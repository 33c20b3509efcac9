"""bf16 inference parity evidence for the streaming detector (VERDICT r3 item 4).

The headline bench auto-picks bfloat16 trunk compute, but every accuracy /
parity artifact so far was produced at f32. This probe shows — on the real
chip, with the full-size B0 flagship — that the reference's detector
semantics (batch_streaming_analysis.py:126-177) are preserved under bf16:

 1. few-shot transfer (f32, reference defaults) of a held-out synthetic
    keyword on top of the at-scale pretrained B0 checkpoint
    (/tmp/scale_run/ckpt from tools_dev/pretrain_scale_run.py),
 2. synthesize a long stream with known target times,
 3. score it twice with the SAME transfer params: trunk compute f32 vs
    bf16 (params, embedding, softmax head stay f32 — the shipped
    mixed-precision contract),
 4. replay the detector over a 19-threshold sweep on both inference sets,
 5. record: per-threshold detection equality, max |delta softmax|, and
    tp/fp/fn at the default 0.9 threshold both ways.

Writes benchmarks/bf16_stream_parity.json.

Run on the TPU host from /root/repo AFTER the scale run (needs its ckpt):
    python tools_dev/bf16_stream_parity.py
"""

import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tests"))

import numpy as np

DEST = REPO / "benchmarks" / "bf16_stream_parity.json"
CKPT = Path("/tmp/scale_run/ckpt")

TARGET = "fbe"  # 3-phoneme word: cannot collide with the 4-phoneme commands
THRESHOLDS = [round(0.05 * i, 2) for i in range(1, 20)]  # 0.05 .. 0.95


def main():
    import zlib

    import jax
    import jax.numpy as jnp

    from helpers import hard_word_clip
    from multilingual_kws_tpu.models.kws_model import make_transfer_model
    from multilingual_kws_tpu.stream.engine import (
        StreamFlags,
        calculate_streaming_accuracy,
    )
    from multilingual_kws_tpu.stream.tprfpr import tpr_fpr
    from multilingual_kws_tpu.tools.stream_synth import synthesize_stream, write_stream
    from multilingual_kws_tpu.train import checkpoints as ckpt_mod
    from multilingual_kws_tpu.train.finetune import transfer_learn
    from multilingual_kws_tpu.utils.wav import write_wav

    assert CKPT.exists(), "run tools_dev/pretrain_scale_run.py first"
    meta = ckpt_mod.load_metadata(CKPT)
    print(f"base checkpoint: epoch {meta.get('epoch')} "
          f"val_acc {meta.get('val_accuracy'):.4f}", flush=True)

    work = Path("/tmp/bf16_stream_parity")
    work.mkdir(exist_ok=True)

    # ---- few-shot corpus: 5 shots of the held-out target + unknowns ----
    def clip(word, i):
        return hard_word_clip(
            word, seed=zlib.crc32(f"bf16probe/{word}/{i}".encode()), noise=0.012
        )

    shots, vals, unknowns = [], [], []
    for i in range(5):
        p = work / f"shot_{i}.wav"
        write_wav(p, clip(TARGET, i))
        shots.append(str(p))
    for i in range(5, 15):
        p = work / f"val_{i}.wav"
        write_wav(p, clip(TARGET, i))
        vals.append(str(p))
    for j, w in enumerate(["aabb", "ccdd", "eeff", "abef", "fcda"]):
        for i in range(4):
            p = work / f"unk_{w}_{i}.wav"
            write_wav(p, clip(w, i))
            unknowns.append(str(p))
    bg_dir = work / "_background_noise_"
    bg_dir.mkdir(exist_ok=True)
    rng = np.random.default_rng(42)
    write_wav(bg_dir / "noise.wav",
              rng.normal(0, 0.05, 5 * 16000).astype(np.float32).clip(-1, 1))

    # ---- transfer learn at f32 (reference defaults) ----
    t0 = time.time()
    result = transfer_learn(
        target=TARGET,
        train_files=shots,
        val_files=vals,
        unknown_files=unknowns,
        bg_datadir=str(bg_dir),
        base_model_path=str(CKPT),
        seed=0,
        verbose=0,
    )
    print(f"transfer_learn done in {time.time()-t0:.0f}s", flush=True)

    # ---- stream with known label times: config-5 scale (VERDICT r4 #7 —
    # the round-4 evidence was one 23 s stream / 1,122 windows; this is
    # ~600 s / ~30k windows so the threshold-adjacent sensitivity gets
    # statistical weight)
    targets = [clip(TARGET, 100 + i) for i in range(8)]
    distractors = [clip("abcd", 200 + i) for i in range(4)] + [
        clip("feca", 300 + i) for i in range(4)
    ]
    spec = synthesize_stream(
        TARGET, targets, distractors,
        num_targets=120, num_distractors=280, gap_ms_range=(200, 900),
        seed=11, noise_rms=0.003,
    )
    wav_path = work / "stream.wav"
    labels_path = work / "labels.txt"
    write_stream(spec, wav_path, labels_path)
    gt_times = [t for _, t in spec.labels]
    duration_s = spec.waveform.shape[0] / 16000
    print(f"stream: {duration_s:.0f}s, {len(gt_times)} targets", flush=True)

    # ---- two predict paths over the SAME f32 transfer params ----
    state_params = result.state.params
    batch_stats = result.state.batch_stats

    def make_predict(dtype):
        kw = {} if dtype == "float32" else {"dtype": jnp.dtype(dtype)}
        model = make_transfer_model(num_categories=3, **kw)
        cols = {"params": state_params, "batch_stats": batch_stats}

        @jax.jit
        def predict(specs):
            return model.apply(cols, specs, train=False)

        return predict

    flags = StreamFlags(
        wav=str(wav_path), ground_truth=str(labels_path),
        target_keyword=TARGET, detection_thresholds=THRESHOLDS,
    )
    runs = {}
    for dtype in ("float32", "bfloat16"):
        t0 = time.time()
        results, inferences = calculate_streaming_accuracy(
            make_predict(dtype), [flags], verbose=False
        )
        runs[dtype] = dict(
            results=results[0][1],
            inferences=np.asarray(inferences, np.float32),
            wall=time.time() - t0,
        )
        print(f"{dtype}: {inferences.shape[0]} windows in "
              f"{runs[dtype]['wall']:.1f}s", flush=True)

    # ---- compare ----
    inf_f32 = runs["float32"]["inferences"]
    inf_bf16 = runs["bfloat16"]["inferences"]
    dp = np.abs(inf_f32 - inf_bf16)
    max_dp = float(dp.max())
    dp_target = dp[:, 2]  # the detector thresholds the target column
    dp_pct = {
        f"p{q}": float(np.percentile(dp_target, q))
        for q in (50, 90, 99, 99.9)
    }
    per_thresh = {}
    identical = 0
    for th in THRESHOLDS:
        f_f32, _ = runs["float32"]["results"][th]
        f_bf16, _ = runs["bfloat16"]["results"][th]
        same = f_f32 == f_bf16
        identical += bool(same)
        # detection agreement at 750 ms tolerance even when not identical:
        # count detections of one side with a same-side match on the other
        t_a = [t for _, t in f_f32]
        t_b = [t for _, t in f_bf16]
        matched = sum(
            1 for ta in t_a if any(abs(ta - tb) <= 750 for tb in t_b)
        )
        per_thresh[str(th)] = dict(
            identical=bool(same),
            detections_f32=len(f_f32),
            detections_bf16=len(f_bf16),
            matched_within_750ms=matched,
        )
        if not same and len(f_f32) <= 20 and len(f_bf16) <= 20:
            per_thresh[str(th)]["f32"] = [list(x) for x in f_f32]
            per_thresh[str(th)]["bf16"] = [list(x) for x in f_bf16]

    def score(found, th):
        r = tpr_fpr(TARGET, th, found, gt_times, duration_s=duration_s,
                    time_tolerance_ms=750)
        return {k: r[k] for k in
                ("true_positives", "false_positives", "false_negatives")}

    out = dict(
        what=(
            "streaming-detector parity f32 vs bf16 trunk compute: same f32 "
            "transfer params, full-size B0, real chip, 19-threshold sweep "
            "(reference semantics batch_streaming_analysis.py:126-177)"
        ),
        base_checkpoint=dict(path=str(CKPT), **{
            k: meta.get(k) for k in ("epoch", "val_accuracy")
        }),
        stream=dict(duration_s=round(duration_s, 1),
                    windows=int(inf_f32.shape[0]),
                    targets=len(gt_times)),
        thresholds=THRESHOLDS,
        thresholds_with_identical_detections=identical,
        max_abs_softmax_delta=max_dp,
        target_prob_delta_percentiles=dp_pct,
        detector_at_0p9=dict(
            f32=score(runs["float32"]["results"][0.9][0], 0.9),
            bf16=score(runs["bfloat16"]["results"][0.9][0], 0.9),
        ),
        per_threshold=per_thresh,
        platform=jax.devices()[0].platform,
    )
    DEST.write_text(json.dumps(out, indent=1))
    print(json.dumps({k: out[k] for k in (
        "thresholds_with_identical_detections", "max_abs_softmax_delta",
        "target_prob_delta_percentiles", "detector_at_0p9")}, indent=1))


if __name__ == "__main__":
    main()
