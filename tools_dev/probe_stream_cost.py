"""Decompose the config-5 streaming run: where do the 13.4 s go?

bench.measure_streaming_rtf reports 617 s of audio scoring in ~13 s
(46x real-time) but the pipeline's components measure 240k clips/s
(frontend) and 455k clips/s (model forward) — the wall must live in
glue. This probe times each stage of calculate_streaming_accuracy on
the same synthetic stream, fresh-dithered per timed call so no tunnel
content/replay cache flatters a number:

  host_prep    — read_wav + trunc-quantize on host
  upload_i32   — device_put of the chunk as int32 (the pre-round-5 wire)
  upload_i16   — device_put as int16 (the shipped wire; half the bytes)
  base_frames  — stateless per-hop prefix (framing..Sqrt64), device
  stream_feats — full stream_features (adds window gather + NR/PCAN/log
                 suffix over (W, 49, 40))
  predict_sync — engine's predict loop (np.asarray per batch, as shipped)
  predict_async— same but device arrays collected, one sync at the end
  detector     — detect_all_thresholds (vectorized threshold replay)
  stats        — 19x ground-truth matching + accuracy stats
  full         — calculate_streaming_accuracy wall (the RTF denominator)

Writes benchmarks/stream_cost_decomposition.json.

Run (real chip, idle host): python tools_dev/probe_stream_cost.py
"""

import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

import numpy as np  # noqa: E402


def _tone_clip(freq, seed):
    rng = np.random.default_rng(seed)
    t = np.arange(16000) / 16000.0
    sig = 0.4 * np.sin(2 * np.pi * freq * t) + rng.normal(0, 0.02, 16000)
    return np.clip(sig, -1, 1).astype(np.float32)


def main():
    import jax
    import jax.numpy as jnp

    from multilingual_kws_tpu.models.kws_model import make_transfer_model
    from multilingual_kws_tpu.ops.micro_exact import FrontendConfig
    from multilingual_kws_tpu.ops.micro_jax import MicroFrontendJax
    from multilingual_kws_tpu.stream.detector import (
        DetectorParams,
        detect_all_thresholds,
    )
    from multilingual_kws_tpu.stream.engine import (
        StreamFlags,
        calculate_streaming_accuracy,
        stream_feature_chunks,
    )
    from multilingual_kws_tpu.stream.stats import StreamingAccuracyStats
    from multilingual_kws_tpu.tools.stream_synth import (
        synthesize_stream,
        write_stream,
    )
    from multilingual_kws_tpu.utils.wav import write_wav

    tmp = Path("/tmp/stream_cost")
    tmp.mkdir(exist_ok=True)
    targets = [_tone_clip(440.0, seed=s) for s in range(6)]
    distractors = [_tone_clip(900.0 + 80 * s, seed=100 + s) for s in range(8)]
    spec = synthesize_stream(
        "target", targets, distractors, num_targets=120, num_distractors=280,
        gap_ms_range=(200, 900), noise_rms=0.003, seed=7,
    )
    wav = tmp / "stream.wav"
    labels = tmp / "labels.txt"
    write_stream(spec, wav, labels)
    audio_s = spec.waveform.shape[0] / spec.sample_rate
    print(f"stream: {audio_s:.1f} s", flush=True)

    model = make_transfer_model(num_categories=3)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 49, 40, 1)), train=False
    )
    predict = jax.jit(
        lambda s: jax.nn.softmax(
            model.apply(variables, s, train=False), axis=-1
        )
    )
    thresholds = [round(0.05 * i, 2) for i in range(1, 20)]
    flags = StreamFlags(
        wav=str(wav), ground_truth=str(labels), target_keyword="target",
        detection_thresholds=thresholds,
    )
    frontend = MicroFrontendJax(FrontendConfig(sample_rate=16000))

    # ---- warm all compiles on the original stream -------------------------
    t0 = time.perf_counter()
    calculate_streaming_accuracy(
        predict, [flags], verbose=False, frontend=frontend
    )
    print(f"warm pass: {time.perf_counter()-t0:.1f} s", flush=True)

    rng = np.random.default_rng(11)

    def fresh_audio():
        d = np.clip(
            spec.waveform
            + rng.uniform(-2e-5, 2e-5, spec.waveform.shape).astype(np.float32),
            -1.0,
            1.0,
        )
        return d

    results = {"audio_seconds": round(audio_s, 1)}
    sr = 16000
    clip_samples = 16000
    stride = 320

    # ---- host prep ---------------------------------------------------------
    audio = fresh_audio()
    t0 = time.perf_counter()
    i16 = np.clip(np.trunc(audio * 32768.0), -32768, 32767)
    i32_host = i16.astype(np.int32)
    i16_host = i16.astype(np.int16)
    results["host_quantize_s"] = round(time.perf_counter() - t0, 3)

    num_windows = int(np.ceil((audio.shape[0] - clip_samples) / stride))
    results["num_windows"] = num_windows

    # ---- uploads (fresh bytes each) ----------------------------------------
    t0 = time.perf_counter()
    dev_i32 = jax.device_put(i32_host)
    dev_i32.block_until_ready()
    results["upload_i32_s"] = round(time.perf_counter() - t0, 3)

    i16_host2 = (i16_host.astype(np.int32) ^ 1).astype(np.int16)  # fresh
    t0 = time.perf_counter()
    dev_i16 = jax.device_put(i16_host2)
    dev_i16.block_until_ready()
    results["upload_i16_s"] = round(time.perf_counter() - t0, 3)

    # ---- base_frames only (stateless prefix) -------------------------------
    base_jit = jax.jit(frontend.base_frames)
    # int16 like the shipped engine wire (round 5) — keeps these stages on
    # the same compiled signature the warm full pass already built
    out = base_jit(dev_i16)  # compile
    jax.block_until_ready(out)
    audio2 = fresh_audio()
    d2 = jax.device_put(
        np.clip(np.trunc(audio2 * 32768.0), -32768, 32767).astype(np.int16)
    )
    d2.block_until_ready()
    t0 = time.perf_counter()
    out = base_jit(d2)
    jax.block_until_ready(out)
    results["base_frames_s"] = round(time.perf_counter() - t0, 3)

    # ---- full stream_features (gather + suffix) ----------------------------
    audio3 = fresh_audio()
    i16_3 = np.clip(np.trunc(audio3 * 32768.0), -32768, 32767).astype(np.int16)
    chunk = i16_3[: (num_windows - 1) * stride + clip_samples]
    dev3 = jax.device_put(chunk)
    dev3.block_until_ready()
    t0 = time.perf_counter()
    feats = frontend.stream_features(dev3, num_windows)
    jax.block_until_ready(feats)
    results["stream_features_s"] = round(time.perf_counter() - t0, 3)
    results["suffix_est_s"] = round(
        results["stream_features_s"] - results["base_frames_s"], 3
    )

    # ---- predict loop over the materialized windows ------------------------
    bs = 2048
    t0 = time.perf_counter()
    preds = []
    for i in range(0, feats.shape[0], bs):
        preds.append(np.asarray(predict(feats[i : i + bs][..., None])))
    inferences = np.concatenate(preds, axis=0)
    results["predict_sync_s"] = round(time.perf_counter() - t0, 3)

    t0 = time.perf_counter()
    preds_d = []
    for i in range(0, feats.shape[0], bs):
        preds_d.append(predict(feats[i : i + bs][..., None]))
    jax.block_until_ready(preds_d)
    inferences2 = np.concatenate([np.asarray(p) for p in preds_d], axis=0)
    results["predict_async_s"] = round(time.perf_counter() - t0, 3)
    assert np.allclose(inferences, inferences2, atol=1e-6)

    # ---- the shipped engine path (round 5b): fixed-shape batches ------------
    # pad to a batch multiple + ONE traced-offset dynamic-slice program, so
    # every batch reuses the same two executables; default bs 8192 -> 4
    # submits instead of 16 variable-shape slice+reshape+predict trios
    from multilingual_kws_tpu.stream.engine import _predict_batches

    bs_fix = 8192
    _ = _predict_batches(predict, feats, bs_fix)  # compile pad/slice/model
    jax.block_until_ready(_)
    t0 = time.perf_counter()
    preds_f = _predict_batches(predict, feats, bs_fix)
    out3 = jnp.concatenate(preds_f, axis=0)
    inferences3 = np.asarray(out3)
    results["predict_fixedshape_s"] = round(time.perf_counter() - t0, 3)
    assert np.allclose(inferences, inferences3, atol=1e-5)

    # ---- detector + stats ---------------------------------------------------
    times_ms = np.array(
        [int(off * 1000 / sr) for off in range(0, audio.shape[0] - clip_samples, stride)],
        dtype=np.int64,
    )[: inferences.shape[0]]
    params = DetectorParams(
        average_window_duration_ms=flags.average_window_duration_ms,
        suppression_ms=flags.suppression_ms,
        minimum_count=flags.minimum_count,
        target_id=2,
    )
    t0 = time.perf_counter()
    per_thresh = detect_all_thresholds(
        inferences, times_ms, thresholds, params, target_name="target"
    )
    results["detector_s"] = round(time.perf_counter() - t0, 3)

    t0 = time.perf_counter()
    for th in thresholds:
        found, _ = per_thresh[float(th)]
        stats = StreamingAccuracyStats(target_keyword="target")
        stats.read_ground_truth_file(str(labels))
        stats.calculate_accuracy_stats(found, -1, flags.time_tolerance_ms)
    results["stats_s"] = round(time.perf_counter() - t0, 3)

    # ---- full wall (fresh wav, as bench times it) ---------------------------
    audio4 = fresh_audio()
    wav4 = tmp / "stream_timed.wav"
    write_wav(wav4, audio4)
    flags4 = StreamFlags(
        wav=str(wav4), ground_truth=str(labels), target_keyword="target",
        detection_thresholds=thresholds,
    )
    t0 = time.perf_counter()
    calculate_streaming_accuracy(
        predict, [flags4], verbose=False, frontend=frontend
    )
    full_s = time.perf_counter() - t0
    results["full_s"] = round(full_s, 3)
    results["real_time_factor"] = round(audio_s / full_s, 1)

    # ---- the old engine's dominant cost, kept measured: a FRESH frontend
    # instance re-traces the whole stream program and re-fetches its
    # executable per call (engine.py used to construct one per stream —
    # that was ~9 s of the old 10 s wall; now cached_stream_frontend)
    audio5 = fresh_audio()
    wav5 = tmp / "stream_timed2.wav"
    write_wav(wav5, audio5)
    flags5 = StreamFlags(
        wav=str(wav5), ground_truth=str(labels), target_keyword="target",
        detection_thresholds=thresholds,
    )
    from multilingual_kws_tpu.ops.micro_exact import FrontendConfig as _FC
    from multilingual_kws_tpu.ops.micro_jax import MicroFrontendJax as _FE

    t0 = time.perf_counter()
    calculate_streaming_accuracy(
        predict, [flags5], verbose=False, frontend=_FE(_FC(sample_rate=16000))
    )
    results["full_fresh_frontend_s"] = round(time.perf_counter() - t0, 3)
    results["retrace_overhead_s"] = round(
        results["full_fresh_frontend_s"] - full_s, 3
    )

    results["note"] = (
        "one v5e via tunnel, fresh-dithered audio per timed stage (no "
        "content/replay cache); stream_features = base_frames + window "
        "gather + NR/PCAN/log suffix; predict_sync is the per-batch "
        "np.asarray loop (engine now concats on device, one pull), "
        "predict_async defers the sync; full_fresh_frontend_s replays the "
        "pre-fix engine (fresh frontend instance per stream => re-trace + "
        "executable re-fetch per call)"
    )
    dest = REPO / "benchmarks" / "stream_cost_decomposition.json"
    dest.write_text(json.dumps(results, indent=1))
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
