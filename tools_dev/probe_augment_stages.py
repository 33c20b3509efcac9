"""Which augmentation stage costs the 9.24 ms/step (bs 512)?

benchmarks/fused_pipeline_decomposition.json: gather+augment (no frontend,
no model) is 9.24 ms/step — 57% of the whole fused pretrain step. The HBM
roofline for the math is ~0.5 ms, so something lowers badly. Suspects: the
per-row dynamic-start gathers in the LANE (minor) dimension — vmapped
dynamic_slice for timeshift (ops/augment.py:51-65) and the background crop
(:68-86) — which TPU handles far worse than row-major gathers.

Times cumulative stages, each as a scanned (n=96) program, 3 reps:
  gather        — bank row gather + silence zeroing
  convert       — + int16 -> f32 * (1/32768)
  timeshift     — + random_timeshift
  bgcrop        — + random_background_crop (crop computed, not mixed)
  mix           — + RMS-equalized mix + silence substitution (= full
                  augment_waveforms)

Writes benchmarks/augment_stage_decomposition.json.

Run (real chip): python tools_dev/probe_augment_stages.py
"""

import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

import numpy as np  # noqa: E402

BS = 512
N = 96
REPS = 3


def main():
    import jax
    import jax.numpy as jnp

    from multilingual_kws_tpu.data.dataset import AudioDataset, _resident_gather
    from multilingual_kws_tpu.ops.augment import (
        add_background,
        augment_waveforms,
        random_background_crop,
        random_timeshift,
    )
    from multilingual_kws_tpu.parallel import mesh as meshlib
    from multilingual_kws_tpu.settings import standard_microspeech_model_settings
    from multilingual_kws_tpu.utils.wav import write_wav

    tmp = Path("/tmp/fused_cost_corpus")  # reuse probe_fused_pipeline_cost's
    words = [f"w{i:02d}" for i in range(16)]
    rng = np.random.default_rng(0)
    files, labels = [], []
    for wi, w in enumerate(words):
        d = tmp / "clips" / w
        d.mkdir(parents=True, exist_ok=True)
        for i in range(32):
            p = d / f"{i}.wav"
            if not p.exists():
                t = np.arange(16000) / 16000.0
                sig = 0.4 * np.sin(2 * np.pi * (300.0 + 45 * wi) * t)
                sig += rng.normal(0, 0.02, 16000)
                write_wav(p, np.clip(sig, -1, 1).astype(np.float32))
            files.append(str(p))
            labels.append(w)
    bg_dir = tmp / "_background_noise_"
    bg_dir.mkdir(exist_ok=True)
    for i in range(2):
        p = bg_dir / f"noise_{i}.wav"
        if not p.exists():
            write_wav(
                p,
                np.clip(rng.normal(0, 0.05, 3 * 16000), -1, 1)
                .astype(np.float32),
            )

    settings = standard_microspeech_model_settings(len(words) + 1)
    mesh = meshlib.make_mesh()
    dataset = AudioDataset(
        model_settings=settings, commands=words,
        background_data_dir=bg_dir, unknown_files=[],
        silence_percentage=1.0, seed=0,
        input_sharding=meshlib.batch_sharding(mesh),
    )
    bank = dataset.build_resident_bank(files)
    from jax.sharding import NamedSharding, PartitionSpec as P

    epoch_in = NamedSharding(mesh, P(None, meshlib.DATA_AXIS))
    params = dataset.aug_params

    def host_indices(steps):
        idx_a, sil_a = [], []
        for idx, _lbl, sil in dataset.host_train_indices(
            files, BS, steps, bank, labels=labels, single_target=False
        ):
            idx_a.append(idx)
            sil_a.append(sil)
        return jax.device_put(
            (np.asarray(idx_a, np.int32), np.asarray(sil_a, bool)), epoch_in
        )

    def stage_fn(stage):
        def one(aug_key, idx, sil):
            wav_i = _resident_gather(bank["bank"], idx, sil)
            if stage == "gather":
                return wav_i.astype(jnp.float32)  # consume
            wav = wav_i.astype(jnp.float32) * (1.0 / 32768.0)
            if stage == "convert":
                return wav
            k_shift, k_bg, k_vol_sil, k_mix, k_vol_mix = jax.random.split(
                aug_key, 5
            )
            if stage == "timeshift":
                return random_timeshift(
                    k_shift, wav, params.time_shift_samples
                )
            if stage == "bgcrop":
                wav = random_timeshift(k_shift, wav, params.time_shift_samples)
                bg = random_background_crop(
                    k_bg, dataset.bg_data, dataset.bg_sizes, wav.shape[1], BS
                )
                return wav + bg * 1e-30  # consume both, skip RMS/mix
            # mix = the full augment_waveforms
            return augment_waveforms(
                aug_key, wav, sil, dataset.bg_data, dataset.bg_sizes, params
            )

        @jax.jit
        def epoch(idx_all, sil_all, data_key):
            def body(carry, xs):
                acc, dkey = carry
                idx, sil = xs
                dks = jax.random.split(dkey)
                dkey, aug_key = dks[0], dks[1]
                out = one(aug_key, idx, sil)
                return (acc + jnp.tanh(jnp.mean(out)) * 1e-30, dkey), None

            (acc, _), _ = jax.lax.scan(
                body, (jnp.zeros(()), data_key), (idx_all, sil_all)
            )
            return acc

        return epoch

    results = {"bs": BS, "n": N, "reps": REPS}
    with mesh:
        for stage in ("gather", "convert", "timeshift", "bgcrop", "mix"):
            epoch = stage_fn(stage)
            idx_d, sil_d = host_indices(N)
            jax.block_until_ready(epoch(idx_d, sil_d, dataset._next_key()))
            times = []
            for _ in range(REPS):
                idx_d, sil_d = host_indices(N)
                t0 = time.perf_counter()
                jax.block_until_ready(
                    epoch(idx_d, sil_d, dataset._next_key())
                )
                times.append(time.perf_counter() - t0)
            med = float(np.median(times))
            results[stage] = {
                "ms_per_step": round(med / N * 1e3, 2),
                "reps_total_ms": [round(t * 1e3) for t in times],
            }
            print(f"{stage}: {med/N*1e3:.2f} ms/step", flush=True)

    results["note"] = (
        "cumulative stages of the resident-bank augment path, scanned n=96 "
        "at bs 512 on one v5e via tunnel; per-step deltas between adjacent "
        "stages price each op. 'bgcrop' computes the crop but skips the "
        "RMS mix; 'mix' = full augment_waveforms."
    )
    dest = REPO / "benchmarks" / "augment_stage_decomposition.json"
    dest.write_text(json.dumps(results, indent=1))
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
