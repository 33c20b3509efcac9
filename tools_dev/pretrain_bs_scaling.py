"""Probe: fused HBM-resident pretrain step throughput vs batch size.

The flagship bench measures end-to-end bs-512 pretraining (reference-like
batch). This probe asks whether the fused step itself scales past the
16.6 ms/step bs-512 compute bound at larger batches (better MXU feeding +
dispatch amortization). Steady-state timing: warm steps, then >= 2 s of
measured wall per config (tunnel micro-timings are untrustworthy below
that — CLAUDE.md).

Run on the real TPU chip: python tools_dev/pretrain_bs_scaling.py
"""

import json
import sys
import time
from pathlib import Path

import numpy as np

# NOT via PYTHONPATH: an env-level /root/repo entry shadows one of the axon
# TPU plugin's imports and breaks its backend registration at startup.
sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main(tmp="/tmp/bs_scaling"):
    import jax
    import jax.numpy as jnp

    from multilingual_kws_tpu.data.dataset import AudioDataset
    from multilingual_kws_tpu.models.kws_model import make_embedding_model
    from multilingual_kws_tpu.parallel import mesh as meshlib
    from multilingual_kws_tpu.settings import (
        standard_microspeech_model_settings,
    )
    from multilingual_kws_tpu.train.pretrain import build_fused_resident_step
    from multilingual_kws_tpu.train.steps import adam
    from multilingual_kws_tpu.utils.wav import write_wav

    tmp = Path(tmp)
    words = [f"w{i:02d}" for i in range(16)]
    files, labels = [], []
    for wi, w in enumerate(words):
        d = tmp / "clips" / w
        d.mkdir(parents=True, exist_ok=True)
        rng = np.random.default_rng(wi)
        for i in range(32):
            p = d / f"{i}.wav"
            if not p.exists():
                t = np.arange(16000) / 16000.0
                clip = 0.3 * np.sin(2 * np.pi * (300.0 + 45 * wi) * t)
                clip += rng.normal(0, 0.02, 16000)
                write_wav(p, np.clip(clip, -1, 1).astype(np.float32))
            files.append(str(p))
            labels.append(w)
    bg_dir = tmp / "_background_noise_"
    bg_dir.mkdir(exist_ok=True)
    rng = np.random.default_rng(1)
    for i in range(2):
        p = bg_dir / f"noise_{i}.wav"
        if not p.exists():
            write_wav(
                p,
                np.clip(rng.normal(0, 0.05, 3 * 16000), -1, 1).astype(
                    np.float32
                ),
            )

    settings = standard_microspeech_model_settings(len(words) + 1)
    mesh = meshlib.make_mesh()
    dataset = AudioDataset(
        model_settings=settings, commands=words,
        background_data_dir=bg_dir, unknown_files=[],
        silence_percentage=1.0, seed=0,
        input_sharding=meshlib.batch_sharding(mesh),
    )
    model = make_embedding_model(num_labels=761, dtype=jnp.bfloat16)
    tx = adam(1e-3)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 49, 40, 1), jnp.float32),
        train=False,
    )
    bank = dataset.build_resident_bank(files)
    fused = build_fused_resident_step(model, tx, mesh, dataset)
    split_fn = jax.jit(lambda k: tuple(jax.random.split(k)))

    results = {}
    from multilingual_kws_tpu.train.pretrain import build_pretrain_step

    init_fn, _, _ = build_pretrain_step(model, tx, mesh)
    for bs in (512, 1024, 2048):
        key = jax.device_put(jax.random.PRNGKey(1))
        with mesh:
            state = init_fn(meshlib.replicate(mesh, variables))

            def steps(n, state, key):
                for idx, lbl, sil in dataset.host_train_indices(
                    files, bs, n, bank, labels=labels, single_target=False,
                ):
                    idx, lbl, sil = dataset._put_batch((idx, lbl, sil))
                    key, sub = split_fn(key)
                    state, _ = fused(
                        state, bank["bank"], idx, sil, lbl,
                        dataset._next_key(), sub,
                    )
                return state, key

            t0 = time.perf_counter()
            state, key = steps(4, state, key)  # warm/compile
            jax.block_until_ready(state.params)
            compile_s = time.perf_counter() - t0
            n = 8
            while True:
                t0 = time.perf_counter()
                state, key = steps(n, state, key)
                jax.block_until_ready(state.params)
                wall = time.perf_counter() - t0
                if wall >= 2.0:
                    break
                n *= 2
            results[bs] = {
                "clips_per_sec": round(bs * n / wall, 0),
                "ms_per_step": round(1000 * wall / n, 2),
                "steps_timed": n,
                "compile_plus_warm_s": round(compile_s, 1),
            }
            print(bs, results[bs], flush=True)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
