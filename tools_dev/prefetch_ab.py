"""Prefetch-vs-sync A/B for the streaming (host-fed) pretrain input path
(VERDICT r2 item 5: extra_metrics said prefetch 29% SLOWER while
pretrain.py's comment said neutral — settle it with >=5 alternating runs
each and set the default to the winner on this rig).

python tools_dev/prefetch_ab.py [reps] [steps]
Writes benchmarks/prefetch_ab.json.
"""

import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

import jax
import jax.numpy as jnp
import numpy as np

REPS = int(sys.argv[1]) if len(sys.argv) > 1 else 5
STEPS = int(sys.argv[2]) if len(sys.argv) > 2 else 12
BS = 512


def main():
    import tempfile

    from multilingual_kws_tpu.data.dataset import AudioDataset
    from multilingual_kws_tpu.models.kws_model import make_embedding_model
    from multilingual_kws_tpu.parallel import mesh as meshlib
    from multilingual_kws_tpu.settings import standard_microspeech_model_settings
    from multilingual_kws_tpu.train.pretrain import build_pretrain_step
    from multilingual_kws_tpu.train.steps import adam
    from multilingual_kws_tpu.utils.compilation_cache import (
        enable_compilation_cache,
    )
    from multilingual_kws_tpu.utils.wav import write_wav

    enable_compilation_cache()
    tmp = Path(tempfile.mkdtemp(prefix="prefetch_ab_"))
    rng = np.random.default_rng(0)
    words = [f"w{i:02d}" for i in range(16)]
    files, labels = [], []
    for wi, w in enumerate(words):
        d = tmp / "clips" / w
        d.mkdir(parents=True, exist_ok=True)
        for i in range(32):
            p = d / f"{i}.wav"
            t = np.arange(16000) / 16000.0
            x = 0.4 * np.sin(2 * np.pi * (300 + 45 * wi) * t)
            write_wav(p, np.clip(x + rng.normal(0, 0.01, 16000), -1, 1))
            files.append(str(p))
            labels.append(w)
    bg_dir = tmp / "_background_noise_"
    bg_dir.mkdir()
    for i in range(2):
        write_wav(
            bg_dir / f"noise_{i}.wav",
            np.clip(rng.normal(0, 0.05, 3 * 16000), -1, 1).astype(np.float32),
        )

    settings = standard_microspeech_model_settings(len(words) + 1)
    mesh = meshlib.make_mesh()
    dataset = AudioDataset(
        model_settings=settings, commands=words, background_data_dir=bg_dir,
        unknown_files=[], silence_percentage=1.0, seed=0,
        input_sharding=meshlib.batch_sharding(mesh),
    )
    model = make_embedding_model(num_labels=761)
    tx = adam(1e-3)
    init_fn, step_fn, _ = build_pretrain_step(model, tx, mesh)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 49, 40, 1), jnp.float32),
        train=False,
    )
    key = jax.device_put(jax.random.PRNGKey(1))
    split_fn = jax.jit(lambda k: tuple(jax.random.split(k)))

    def run(prefetch):
        nonlocal key
        with mesh:
            state = init_fn(meshlib.replicate(mesh, variables))
            for specs, lbl in dataset.train_batches(
                files, batch_size=BS, num_steps=2, labels=labels,
                single_target=False, prefetch=prefetch,
            ):
                key, sub = split_fn(key)
                state, _ = step_fn(state, specs, lbl, sub)
            jax.block_until_ready(state.params)
            t0 = time.perf_counter()
            for specs, lbl in dataset.train_batches(
                files, batch_size=BS, num_steps=STEPS, labels=labels,
                single_target=False, prefetch=prefetch,
            ):
                key, sub = split_fn(key)
                state, _ = step_fn(state, specs, lbl, sub)
            jax.block_until_ready(state.params)
            return BS * STEPS / (time.perf_counter() - t0)

    results = {"sync": [], "prefetch2": []}
    run(0)  # compile warmup
    for r in range(REPS):
        results["sync"].append(round(run(0), 1))
        results["prefetch2"].append(round(run(2), 1))
        print(f"rep {r}: sync={results['sync'][-1]} "
              f"prefetch2={results['prefetch2'][-1]} clips/s", flush=True)

    out = {
        "reps": REPS,
        "steps_per_rep": STEPS,
        "batch_size": BS,
        "sync_clips_per_sec": results["sync"],
        "prefetch2_clips_per_sec": results["prefetch2"],
        "sync_median": float(np.median(results["sync"])),
        "prefetch2_median": float(np.median(results["prefetch2"])),
    }
    (REPO / "benchmarks" / "prefetch_ab.json").write_text(
        json.dumps(out, indent=1)
    )
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
