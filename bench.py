"""Benchmark: clips/sec through micro-frontend + EfficientNetB0 embedding on
one TPU chip, vs the TF-CPU reference pipeline (BASELINE.json config #2 /
north star ">=10x clips/sec over the TF-CPU reference").

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "clips/sec", "vs_baseline": N}

The reference baseline (TF-CPU: per-clip to_micro_spectrogram + Keras
EfficientNetB0 predict) is measured once if TensorFlow is available and
cached in benchmarks/ref_baseline.json; otherwise the cached value ships
with the repo.
"""

import json
import os
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent
sys.path.insert(0, str(REPO))

BASELINE_CACHE = REPO / "benchmarks" / "ref_baseline.json"
BATCH = 2048
WARMUP = 2
ITERS = 6


def measure_ours() -> float:
    import jax
    import jax.numpy as jnp
    from multilingual_kws_tpu.models.kws_model import make_embedding_model
    from multilingual_kws_tpu.ops.micro_exact import FrontendConfig
    from multilingual_kws_tpu.ops.micro_jax import MicroFrontendJax

    model = make_embedding_model(num_labels=761)
    rng = jax.random.PRNGKey(0)
    variables = model.init(rng, jnp.zeros((1, 49, 40, 1), jnp.float32), train=False)
    frontend = MicroFrontendJax(FrontendConfig())

    @jax.jit
    def pipeline(params, batch_stats, audio):
        specs = frontend._features_impl(audio)[..., None]
        return model.apply(
            {"params": params, "batch_stats": batch_stats}, specs, train=False
        )

    rng_np = np.random.default_rng(0)
    audio = rng_np.normal(0, 0.1, (BATCH, 16000)).astype(np.float32).clip(-1, 1)
    audio = jax.device_put(audio)
    params, bstats = variables["params"], variables["batch_stats"]

    for _ in range(WARMUP):
        pipeline(params, bstats, audio).block_until_ready()
    # steady-state throughput: pipelined submission (sync once at the end),
    # overlapping host dispatch with device compute — how a bulk evaluation
    # or serving loop actually runs
    t0 = time.perf_counter()
    outs = [pipeline(params, bstats, audio) for _ in range(ITERS)]
    jax.block_until_ready(outs)
    dt = time.perf_counter() - t0
    return BATCH * ITERS / dt


def measure_reference() -> float:
    """TF-CPU reference path: to_micro_spectrogram per clip (the reference's
    per-file featurization, transfer_learning.py:189-198) + batched Keras
    EfficientNetB0+head predict."""
    import tensorflow as tf
    from tensorflow.lite.experimental.microfrontend.python.ops import (
        audio_microfrontend_op as frontend_op,
    )

    tf.config.set_visible_devices([], "GPU")

    inputs = tf.keras.Input((49, 40, 1))
    trunk = tf.keras.applications.EfficientNetB0(
        include_top=False, weights=None, input_tensor=inputs
    )
    x = tf.keras.layers.GlobalAveragePooling2D()(trunk.output)
    x = tf.keras.layers.Dense(1024, activation="relu")(x)
    x = tf.keras.layers.Dense(1024, activation="relu")(x)
    x = tf.keras.layers.Dense(192, activation="selu")(x)
    out = tf.keras.layers.Dense(761)(x)
    model = tf.keras.Model(inputs, out)

    rng = np.random.default_rng(0)
    n = 64  # smaller sample, extrapolates linearly
    audio = rng.normal(0, 0.1, (n, 16000)).astype(np.float32).clip(-1, 1)

    def featurize(clip):
        int16 = tf.cast(tf.multiply(tf.constant(clip), 32768), tf.int16)
        return frontend_op.audio_microfrontend(
            int16, sample_rate=16000, window_size=30, window_step=20,
            num_channels=40, out_scale=1, out_type=tf.float32,
        ) * (10.0 / 256.0)

    # warmup
    specs = np.stack([featurize(audio[0]).numpy() for _ in range(2)])
    model.predict(specs[..., None], verbose=0)

    t0 = time.perf_counter()
    specs = np.stack([featurize(c).numpy() for c in audio])
    model.predict(specs[..., None], batch_size=64, verbose=0)
    dt = time.perf_counter() - t0
    return n / dt


def get_baseline() -> float:
    if BASELINE_CACHE.exists():
        with open(BASELINE_CACHE) as fh:
            return json.load(fh)["clips_per_sec"]
    try:
        val = measure_reference()
        BASELINE_CACHE.parent.mkdir(parents=True, exist_ok=True)
        with open(BASELINE_CACHE, "w") as fh:
            json.dump(
                {"clips_per_sec": val, "config": "TF-CPU frontend+EfficientNetB0"},
                fh,
            )
        return val
    except Exception as e:
        print(f"# reference baseline unavailable ({e})", file=sys.stderr)
        return float("nan")


def main():
    ours = measure_ours()
    base = get_baseline()
    vs = ours / base if base == base else None
    print(
        json.dumps(
            {
                "metric": "frontend+EfficientNetB0 embed throughput (bs 2048)",
                "value": round(ours, 1),
                "unit": "clips/sec",
                "vs_baseline": round(vs, 2) if vs is not None else None,
            }
        )
    )


if __name__ == "__main__":
    main()
