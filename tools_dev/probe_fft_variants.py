"""Time the three bit-identical radix-4 stage formulations on the TPU.

Variants (ops/pallas_fft._stage_*):
  ref — roll-broadcast all four quarters + full-width butterfly + select
  rot — twiddle products at source lanes + grouped rotates + 2-case combine
  mxu — twiddle products at source lanes + butterfly as exact f32 matmuls

Each variant is first checked bit-exact ON CHIP (Mosaic-compiled) against
ops/micro_exact, then timed with chained (cache-proof) timing on the full
fused frontend at bs 2048. Writes benchmarks/fft_variants.json.

Run on the real TPU: python tools_dev/probe_fft_variants.py
"""

import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

import jax
import jax.numpy as jnp
import numpy as np

from bench import _chained_time as chained_time  # the ONE timing helper
from multilingual_kws_tpu.ops.micro_exact import (
    FrontendConfig,
    to_micro_spectrogram_exact,
)
from multilingual_kws_tpu.ops.micro_jax import MicroFrontendJax

BATCH = 2048


def main():
    assert jax.default_backend() == "tpu", jax.default_backend()
    rng = np.random.default_rng(0)
    audio = rng.normal(0, 0.1, (BATCH, 16000)).astype(np.float32).clip(-1, 1)
    audio_dev = jax.device_put(audio)

    # host oracle on a subsample for the on-chip exactness gate
    n_check = 128
    want = np.stack(
        [to_micro_spectrogram_exact(a) for a in audio[:n_check]]
    )

    results = {}
    for variant in ("ref", "rot", "mxu"):
        fe = MicroFrontendJax(FrontendConfig(), fft_variant=variant)
        got = np.asarray(fe.features(jax.device_put(audio[:n_check])))
        exact = got.shape == want.shape and np.array_equal(got, want)
        print(f"{variant}: on-chip bit-exact = {exact}", flush=True)
        if not exact:
            results[variant] = {"bit_exact_on_chip": False}
            continue

        @jax.jit
        def fe_step(a, eps, fe=fe):
            feats = fe._features_impl(a + eps)
            return jnp.tanh(jnp.mean(feats)) * 1e-30

        sec = chained_time(fe_step, audio_dev)
        results[variant] = {
            "bit_exact_on_chip": True,
            "clips_per_sec": round(BATCH / sec),
            "us_per_clip": round(sec / BATCH * 1e6, 3),
        }
        print(f"{variant}: {results[variant]}", flush=True)

    out = {
        "what": "fused frontend (frontend only, bs 2048) by FFT stage "
        "formulation, chained timing, one v5e chip via tunnel",
        "results": results,
    }
    (REPO / "benchmarks" / "fft_variants.json").write_text(
        json.dumps(out, indent=1)
    )
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
