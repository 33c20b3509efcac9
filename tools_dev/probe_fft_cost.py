"""Decompose the fused frontend kernel's 6.5 us/clip: which section binds?

Times (chained, bs 2048 = 100352 frame rows):
  A. window_fft_energy  — window + input_shift + perm + FFT + energies
  B. kiss_fft_energy    — FFT + energies only (pre-permuted inputs)
  C. full kernel        — everything (the shipped path)
  D. full kernel, PCAN and log both disabled (diagnostic, not bit-exact)
  E. full kernel, log disabled, PCAN enabled (diagnostic)

Derived: window+perm = A-B; filterbank+sqrt+NR+framing = D-A;
PCAN chain = E-D; log chain = C-E.

Run on the real TPU: python tools_dev/probe_fft_cost.py
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
from multilingual_kws_tpu.ops.micro_exact import FrontendConfig
from multilingual_kws_tpu.ops.micro_jax import WINDOW_BITS, MicroFrontendJax

BATCH = 2048


def main():
    assert jax.default_backend() == "tpu", jax.default_backend()
    from multilingual_kws_tpu.ops.pallas_fft import (
        clip_frontend_features,
        kiss_fft_energy,
        window_fft_energy,
    )

    fe = MicroFrontendJax(FrontendConfig())
    rng = np.random.default_rng(0)
    audio = rng.normal(0, 0.1, (BATCH, 16000)).astype(np.float32).clip(-1, 1)
    audio_i = jax.device_put(np.trunc(audio * 32768.0).astype(np.int32))
    nf = 49
    n_rows = BATCH * nf
    frames = jax.device_put(
        rng.integers(-2048, 2048, (n_rows, 480)).astype(np.int32)
    )
    xr = jax.device_put(
        rng.integers(-32768, 32768, (n_rows, 256)).astype(np.int32)
    )
    xi = jax.device_put(
        rng.integers(-32768, 32768, (n_rows, 256)).astype(np.int32)
    )

    res = {}

    @jax.jit
    def step_b(x, eps):
        d = x + eps.astype(jnp.int32)
        out = kiss_fft_energy(d, d)
        return jnp.tanh(jnp.sum(out[::4096, ::64].astype(jnp.float32))) * 1e-30

    res["B_fft_energy_only_us_per_clip"] = (
        chained_time(step_b, xr) / BATCH * 1e6
    )
    print("B", res, flush=True)

    @jax.jit
    def step_a(x, eps):
        d = x + eps.astype(jnp.int32)
        e, sh = window_fft_energy(
            d, fe.window_coeffs, fe._fft_pr, fe._fft_pi,
            window_bits=WINDOW_BITS,
        )
        return jnp.tanh(jnp.sum(e[::4096, ::64].astype(jnp.float32))) * 1e-30

    res["A_window_fft_energy_us_per_clip"] = (
        chained_time(step_a, frames) / BATCH * 1e6
    )
    print("A", res, flush=True)

    def full(audio_int, enable_pcan, enable_log):
        t = fe.t
        return clip_frontend_features(
            audio_int,
            fe.window_coeffs, fe._fft_pr, fe._fft_pi,
            fe.fb_whi_f32, fe.fb_wlo_f32, fe.sm_u, fe.om_u,
            window_bits=WINDOW_BITS,
            window_size=t.window_size,
            window_step=t.window_step,
            smoothing_bits=t.smoothing_bits,
            msr=int(t.min_signal_remaining),
            enable_pcan=enable_pcan,
            snr_shift=int(t.snr_shift),
            wdf_rows=fe._wdf_rows_static,
            lut012=fe._lut012_static,
            enable_log=enable_log,
            correction_bits=int(t.correction_bits),
            scale_shift=int(t.scale_shift),
            log_pairs=fe._log_pairs_static,
        )

    for name, pcan, log in (
        ("C_full", True, True),
        ("D_no_pcan_no_log", False, False),
        ("E_no_log", True, False),
    ):

        @jax.jit
        def step_f(x, eps, pcan=pcan, log=log):
            d = x + eps.astype(jnp.int32)
            out = full(d, pcan, log)
            return (
                jnp.tanh(jnp.sum(out[::512, ::16, ::8].astype(jnp.float32)))
                * 1e-30
            )

        res[f"{name}_us_per_clip"] = chained_time(step_f, audio_i) / BATCH * 1e6
        print(name, res, flush=True)

    res = {k: round(v, 3) for k, v in res.items()}
    out = {
        "what": "fused frontend cost decomposition (us/clip, bs 2048, "
        "chained timing); D/E are diagnostics with stages disabled",
        "results": res,
    }
    (REPO / "benchmarks" / "fft_cost_decomposition.json").write_text(
        json.dumps(out, indent=1)
    )
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
