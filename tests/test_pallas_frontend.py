"""Pallas NR-scan kernel: interpret-mode parity with the lax.scan path."""

import numpy as np

import jax
import jax.numpy as jnp

from multilingual_kws_tpu.ops.micro_exact import (
    NOISE_REDUCTION_BITS,
    FrontendConfig,
)
from multilingual_kws_tpu.ops.micro_jax import MicroFrontendJax
from multilingual_kws_tpu.ops.pallas_frontend import noise_estimate_scan


def test_kernel_matches_lax_scan_interpret():
    fe = MicroFrontendJax(FrontendConfig(), use_pallas=False)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(0, 1e6, (49, 6, 40)).astype(np.float32))
    sm = fe.smoothing
    nrb = float(1 << NOISE_REDUCTION_BITS)
    om = nrb - sm
    sb = float(1 << fe.config.smoothing_bits)

    got = np.asarray(noise_estimate_scan(x, sm, om, sb, nrb, interpret=True))

    def step(est, sig):
        est = jnp.floor((sig * sb * sm + est * om) / nrb)
        return est, est

    _, want = jax.lax.scan(step, jnp.zeros(x.shape[1:], x.dtype), x)
    np.testing.assert_array_equal(got, np.asarray(want))


def test_kernel_pads_odd_batches():
    fe = MicroFrontendJax(FrontendConfig(), use_pallas=False)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.uniform(0, 1e4, (10, 3, 40)).astype(np.float32))
    sm = fe.smoothing
    nrb = float(1 << NOISE_REDUCTION_BITS)
    got = noise_estimate_scan(
        x, sm, nrb - sm, float(1 << 10), nrb, interpret=True
    )
    assert got.shape == (10, 3, 40)
