"""Pallas TPU kernels for the micro-frontend's sequential stage.

The noise-estimate recurrence est_t = floor((sig_t*2^10*sm + est_{t-1}*om)
/ 2^14) is the frontend's only sequential computation (49 steps over a
(B, C) carry). As a lax.scan it is pure loop-dispatch latency on TPU
(~37 ms at bs 256 for ~0.5 MFLOP of work); here the whole loop runs inside
ONE kernel over VMEM-resident data — the per-step cost is just VPU ops.

The grid tiles the batch; each instance keeps its (TILE_B, C) carry in
registers/VMEM across the frame loop. Float semantics are identical to the
lax.scan path (same multiply/floor order), so CPU tests of the scan path
certify this kernel's math.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _nr_kernel(sm_ref, om_ref, x_ref, out_ref, *, num_frames: int,
               sb: float, nrb: float):
    sm = sm_ref[:]  # (1, C)
    om = om_ref[:]  # (1, C)

    def body(t, est):
        sig = x_ref[t, :, :]  # (TILE_B, C)
        est = jnp.floor((sig * sb * sm + est * om) / nrb)
        out_ref[t, :, :] = est
        return est

    est0 = jnp.zeros(x_ref.shape[1:], x_ref.dtype)
    jax.lax.fori_loop(0, num_frames, body, est0)


@functools.partial(jax.jit, static_argnames=("sb", "nrb", "interpret"))
def noise_estimate_scan(
    x: jnp.ndarray,  # (F, B, C) float32 sqrt-filterbank values, frame-major
    sm: jnp.ndarray,  # (C,) smoothing (quantized, per-channel even/odd)
    om: jnp.ndarray,  # (C,) 2^14 - smoothing
    sb: float,  # 2^smoothing_bits
    nrb: float,  # 2^noise_reduction_bits
    interpret: bool = False,  # pallas interpreter (CPU tests)
) -> jnp.ndarray:
    """est_t sequence, shape (F, B, C) — the lax.scan equivalent of
    micro_jax.nr_pcan_log's sequential piece, as one Pallas kernel."""
    f, b, c = x.shape
    tile_b = min(b, 128)
    pad_b = (-b) % tile_b
    if pad_b:
        x = jnp.pad(x, ((0, 0), (0, pad_b), (0, 0)))
    bp = b + pad_b

    sm2 = jnp.asarray(sm, jnp.float32)[None, :]
    om2 = jnp.asarray(om, jnp.float32)[None, :]

    out = pl.pallas_call(
        functools.partial(_nr_kernel, num_frames=f, sb=sb, nrb=nrb),
        grid=(bp // tile_b,),
        in_specs=[
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (f, tile_b, c), lambda i: (0, i, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (f, tile_b, c), lambda i: (0, i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((f, bp, c), x.dtype),
        interpret=interpret,
    )(sm2, om2, x)
    return out[:, :b, :]
