"""Pallas TPU kernels for the micro-frontend's sequential stage.

The noise-estimate recurrence est_t = (uint64(sig_t << 10)*sm +
uint64(est_{t-1})*om) >> 14 is the frontend's only sequential computation
(49 steps over a (B, C) carry). As a lax.scan it is pure loop-dispatch
latency on TPU (~37 ms at bs 256 for ~0.5 MFLOP of work); here the whole
loop runs inside ONE kernel over VMEM-resident data — the per-step cost is
just VPU ops.

Two variants:
- ``noise_estimate_scan_u32``: bit-exact uint32 recurrence (mode="exact"),
  body shared with the CPU lax.scan path via micro_int.nr_estimate_step —
  CPU tests of the scan path certify this kernel's math.
- ``noise_estimate_scan``: integer-valued float32 recurrence (mode="fast").

The grid tiles the batch; each instance keeps its (TILE_B, C) carry in
registers/VMEM across the frame loop.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .micro_int import nr_estimate_step


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


def _nr_kernel_u32(sm_ref, om_ref, x_ref, out_ref, *, num_frames: int,
                   smoothing_bits: int):
    sm = sm_ref[:]  # (1, C) uint32
    om = om_ref[:]

    def body(t, est):
        est = nr_estimate_step(est, x_ref[t, :, :], sm, om, smoothing_bits)
        out_ref[t, :, :] = est
        return est

    est0 = jnp.zeros(x_ref.shape[1:], jnp.uint32)
    jax.lax.fori_loop(0, num_frames, body, est0)


@functools.partial(jax.jit, static_argnames=("smoothing_bits", "interpret"))
def noise_estimate_scan_u32(
    x: jnp.ndarray,  # (F, B, C) uint32 sqrt-filterbank signal, frame-major
    sm: jnp.ndarray,  # (C,) uint32 smoothing (quantized, per-channel even/odd)
    om: jnp.ndarray,  # (C,) uint32 2^14 - smoothing
    smoothing_bits: int = 10,
    interpret: bool = False,  # pallas interpreter (CPU tests)
) -> jnp.ndarray:
    """Bit-exact uint32 noise-estimate sequence, shape (F, B, C) — the
    lax.scan equivalent of micro_jax.nr_pcan_log_int's sequential piece,
    as one Pallas kernel (body shared via micro_int.nr_estimate_step)."""
    f, b, c = x.shape
    tile_b = min(b, 128)
    pad_b = (-b) % tile_b
    if pad_b:
        x = jnp.pad(x, ((0, 0), (0, pad_b), (0, 0)))
    bp = b + pad_b

    out = pl.pallas_call(
        functools.partial(
            _nr_kernel_u32, num_frames=f, smoothing_bits=smoothing_bits
        ),
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
        out_shape=jax.ShapeDtypeStruct((f, bp, c), jnp.uint32),
        interpret=interpret,
    )(jnp.asarray(sm, jnp.uint32)[None, :], jnp.asarray(om, jnp.uint32)[None, :], x)
    return out[:, :b, :]
