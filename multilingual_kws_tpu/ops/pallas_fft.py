"""Pallas TPU kernel for the fixed-point kiss FFT (512-point real).

The exact frontend's dominant cost is the int32 kiss FFT emulation: four
radix-4 stages plus the real postprocess, ~200 elementwise int ops per
(frame, 256) element. As XLA ops each stage round-trips the full
(num_frames, 256) x2 tensors through HBM (the concatenates break elementwise
fusion), which makes the FFT HBM-bound. This kernel runs ALL stages plus
the real-FFT postprocess and the energy computation on a VMEM-resident tile,
so the data crosses HBM exactly twice (frames in, energies out).

Bit-exactness: the math is the same fixed-point butterfly sequence as
micro_jax._KissFftrJax (sround order preserved); tests compare the two
paths element-for-element.

Input convention: the caller supplies the windowed+shifted frames already
split into the 256-point complex substate and base-4 digit-reversal
permuted (one XLA gather), i.e. xr = frames[..., 0::2][..., perm],
xi = frames[..., 1::2][..., perm]. Output: uint32 energies (..., 257)
with C wrap semantics, bin 256 handled via the tdc terms.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_STAGES = ((64, 1), (16, 4), (4, 16), (1, 64))


def _twiddles():
    n = 256
    idx = np.arange(n)
    phase = -2.0 * np.pi * idx / n
    tw_r = np.floor(0.5 + 32767 * np.cos(phase)).astype(np.int32)
    tw_i = np.floor(0.5 + 32767 * np.sin(phase)).astype(np.int32)
    k = np.arange(n // 2)
    sphase = -np.pi * ((k + 1.0) / n + 0.5)
    stw_r = np.floor(0.5 + 32767 * np.cos(sphase)).astype(np.int32)
    stw_i = np.floor(0.5 + 32767 * np.sin(sphase)).astype(np.int32)
    stage_tw = []
    for fstride, m in _STAGES:
        kk = np.arange(m)
        stage_tw.append(
            tuple(
                t
                for t in (
                    tw_r[kk * fstride], tw_i[kk * fstride],
                    tw_r[2 * kk * fstride], tw_i[2 * kk * fstride],
                    tw_r[3 * kk * fstride], tw_i[3 * kk * fstride],
                )
            )
        )
    return stage_tw, stw_r, stw_i


_STAGE_TW, _STW_R, _STW_I = _twiddles()


def _pack_twiddles() -> np.ndarray:
    """All twiddles as one (26, 256) int32 array (Pallas kernels cannot
    capture array constants). Stage s's six twiddle vectors (period m) are
    tiled across 256 lanes — any (G, m) reshape-view then reproduces the
    per-quarter pattern. Rows 24/25: the real-postprocess super-twiddles
    laid out at lanes 1..128."""
    rows = []
    for (fstride, m), tw in zip(_STAGES, _STAGE_TW):
        for t in tw:
            rows.append(np.tile(t, 256 // m))
    rows.append(np.concatenate([[0], _STW_R, np.zeros(127, np.int32)]))
    rows.append(np.concatenate([[0], _STW_I, np.zeros(127, np.int32)]))
    return np.stack(rows).astype(np.int32)


_TW_PACKED = _pack_twiddles()


def build_input_perm() -> np.ndarray:
    """Base-4 digit-reversal permutation of the 256 complex inputs."""
    perm = np.zeros(256, dtype=np.int32)
    for i in range(256):
        v, r = i, 0
        for _ in range(4):
            r = (r << 2) | (v & 3)
            v >>= 2
        perm[i] = r
    return perm


def _sround(x):
    return (x + (1 << 14)) >> 15


def _fft_energy_math(tw_ref, fr, fi):
    """Shared kernel math: four radix-4 stages + real postprocess + energy.

    fr/fi: (TILE, 256) int32 input-permuted complex substate.
    Returns (energy256 (TILE, 256) uint32, e256 (TILE, 1) uint32)."""
    tile = fr.shape[0]
    sr = _sround
    lane = jax.lax.broadcasted_iota(jnp.int32, (tile, 256), 1)

    # Mosaic cannot reshape lanes into sublanes, so the radix-4 stages stay
    # flat: per stage, the four quarter values of each butterfly group are
    # broadcast to every lane of the group via global lane-rolls + per-
    # quarter masks, the butterfly math runs full-width, and each lane
    # selects its own quarter's output.
    for s, (fstride, m) in enumerate(_STAGES):
        q = (lane % (4 * m)) // m  # quarter id of each lane

        def fixdiv4(x):
            return sr(x * 8191)

        fr_d = fixdiv4(fr)
        fi_d = fixdiv4(fi)

        def quarter_bcast(x):
            """Xc[lane (g,q,k)] = x[g, c, k] for c = 0..3; via rolls by
            (q-c)*m selected per lane-quarter."""
            rolls = {d: pltpu.roll(x, (d * m) % 256, 1) for d in range(-3, 4)}
            out = []
            for c in range(4):
                v = rolls[0 - c]
                for qq in range(1, 4):
                    v = jnp.where(q == qq, rolls[qq - c], v)
                out.append(v)
            return out

        x0r, x1r, x2r, x3r = quarter_bcast(fr_d)
        x0i, x1i, x2i, x3i = quarter_bcast(fi_d)

        def tw_row(j):
            return tw_ref[6 * s + j : 6 * s + j + 1, :]  # (1, 256), period m

        tw1r, tw1i, tw2r, tw2i, tw3r, tw3i = (tw_row(j) for j in range(6))

        s0r = sr(x1r * tw1r - x1i * tw1i)
        s0i = sr(x1r * tw1i + x1i * tw1r)
        s1r = sr(x2r * tw2r - x2i * tw2i)
        s1i = sr(x2r * tw2i + x2i * tw2r)
        s2r = sr(x3r * tw3r - x3i * tw3i)
        s2i = sr(x3r * tw3i + x3i * tw3r)

        s5r = x0r - s1r
        s5i = x0i - s1i
        y0r = x0r + s1r
        y0i = x0i + s1i
        s3r = s0r + s2r
        s3i = s0i + s2i
        s4r = s0r - s2r
        s4i = s0i - s2i

        o0r, o1r, o2r, o3r = y0r + s3r, s5r + s4i, y0r - s3r, s5r - s4i
        o0i, o1i, o2i, o3i = y0i + s3i, s5i - s4r, y0i - s3i, s5i + s4r
        fr = jnp.where(q == 0, o0r, jnp.where(q == 1, o1r,
                       jnp.where(q == 2, o2r, o3r)))
        fi = jnp.where(q == 0, o0i, jnp.where(q == 1, o1i,
                       jnp.where(q == 2, o2i, o3i)))

    # real-FFT postprocess on the full 256 lanes at once:
    # fpk[k] = fixdiv2(f[k]); fpnk[k] = fixdiv2(conj(f[256-k])), k = 1..128.
    # Mosaic has no lane-reversal primitive, so rev[j] = x[(256-j) mod 256]
    # runs as an exact one-hot permutation matmul on the MXU (|x| <= ~2^17,
    # well inside f32-exact range). NOTE the conjugation happens BEFORE
    # fixdiv2 (sround is not odd-symmetric): rev_i uses fixdiv2(-fi).
    def fixdiv2(x):
        return sr(x * 16383)

    row = jax.lax.broadcasted_iota(jnp.int32, (256, 256), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (256, 256), 1)
    perm_rev = ((256 - col) % 256 == row).astype(jnp.float32)

    def rev_lanes(x_i32):
        return jnp.dot(
            x_i32.astype(jnp.float32), perm_rev,
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        ).astype(jnp.int32)

    fr2 = fixdiv2(fr)
    fi2 = fixdiv2(fi)
    rev_r = rev_lanes(fr2)  # lane j -> fr2[(256-j) mod 256]
    rev_i = rev_lanes(fixdiv2(-fi))  # = fpnk_i at lane j

    f1k_r = fr2 + rev_r
    f1k_i = fi2 + rev_i
    f2k_r = fr2 - rev_r
    f2k_i = fi2 - rev_i
    # super-twiddles for k=1..128 live at lanes 1..128 (lane k uses stw[k-1]);
    # lanes 0 and 129..255 hold don't-care values (masked by energy select)
    stw_r = tw_ref[24:25, :]
    stw_i = tw_ref[25:26, :]
    tw_r = sr(f2k_r * stw_r - f2k_i * stw_i)
    tw_i = sr(f2k_r * stw_i + f2k_i * stw_r)

    lo_r = (f1k_r + tw_r) >> 1  # valid at lanes 1..128 = bins 1..128
    lo_i = (f1k_i + tw_i) >> 1
    hi_r = (f1k_r - tw_r) >> 1  # valid at lanes 1..128 = bins 256-k
    hi_i = (tw_i - f1k_i) >> 1

    # energies, uint32 with C wrap semantics
    def en(r, i):
        ru = r.astype(jnp.uint32)
        iu = i.astype(jnp.uint32)
        return ru * ru + iu * iu

    e_lo = en(lo_r, lo_i)  # lane k -> bin k (k = 1..128)
    # scatter bins 128..255: bin b = 256-k lives at lane 256-b — permute the
    # int32 components (f32-exact) BEFORE squaring, since uint32 energies
    # would not survive the f32 permutation matmul
    e_hi_rev = en(rev_lanes(hi_r), rev_lanes(hi_i))  # lane b -> bin b

    lane = jax.lax.broadcasted_iota(jnp.int32, (tile, 256), 1)
    # bin 128 is written twice by the reference loop (k and 256-k at k=128);
    # the 256-k ("hi") write lands last and wins, so lo covers lanes 1..127
    energy256 = jnp.where(lane <= 127, e_lo, e_hi_rev)

    # bins 0 and 256 from the tdc terms
    tdc_r = fixdiv2(fr[:, 0:1])
    tdc_i = fixdiv2(fi[:, 0:1])
    e0 = en(tdc_r + tdc_i, jnp.zeros_like(tdc_r))
    e256 = en(tdc_r - tdc_i, jnp.zeros_like(tdc_r))
    energy256 = jnp.where(lane == 0, e0, energy256)
    return energy256, e256


def _fft_energy_kernel(tw_ref, xr_ref, xi_ref, out_ref):
    energy256, e256 = _fft_energy_math(tw_ref, xr_ref[:], xi_ref[:])
    out_ref[:, :256] = energy256
    out_ref[:, 256:257] = e256


def _window_fft_energy_kernel(
    tw_ref, win_ref, pr_ref, pi_ref, frames_ref, out_ref, *, window_bits: int
):
    """Fully fused frontend prefix: quantized-Hann windowing, per-frame
    input_shift, even/odd + digit-reversal input permutation (as an exact
    f32 one-hot matmul on the MXU — scaled values are int16-range), then
    the FFT stages + energy."""
    frames = frames_ref[:]  # (TILE, 480) int32
    w = (frames * win_ref[:]) >> window_bits
    max_abs = jnp.max(jnp.abs(w), axis=-1, keepdims=True).astype(jnp.uint32)
    # msb32 binary search (micro_int.msb32 inlined: tiny (TILE, 1) values)
    bit = jnp.zeros_like(max_abs)
    val = max_abs
    for s in (16, 8, 4, 2, 1):
        m = val >= (jnp.uint32(1) << jnp.uint32(s))
        bit = jnp.where(m, bit + jnp.uint32(s), bit)
        val = jnp.where(m, val >> jnp.uint32(s), val)
    bit = bit + (val != 0).astype(jnp.uint32)
    shift = jnp.clip(15 - bit.astype(jnp.int32), 0, 15)
    scaled = (w << shift).astype(jnp.float32)

    def perm(p_ref):
        return jnp.dot(
            scaled, p_ref[:],
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        ).astype(jnp.int32)

    energy256, e256 = _fft_energy_math(tw_ref, perm(pr_ref), perm(pi_ref))
    out_ref[:, :256] = energy256
    out_ref[:, 256:257] = e256
    out_ref[:, 257:258] = shift.astype(jnp.uint32)


def build_perm_matrices(window_size: int):
    """(window, 256) f32 one-hot matrices selecting the even/odd samples in
    base-4 digit-reversal order: xr = scaled @ Pr, xi = scaled @ Pi."""
    perm = build_input_perm()
    pr = np.zeros((window_size, 256), np.float32)
    pi = np.zeros((window_size, 256), np.float32)
    for j, p in enumerate(perm):
        if 2 * p < window_size:
            pr[2 * p, j] = 1.0
        if 2 * p + 1 < window_size:
            pi[2 * p + 1, j] = 1.0
    return pr, pi


@functools.partial(
    jax.jit, static_argnames=("window_bits", "interpret")
)
def window_fft_energy(
    frames: jnp.ndarray,  # (N, window) int32 raw framed audio
    window_coeffs: jnp.ndarray,  # (window,) int32 quantized Hann
    pr: jnp.ndarray,  # (window, 256) f32 even-sample permutation
    pi: jnp.ndarray,  # (window, 256) f32 odd-sample permutation
    window_bits: int = 12,
    interpret: bool = False,
):
    """Fused window+shift+permute+FFT+energy: (N, window) int16-range frames
    -> ((N, 257) uint32 energies, (N,) uint32 per-frame input shift)."""
    n, win = frames.shape
    tile = min(n, 512)
    pad = (-n) % tile
    if pad:
        frames = jnp.pad(frames, ((0, pad), (0, 0)))
    np_ = n + pad

    out = pl.pallas_call(
        functools.partial(_window_fft_energy_kernel, window_bits=window_bits),
        grid=(np_ // tile,),
        in_specs=[
            pl.BlockSpec((26, 256), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, win), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((win, 256), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((win, 256), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, win), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (tile, 258), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((np_, 258), jnp.uint32),
        interpret=interpret,
    )(
        jnp.asarray(_TW_PACKED),
        jnp.asarray(window_coeffs, jnp.int32)[None, :],
        pr,
        pi,
        frames,
    )
    return out[:n, :257], out[:n, 257]


@functools.partial(jax.jit, static_argnames=("interpret",))
def kiss_fft_energy(
    xr: jnp.ndarray,  # (N, 256) int32, input-permuted real part
    xi: jnp.ndarray,  # (N, 256) int32, input-permuted imag part
    interpret: bool = False,
) -> jnp.ndarray:
    """(N, 256) x2 permuted complex substate -> (N, 257) uint32 energies."""
    n = xr.shape[0]
    tile = min(n, 512)
    pad = (-n) % tile
    if pad:
        xr = jnp.pad(xr, ((0, pad), (0, 0)))
        xi = jnp.pad(xi, ((0, pad), (0, 0)))
    np_ = n + pad

    out = pl.pallas_call(
        _fft_energy_kernel,
        grid=(np_ // tile,),
        in_specs=[
            pl.BlockSpec((26, 256), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, 256), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, 256), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (tile, 257), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((np_, 257), jnp.uint32),
        interpret=interpret,
    )(jnp.asarray(_TW_PACKED), xr, xi)
    return out[:n]
