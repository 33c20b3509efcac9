"""Bit-exact integer (uint32) device stages of the micro audio frontend.

The C microfrontend (reference: multilingual_kws/embedding/input_data.py:25-33
calls the TFLite ``audio_microfrontend`` op) computes its filterbank /
noise-reduction / PCAN / log stages in uint32 arithmetic with uint64
intermediates.  The previous device path (ops/micro_jax.py round 1) emulated
those stages on *integer-valued float32*, which is exact only below 2^24 —
filterbank accumulators reach ~2^48 and the noise-estimate recurrence carries
genuine uint32 state, so ~0.1% of bins could land off the reference grid.

This module re-expresses every stage in true uint32 JAX ops, emulating each
64-bit intermediate with 16-bit limb splits chosen so no partial product or
partial sum can overflow 32 bits (bounds documented inline).  The functions
are pure jnp and run identically under jit on CPU/TPU and inside Pallas
kernels, so the CPU tests certify the TPU kernel's math.

Ground truth is ops/micro_exact.py (host numpy int64, itself golden-pinned to
the real TFLite op in tests/golden/).  tests/test_frontend_jax.py asserts the
device exact path is 100% on-grid against it.

Value-range notes (why 32 bits + limbs suffice):
- FFT energies: |kiss out| <= 32767 by fixed-point design, so
  energy = re^2 + im^2 <= 2*32767^2 < 2^31.
- filterbank accumulators ("work"): <= sum of 2^31 * 2^12 over <=128 bins
  ~ 2^50 -> held as a (hi, lo) uint32 pair.
- Sqrt64 result <= 2^25 for any physical work value; noise-reduction then
  keeps everything <= 2^28 (floor term) with 64-bit products emulated.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from .micro_exact import (
    LOG_COEFF,
    LOG_SCALE_LOG2,
    LOG_SEGMENTS_LOG2,
    NOISE_REDUCTION_BITS,
    PCAN_OUTPUT_BITS,
    PCAN_SNR_BITS,
    _LOG_LUT,
)

U32 = jnp.uint32
I32 = jnp.int32


def _u(x):
    return jnp.asarray(x, U32)


def u32_to_f32(x_u32):
    """uint32 -> float32 via 16-bit limbs. Mosaic (Pallas TPU) has no
    direct u32->f32 convert; hi*2^16 is exact (hi < 2^16), so the single
    rounding of the sum makes this bit-identical to a direct cast."""
    hi = (x_u32 >> U32(16)).astype(I32).astype(jnp.float32)
    lo = (x_u32 & U32(0xFFFF)).astype(I32).astype(jnp.float32)
    return hi * np.float32(65536.0) + lo


def f32_to_u32(x_f32):
    """float32 -> uint32 for values in [0, 2^31): route through int32
    (Mosaic has no direct f32->u32 convert)."""
    return x_f32.astype(I32).astype(U32)


def umin(a, b):
    """Unsigned min via compare+select — Mosaic cannot legalize vector
    arith.minui, and jnp.minimum on uint32 lowers to it."""
    return jnp.where(a < b, a, b)


def umax(a, b):
    return jnp.where(a > b, a, b)


# ---------------------------------------------------------------------------
# uint64 emulation on (hi, lo) uint32 pairs
# ---------------------------------------------------------------------------


def u64_add(ah, al, bh, bl):
    lo = al + bl
    carry = (lo < al).astype(U32)
    return ah + bh + carry, lo


def u64_sub(ah, al, bh, bl):
    lo = al - bl
    borrow = (al < bl).astype(U32)
    return ah - bh - borrow, lo


def u64_le(ah, al, bh, bl):
    return (ah < bh) | ((ah == bh) & (al <= bl))


def u64_from_shifted(x_u32, shift: int):
    """(x << shift) as a (hi, lo) pair; x < 2^32, 0 <= shift < 32 static."""
    if shift == 0:
        return jnp.zeros_like(x_u32), x_u32
    return x_u32 >> U32(32 - shift), x_u32 << U32(shift)


# ---------------------------------------------------------------------------
# bit length (MostSignificantBit32) — binary search, no float round-off
# ---------------------------------------------------------------------------


def msb32(x_u32):
    """Bit length of each uint32 value (0 for 0), as uint32."""
    out = jnp.zeros_like(x_u32)
    val = x_u32
    for s in (16, 8, 4, 2, 1):
        m = val >= (U32(1) << U32(s))
        out = jnp.where(m, out + U32(s), out)
        val = jnp.where(m, val >> U32(s), val)
    return out + (val != 0).astype(U32)


# ---------------------------------------------------------------------------
# filterbank: exact 64-bit accumulate via 16/6-bit limb split + Sqrt64
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class FilterbankInt:
    """Padded per-channel gather tables for the exact integer filterbank.

    Channel c accumulates unweights over band c's bins plus weights over
    band c+1's bins (micro_exact.MicroFrontend.filterbank: work =
    uacc[:, :-1] + wacc[:, 1:]).  Here both contributions are concatenated
    into one (num_channels, W) index/weight table, zero-padded (weight 0,
    index 0) to the max combined width W.
    """

    idx: np.ndarray  # (C, W) int32 fft-bin indices
    wgt: np.ndarray  # (C, W) int32 12-bit weights (<= 4096)


def build_filterbank_int(fb, num_channels: int) -> FilterbankInt:
    """fb: micro_exact._FilterbankTables."""
    rows_idx, rows_w = [], []
    for c in range(num_channels):
        s0, w0 = int(fb.band_starts[c]), int(fb.band_widths[c])
        s1, w1 = int(fb.band_starts[c + 1]), int(fb.band_widths[c + 1])
        idx = np.concatenate([np.arange(s0, s0 + w0), np.arange(s1, s1 + w1)])
        wgt = np.concatenate([fb.unweights[c], fb.weights[c + 1]])
        rows_idx.append(idx)
        rows_w.append(wgt)
    wmax = max(len(r) for r in rows_idx)
    idx = np.zeros((num_channels, wmax), np.int32)
    wgt = np.zeros((num_channels, wmax), np.int32)
    for c, (ri, rw) in enumerate(zip(rows_idx, rows_w)):
        idx[c, : len(ri)] = ri
        wgt[c, : len(rw)] = rw
    assert wgt.max() <= 4096 and wmax <= 128, (wgt.max(), wmax)
    return FilterbankInt(idx=idx, wgt=wgt)


def build_filterbank_limb_matrices(fbi: FilterbankInt, num_bins: int):
    """Dense (bins, C) weight matrices for the MXU limb-matmul filterbank:
    returns (w_hi, w_lo) float32 with w = w_hi*2^6 + w_lo per channel."""
    dense = np.zeros((num_bins, fbi.idx.shape[0]), np.int64)
    for c in range(fbi.idx.shape[0]):
        for i, w in zip(fbi.idx[c], fbi.wgt[c]):
            if w:
                dense[i, c] += w
    assert dense.max() <= 4096
    return (
        (dense >> 6).astype(np.float32),
        (dense & 0x3F).astype(np.float32),
    )


def filterbank_accumulate_mxu(energy_u32, w_hi_f32, w_lo_f32):
    """Exact 64-bit filterbank accumulate as SIX f32 matmuls on the MXU.

    energy (< 2^31) splits into three 11-bit limbs, weights (<= 2^12) into
    6-bit limbs; every product <= 2^17 and every channel's true sum
    <= 28 terms * 2^17 < 2^23, so float32 accumulation is exact end to end
    (HIGHEST precision — the default path's bf16 passes are not exact).
    Returns (hi, lo) uint32 pairs like filterbank_accumulate."""
    hp = jax.lax.Precision.HIGHEST
    limbs = [
        (energy_u32 >> U32(22)).astype(jnp.float32),
        ((energy_u32 >> U32(11)) & U32(0x7FF)).astype(jnp.float32),
        (energy_u32 & U32(0x7FF)).astype(jnp.float32),
    ]
    shifts = [22, 11, 0]
    h = l = None
    for e_f, s in zip(limbs, shifts):
        for w_f, ws in ((w_hi_f32, 6), (w_lo_f32, 0)):
            part = jnp.matmul(
                e_f, w_f, preferred_element_type=jnp.float32, precision=hp
            ).astype(U32)
            ph, pl = u64_from_shifted(part, s + ws)
            if h is None:
                h, l = ph, pl
            else:
                h, l = u64_add(h, l, ph, pl)
    return h, l


def filterbank_accumulate(energy_u32, idx, wgt_u32):
    """(..., bins) uint32 energies -> (hi, lo) uint32 pairs (..., C).

    energy < 2^31, weight <= 2^12, <=128 terms.  Limb split keeps every
    partial sum under 2^32: e_hi<=2^15, e_lo<2^16, w_hi<=2^6, w_lo<2^6 =>
    worst partial sum 2^16*2^6*2^7 = 2^29.
    """
    e = jnp.take(energy_u32, idx, axis=-1)  # (..., C, W)
    e_hi = e >> U32(16)
    e_lo = e & U32(0xFFFF)
    w_hi = wgt_u32 >> U32(6)
    w_lo = wgt_u32 & U32(0x3F)
    s_hh = jnp.sum(e_hi * w_hi, axis=-1)
    s_hl = jnp.sum(e_hi * w_lo, axis=-1)
    s_lh = jnp.sum(e_lo * w_hi, axis=-1)
    s_ll = jnp.sum(e_lo * w_lo, axis=-1)
    # acc64 = s_hh<<22 + s_hl<<16 + s_lh<<6 + s_ll
    h, l = u64_from_shifted(s_hh, 22)
    h2, l2 = u64_from_shifted(s_hl, 16)
    h, l = u64_add(h, l, h2, l2)
    h2, l2 = u64_from_shifted(s_lh, 6)
    h, l = u64_add(h, l, h2, l2)
    return u64_add(h, l, jnp.zeros_like(s_ll), s_ll)


def sqrt64_exact(hi, lo):
    """Sqrt64 semantics (micro_exact._isqrt_rounded): floor sqrt of the
    64-bit value with +1 round-up when remainder > result, capped at
    0xFFFF (32-bit inputs) / 0xFFFFFFFF.  Float32 gives a +-2 candidate
    window; exact uint32 comparisons select the true floor sqrt."""
    v = u32_to_f32(hi) * np.float32(2.0**32) + u32_to_f32(lo)
    # Error budget at the 2^50 extreme: v carries 1 ulp = 2^27 absolute
    # (+-2 on the root), float32 sqrt rounding adds ulp(2^25) = 2, floor 1
    # => the float guess is within +-6 of the true floor sqrt. Scan a +-8
    # window and pick the true floor via exact u64 comparisons.
    r0 = f32_to_u32(jnp.clip(jnp.floor(jnp.sqrt(v)) - 8.0, 0.0, None))

    def square64(r):
        a = r >> U32(12)
        b = r & U32(0xFFF)
        h, l = u64_from_shifted(a * a, 24)
        h2, l2 = u64_from_shifted(U32(2) * a * b, 12)
        h, l = u64_add(h, l, h2, l2)
        return u64_add(h, l, jnp.zeros_like(r), b * b)

    # Largest r in [r0, r0+16] with r^2 <= x, by bisection. The window
    # guarantee (true floor sqrt t >= r0) gives the invariant
    # square64(lo_b) <= x; five halvings of the 17-candidate window pin t
    # exactly — 5 square64+compare rounds instead of the previous 17-step
    # linear scan (this function dominates the fused frontend kernel's
    # post-FFT cost, benchmarks/fft_cost_decomposition.json).
    lo_b = r0
    hi_b = r0 + U32(16)
    for _ in range(5):
        mid = (lo_b + hi_b + U32(1)) >> U32(1)
        sh, sl = square64(mid)
        le = u64_le(sh, sl, hi, lo)
        lo_b = jnp.where(le, mid, lo_b)
        hi_b = jnp.where(le, hi_b, mid - U32(1))
    best = lo_b
    bh, bl = square64(best)
    _, rem = u64_sub(hi, lo, bh, bl)  # remainder <= 2r+1 fits the low word
    cap = jnp.where(hi == 0, U32(0xFFFF), U32(0xFFFFFFFF))
    bump = (rem > best) & (best != cap)
    return best + bump.astype(U32)


def filterbank_sqrt(energy_u32, idx, wgt_u32, shift_u32):
    """Energies + per-frame input shift -> uint32 sqrt-filterbank signal."""
    h, l = filterbank_accumulate(energy_u32, idx, wgt_u32)
    res = sqrt64_exact(h, l)
    return res >> shift_u32[..., None]


# ---------------------------------------------------------------------------
# noise reduction (the only sequential recurrence)
# ---------------------------------------------------------------------------


def nr_estimate_step(est_u32, sig_u32, sm_u32, om_u32, smoothing_bits: int = 10):
    """One frame of the noise-estimate recurrence (noise_reduction.c):

        est' = (uint64(sig << sb) * sm + uint64(est) * om) >> 14   (mod 2^32)

    sm + om = 2^14, both <= 2^14; 16-bit limbs keep partials < 2^31."""
    su = sig_u32 << U32(smoothing_bits)  # wraps mod 2^32 like the C cast
    hi_part = (su >> U32(16)) * sm_u32 + (est_u32 >> U32(16)) * om_u32
    lo_part = (su & U32(0xFFFF)) * sm_u32 + (est_u32 & U32(0xFFFF)) * om_u32
    # (hi_part<<16 + lo_part) >> 14 mod 2^32; hi_part<<2 wraps correctly
    return (hi_part << U32(16 - NOISE_REDUCTION_BITS)) + (
        lo_part >> U32(NOISE_REDUCTION_BITS)
    )


def nr_subtract(sig_u32, est_u32, msr_u32, smoothing_bits: int = 10):
    """Vectorized suffix of NoiseReductionApply given the estimate sequence:
    scaled-domain subtraction with clamp, plus the min-signal floor."""
    su = sig_u32 << U32(smoothing_bits)
    est_c = umin(est_u32, su)
    subtracted = (su - est_c) >> U32(smoothing_bits)
    # floor = (uint64(sig) * msr) >> 14 ; sig <= 2^26 physically, msr < 2^14
    a = (sig_u32 >> U32(16)) * msr_u32
    b = (sig_u32 & U32(0xFFFF)) * msr_u32
    floor_ = (a << U32(16 - NOISE_REDUCTION_BITS)) + (b >> U32(NOISE_REDUCTION_BITS))
    return umax(subtracted, floor_)


# ---------------------------------------------------------------------------
# PCAN gain (WideDynamicFunction + shrink)
# ---------------------------------------------------------------------------


def build_wdf_tables(pcan_lut: np.ndarray):
    """(32, 3) int32 per-interval LUT rows + first-3 direct entries."""
    lut = np.asarray(pcan_lut, np.int64)
    rows = []
    for interval in range(1, 33):
        base = min(max(4 * interval - 6, 0), len(lut) - 3)
        rows.append([lut[base], lut[base + 1], lut[base + 2]])
    return (
        np.asarray(rows, np.int32),  # (32, 3)
        np.asarray(lut[:3], np.int32),  # x <= 2 direct entries
    )


def wide_dynamic_function(x_u32, wdf_rows_f32, lut012_i32):
    """Exact WideDynamicFunction (pcan_gain_control.c) on uint32 inputs.

    wdf_rows_f32: (32, 3) float32 copy of the int rows (one-hot matmul is an
    exact select for |values| <= 2^24, and keeps the lookup on the MXU;
    HIGHEST precision is required — the default matmul path runs bf16
    passes that corrupt the selected integers).
    """
    interval = msb32(x_u32)  # 1..32 for x >= 1
    onehot = jax.nn.one_hot(
        jnp.clip(interval.astype(I32) - 1, 0, 31), 32, dtype=jnp.float32
    )
    sel = jnp.matmul(
        onehot, wdf_rows_f32,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    l0 = sel[..., 0].astype(I32)
    l1 = sel[..., 1].astype(I32)
    l2 = sel[..., 2].astype(I32)

    shl = umin(umax(U32(11) - umin(interval, U32(11)), U32(0)), U32(31))
    shr = umin(umax(interval, U32(11)) - U32(11), U32(31))
    frac = (
        jnp.where(interval < U32(11), x_u32 << shl, x_u32 >> shr) & U32(0x3FF)
    ).astype(I32)

    r = (l2 * frac) >> 5  # |l2|<=2^15, frac<=1023 -> |prod|<=2^25
    r = r + (l1 << 5)
    # r *= frac with a signed 16-bit limb split (|r| <= ~3*2^20):
    r_hi = r >> 16  # arithmetic
    r_lo = r & 0xFFFF  # non-negative
    r = r_hi * frac * 2 + ((r_lo * frac + (1 << 14)) >> 15)
    r = r + l0
    small = x_u32 <= U32(2)
    direct = jnp.where(
        x_u32 < U32(1),
        lut012_i32[0],
        jnp.where(x_u32 < U32(2), lut012_i32[1], lut012_i32[2]),
    )
    return jnp.where(small, direct, r)


def pcan_gain(nr_u32, gain_i32, snr_shift: int):
    """snr = (uint64(nr) * gain) >> snr_shift, then PcanShrink.

    nr <= 2^22 physically, gain <= 2^15, snr_shift <= 16."""
    g = gain_i32.astype(U32)
    a = (nr_u32 >> U32(16)) * g  # <= 2^6 * 2^15 = 2^21
    b = (nr_u32 & U32(0xFFFF)) * g  # <= 2^31
    snr = (a << U32(16 - snr_shift)) + (b >> U32(snr_shift))
    big = snr >= U32(2 << PCAN_SNR_BITS)
    # clamp before squaring so the (unselected) small branch cannot overflow
    s = umin(snr, U32(2 << PCAN_SNR_BITS))
    small_val = (s * s) >> U32(2 + 2 * PCAN_SNR_BITS - PCAN_OUTPUT_BITS)
    big_val = (snr >> U32(PCAN_SNR_BITS - PCAN_OUTPUT_BITS)) - U32(
        1 << PCAN_OUTPUT_BITS
    )
    return jnp.where(big, big_val, small_val)


# ---------------------------------------------------------------------------
# integer log scaling (log_scale.c / log_lut.c)
# ---------------------------------------------------------------------------

_LOG_PAIRS_F32 = np.stack(
    [
        _LOG_LUT[: (1 << LOG_SEGMENTS_LOG2) + 1],
        _LOG_LUT[1 : (1 << LOG_SEGMENTS_LOG2) + 2],
    ],
    axis=1,
).astype(np.float32)  # (129, 2), values <= ~5630 — exact in f32


def log_scale_int(x_u32, correction_bits: int, scale_shift: int, log_pairs_f32):
    """Exact integer log: value = x << correction_bits; Log() per log_scale.c.

    x <= ~2^25 physically so value <= 2^28; every product is limb-split to
    stay under 2^32."""
    value = x_u32 << U32(correction_bits)
    nonzero = value > U32(0)
    v = umax(value, U32(1))
    integer = msb32(v) - U32(1)  # 0..31
    frac = v - (U32(1) << integer)
    shl = umin(
        umax(U32(LOG_SCALE_LOG2) - umin(integer, U32(LOG_SCALE_LOG2)), U32(0)),
        U32(31),
    )
    shr = umin(
        umax(integer, U32(LOG_SCALE_LOG2)) - U32(LOG_SCALE_LOG2), U32(31)
    )
    frac = jnp.where(integer < U32(LOG_SCALE_LOG2), frac << shl, frac >> shr)
    seg_shift = LOG_SCALE_LOG2 - LOG_SEGMENTS_LOG2  # 9
    base_seg = frac >> U32(seg_shift)  # 0..128
    onehot = jax.nn.one_hot(base_seg.astype(I32), 129, dtype=jnp.float32)
    sel = jnp.matmul(
        onehot, log_pairs_f32,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    c0 = sel[..., 0].astype(I32)
    c1 = sel[..., 1].astype(I32)
    delta = frac.astype(I32) - (base_seg << U32(seg_shift)).astype(I32)  # < 512
    rel = ((c1 - c0) * delta) >> LOG_SCALE_LOG2  # |.| <= 2^13*2^9 = 2^22
    fraction = frac.astype(I32) + c0 + rel
    log2v = ((integer.astype(I32)) << LOG_SCALE_LOG2) + fraction  # <= ~2^21
    lv = log2v.astype(U32)
    h = lv >> U32(16)
    l = lv & U32(0xFFFF)
    rnd = U32(1 << (LOG_SCALE_LOG2 - 1))
    # LOG_COEFF * l <= 45426 * 65535 < 2^32 — uint32 holds it
    loge = U32(LOG_COEFF) * h + ((U32(LOG_COEFF) * l + rnd) >> U32(LOG_SCALE_LOG2))
    logged = ((loge << U32(scale_shift)) + rnd) >> U32(LOG_SCALE_LOG2)
    out = jnp.where(nonzero, logged, U32(0))
    return umin(out, U32(0xFFFF))
