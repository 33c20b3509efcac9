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


def _base_twiddle_table():
    """The 256-entry Q15 twiddle table (kiss convention, round-half-up)."""
    n = 256
    idx = np.arange(n)
    phase = -2.0 * np.pi * idx / n
    tw_r = np.floor(0.5 + 32767 * np.cos(phase)).astype(np.int32)
    tw_i = np.floor(0.5 + 32767 * np.sin(phase)).astype(np.int32)
    return tw_r, tw_i


def _twiddles():
    n = 256
    tw_r, tw_i = _base_twiddle_table()
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
    """All twiddles as one (34, 256) int32 array (Pallas kernels cannot
    capture array constants). Stage s's six twiddle vectors (period m) are
    tiled across 256 lanes — any (G, m) reshape-view then reproduces the
    per-quarter pattern. Rows 24/25: the real-postprocess super-twiddles
    laid out at lanes 1..128. Rows 26+2s/27+2s: stage s's SOURCE-LANE
    twiddle tables — lane (g, c, k) holds tw[c*k*fstride] so the twiddle
    product T_c can be computed at each value's own lane with ONE
    full-width complex multiply (quarter-0 lanes are don't-care: the kiss
    c=0 term has no twiddle/sround and is selected through directly)."""
    rows = []
    for (fstride, m), tw in zip(_STAGES, _STAGE_TW):
        for t in tw:
            rows.append(np.tile(t, 256 // m))
    rows.append(np.concatenate([[0], _STW_R, np.zeros(127, np.int32)]))
    rows.append(np.concatenate([[0], _STW_I, np.zeros(127, np.int32)]))
    tw_r, tw_i = _base_twiddle_table()
    for fstride, m in _STAGES:
        lane = np.arange(256)
        c = (lane % (4 * m)) // m
        k = lane % m
        rows.append(np.where(c == 0, 32767, tw_r[c * k * fstride]))
        rows.append(np.where(c == 0, 0, tw_i[c * k * fstride]))
    return np.stack(rows).astype(np.int32)


_TW_PACKED = _pack_twiddles()


def _butterfly_matrices() -> np.ndarray:
    """Radix-4 butterfly combinations as exact one-hot-signed matrices for
    the "mxu" FFT variant, packed (256, 8*256) f32. For stage s, columns
    [2s*256, (2s+1)*256) hold M_rr and [(2s+1)*256, (2s+2)*256) hold M_ir:

        O_r = T_r @ M_rr + T_i @ M_ir
        O_i = T_i @ M_rr - T_r @ M_ir

    where T are the sround'd twiddle products at source lanes and
    M_rr[src, dst] = ±1 selects Re(i^{-q·c} T_c) terms (e = q·c mod 4:
    +1 at e=0, -1 at e=2), M_ir the Im-sourced terms (+1 at e=1, -1 at
    e=3). Entries are ±1 with 4 nonzeros per column; |T| < 2^17 so every
    4-term dot is < 2^19 — exact in f32 (HIGHEST precision)."""
    blocks = []
    for fstride, m in _STAGES:
        m_rr = np.zeros((256, 256), np.float32)
        m_ir = np.zeros((256, 256), np.float32)
        for src in range(256):
            g, rem = divmod(src, 4 * m)
            c, k = divmod(rem, m)
            for q in range(4):
                dst = g * 4 * m + q * m + k
                e = (q * c) % 4
                if e == 0:
                    m_rr[src, dst] = 1.0
                elif e == 2:
                    m_rr[src, dst] = -1.0
                elif e == 1:
                    m_ir[src, dst] = 1.0
                else:
                    m_ir[src, dst] = -1.0
        blocks += [m_rr, m_ir]
    return np.concatenate(blocks, axis=1)


_BF_PACKED = _butterfly_matrices()

# Which radix-4 stage formulation the public entry points use by default.
# All three are bit-identical (tests cross-check); the default is the one
# that measured fastest on the v5e rig (tools_dev/probe_fft_variants.py ->
# benchmarks/fft_variants.json: rot 242k / ref 224k / mxu 157k clips/s).
DEFAULT_FFT_VARIANT = "rot"


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


def _fixdiv4(x):
    return _sround(x * 8191)


def _stage_twiddle_at_source(tw_ref, s, q, fr_d, fi_d):
    """The kiss twiddle products computed at each value's OWN lane via the
    source-lane tables (_pack_twiddles rows 26+2s/27+2s): lane (g, c, k)
    yields T_c[k] = sround(x ⊛ tw[c·k·fstride]) for c >= 1, and passes
    x through untouched on quarter-0 lanes (kiss applies no twiddle/sround
    to the c=0 term). One full-width complex multiply replaces the three
    per-quarter ones. Bit-exact: same products, same sround."""
    sr = _sround
    twr = tw_ref[26 + 2 * s : 27 + 2 * s, :]
    twi = tw_ref[27 + 2 * s : 28 + 2 * s, :]
    p_r = sr(fr_d * twr - fi_d * twi)
    p_i = sr(fr_d * twi + fi_d * twr)
    q0 = q == 0
    return jnp.where(q0, fr_d, p_r), jnp.where(q0, fi_d, p_i)


def _stage_ref(tw_ref, s, fstride, m, q, fr, fi):
    """Original formulation: broadcast all four quarter values to every
    lane of the group via global lane-rolls + per-quarter masks, run the
    butterfly full-width, select each lane's own quarter output."""
    sr = _sround
    fr_d = _fixdiv4(fr)
    fi_d = _fixdiv4(fi)

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
    return fr, fi


def _stage_rot(tw_ref, s, fstride, m, q, fr, fi):
    """Rotate-and-combine formulation: twiddle products at source lanes
    (one cmul), then three GROUPED rotates bring T_{(q-j) mod 4} to each
    lane and the radix-4 output is a per-lane two-case select per term —
    O_q = Σ_j i^{-q·((q-j) mod 4)} R_j, where the exponent
    e(q, j) = q·(q-j) mod 4 takes only two values across q for each j.
    Same sround'd products and integer adds as _stage_ref (bit-exact),
    ~40% fewer VPU ops."""
    fr_d = _fixdiv4(fr)
    fi_d = _fixdiv4(fi)
    tr, ti = _stage_twiddle_at_source(tw_ref, s, q, fr_d, fi_d)

    def grot(x, j):
        """x[(g, (q-j) mod 4, k)] at lane (g, q, k): a global roll by j*m
        except the top j quarters of each group, which wrap within the
        group (roll by (j-4)*m)."""
        a = pltpu.roll(x, (j * m) % 256, 1)
        b = pltpu.roll(x, (j * m - 4 * m) % 256, 1)
        return jnp.where(q >= j, a, b) if (j * m) % 256 != (j * m - 4 * m) % 256 else a

    r1r, r1i = grot(tr, 1), grot(ti, 1)
    r2r, r2i = grot(tr, 2), grot(ti, 2)
    r3r, r3i = grot(tr, 3), grot(ti, 3)

    qodd = (q & 1) == 1  # e(q,0) = (0,1,0,1); e(q,2) = (0,3,0,3)
    q23 = q >= 2  # e(q,1) = (0,0,2,2)
    q12 = (q == 1) | (q == 2)  # e(q,3) = (0,2,2,0)
    fr = (
        jnp.where(qodd, ti, tr)
        + jnp.where(q23, -r1r, r1r)
        + jnp.where(qodd, -r2i, r2r)
        + jnp.where(q12, -r3r, r3r)
    )
    fi = (
        jnp.where(qodd, -tr, ti)
        + jnp.where(q23, -r1i, r1i)
        + jnp.where(qodd, r2r, r2i)
        + jnp.where(q12, -r3i, r3i)
    )
    return fr, fi


def _stage_mxu(tw_ref, bf_ref, s, fstride, m, q, fr, fi):
    """MXU formulation: twiddle products at source lanes (one cmul), then
    the entire butterfly data movement + ±1/±i combination as two exact
    f32 matmuls against the precomputed ±1 matrices (_butterfly_matrices).
    Zero lane-rolls; the sround'd products are identical and the matmul
    sums 4 terms < 2^19 — exact in f32 HIGHEST (bit-exact)."""
    fr_d = _fixdiv4(fr)
    fi_d = _fixdiv4(fi)
    tr, ti = _stage_twiddle_at_source(tw_ref, s, q, fr_d, fi_d)
    m_rr = bf_ref[:, 2 * s * 256 : (2 * s + 1) * 256]
    m_ir = bf_ref[:, (2 * s + 1) * 256 : (2 * s + 2) * 256]
    hp = jax.lax.Precision.HIGHEST
    tr_f = tr.astype(jnp.float32)
    ti_f = ti.astype(jnp.float32)

    def dot(a, b):
        return jnp.dot(a, b, preferred_element_type=jnp.float32, precision=hp)

    fr = (dot(tr_f, m_rr) + dot(ti_f, m_ir)).astype(jnp.int32)
    fi = (dot(ti_f, m_rr) - dot(tr_f, m_ir)).astype(jnp.int32)
    return fr, fi


def _fft_energy_math(tw_ref, fr, fi, variant="ref", bf_ref=None):
    """Shared kernel math: four radix-4 stages + real postprocess + energy.

    fr/fi: (TILE, 256) int32 input-permuted complex substate.
    variant: "ref" | "rot" | "mxu" — three bit-identical stage
    formulations (see _stage_*; tests cross-check element-for-element).
    Returns (energy256 (TILE, 256) uint32, e256 (TILE, 1) uint32)."""
    tile = fr.shape[0]
    sr = _sround
    lane = jax.lax.broadcasted_iota(jnp.int32, (tile, 256), 1)

    # Mosaic cannot reshape lanes into sublanes, so the radix-4 stages stay
    # flat over the 256 lanes; the three formulations differ only in how
    # each lane obtains its group's four quarter values.
    for s, (fstride, m) in enumerate(_STAGES):
        # quarter id of each lane: m is always a power of 4, so
        # (lane % (4m)) // m strength-reduces to shift+mask (the %,//
        # pair emitted real div/rem vector ops in the Mosaic lowering —
        # tools_dev/vpu_roofline.py census)
        q = (lane >> int(m).bit_length() - 1) & 3
        if variant == "rot":
            fr, fi = _stage_rot(tw_ref, s, fstride, m, q, fr, fi)
        elif variant == "mxu":
            fr, fi = _stage_mxu(tw_ref, bf_ref, s, fstride, m, q, fr, fi)
        else:
            fr, fi = _stage_ref(tw_ref, s, fstride, m, q, fr, fi)

    # real-FFT postprocess on the full 256 lanes at once:
    # fpk[k] = fixdiv2(f[k]); fpnk[k] = fixdiv2(conj(f[256-k])), k = 1..128.
    # Mosaic has no lane-reversal primitive, so rev[j] = x[(256-j) mod 256]
    # runs as an exact bf16-limb permutation matmul on the MXU — see
    # rev_lanes' docstring for the |x| <= ~2^15 bound its exactness needs.
    # NOTE the conjugation happens BEFORE fixdiv2 (sround is not
    # odd-symmetric): rev_i uses fixdiv2(-fi).
    def fixdiv2(x):
        return sr(x * 16383)

    row = jax.lax.broadcasted_iota(jnp.int32, (256, 256), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (256, 256), 1)
    perm_rev = ((256 - col) % 256 == row).astype(jnp.bfloat16)

    def rev_lanes(x_i32):
        """Exact permutation matmul in native bf16: |x| <= 2^15+16 here
        (kiss keeps stage outputs within ~1 of the input magnitude; inputs
        are < 2^15 windowed samples), so the two 8-bit limbs lo in [0,255]
        and hi in [-129, 129) are bf16-exact integers, each output sums
        exactly one term, and two single-pass bf16 matmuls replace the
        ~6-pass f32-HIGHEST one (34% of the kernel was HIGHEST matmuls,
        benchmarks/fft_cost_decomposition.json)."""
        lo = (x_i32 & 255).astype(jnp.float32).astype(jnp.bfloat16)
        hi = (x_i32 >> 8).astype(jnp.float32).astype(jnp.bfloat16)
        lo_p = jnp.dot(lo, perm_rev, preferred_element_type=jnp.float32)
        hi_p = jnp.dot(hi, perm_rev, preferred_element_type=jnp.float32)
        return (hi_p.astype(jnp.int32) << 8) + lo_p.astype(jnp.int32)

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


def _fft_energy_kernel(tw_ref, bf_ref, xr_ref, xi_ref, out_ref, *, variant):
    energy256, e256 = _fft_energy_math(
        tw_ref, xr_ref[:], xi_ref[:], variant=variant, bf_ref=bf_ref
    )
    out_ref[:, :256] = energy256
    out_ref[:, 256:257] = e256


def _window_shift_perm(win_ref, pr_ref, pi_ref, frames, window_bits: int):
    """Quantized-Hann windowing, per-frame input_shift, and the even/odd +
    digit-reversal input permutation as exact bf16 one-hot matmuls on the
    MXU: |scaled| < 2^15, so the 8-bit limbs lo in [0,255] / hi in
    [-128,128) are bf16-exact and each output sums exactly one term — four
    single-pass bf16 matmuls replace two ~6-pass f32-HIGHEST ones.
    Returns (xr, xi, shift)."""
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
    scaled = w << shift
    lo = (scaled & 255).astype(jnp.float32).astype(jnp.bfloat16)
    hi = (scaled >> 8).astype(jnp.float32).astype(jnp.bfloat16)

    def perm(p_ref):
        p = p_ref[:].astype(jnp.bfloat16)
        lo_p = jnp.dot(lo, p, preferred_element_type=jnp.float32)
        hi_p = jnp.dot(hi, p, preferred_element_type=jnp.float32)
        return (hi_p.astype(jnp.int32) << 8) + lo_p.astype(jnp.int32)

    return perm(pr_ref), perm(pi_ref), shift


def _window_fft_energy_kernel(
    tw_ref, bf_ref, win_ref, pr_ref, pi_ref, frames_ref, out_ref,
    *, window_bits: int, variant: str
):
    """Fused frontend prefix on pre-framed input: windowing, input_shift,
    input permutation, FFT stages + energy."""
    xr, xi, shift = _window_shift_perm(
        win_ref, pr_ref, pi_ref, frames_ref[:], window_bits
    )
    energy256, e256 = _fft_energy_math(
        tw_ref, xr, xi, variant=variant, bf_ref=bf_ref
    )
    out_ref[:, :256] = energy256
    out_ref[:, 256:257] = e256
    out_ref[:, 257:258] = shift.astype(jnp.uint32)


def _clip_frontend_kernel(
    tw_ref, bf_ref, win_ref, pr_ref, pi_ref, fbh_ref, fbl_ref, rows_ref,
    out_ref, *, window_bits: int, step: int, window_size: int, variant: str
):
    """The WHOLE stateless frontend prefix for a tile of clips, one VMEM
    pass: framing, windowing, input_shift, input permutation, all FFT
    stages, bin energies, the exact 64-bit filterbank accumulate, Sqrt64
    and the >>shift denormalization.

    rows_ref: (R, step) int32 — the clips' audio reshaped to hop-sized
    rows, R = clips_per_tile * rows_per_clip. Frame r is
    rows[r] ++ rows[r+1][:window-step] (window <= 2*step), built with one
    sublane roll; the last row of each clip yields a garbage frame that the
    wrapper slices off (≈2% wasted lanes — cheaper than any gather).
    """
    rows = rows_ref[:]  # (R, step) int32
    # rows[r+1] at row r (wraps at the end); pltpu.roll needs shift >= 0,
    # and roll by R-1 == roll by -1
    nxt = pltpu.roll(rows, rows.shape[0] - 1, 0)
    frames = jnp.concatenate([rows, nxt[:, : window_size - step]], axis=-1)
    xr, xi, shift = _window_shift_perm(
        win_ref, pr_ref, pi_ref, frames, window_bits
    )
    energy256, e256 = _fft_energy_math(
        tw_ref, xr, xi, variant=variant, bf_ref=bf_ref
    )
    out_ref[:] = _filterbank_sqrt_in_kernel(
        fbh_ref, fbl_ref, energy256, e256, shift
    )


def _bf_input(variant: str):
    """The butterfly-matrix kernel input for the "mxu" FFT variant (2 MiB
    VMEM), or a negligible placeholder block for the others (the kernels
    take a uniform signature)."""
    if variant == "mxu":
        spec = pl.BlockSpec(
            (256, 8 * 256), lambda i: (0, 0), memory_space=pltpu.VMEM
        )
        return jnp.asarray(_BF_PACKED), spec
    spec = pl.BlockSpec((8, 128), lambda i: (0, 0), memory_space=pltpu.VMEM)
    return jnp.zeros((8, 128), jnp.float32), spec


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
    jax.jit, static_argnames=("window_bits", "interpret", "fft_variant")
)
def window_fft_energy(
    frames: jnp.ndarray,  # (N, window) int32 raw framed audio
    window_coeffs: jnp.ndarray,  # (window,) int32 quantized Hann
    pr: jnp.ndarray,  # (window, 256) f32 even-sample permutation
    pi: jnp.ndarray,  # (window, 256) f32 odd-sample permutation
    window_bits: int = 12,
    interpret: bool = False,
    fft_variant: str = DEFAULT_FFT_VARIANT,
):
    """Fused window+shift+permute+FFT+energy: (N, window) int16-range frames
    -> ((N, 257) uint32 energies, (N,) uint32 per-frame input shift)."""
    n, win = frames.shape
    tile = min(n, 512)
    pad = (-n) % tile
    if pad:
        frames = jnp.pad(frames, ((0, pad), (0, 0)))
    np_ = n + pad
    bf, bf_spec = _bf_input(fft_variant)

    out = pl.pallas_call(
        functools.partial(
            _window_fft_energy_kernel,
            window_bits=window_bits,
            variant=fft_variant,
        ),
        grid=(np_ // tile,),
        in_specs=[
            pl.BlockSpec((34, 256), lambda i: (0, 0), memory_space=pltpu.VMEM),
            bf_spec,
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
        bf,
        jnp.asarray(window_coeffs, jnp.int32)[None, :],
        pr,
        pi,
        frames,
    )
    return out[:n, :257], out[:n, 257]


def _filterbank_sqrt_in_kernel(fbh_ref, fbl_ref, energy256, e256, shift):
    """Exact 64-bit filterbank accumulate + Sqrt64 + >>shift on the VMEM
    tile (micro_int.filterbank_accumulate_mxu semantics; fft-bin 256 as a
    rank-1 term). Energies split into 8-bit limbs and weights into 6-bit
    limbs — both bf16-exact integers — so the accumulates run as eight
    single-pass NATIVE bf16 matmuls (f32 accumulation; every sum
    255*63*256 < 2^23 stays exact) instead of six ~6-pass f32-HIGHEST
    ones. The bin-256 rank-1 addend stays f32 elementwise (bf16 products
    would round)."""
    from .micro_int import sqrt64_exact, u64_add, u64_from_shifted

    U = jnp.uint32
    bf = jnp.bfloat16
    w0h = fbh_ref[0:256, :].astype(bf)
    w0l = fbl_ref[0:256, :].astype(bf)
    w256h, w256l = fbh_ref[256:257, :], fbl_ref[256:257, :]

    def limb_f32(x_u32, sh):
        # 8-bit limb (< 2^8): Mosaic-safe u32 -> f32 via int32
        v = (x_u32 >> U(sh)) & U(0xFF) if sh else x_u32 & U(0xFF)
        return v.astype(jnp.int32).astype(jnp.float32)

    h = l = None
    for s in (24, 16, 8, 0):
        e_f = limb_f32(energy256, s)
        e_bf = e_f.astype(bf)
        e256_f = limb_f32(e256, s)
        for w_bf, w256_f, ws in ((w0h, w256h, 6), (w0l, w256l, 0)):
            part = (
                jnp.dot(e_bf, w_bf, preferred_element_type=jnp.float32)
                + e256_f * w256_f
            )
            # part < 2^23 -> exact f32 -> u32 via int32 (Mosaic-safe)
            part_u = part.astype(jnp.int32).astype(U)
            ph, pl_ = u64_from_shifted(part_u, s + ws)
            h, l = (ph, pl_) if h is None else u64_add(h, l, ph, pl_)
    return sqrt64_exact(h, l) >> shift.astype(U)


def _select_chain(idx_i32, table, width):
    """Exact table select as a where-chain over STATIC Python values (no
    one-hot matmul tensors in VMEM). table: tuple of scalars or tuples."""
    first = table[0]
    if isinstance(first, tuple):
        outs = [jnp.full_like(idx_i32, t0) for t0 in first]
        for k in range(1, width):
            m = idx_i32 == k
            outs = [
                jnp.where(m, jnp.int32(tv), o)
                for tv, o in zip(table[k], outs)
            ]
        return outs
    out = jnp.full_like(idx_i32, first)
    for k in range(1, width):
        out = jnp.where(idx_i32 == k, jnp.int32(table[k]), out)
    return out


def _pcan_section(est_seq, out, *, wdf_rows, lut012, snr_shift):
    """PCAN gain over a NR-output slab: WideDynamicFunction
    (micro_int.wide_dynamic_function semantics) with the (32, 3) LUT rows
    as static immediates. l1/l2 fit 16 bits signed, so they ride ONE
    packed select chain and unpack with two shifts (the packing halves
    this section's select count, benchmarks/fft_cost_decomposition.json).
    Pure jnp on plain arrays: runs identically inside the Mosaic kernel
    and under jax.make_jaxpr (tools_dev/vpu_roofline.py's op census)."""
    from .micro_int import msb32, pcan_gain, umin, umax

    U = jnp.uint32
    I = jnp.int32
    x = est_seq
    interval = msb32(x)
    idx = jnp.clip(interval.astype(I) - 1, 0, 31)

    def _as_i32(v):
        return v - (1 << 32) if v >= (1 << 31) else v

    packed12 = tuple(
        _as_i32(((int(r[1]) & 0xFFFF) << 16) | (int(r[2]) & 0xFFFF))
        for r in wdf_rows
    )
    l0 = _select_chain(idx, tuple(int(r[0]) for r in wdf_rows), 32)
    p12 = _select_chain(idx, packed12, 32)
    l1 = p12 >> 16  # arithmetic shift restores the sign
    l2 = (p12 << 16) >> 16
    shl = umin(umax(U(11) - umin(interval, U(11)), U(0)), U(31))
    shr = umin(umax(interval, U(11)) - U(11), U(31))
    frac = (
        jnp.where(interval < U(11), x << shl, x >> shr) & U(0x3FF)
    ).astype(I)
    r = (l2 * frac) >> 5
    r = r + (l1 << 5)
    r_hi = r >> 16
    r_lo = r & 0xFFFF
    r = r_hi * frac * 2 + ((r_lo * frac + (1 << 14)) >> 15)
    r = r + l0
    small = x <= U(2)
    direct = jnp.where(
        x < U(1), jnp.int32(lut012[0]),
        jnp.where(x < U(2), jnp.int32(lut012[1]), jnp.int32(lut012[2])),
    )
    gain = jnp.where(small, direct, r)
    return pcan_gain(out, gain, snr_shift)


def _log_section(out, *, correction_bits, scale_shift, log_pairs):
    """Integer log scaling (micro_int.log_scale_int semantics) with the
    129 segment pairs as static immediates: (c0 << 16) | c1 rides one
    packed select chain instead of two 128-select chains. Pure jnp on
    plain arrays (see _pcan_section)."""
    from .micro_int import msb32, umin, umax
    from .micro_exact import LOG_SCALE_LOG2, LOG_COEFF

    U = jnp.uint32
    I = jnp.int32
    value = out << U(correction_bits)
    nonzero = value > U(0)
    v = umax(value, U(1))
    integer = msb32(v) - U(1)
    frac = v - (U(1) << integer)
    shl = umin(
        umax(
            U(LOG_SCALE_LOG2) - umin(integer, U(LOG_SCALE_LOG2)), U(0)
        ),
        U(31),
    )
    shr = umin(
        umax(integer, U(LOG_SCALE_LOG2)) - U(LOG_SCALE_LOG2), U(31)
    )
    frac = jnp.where(integer < U(LOG_SCALE_LOG2), frac << shl, frac >> shr)
    from .micro_exact import LOG_SEGMENTS_LOG2

    seg_shift = LOG_SCALE_LOG2 - LOG_SEGMENTS_LOG2  # 9
    base_seg = (frac >> U(seg_shift)).astype(I)  # 0..128
    packed01 = tuple(
        (int(c0) << 16) | int(c1) for c0, c1 in log_pairs
    )
    p01 = _select_chain(base_seg, packed01, 129)
    c0 = p01 >> 16
    c1 = p01 & 0xFFFF
    delta = frac.astype(I) - (base_seg << seg_shift)
    rel = ((c1 - c0) * delta) >> LOG_SCALE_LOG2
    fraction = frac.astype(I) + c0 + rel
    log2v = ((integer.astype(I)) << LOG_SCALE_LOG2) + fraction
    lv = log2v.astype(U)
    h16 = lv >> U(16)
    l16 = lv & U(0xFFFF)
    rnd = U(1 << (LOG_SCALE_LOG2 - 1))
    loge = U(LOG_COEFF) * h16 + (
        (U(LOG_COEFF) * l16 + rnd) >> U(LOG_SCALE_LOG2)
    )
    logged = ((loge << U(scale_shift)) + rnd) >> U(LOG_SCALE_LOG2)
    out = jnp.where(nonzero, logged, U(0))
    return umin(out, U(0xFFFF))


def _clip_frontend_full_kernel(
    tw_ref, bf_ref, win_ref, pr_ref, pi_ref, fbh_ref, fbl_ref, sm_ref,
    om_ref, rows_ref, out_ref, sig_scratch, est_scratch,
    *, window_bits: int, step: int, window_size: int, cb: int, nf: int,
    smoothing_bits: int, msr: int, enable_pcan: bool, snr_shift: int,
    wdf_rows, lut012, enable_log: bool, correction_bits: int,
    scale_shift: int, log_pairs, variant: str,
):
    """THE fused frontend: framing, windowing, input_shift, FFT, energies,
    filterbank, Sqrt64, noise-reduction recurrence, PCAN and log scaling —
    the entire micro frontend for a tile of clips in one VMEM pass.

    Rows arrive FRAME-MAJOR (row = f*cb + c) so the per-clip NR recurrence
    scans contiguous (cb, C) slabs; frame f's window is rows (f, c) and
    (f+1, c), built with one sublane roll by cb. LUT stages (PCAN wide
    dynamic function, log segments) select via where-chains over static
    immediates instead of one-hot matmuls. Semantics are micro_int's
    (bit-exact; tests compare element-for-element)."""
    from .micro_int import nr_estimate_step, nr_subtract, umin

    U = jnp.uint32
    rows = rows_ref[:]  # (R, step) int32, R = (nf+1)*cb
    r_total = rows.shape[0]
    nxt = pltpu.roll(rows, r_total - cb, 0)  # row (f+1, c) at (f, c)
    frames = jnp.concatenate([rows, nxt[:, : window_size - step]], axis=-1)
    xr, xi, shift = _window_shift_perm(
        win_ref, pr_ref, pi_ref, frames, window_bits
    )
    energy256, e256 = _fft_energy_math(
        tw_ref, xr, xi, variant=variant, bf_ref=bf_ref
    )
    sig = _filterbank_sqrt_in_kernel(fbh_ref, fbl_ref, energy256, e256, shift)
    c = sig.shape[-1]
    sig_scratch[:] = sig.reshape(nf + 1, cb, c)

    sm = sm_ref[0]  # (C,) uint32 per-channel smoothing
    om = om_ref[0]

    def nr_step(f, est):
        est = nr_estimate_step(est, sig_scratch[f], sm, om, smoothing_bits)
        est_scratch[f] = est
        return est

    jax.lax.fori_loop(
        0, nf, nr_step, jnp.zeros((cb, c), U), unroll=False
    )
    est_seq = est_scratch[:]  # (nf, cb, C)
    sig_real = sig_scratch[0:nf]  # last frame row is framing garbage

    out = nr_subtract(sig_real, est_seq, U(msr), smoothing_bits)
    if enable_pcan:
        out = _pcan_section(
            est_seq, out, wdf_rows=wdf_rows, lut012=lut012,
            snr_shift=snr_shift,
        )
    if enable_log:
        out = _log_section(
            out, correction_bits=correction_bits, scale_shift=scale_shift,
            log_pairs=log_pairs,
        )
    else:
        out = umin(out, U(0xFFFF))
    out_ref[0] = out


# ~17 KiB scoped VMEM per frame row (measured on v5e: 1200 rows -> 20.3 MiB,
# over the 16 MiB scoped limit; 800 rows fits). Callers must route clips with
# rpc*tile_clips(rpc) beyond this to the unfused XLA path (micro_jax does).
MAX_TILE_ROWS = 800


def tile_clips(rpc: int) -> int:
    """Clips per kernel tile for clips of `rpc` frame rows each.

    Targets ~400 frame rows per invocation, but MUST be a multiple of 8 on
    real Mosaic: the input block is (rpc*cb, step) (sublane dim must divide
    by 8), and the framing roll by cb*(rpc-1) must stay sublane-aligned or
    the frames concatenate is rejected with "result/input offset mismatch
    on non-concat dimension". Both hold for every rpc exactly when 8 | cb.
    """
    return max(8, (400 // rpc) // 8 * 8)


@functools.partial(
    jax.jit,
    static_argnames=(
        "window_bits", "window_size", "window_step", "smoothing_bits", "msr",
        "enable_pcan", "snr_shift", "wdf_rows", "lut012", "enable_log",
        "correction_bits", "scale_shift", "log_pairs", "clips_per_tile",
        "interpret", "fft_variant",
    ),
)
def clip_frontend_features(
    audio_int32: jnp.ndarray,  # (B, T) int32 int16-range audio
    window_coeffs: jnp.ndarray,
    pr: jnp.ndarray,
    pi: jnp.ndarray,
    fb_whi: jnp.ndarray,  # (257, C) f32
    fb_wlo: jnp.ndarray,  # (257, C) f32
    sm_u: jnp.ndarray,  # (C,) uint32 even/odd smoothing
    om_u: jnp.ndarray,  # (C,) uint32 1<<14 - smoothing
    *,
    window_bits: int = 12,
    window_size: int = 480,
    window_step: int = 320,
    smoothing_bits: int = 10,
    msr: int = 0,
    enable_pcan: bool = True,
    snr_shift: int = 6,
    wdf_rows=(),
    lut012=(),
    enable_log: bool = True,
    correction_bits: int = 3,
    scale_shift: int = 6,
    log_pairs=(),
    clips_per_tile=None,
    interpret: bool = False,
    fft_variant: str = DEFAULT_FFT_VARIANT,
):
    """The ENTIRE micro frontend as one Pallas kernel per clip tile:
    (B, T) int16-range audio -> (B, nf, C) uint32 features (pre-10/256
    scale). Audio crosses HBM once in, features once out — no intermediate
    tensor exists outside VMEM. Bit-exact vs ops/micro_exact.py."""
    b, t = audio_int32.shape
    win, step = window_size, window_step
    assert win <= 2 * step, (win, step)
    nf = 1 + (t - win) // step if t >= win else 0
    num_channels = fb_whi.shape[1]
    if nf <= 0:
        return jnp.zeros((b, 0, num_channels), jnp.uint32)
    rpc = nf + 1
    pad_to = rpc * step
    if pad_to > t:
        audio_int32 = jnp.pad(audio_int32, ((0, 0), (0, pad_to - t)))
    else:
        audio_int32 = audio_int32[:, :pad_to]

    cb = clips_per_tile or tile_clips(rpc)
    pad_b = (-b) % cb
    if pad_b:
        audio_int32 = jnp.pad(audio_int32, ((0, pad_b), (0, 0)))
    bp = b + pad_b
    ntiles = bp // cb
    # frame-major row order within each tile: row = f*cb + c
    rows = (
        audio_int32.reshape(ntiles, cb, rpc, step)
        .transpose(0, 2, 1, 3)
        .reshape(ntiles * rpc * cb, step)
    )

    bf, bf_spec = _bf_input(fft_variant)
    out = pl.pallas_call(
        functools.partial(
            _clip_frontend_full_kernel,
            window_bits=window_bits, step=step, window_size=win, cb=cb,
            nf=nf, smoothing_bits=smoothing_bits, msr=msr,
            enable_pcan=enable_pcan, snr_shift=snr_shift, wdf_rows=wdf_rows,
            lut012=lut012, enable_log=enable_log,
            correction_bits=correction_bits, scale_shift=scale_shift,
            log_pairs=log_pairs, variant=fft_variant,
        ),
        grid=(ntiles,),
        in_specs=[
            pl.BlockSpec((34, 256), lambda i: (0, 0), memory_space=pltpu.VMEM),
            bf_spec,
            pl.BlockSpec((1, win), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((win, 256), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((win, 256), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (257, num_channels), lambda i: (0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (257, num_channels), lambda i: (0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, num_channels), lambda i: (0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, num_channels), lambda i: (0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (rpc * cb, step), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, nf, cb, num_channels), lambda i: (i, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct(
            (ntiles, nf, cb, num_channels), jnp.uint32
        ),
        scratch_shapes=[
            pltpu.VMEM((rpc, cb, num_channels), jnp.uint32),
            pltpu.VMEM((nf, cb, num_channels), jnp.uint32),
        ],
        interpret=interpret,
    )(
        jnp.asarray(_TW_PACKED),
        bf,
        jnp.asarray(window_coeffs, jnp.int32)[None, :],
        pr,
        pi,
        fb_whi,
        fb_wlo,
        jnp.asarray(sm_u, jnp.uint32)[None, :],
        jnp.asarray(om_u, jnp.uint32)[None, :],
        rows,
    )
    return out.transpose(0, 2, 1, 3).reshape(bp, nf, num_channels)[:b]


@functools.partial(
    jax.jit,
    static_argnames=(
        "window_bits", "window_size", "window_step", "interpret",
        "fft_variant",
    ),
)
def clip_frontend(
    audio_int32: jnp.ndarray,  # (B, T) int32 int16-range audio
    window_coeffs: jnp.ndarray,  # (window,) int32 quantized Hann
    pr: jnp.ndarray,  # (window, 256) f32 even-sample permutation
    pi: jnp.ndarray,  # (window, 256) f32 odd-sample permutation
    fb_whi: jnp.ndarray,  # (257, C) f32 filterbank weight hi limbs
    fb_wlo: jnp.ndarray,  # (257, C) f32 filterbank weight lo limbs
    window_bits: int = 12,
    window_size: int = 480,
    window_step: int = 320,
    interpret: bool = False,
    fft_variant: str = DEFAULT_FFT_VARIANT,
):
    """Whole stateless frontend prefix as ONE Pallas kernel per clip tile:
    (B, T) audio -> (B, nf, C) uint32 sqrt-filterbank signal (input_shift
    already applied). Framing happens in-kernel from hop-sized rows, so the
    (B, nf, window) frame tensor never exists in HBM.

    Requires window <= 2*window_step (true for the 30 ms/20 ms micro
    config). Intended for clip-scale nf (training/eval); the streaming path
    uses window_fft_energy on its own framing.
    """
    b, t = audio_int32.shape
    win, step = window_size, window_step
    assert win <= 2 * step, (win, step)
    nf = 1 + (t - win) // step if t >= win else 0
    num_channels = fb_whi.shape[1]
    if nf <= 0:
        return jnp.zeros((b, 0, num_channels), jnp.uint32)
    rpc = nf + 1  # rows per clip (hop-sized), last row only feeds overlap
    pad_to = rpc * step
    if pad_to > t:
        audio_int32 = jnp.pad(audio_int32, ((0, 0), (0, pad_to - t)))
    else:
        audio_int32 = audio_int32[:, :pad_to]

    # clips per tile: target ~400 frame rows per kernel invocation
    cb = max(1, 400 // rpc)
    pad_b = (-b) % cb
    if pad_b:
        audio_int32 = jnp.pad(audio_int32, ((0, pad_b), (0, 0)))
    bp = b + pad_b
    rows = audio_int32.reshape(bp * rpc, step)
    tile_rows = cb * rpc

    bf, bf_spec = _bf_input(fft_variant)
    out = pl.pallas_call(
        functools.partial(
            _clip_frontend_kernel,
            window_bits=window_bits, step=step, window_size=win,
            variant=fft_variant,
        ),
        grid=(bp // cb,),
        in_specs=[
            pl.BlockSpec((34, 256), lambda i: (0, 0), memory_space=pltpu.VMEM),
            bf_spec,
            pl.BlockSpec((1, win), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((win, 256), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((win, 256), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (257, num_channels), lambda i: (0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (257, num_channels), lambda i: (0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (tile_rows, step), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (tile_rows, num_channels), lambda i: (i, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((bp * rpc, num_channels), jnp.uint32),
        interpret=interpret,
    )(
        jnp.asarray(_TW_PACKED),
        bf,
        jnp.asarray(window_coeffs, jnp.int32)[None, :],
        pr,
        pi,
        fb_whi,
        fb_wlo,
        rows,
    )
    # row c*rpc + nf is each clip's garbage overlap frame — slice it off
    return out.reshape(bp, rpc, num_channels)[:b, :nf, :]


@functools.partial(jax.jit, static_argnames=("interpret", "fft_variant"))
def kiss_fft_energy(
    xr: jnp.ndarray,  # (N, 256) int32, input-permuted real part
    xi: jnp.ndarray,  # (N, 256) int32, input-permuted imag part
    interpret: bool = False,
    fft_variant: str = DEFAULT_FFT_VARIANT,
) -> jnp.ndarray:
    """(N, 256) x2 permuted complex substate -> (N, 257) uint32 energies."""
    n = xr.shape[0]
    tile = min(n, 512)
    pad = (-n) % tile
    if pad:
        xr = jnp.pad(xr, ((0, pad), (0, 0)))
        xi = jnp.pad(xi, ((0, pad), (0, 0)))
    np_ = n + pad
    bf, bf_spec = _bf_input(fft_variant)

    out = pl.pallas_call(
        functools.partial(_fft_energy_kernel, variant=fft_variant),
        grid=(np_ // tile,),
        in_specs=[
            pl.BlockSpec((34, 256), lambda i: (0, 0), memory_space=pltpu.VMEM),
            bf_spec,
            pl.BlockSpec((tile, 256), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, 256), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (tile, 257), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((np_, 257), jnp.uint32),
        interpret=interpret,
    )(jnp.asarray(_TW_PACKED), bf, xr, xi)
    return out[:n]
