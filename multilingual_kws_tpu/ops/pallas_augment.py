"""Fused waveform augmentation + quantization as one Pallas TPU kernel.

The training input pipeline's augmentation (reference semantics:
random_timeshift + random_background_sample + RMS-equalized mix,
input_data.py:141-268) is pure data movement plus a handful of
elementwise passes, but expressed in XLA it costs ~2 ms/step at bs 512
(benchmarks/augment_stage_decomposition.json) because every stage —
int16->f32 convert, per-clip shift, background fine-crop, mix, and the
float->int16 quantize inside the frontend — makes a full HBM round trip
over (B, 16000) f32.

Here the whole chain runs in VMEM on a tile of clips:

  int16 foreground rows + coarse background block-rows  ->  one kernel ->
  quantized int32 audio ready for the fused frontend kernel

Per-clip dynamic shifts use NO gathers: `pltpu.roll(x, s)[i] = x[(i-s) % n]`
with static per-bit amounts, selected per clip by the binary digits of the
clip's shift (a (cb, 1) mask broadcast over lanes) — the same binary
decomposition as ops/augment._per_row_slice, but on VMEM-resident rows
where each pass is VPU-rate instead of an HBM round trip. The background
crop arrives as whole 320-sample blocks (a fast major-dim gather in XLA,
see ops/augment.BG_BLK) and only the sub-block offset (< 320, 9 bits) is
shifted in-kernel.

RNG draws happen OUTSIDE the kernel with exactly augment_waveforms' key
splits, so the kernel path consumes the same randomness as the XLA path
and both input pipelines (HBM-resident and host-streaming) stay mutually
bit-identical when routed through it. Versus the XLA path the waveform
samples are bit-identical by construction (pure movement); the mixed
output can differ in the last float ulp (reduction order / FMA fusion in
the RMS + mix arithmetic), which after quantization flips a rare sample
by one int16 step — tests/test_pallas_augment.py bounds this.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .augment import BG_BLK, AugmentParams

# clips per kernel tile: (cb, 16000) f32 working set * ~6 live arrays must
# sit inside scoped VMEM; 8 sublanes already fill the VPU (the lane dim is
# 125 vregs wide)
CLIPS_PER_TILE = 8


def _per_clip_roll(x, amount, nbits, *, left=False):
    """Rotate each clip row by its own amount via binary-decomposed STATIC
    rolls selected per clip (amount: (cb, 1) int32 in [0, 2**nbits)).

    right (default): x[c, j] <- x[c, (j - amount_c) mod n]
    left:            x[c, j] <- x[c, (j + amount_c) mod n]
    """
    n = x.shape[-1]
    for bit in range(nbits):
        k = 1 << bit
        if k >= n:
            break
        x = jnp.where(
            (amount & k) != 0, pltpu.roll(x, n - k if left else k, 1), x
        )
    return x


def _augment_quantize_kernel(
    fg_ref, bg_ref, si_ref, sf_ref, out_ref, *, t: int, max_shift: int
):
    """One tile: (cb, T) int32 foreground PCM + (cb, BGW) f32 background
    window -> (cb, T) int32 augmented, quantized audio.

    si_ref (cb, 8) int32: [0] = shift + max_shift in [0, 2*max_shift),
                          [1] = background sub-block offset in [0, BG_BLK)
    sf_ref (cb, 8) f32:   [0] = is_silence (0/1), [1] = silence volume,
                          [2] = mix volume (already 0 for non-mixed rows)
    """
    fg = fg_ref[:].astype(jnp.float32) * np.float32(1.0 / 32768.0)

    if max_shift > 0:
        # out[j] = fg[j - s], s = u - max_shift: pre-roll left by max_shift,
        # then right by u per clip; zero lanes whose source fell outside
        u = si_ref[:, 0:1]
        nbits = max(1, (2 * max_shift - 1).bit_length())
        x = pltpu.roll(fg, t - max_shift, 1)
        x = _per_clip_roll(x, u, nbits)
        lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
        s = u - max_shift
        fg = jnp.where((lane >= s) & (lane < t + s), x, 0.0)

    # background fine shift: window[j + r] = roll left by r
    r = si_ref[:, 1:2]
    nbits_bg = max(1, (BG_BLK - 1).bit_length())
    bg = _per_clip_roll(bg_ref[:], r, nbits_bg, left=True)[:, :t]

    # RMS-equalized mix (reference add_background, input_data.py:141-157)
    inv_t = np.float32(1.0 / t)
    fg_rms = jnp.sqrt(jnp.sum(fg * fg, axis=-1, keepdims=True) * inv_t)
    bg_rms = jnp.sqrt(jnp.sum(bg * bg, axis=-1, keepdims=True) * inv_t)
    scaling = jnp.where(
        bg_rms > 0, fg_rms / jnp.maximum(bg_rms, np.float32(1e-30)), 0.0
    )
    mixed = jnp.clip(fg + bg * (scaling * sf_ref[:, 2:3]), -1.0, 1.0)
    silence_audio = bg * sf_ref[:, 1:2]
    wav = jnp.where(sf_ref[:, 0:1] > 0, silence_audio, mixed)

    # saturating float -> int16 quantize (micro_jax._features_impl)
    out_ref[:] = jnp.clip(
        jnp.trunc(wav * 32768.0), -32768.0, 32767.0
    ).astype(jnp.int32)


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def draw_augment_params(key, b, t, n_bg, bg_sizes, params: AugmentParams):
    """All RNG draws, with exactly augment_waveforms' key splits
    (ops/augment.py:156-174). Returns (shifts, idx, off, sil_vol, volume)."""
    k_shift, k_bg, k_vol_sil, k_mix, k_vol_mix = jax.random.split(key, 5)

    max_shift = int(params.time_shift_samples)
    if max_shift > 0:
        shifts = jax.random.randint(k_shift, (b,), -max_shift, max_shift)
    else:
        shifts = jnp.zeros((b,), jnp.int32)

    # background draw, exactly ops/augment.random_background_crop
    k1, k2 = jax.random.split(k_bg)
    idx = jax.random.randint(k1, (b,), 0, n_bg)
    max_off = jnp.maximum(bg_sizes[idx] - t, 1)
    off = jax.random.randint(k2, (b,), 0, 2**30) % max_off

    sil_vol = jax.random.uniform(k_vol_sil, (b,))
    do_mix = jax.random.uniform(k_mix, (b,)) < params.background_frequency
    mix_vol = jax.random.uniform(
        k_vol_mix, (b,), minval=0.0, maxval=params.background_volume_range
    )
    volume = jnp.where(do_mix, mix_vol, 0.0)
    return shifts, idx, off, sil_vol, volume


def gather_bg_window(bg_data, idx, off, t):
    """Coarse background window: whole BG_BLK-sample block rows (fast
    major-dim gather); the kernel applies the sub-block offset. Returns
    (B, nwin*BG_BLK) rows starting at block floor(off/BG_BLK)."""
    b = idx.shape[0]
    nwin = -(-(t + BG_BLK - 1) // BG_BLK)
    n_bg, max_len = bg_data.shape
    need = (max(0, max_len - t) // BG_BLK + nwin) * BG_BLK
    if need > max_len:  # bank not pre-padded (see pad_background_bank)
        bg_data = jnp.pad(bg_data, ((0, 0), (0, need - max_len)))
    nblk_tot = bg_data.shape[1] // BG_BLK
    flat = bg_data[:, : nblk_tot * BG_BLK].reshape(n_bg * nblk_tot, BG_BLK)
    rows = flat[(idx * nblk_tot + off // BG_BLK)[:, None] + jnp.arange(nwin)]
    return rows.reshape(b, nwin * BG_BLK)


def pack_scalar_rows(shifts, off, sil_vol, volume, is_silence, max_shift):
    """Per-clip scalars as two (B, 8) kernel-input rows (si, sf)."""
    b = shifts.shape[0]
    si = jnp.stack(
        [shifts + max_shift, (off % BG_BLK).astype(jnp.int32)]
        + [jnp.zeros((b,), jnp.int32)] * 6,
        axis=1,
    )
    sf = jnp.stack(
        [is_silence.astype(jnp.float32), sil_vol, volume]
        + [jnp.zeros((b,), jnp.float32)] * 5,
        axis=1,
    )
    return si, sf


def augment_kernel_call(fg, bgw, si, sf, *, max_shift, interpret=False):
    """The bare pallas_call on pre-assembled inputs (fg (B, T) int32,
    bgw (B, W) f32, si/sf (B, 8)). Pads B to the tile multiple."""
    b, t = fg.shape
    cb = CLIPS_PER_TILE
    bp = _round_up(b, cb)
    pad = bp - b
    if pad:
        fg = jnp.pad(fg, ((0, pad), (0, 0)))
        bgw = jnp.pad(bgw, ((0, pad), (0, 0)))
        si = jnp.pad(si, ((0, pad), (0, 0)))
        sf = jnp.pad(sf, ((0, pad), (0, 0)))

    bg_width = bgw.shape[1]
    out = pl.pallas_call(
        functools.partial(
            _augment_quantize_kernel, t=t, max_shift=max_shift
        ),
        grid=(bp // cb,),
        in_specs=[
            pl.BlockSpec((cb, t), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (cb, bg_width), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec((cb, 8), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((cb, 8), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (cb, t), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((bp, t), jnp.int32),
        interpret=interpret,
    )(fg, bgw, si, sf)
    return out[:b]


def augment_quantize(
    key,
    audio_int16: jnp.ndarray,  # (B, T) int16/int32 PCM (silence rows zero)
    is_silence: jnp.ndarray,  # (B,) bool
    bg_data: jnp.ndarray,  # (n_bg, L) f32 padded bank (pad_background_bank)
    bg_sizes: jnp.ndarray,  # (n_bg,) int32
    params: AugmentParams = AugmentParams(),
    *,
    interpret: bool = False,
) -> jnp.ndarray:
    """augment_waveforms + float->int16 quantization, Pallas TPU fast path.

    Returns (B, T) int32 int16-range audio — feed to
    MicroFrontendJax.features_from_int16. Consumes the key with exactly
    augment_waveforms' splits; waveform movement (shift/crop) is
    bit-identical to the XLA path, float mix arithmetic is ulp-equivalent.
    """
    b, t = audio_int16.shape
    max_shift = int(params.time_shift_samples)
    shifts, idx, off, sil_vol, volume = draw_augment_params(
        key, b, t, bg_data.shape[0], bg_sizes, params
    )
    bgw = gather_bg_window(bg_data, idx, off, t)
    si, sf = pack_scalar_rows(shifts, off, sil_vol, volume, is_silence,
                              max_shift)
    fg = audio_int16.astype(jnp.int32)
    return augment_kernel_call(
        fg, bgw, si, sf, max_shift=max_shift, interpret=interpret
    )
