"""On-device batched audio augmentation (jitted, explicit PRNG keys).

TPU-first re-design of the reference's per-sample tf.data augmentation
(input_data.py:245-364). The host decides *which* clip fills each batch slot
(target / unknown / silence — file IO lives there); the device applies all
signal transforms in one fused jitted function:

- random time shift +-time_shift samples (pad+slice, input_data.py:245-268)
- silence slots: random background crop scaled by U[0,1)
  (input_data.py:284-287,510-514)
- background mixing with prob background_frequency at volume
  U[0, background_volume_range), RMS-equalized (add_background,
  input_data.py:141-157,300-303)
- SpecAugment time/freq masking after featurization (input_data.py:306-369)

Everything is vmapped/batched; randomness comes from a single jax PRNG key
split per batch (order-independent, statistically identical to the
reference's sequential draws).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@dataclass(frozen=True)
class SpecAugParams:
    """Reference SpecAugParams (input_data.py:160-170)."""

    percentage: float = 80.0
    frequency_n_range: int = 2
    frequency_max_px: int = 2
    time_n_range: int = 2
    time_max_px: int = 2


@dataclass(frozen=True)
class AugmentParams:
    time_shift_samples: int = 1600  # 100 ms @ 16 kHz
    background_frequency: float = 0.8
    background_volume_range: float = 0.1
    spec_aug: SpecAugParams = SpecAugParams()


def _per_row_slice(x: jnp.ndarray, start: jnp.ndarray, out_len: int,
                   max_start: int) -> jnp.ndarray:
    """out[i, j] = x[i, start_i + j], gather-free (0 <= start_i <= max_start).

    A per-row dynamic slice in the minor (lane) dimension lowers to an
    elementwise XLA gather — the single most expensive op in the fused
    pretrain input pipeline (benchmarks/fused_pipeline_decomposition.json:
    gather+augment was 9.2 ms/step at bs 512, ~18x its HBM roofline).
    Instead, decompose start_i in binary and apply ceil(log2(max_start+1))
    UNIFORM static shifts, each a contiguous pad+slice+select pass that XLA
    runs at HBM bandwidth. Positions past the row end read as zero, which
    is only ever consumed where the true slice already lay inside x.
    """
    b, width = x.shape
    nbits = max(1, int(max_start).bit_length())
    for bit in range(nbits):
        k = 1 << bit
        shifted = jnp.pad(x[:, k:], ((0, 0), (0, k)))
        x = jnp.where((start & k)[:, None] != 0, shifted, x)
    return x[:, :out_len]


def random_timeshift(key, audio: jnp.ndarray, max_shift: int) -> jnp.ndarray:
    """Batched +-max_shift sample shift (pad + gather-free per-row slice).

    Equivalent to reference random_timeshift (input_data.py:245-268):
    shift>0 pads the beginning (delays), shift<0 slices forward.
    """
    b, n = audio.shape
    shifts = jax.random.randint(key, (b,), -max_shift, max_shift)
    padded = jnp.pad(audio, ((0, 0), (max_shift, max_shift)))
    # shift amount s>0 -> slice starts at max_shift - s (prepend zeros)
    return _per_row_slice(padded, max_shift - shifts, n, 2 * max_shift)


# Block size for the coarse background-crop gather: whole BG_BLK-sample rows
# move contiguously (major-dim row gather, fast); the residual offset
# (< BG_BLK) is a _per_row_slice fine shift.
BG_BLK = 512


def pad_background_bank(bg_data: np.ndarray, num_samples: int = 16000):
    """Right-pad the bank so random_background_crop's blocked view never
    re-pads per step: width must cover floor(max_off/BG_BLK)*BG_BLK plus
    ceil((num_samples + BG_BLK - 1)/BG_BLK) whole blocks."""
    nblk_win = -(-(num_samples + BG_BLK - 1) // BG_BLK)
    max_len = bg_data.shape[1]
    # max(0, ...): a bank whose longest clip is shorter than num_samples
    # must not under-size the blocked view (the row gather would silently
    # read a neighboring clip's blocks via JAX's clamped OOB gather)
    need = (max(0, max_len - num_samples) // BG_BLK + nblk_win) * BG_BLK
    if need > max_len:
        pad = np.zeros((bg_data.shape[0], need - max_len), bg_data.dtype)
        bg_data = np.concatenate([bg_data, pad], axis=1)
    return bg_data


def random_background_crop(
    key, bg_data: jnp.ndarray, bg_sizes: jnp.ndarray, num_samples: int, batch: int
) -> jnp.ndarray:
    """Random (clip, offset) crops from the padded background bank.

    bg_data: (n_bg, max_len) float32; bg_sizes: (n_bg,) int32.
    Mirrors random_background_sample (input_data.py:227-243). Offsets are
    exact (any sample position); the crop is assembled gather-free as a
    coarse block-row gather (offset // BG_BLK) + a binary-decomposed fine
    shift (offset % BG_BLK) — see _per_row_slice.
    """
    k1, k2 = jax.random.split(key)
    idx = jax.random.randint(k1, (batch,), 0, bg_data.shape[0])
    sizes = bg_sizes[idx]
    max_off = jnp.maximum(sizes - num_samples, 1)
    # uniform [0, size - num_samples)
    off = jax.random.randint(k2, (batch,), 0, 2**30) % max_off

    nblk_win = -(-(num_samples + BG_BLK - 1) // BG_BLK)
    n_bg, max_len = bg_data.shape
    # widest block window starts at floor(max(0, max_len - num_samples)/BG_BLK)
    need = (max(0, max_len - num_samples) // BG_BLK + nblk_win) * BG_BLK
    if need > max_len:  # bank not pre-padded (see pad_background_bank)
        bg_data = jnp.pad(bg_data, ((0, 0), (0, need - max_len)))
    nblk_tot = bg_data.shape[1] // BG_BLK
    flat = bg_data[:, : nblk_tot * BG_BLK].reshape(n_bg * nblk_tot, BG_BLK)

    oq, r = off // BG_BLK, off % BG_BLK
    rows = flat[(idx * nblk_tot + oq)[:, None] + jnp.arange(nblk_win)[None, :]]
    window = rows.reshape(batch, nblk_win * BG_BLK)
    return _per_row_slice(window, r, num_samples, BG_BLK - 1)


def add_background(fg: jnp.ndarray, bg: jnp.ndarray, volume: jnp.ndarray) -> jnp.ndarray:
    """RMS-equalized background mix (reference add_background,
    input_data.py:141-157). fg/bg: (B, N); volume: (B,)."""
    fg_rms = jnp.sqrt(jnp.mean(fg * fg, axis=-1))
    bg_rms = jnp.sqrt(jnp.mean(bg * bg, axis=-1))
    snr_scaling = jnp.where(bg_rms > 0, fg_rms / jnp.maximum(bg_rms, 1e-30), 0.0)
    mixed = fg + bg * (snr_scaling * volume)[:, None]
    return jnp.clip(mixed, -1.0, 1.0)


def augment_waveforms(
    key,
    audio: jnp.ndarray,  # (B, N) float32 — target/unknown waveforms
    is_silence: jnp.ndarray,  # (B,) bool — slots that become pure background
    bg_data: jnp.ndarray,
    bg_sizes: jnp.ndarray,
    params: AugmentParams = AugmentParams(),
) -> jnp.ndarray:
    """Full waveform-domain augmentation. Returns (B, N) float32."""
    b, n = audio.shape
    k_shift, k_bg, k_vol_sil, k_mix, k_vol_mix = jax.random.split(key, 5)

    if params.time_shift_samples > 0:
        audio = random_timeshift(k_shift, audio, params.time_shift_samples)

    bg = random_background_crop(k_bg, bg_data, bg_sizes, n, b)

    # silence slots: background * U[0,1)
    sil_vol = jax.random.uniform(k_vol_sil, (b,))
    silence_audio = bg * sil_vol[:, None]

    # others: mix background with prob background_frequency at U[0, vol_range)
    do_mix = jax.random.uniform(k_mix, (b,)) < params.background_frequency
    mix_vol = jax.random.uniform(
        k_vol_mix, (b,), minval=0.0, maxval=params.background_volume_range
    )
    mixed = add_background(audio, bg, jnp.where(do_mix, mix_vol, 0.0))

    return jnp.where(is_silence[:, None], silence_audio, mixed)


def spec_augment(
    key, specs: jnp.ndarray, params: SpecAugParams = SpecAugParams()
) -> jnp.ndarray:
    """Batched SpecAugment (reference input_data.py:306-369).

    specs: (B, T, F). Per sample: with prob percentage/100, apply
    freq_n ~ U{0..n_range} frequency masks (each size ~ U{1..max_px},
    start ~ U[0, F-size)) and likewise time masks.
    """
    b, t, f = specs.shape
    keys = jax.random.split(key, 7)
    apply = jax.random.uniform(keys[0], (b,)) < (params.percentage / 100.0)

    def axis_mask(kn, ks, kstart, axis_len, n_range, max_px):
        n_active = jax.random.randint(kn, (b,), 0, n_range + 1)
        sizes = jax.random.randint(ks, (b, n_range), 1, max_px + 1)
        starts = jax.random.randint(kstart, (b, n_range), 0, 2**30) % jnp.maximum(
            axis_len - sizes, 1
        )
        pos = jnp.arange(axis_len)[None, None, :]
        active = (jnp.arange(n_range)[None, :] < n_active[:, None])[..., None]
        inside = (pos >= starts[..., None]) & (pos < (starts + sizes)[..., None])
        masked = jnp.any(active & inside, axis=1)  # (B, axis_len)
        return jnp.where(masked, 0.0, 1.0)

    fmask = axis_mask(keys[1], keys[2], keys[3], f, params.frequency_n_range,
                      params.frequency_max_px)
    tmask = axis_mask(keys[4], keys[5], keys[6], t, params.time_n_range,
                      params.time_max_px)
    full = tmask[:, :, None] * fmask[:, None, :]
    full = jnp.where(apply[:, None, None], full, 1.0)
    return specs * full
