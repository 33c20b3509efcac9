"""Validation of the JAX device frontend vs the bit-exact host frontend,
plus the streaming shared-base-frames equivalence.

mode="exact" (int32 kiss FFT + uint32 filterbank/Sqrt64/NR/PCAN/log,
ops/micro_int.py) must be 100% bit-exact: every bin identical to the host
frontend, which is itself golden-pinned to the real TFLite op.
"""

import numpy as np
import pytest

from multilingual_kws_tpu.ops.micro_exact import (
    FrontendConfig,
    MicroFrontend,
    to_micro_spectrogram_exact,
)
from multilingual_kws_tpu.ops.micro_jax import MicroFrontendJax

STEP = np.float32(10.0 / 256.0)


def make_batch(n=6, samples=16000, seed=7):
    rng = np.random.default_rng(seed)
    t = np.arange(samples) / 16000.0
    waves = [
        np.zeros(samples),
        0.5 * np.sin(2 * np.pi * 440 * t),
        np.clip(rng.normal(0, 0.1, samples), -1, 1),
        np.clip(rng.normal(0, 0.001, samples), -1, 1),
        0.3 * np.sin(2 * np.pi * (200 + 3000 * t) * t),
        np.clip(
            0.25 * np.sin(2 * np.pi * 180 * t) * (1 + 0.8 * np.sin(2 * np.pi * 3 * t))
            + rng.normal(0, 0.02, samples),
            -1,
            1,
        ),
    ]
    return np.stack(waves[:n]).astype(np.float32)


@pytest.fixture(scope="module")
def frontends():
    return MicroFrontendJax(FrontendConfig(), quantize=True), MicroFrontend(
        FrontendConfig()
    )


def test_batch_features_bit_exact(frontends):
    fj, _ = frontends
    batch = make_batch()
    got = np.asarray(fj.features(batch))
    want = np.stack([to_micro_spectrogram_exact(w) for w in batch])
    assert got.shape == want.shape == (6, 49, 40)
    steps = np.abs(got - want) / STEP
    n_off = int((steps > 0).sum())
    assert n_off == 0, f"{n_off} bins off-grid (max {steps.max():.2f} steps)"


def test_random_audio_bit_exact(frontends):
    """Exactness on arbitrary audio (loud noise / near-clipping / quiet),
    where the round-1 float emulation drifted off-grid."""
    fj, _ = frontends
    rng = np.random.default_rng(123)
    batch = np.stack(
        [
            np.clip(rng.normal(0, 0.5, 16000), -1, 1),  # loud noise
            np.clip(rng.normal(0, 0.9, 16000), -1, 1),  # near clipping
            np.clip(rng.uniform(-1, 1, 16000), -1, 1),  # full-scale uniform
            np.sign(np.sin(2 * np.pi * 1000 * np.arange(16000) / 16000.0))
            * 0.99,  # square wave
        ]
    ).astype(np.float32)
    got = np.asarray(fj.features(batch))
    want = np.stack([to_micro_spectrogram_exact(w) for w in batch])
    np.testing.assert_array_equal(got, want)


def test_jit_and_vmap_compatible(frontends):
    import jax

    fj, _ = frontends
    batch = make_batch(2)
    f = jax.jit(fj.features)
    a = np.asarray(f(batch))
    b = np.asarray(fj.features(batch))
    np.testing.assert_allclose(a, b, atol=1e-5)


def test_stream_features_match_per_window(frontends):
    """Shared-base-frame streaming == independent per-window featurization."""
    fj, fe = frontends
    rng = np.random.default_rng(3)
    t = np.arange(48000) / 16000.0
    audio = np.clip(
        0.3 * np.sin(2 * np.pi * 700 * t) + rng.normal(0, 0.05, 48000), -1, 1
    ).astype(np.float32)
    i16 = np.clip(np.trunc(audio * 32768.0), -32768, 32767).astype(np.int16)

    num_windows = (48000 - 16000) // 320  # leave space for one full clip
    got = np.asarray(fj.stream_features(i16.astype(np.int32), num_windows))

    # reference semantics: independent spectrogram per 320-sample offset
    for w in [0, 1, 17, 50, 99]:
        clip = i16[w * 320 : w * 320 + 16000]
        want = fe(clip).astype(np.float32) * STEP
        np.testing.assert_array_equal(got[w], want)


def test_int16_cast_edge(frontends):
    fj, _ = frontends
    audio = np.ones((1, 16000), dtype=np.float32)  # +1.0 saturates to 32767
    got = np.asarray(fj.features(audio))
    want = to_micro_spectrogram_exact(np.ones(16000, dtype=np.float32))
    np.testing.assert_array_equal(got[0], want)


@pytest.mark.slow  # re-tiered r5: fast suite back under ~4 min (CLAUDE.md)
# 11 s; test_random_audio_bit_exact/test_batch_features_bit_exact stay fast
def test_multisecond_clips_bit_exact(frontends):
    """features() on non-1-second audio (verify session 2026-08-17 found a
    3-s clip failing Mosaic compile: the tile chose cb=2, whose framing roll
    broke sublane alignment). 2 s exercises the Pallas-eligible boundary
    (rpc=100 -> 800 rows), 3 s the unfused fallback."""
    fj, _ = frontends
    rng = np.random.default_rng(20260817)
    for secs in (2, 3):
        n = 16000 * secs
        batch = np.clip(rng.normal(0, 0.2, (2, n)), -1, 1).astype(np.float32)
        got = np.asarray(fj.features(batch))
        want = np.stack([to_micro_spectrogram_exact(w) for w in batch])
        assert got.shape == want.shape == (2, 49 + 50 * (secs - 1), 40)
        np.testing.assert_array_equal(got, want)


def test_tile_clips_mosaic_alignment():
    """Every tile size must be a multiple of 8 (Mosaic sublane rules for the
    (rpc*cb, step) input block AND the framing roll by cb*(rpc-1)), and the
    micro_jax gate must never admit a tile over the scoped-VMEM row budget."""
    from multilingual_kws_tpu.ops.pallas_fft import MAX_TILE_ROWS, tile_clips

    for rpc in range(1, 600):
        cb = tile_clips(rpc)
        assert cb % 8 == 0, (rpc, cb)
        assert (cb * (rpc - 1)) % 8 == 0 and (cb * rpc) % 8 == 0
    # the flagship 1-s clip keeps its measured-optimal tile
    assert tile_clips(50) == 8 and 50 * tile_clips(50) == 400 <= MAX_TILE_ROWS
    # 2 s fits the budget, 3 s must not (it OOMs scoped VMEM at 20.3 MiB)
    assert 100 * tile_clips(100) <= MAX_TILE_ROWS < 150 * tile_clips(150)
