"""Fused Pallas augmentation kernel: interpret-mode parity with the XLA
augment path (ops/augment.augment_waveforms + quantize)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from multilingual_kws_tpu.ops.augment import (
    AugmentParams,
    augment_waveforms,
    pad_background_bank,
)
from multilingual_kws_tpu.ops.pallas_augment import augment_quantize


def _fixture(b=24, t=16000, seed=0):
    rng = np.random.default_rng(seed)
    fg16 = (
        (rng.normal(0, 0.15, (b, t)) * 32768).clip(-32768, 32767)
    ).astype(np.int16)
    is_sil = np.zeros(b, bool)
    is_sil[min(3, b - 1)] = True
    fg16[is_sil] = 0
    sizes = np.array([61234, 17000, 16001], np.int32)
    bank = np.zeros((3, int(sizes.max())), np.float32)
    for i, n in enumerate(sizes):
        bank[i, :n] = rng.normal(0, 0.1, n).astype(np.float32)
    return fg16, is_sil, pad_background_bank(bank, t), sizes


def _xla_reference(key, fg16, is_sil, bank, sizes, params):
    wav = augment_waveforms(
        key,
        jnp.asarray(fg16, jnp.float32) / 32768.0,
        jnp.asarray(is_sil),
        jnp.asarray(bank),
        jnp.asarray(sizes),
        params,
    )
    return np.asarray(
        jnp.clip(jnp.trunc(wav * 32768.0), -32768.0, 32767.0).astype(jnp.int32)
    )


def test_kernel_matches_xla_augment_interpret():
    """Same key -> same draws; waveform movement bit-identical, float mix
    within 1 int16 step on a vanishing fraction of samples (RMS reduction
    order / FMA fusion ulp)."""
    fg16, is_sil, bank, sizes = _fixture()
    params = AugmentParams()
    key = jax.random.PRNGKey(42)
    want = _xla_reference(key, fg16, is_sil, bank, sizes, params)
    got = np.asarray(
        augment_quantize(
            key,
            jnp.asarray(fg16),
            jnp.asarray(is_sil),
            jnp.asarray(bank),
            jnp.asarray(sizes),
            params,
            interpret=True,
        )
    )
    assert got.shape == want.shape
    diff = got != want
    assert np.abs(got - want).max() <= 1
    assert diff.mean() < 1e-4, f"{diff.sum()} samples differ"


def test_kernel_no_timeshift_and_odd_batch():
    """max_shift=0 skips the shift machinery; batch not a multiple of the
    tile size exercises the padding path."""
    fg16, is_sil, bank, sizes = _fixture(b=11, seed=3)
    params = AugmentParams(time_shift_samples=0)
    key = jax.random.PRNGKey(7)
    want = _xla_reference(key, fg16, is_sil, bank, sizes, params)
    got = np.asarray(
        augment_quantize(
            key,
            jnp.asarray(fg16),
            jnp.asarray(is_sil),
            jnp.asarray(bank),
            jnp.asarray(sizes),
            params,
            interpret=True,
        )
    )
    assert got.shape == (11, 16000)
    assert np.abs(got - want).max() <= 1
    assert (got != want).mean() < 1e-4


@pytest.mark.slow  # re-tiered r5: fast suite back under ~4 min (CLAUDE.md)
# 11 s edge case; test_kernel_matches_xla_augment_interpret stays fast
def test_kernel_unpadded_bank():
    """A bank narrower than the blocked-window requirement takes the
    in-call pad branch and still crops exactly."""
    rng = np.random.default_rng(9)
    sizes = np.array([16050, 16001], np.int32)
    bank = np.zeros((2, 16050), np.float32)
    for i, n in enumerate(sizes):
        bank[i, :n] = rng.normal(0, 0.1, n).astype(np.float32)
    fg16 = (rng.normal(0, 0.1, (8, 16000)) * 32768).astype(np.int16)
    is_sil = np.zeros(8, bool)
    params = AugmentParams()
    key = jax.random.PRNGKey(1)
    want = _xla_reference(key, fg16, is_sil, bank, sizes, params)
    got = np.asarray(
        augment_quantize(
            key,
            jnp.asarray(fg16),
            jnp.asarray(is_sil),
            jnp.asarray(bank),
            jnp.asarray(sizes),
            params,
            interpret=True,
        )
    )
    assert np.abs(got - want).max() <= 1
    assert (got != want).mean() < 1e-4


def test_dataset_routes_pallas_augment(monkeypatch, tmp_path):
    """_augment_featurize with a use_pallas frontend routes through the
    kernel (interpret-forced) and yields features matching the XLA route
    up to the 1-int16-step mix tolerance."""
    import multilingual_kws_tpu.data.dataset as dsmod
    from multilingual_kws_tpu.ops.micro_exact import FrontendConfig
    from multilingual_kws_tpu.ops.micro_jax import MicroFrontendJax

    fg16, is_sil, bank, sizes = _fixture(b=8, seed=5)
    params = AugmentParams()
    key = jax.random.PRNGKey(11)

    calls = {}
    real = augment_quantize

    def spy(*a, **k):
        calls["hit"] = True
        k["interpret"] = True
        return real(*a, **k)

    monkeypatch.setattr(dsmod, "pallas_augment_quantize", spy)

    # RoutingFrontend: use_pallas=True so _augment_featurize takes the
    # kernel route (the spy forces interpret on CPU), while featurization
    # itself delegates to a plain XLA frontend — the augment routing is
    # what's under test, not the frontend kernel.
    class RoutingFrontend:
        use_pallas = True

        @staticmethod
        def features_from_int16(quant):
            return fe_xla.features_from_int16(quant)

        @staticmethod
        def features(wav):
            return fe_xla.features(wav)

    fe_xla = MicroFrontendJax(FrontendConfig(), use_pallas=False)

    got = np.asarray(
        dsmod._augment_featurize(
            RoutingFrontend, params, key, jnp.asarray(fg16),
            jnp.asarray(is_sil), jnp.asarray(bank), jnp.asarray(sizes),
        )
    )
    assert calls.get("hit"), "kernel path not taken"

    fe_xla2 = MicroFrontendJax(FrontendConfig(), use_pallas=False)
    want = np.asarray(
        dsmod._augment_featurize(
            fe_xla2, params, key, jnp.asarray(fg16),
            jnp.asarray(is_sil), jnp.asarray(bank), jnp.asarray(sizes),
        )
    )
    assert got.shape == want.shape
    # features from quantized audio differing by <=1 int16 step on <1e-4
    # of samples: allow a small fraction of feature elements to move
    frac = (got != want).mean()
    assert frac < 5e-3, f"feature mismatch fraction {frac}"
