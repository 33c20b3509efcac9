"""Augmentation semantics + AudioDataset pipeline + wav IO."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from multilingual_kws_tpu.ops.augment import (
    AugmentParams,
    SpecAugParams,
    add_background,
    augment_waveforms,
    random_timeshift,
    spec_augment,
)
from multilingual_kws_tpu.settings import standard_microspeech_model_settings
from multilingual_kws_tpu.utils.wav import read_wav, validate_sample_wav, wav_info, write_wav

from helpers import make_corpus


def test_wav_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    x = rng.normal(0, 0.2, 16000).clip(-1, 1).astype(np.float32)
    p = tmp_path / "a.wav"
    write_wav(p, x, 16000)
    y, sr = read_wav(p)
    assert sr == 16000
    # write scales by 32767 (+rounding), read divides by 32768
    np.testing.assert_allclose(x, y, atol=1.6 / 32768)
    info = wav_info(p)
    assert info.num_samples == 16000 and info.sample_rate == 16000
    validate_sample_wav(p)  # should not raise


def test_wav_decode_pad_truncate(tmp_path):
    x = np.ones(8000, np.float32) * 0.5
    p = tmp_path / "b.wav"
    write_wav(p, x)
    y, _ = read_wav(p, desired_samples=16000)
    assert y.shape == (16000,)
    assert np.all(y[8000:] == 0)  # zero-padded
    z, _ = read_wav(p, desired_samples=4000)
    assert z.shape == (4000,)


def test_wav_validation_raises(tmp_path):
    p = tmp_path / "bad.wav"
    write_wav(p, np.zeros(8000, np.float32))
    with pytest.raises(ValueError):
        validate_sample_wav(p)


def test_timeshift_preserves_content():
    key = jax.random.PRNGKey(0)
    x = np.zeros((4, 16000), np.float32)
    x[:, 8000] = 1.0  # impulse at center
    out = np.asarray(random_timeshift(key, jnp.asarray(x), 1600))
    for row in out:
        (pos,) = np.nonzero(row)
        assert abs(int(pos[0]) - 8000) <= 1600


def test_timeshift_matches_dynamic_slice_reference():
    """The gather-free binary-shift decomposition must be bit-identical to
    the naive per-row dynamic slice it replaced (same RNG draws)."""
    from multilingual_kws_tpu.ops.augment import _per_row_slice

    key = jax.random.PRNGKey(7)
    x = jnp.asarray(
        np.random.default_rng(3).normal(0, 0.3, (16, 16000)).astype(np.float32)
    )
    max_shift = 1600
    shifts = jax.random.randint(key, (16,), -max_shift, max_shift)
    padded = jnp.pad(x, ((0, 0), (max_shift, max_shift)))

    def take(row, s):
        return jax.lax.dynamic_slice(row, (max_shift - s,), (16000,))

    want = np.asarray(jax.vmap(take)(padded, shifts))
    got = np.asarray(random_timeshift(key, x, max_shift))
    np.testing.assert_array_equal(got, want)
    # and at the extreme starts (0 and 2*max_shift)
    for s in (-max_shift, 0, max_shift - 1):
        ss = jnp.full((16,), s, jnp.int32)
        want = np.asarray(jax.vmap(take)(padded, ss))
        got = np.asarray(_per_row_slice(padded, max_shift - ss, 16000, 2 * max_shift))
        np.testing.assert_array_equal(got, want)


def test_background_crop_matches_dynamic_slice_reference():
    """Blocked coarse-gather + fine-shift crop must be bit-identical to the
    naive per-row dynamic slice, pre-padded bank or not."""
    from multilingual_kws_tpu.ops.augment import (
        pad_background_bank,
        random_background_crop,
    )

    rng = np.random.default_rng(5)
    n_bg, num_samples = 3, 16000
    sizes = np.array([61234, 17000, 16001], np.int32)
    bank = np.zeros((n_bg, int(sizes.max())), np.float32)
    for i, n in enumerate(sizes):
        bank[i, :n] = rng.normal(0, 0.1, n).astype(np.float32)

    key = jax.random.PRNGKey(11)
    batch = 32

    def naive(bg_data):
        k1, k2 = jax.random.split(key)
        idx = jax.random.randint(k1, (batch,), 0, bg_data.shape[0])
        max_off = jnp.maximum(jnp.asarray(sizes)[idx] - num_samples, 1)
        off = jax.random.randint(k2, (batch,), 0, 2**30) % max_off

        arr = jnp.asarray(bg_data)

        def crop(i, o):
            return jax.lax.dynamic_slice(arr[i], (o,), (num_samples,))

        return np.asarray(jax.vmap(crop)(idx, off))

    want = naive(bank)
    got_raw = np.asarray(
        random_background_crop(
            key, jnp.asarray(bank), jnp.asarray(sizes), num_samples, batch
        )
    )
    padded = pad_background_bank(bank, num_samples)
    got_pad = np.asarray(
        random_background_crop(
            key, jnp.asarray(padded), jnp.asarray(sizes), num_samples, batch
        )
    )
    np.testing.assert_array_equal(got_raw, want)
    np.testing.assert_array_equal(got_pad, want)


def test_add_background_rms_equalized():
    fg = (0.3 * np.sin(2 * np.pi * 440 * np.arange(16000) / 16000))[None].astype(
        np.float32
    )
    bg = (0.01 * np.random.default_rng(0).normal(0, 1, (1, 16000))).astype(np.float32)
    out = np.asarray(
        add_background(jnp.asarray(fg), jnp.asarray(bg), jnp.asarray([1.0]))
    )
    # bg scaled up to fg's rms then added: rms grows noticeably
    assert np.sqrt((out**2).mean()) > np.sqrt((fg**2).mean()) * 1.2
    assert np.abs(out).max() <= 1.0


def test_add_background_zero_bg():
    fg = np.ones((1, 100), np.float32) * 0.5
    bg = np.zeros((1, 100), np.float32)
    out = np.asarray(add_background(jnp.asarray(fg), jnp.asarray(bg), jnp.asarray([0.5])))
    np.testing.assert_allclose(out, fg)


def test_spec_augment_masks():
    key = jax.random.PRNGKey(1)
    specs = jnp.ones((8, 49, 40))
    out = np.asarray(spec_augment(key, specs, SpecAugParams(percentage=100.0)))
    assert out.shape == (8, 49, 40)
    assert out.min() == 0.0 or (out == 1).all()  # masks zero entries
    # masked area bounded: at most 2 freq cols * 2px + 2 time rows * 2px
    for s in out:
        zero_cols = (s == 0).all(axis=0).sum()
        zero_rows = (s == 0).all(axis=1).sum()
        assert zero_cols <= 4 and zero_rows <= 4


def test_spec_augment_disabled():
    key = jax.random.PRNGKey(1)
    specs = jnp.ones((4, 49, 40))
    out = np.asarray(spec_augment(key, specs, SpecAugParams(percentage=0.0)))
    assert (out == 1).all()


def test_audio_dataset_label_order(tmp_path):
    from multilingual_kws_tpu.data.dataset import AudioDataset

    corpus = make_corpus(tmp_path, clips_per_word=3)
    settings = standard_microspeech_model_settings(3)
    ds = AudioDataset(
        model_settings=settings,
        commands=["alpha"],
        background_data_dir=corpus["bg_dir"],
        unknown_files=corpus["unknown_files"],
        unknown_percentage=50.0,
        seed=0,
    )
    # reference label ordering contract (input_data.py:196-206)
    assert ds.commands == ["_silence_", "_unknown_", "alpha"]


def test_audio_dataset_batches(tmp_path):
    from multilingual_kws_tpu.data.dataset import AudioDataset

    corpus = make_corpus(tmp_path, clips_per_word=3)
    settings = standard_microspeech_model_settings(3)
    ds = AudioDataset(
        model_settings=settings,
        commands=["alpha"],
        background_data_dir=corpus["bg_dir"],
        unknown_files=corpus["unknown_files"],
        unknown_percentage=50.0,
        silence_percentage=10.0,
        seed=0,
    )
    batches = list(
        ds.train_batches(corpus["alpha"], batch_size=16, num_steps=2)
    )
    assert len(batches) == 2
    specs, labels = batches[0]
    assert specs.shape == (16, 49, 40, 1)
    assert labels.shape == (16,)
    lbl = np.asarray(labels)
    assert set(np.unique(lbl)).issubset({0, 1, 2})
    # with 50% unknown there should be some unknown labels across 32 draws
    all_lbl = np.concatenate([np.asarray(l) for _, l in batches])
    assert (all_lbl == 1).sum() >= 3

    evals = list(ds.eval_batches(corpus["alpha"], batch_size=8))
    total = sum(l.shape[0] for _, l in evals)
    assert total == 3
    assert all((np.asarray(l) == 2).all() for _, l in evals)
