"""Settings derivation parity with reference input_data.py:63-138."""

import pytest

from multilingual_kws_tpu.settings import (
    ModelSettings,
    next_power_of_two,
    prepare_model_settings,
    standard_microspeech_model_settings,
)


def test_standard_micro_settings():
    s = standard_microspeech_model_settings(3)
    assert s.desired_samples == 16000
    assert s.window_size_samples == 480
    assert s.window_stride_samples == 320
    assert s.spectrogram_length == 49
    assert s.fingerprint_width == 40
    assert s.fingerprint_size == 49 * 40
    assert s.label_count == 3
    assert s.sample_rate == 16000
    assert s.preprocess == "micro"
    assert s.average_window_width == -1
    assert s.feature_shape == (49, 40)
    assert s.fft_size == 512


def test_dict_contract_keys():
    # the reference's public model_settings dict keys (input_data.py:115-126)
    d = standard_microspeech_model_settings(761).to_dict()
    assert set(d.keys()) == {
        "desired_samples",
        "window_size_samples",
        "window_stride_samples",
        "spectrogram_length",
        "fingerprint_width",
        "fingerprint_size",
        "label_count",
        "sample_rate",
        "preprocess",
        "average_window_width",
    }
    assert d["label_count"] == 761


def test_average_mode_derivation():
    s = prepare_model_settings(10, 16000, 1000, 30, 20, 40, "average")
    # fft_bin_count = 257; width 6; ceil(257/6) = 43
    assert s.average_window_width == 6
    assert s.fingerprint_width == 43


def test_short_clip_zero_frames():
    s = prepare_model_settings(2, 16000, 20, 30, 20, 40, "micro")
    assert s.spectrogram_length == 0


def test_unknown_preprocess_raises():
    with pytest.raises(ValueError):
        prepare_model_settings(2, 16000, 1000, 30, 20, 40, "bogus")


def test_next_power_of_two():
    assert next_power_of_two(0) == 1
    assert next_power_of_two(1) == 1
    assert next_power_of_two(480) == 512
    assert next_power_of_two(512) == 512
    assert next_power_of_two(513) == 1024
