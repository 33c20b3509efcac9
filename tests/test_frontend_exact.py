"""Bit-exactness of the numpy micro frontend vs golden features from the
real TFLite microfrontend op (captured by tools/capture_golden.py).

North-star requirement: bit-comparable 49x40 features (BASELINE.md).
"""

from pathlib import Path

import numpy as np
import pytest

from multilingual_kws_tpu.ops.micro_exact import (
    FrontendConfig,
    MicroFrontend,
    to_micro_spectrogram_exact,
)

GOLDEN = Path(__file__).parent / "golden" / "microfrontend_golden.npz"

CONFIGS = {
    "default40": FrontendConfig(),
    "micro32": FrontendConfig(window_size_ms=25, window_step_ms=10, num_channels=32),
    "nopcan": FrontendConfig(enable_pcan=False),
    "nolog": FrontendConfig(enable_log=False),
    "raw": FrontendConfig(
        enable_pcan=False, enable_log=False, min_signal_remaining=1.0
    ),
}

WAVEFORMS = [
    "zeros",
    "sine440",
    "loud1k",
    "fullscale",
    "noise",
    "quiet",
    "chirp",
    "impulses",
    "speechlike",
    "mix",
    "long_mix",
    "short",
]


@pytest.fixture(scope="module")
def golden():
    assert GOLDEN.exists(), "golden data missing; run tools/capture_golden.py"
    return np.load(GOLDEN)


@pytest.mark.parametrize("cname", list(CONFIGS))
@pytest.mark.parametrize("wname", WAVEFORMS)
def test_bit_exact(golden, cname, wname):
    audio = golden[f"audio_{wname}"]
    ref = golden[f"feat_{cname}_{wname}"]
    fe = MicroFrontend(CONFIGS[cname])
    mine = fe(audio).astype(np.float32)
    np.testing.assert_array_equal(mine, ref)


@pytest.mark.parametrize("wname", WAVEFORMS)
def test_to_micro_spectrogram_semantics(golden, wname):
    """Full reference to_micro_spectrogram: float->int16 cast + 10/256 scale."""
    wav = golden[f"floataudio_{wname}"]
    ref = golden[f"spec_{wname}"]
    mine = to_micro_spectrogram_exact(wav)
    np.testing.assert_array_equal(mine, ref)


def test_frame_counts():
    fe = MicroFrontend(FrontendConfig())
    assert fe(np.zeros(16000, np.int16)).shape == (49, 40)
    assert fe(np.zeros(480, np.int16)).shape == (1, 40)
    assert fe(np.zeros(479, np.int16)).shape == (0, 40)
    assert fe(np.zeros(800, np.int16)).shape == (2, 40)


def test_feature_range():
    fe = MicroFrontend(FrontendConfig())
    rng = np.random.default_rng(0)
    audio = (rng.normal(0, 0.1, 16000).clip(-1, 1) * 32768).astype(np.int16)
    feats = fe(audio)
    assert feats.min() >= 0
    assert feats.max() <= 0xFFFF
