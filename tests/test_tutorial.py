"""The tutorial walkthrough (examples/tutorial.py) — the de-facto public
API contract of the reference intro notebook — must execute end to end."""

import sys
from pathlib import Path

import pytest

@pytest.mark.slow  # trains two tiny models (~1 min on CPU)
def test_tutorial_runs_end_to_end(tmp_path):
    sys.path.insert(0, "examples")
    try:
        from tutorial import run_tutorial
    finally:
        sys.path.pop(0)

    summary = run_tutorial(tmp_path / "tut", keyword="alpha", shots=5, tiny=True)
    assert summary["embedding_dim"] == 192
    assert 0.0 <= summary["val_accuracy"] <= 1.0
    assert (tmp_path / "tut" / "embedding_model" / "kws_metadata.json").exists()
    # the projection/visualization artifact is written when matplotlib exists
    try:
        import matplotlib  # noqa: F401

        assert (tmp_path / "tut" / "embeddings.png").exists()
    except ImportError:
        pass


def test_file2spec_contract():
    """file2spec (cell 13): settings-driven single-clip featurization."""
    import numpy as np

    from multilingual_kws_tpu.data.dataset import file2spec
    from multilingual_kws_tpu.ops.micro_exact import to_micro_spectrogram_exact
    from multilingual_kws_tpu.settings import standard_microspeech_model_settings
    from multilingual_kws_tpu.utils.wav import write_wav
    import tempfile

    rng = np.random.default_rng(0)
    wav = np.clip(rng.normal(0, 0.1, 12345), -1, 1).astype(np.float32)
    with tempfile.TemporaryDirectory() as d:
        p = Path(d) / "x.wav"
        write_wav(p, wav)
        spec = file2spec(standard_microspeech_model_settings(3), str(p))
    assert spec.shape == (49, 40)
    # matches the bit-exact host frontend on the decoded (int16-quantized)
    # padded clip
    from multilingual_kws_tpu.utils.wav import read_wav

    with tempfile.TemporaryDirectory() as d:
        p = Path(d) / "x.wav"
        write_wav(p, wav)
        decoded, _ = read_wav(str(p), desired_samples=16000)
    want = to_micro_spectrogram_exact(decoded)
    np.testing.assert_array_equal(spec, want)
