"""Native C++ micro frontend: bit-exactness vs the validated host
implementation (which golden tests pin to the real TFLite op), batch/stream
APIs, threading. Skipped when no C++ toolchain is available."""

import shutil

import numpy as np
import pytest

if shutil.which("g++") is None:
    pytest.skip("no g++ toolchain", allow_module_level=True)

from multilingual_kws_tpu.native.host_frontend import (
    NativeMicroFrontend,
    build_library,
)
from multilingual_kws_tpu.ops.micro_exact import FrontendConfig, MicroFrontend


@pytest.fixture(scope="module")
def frontends():
    build_library()
    return NativeMicroFrontend(FrontendConfig()), MicroFrontend(FrontendConfig())


def _exact_batch(fe_exact, batch):
    return np.stack(
        [fe_exact(b).astype(np.float32) * np.float32(10 / 256) for b in batch]
    )


def test_batch_bit_exact(frontends):
    native, exact = frontends
    rng = np.random.default_rng(0)
    cases = [
        np.clip(rng.normal(0, 0.2, (8, 16000)) * 32768, -32768, 32767),
        np.zeros((2, 16000)),
        np.full((1, 16000), 32767.0),
        np.clip(rng.normal(0, 0.001, (2, 16000)) * 32768, -32768, 32767),
    ]
    for arr in cases:
        batch = arr.astype(np.int16)
        got = native.features_from_int16(batch)
        ref = _exact_batch(exact, batch)
        np.testing.assert_array_equal(got, ref)


def test_single_clip_and_frame_count(frontends):
    native, exact = frontends
    rng = np.random.default_rng(1)
    clip = (rng.normal(0, 0.1, 16000) * 32768).clip(-32768, 32767).astype(np.int16)
    got = native.features_from_int16(clip)
    assert got.shape == (49, 40)
    assert native.num_frames(16000) == 49
    assert native.num_frames(480) == 1
    assert native.num_frames(479) == 0
    np.testing.assert_array_equal(
        got, exact(clip).astype(np.float32) * np.float32(10 / 256)
    )


def test_float_cast_matches_exact_path(frontends):
    native, _ = frontends
    from multilingual_kws_tpu.ops.micro_exact import to_micro_spectrogram_exact

    rng = np.random.default_rng(2)
    wav = rng.normal(0, 0.15, 16000).clip(-1, 1).astype(np.float32)
    np.testing.assert_array_equal(
        native.features(wav), to_micro_spectrogram_exact(wav)
    )


def test_stream_matches_per_window(frontends):
    native, exact = frontends
    rng = np.random.default_rng(3)
    stream = (rng.normal(0, 0.1, 3 * 16000) * 32768).clip(-32768, 32767).astype(
        np.int16
    )
    nw = (len(stream) - 16000) // 320
    got = native.stream_features(stream, nw)
    ref = np.stack(
        [
            exact(stream[w * 320 : w * 320 + 16000]).astype(np.float32)
            * np.float32(10 / 256)
            for w in range(nw)
        ]
    )
    np.testing.assert_array_equal(got, ref)


def test_thread_count_invariance(frontends):
    _, exact = frontends
    rng = np.random.default_rng(4)
    batch = (rng.normal(0, 0.2, (6, 16000)) * 32768).clip(-32768, 32767).astype(
        np.int16
    )
    one = NativeMicroFrontend(FrontendConfig(), num_threads=1)
    four = NativeMicroFrontend(FrontendConfig(), num_threads=4)
    np.testing.assert_array_equal(
        one.features_from_int16(batch), four.features_from_int16(batch)
    )


def test_featurize_files_native_backend(frontends, tmp_path):
    from multilingual_kws_tpu.train.evaluate import featurize_files
    from multilingual_kws_tpu.utils.wav import write_wav

    rng = np.random.default_rng(5)
    files = []
    for i in range(3):
        p = tmp_path / f"{i}.wav"
        write_wav(p, rng.normal(0, 0.1, 16000).clip(-1, 1).astype(np.float32))
        files.append(str(p))
    jax_feats = featurize_files(files, backend="jax")
    native_feats = featurize_files(files, backend="native")
    # native is bit-true to the op; the JAX path's f32 NR/PCAN scan has rare
    # cancellation outliers (documented in ops/micro_jax.py) — compare
    # statistically, not bitwise
    assert jax_feats.shape == native_feats.shape
    same = (jax_feats == native_feats).mean()
    assert same >= 0.995, f"only {same:.4f} bins identical"


def test_phase_timer():
    from multilingual_kws_tpu.utils.profiling import PhaseTimer

    t = PhaseTimer()
    with t.phase("outer"):
        with t.phase("outer/inner"):
            pass
    assert t.counts["outer"] == 1 and t.counts["outer/inner"] == 1
    assert t.totals["outer"] >= t.totals["outer/inner"]
    assert "outer" in t.report()


def test_native_wavloader_matches_python_reader(tmp_path):
    """native/wavloader.load_batch must be bit-identical to
    utils/wav.read_wav_int16 — incl. truncation, padding, stereo (channel
    0), and the Python fallback for 8-bit files."""
    import numpy as np
    import wave

    from multilingual_kws_tpu.native import wavloader
    from multilingual_kws_tpu.utils.wav import read_wav_int16, write_wav

    rng = np.random.default_rng(4)
    paths = []
    # mono, exact / short / long
    for i, n in enumerate((16000, 9000, 20000)):
        p = tmp_path / f"m{i}.wav"
        write_wav(p, rng.normal(0, 0.3, n).clip(-1, 1).astype(np.float32))
        paths.append(str(p))
    # stereo 16-bit: native must take channel 0
    st = (rng.normal(0, 0.3, (500, 2)).clip(-1, 1) * 32767).astype(np.int16)
    p = tmp_path / "stereo.wav"
    with wave.open(str(p), "wb") as w:
        w.setnchannels(2)
        w.setsampwidth(2)
        w.setframerate(16000)
        w.writeframes(st.tobytes())
    paths.append(str(p))
    # 8-bit: unsupported natively -> python fallback path
    p = tmp_path / "u8.wav"
    with wave.open(str(p), "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(1)
        w.setframerate(16000)
        w.writeframes((rng.integers(0, 256, 300).astype(np.uint8)).tobytes())
    paths.append(str(p))

    got = wavloader.load_batch(paths, desired_samples=16000)
    want = np.stack(
        [read_wav_int16(p, desired_samples=16000)[0] for p in paths]
    )
    np.testing.assert_array_equal(got, want)


def test_load_many_uses_cache_and_matches(tmp_path):
    import numpy as np

    from multilingual_kws_tpu.data.dataset import AudioDataset
    from multilingual_kws_tpu.settings import standard_microspeech_model_settings
    from multilingual_kws_tpu.utils.wav import write_wav

    rng = np.random.default_rng(5)
    files = []
    for i in range(6):
        p = tmp_path / f"c{i}.wav"
        write_wav(p, rng.normal(0, 0.2, 16000).clip(-1, 1).astype(np.float32))
        files.append(str(p))
    bg = tmp_path / "bg"
    bg.mkdir()
    write_wav(bg / "n.wav", rng.normal(0, 0.05, 32000).clip(-1, 1).astype(np.float32))
    ds = AudioDataset(
        model_settings=standard_microspeech_model_settings(3),
        commands=["w"], background_data_dir=bg, unknown_files=[], seed=0,
    )
    batch = ds._load_many(files + files[:2])  # duplicates + misses
    singles = np.stack([ds._load(f) for f in files + files[:2]])
    np.testing.assert_array_equal(batch, singles)
    # second call: pure cache hits
    np.testing.assert_array_equal(ds._load_many(files), singles[:6])
