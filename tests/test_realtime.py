"""Real-time incremental detector: chunked feeding must reproduce the
offline engine's detections regardless of chunk size."""

import numpy as np
import pytest

# heavy e2e tests carry pytest.mark.slow individually; reset/state tests are fast
slow = pytest.mark.slow

from multilingual_kws_tpu.stream.realtime import RealtimeDetector


class SpectralPredictor:
    """Deterministic stand-in model: softmax over negative distances to
    channel-profile templates of silence / charlie / alpha (time-pooled to be
    onset-invariant). No training, fully reproducible."""

    def __init__(self):
        from helpers import keyword_clip
        from multilingual_kws_tpu.ops.micro_exact import FrontendConfig
        from multilingual_kws_tpu.ops.micro_jax import MicroFrontendJax

        fe = MicroFrontendJax(FrontendConfig())

        def profile(clips):
            feats = np.asarray(fe.features(np.stack(clips)))  # (N, 49, 40)
            return feats.mean(axis=(0, 1))  # (40,) channel profile

        self.templates = np.stack([
            profile([np.random.default_rng(s).normal(0, 0.003, 16000)
                     .astype(np.float32) for s in range(3)]),       # silence
            profile([keyword_clip("charlie", seed=900 + i) for i in range(3)]),
            profile([keyword_clip("alpha", seed=800 + i) for i in range(3)]),
        ])  # (3, 40)

    def __call__(self, specs):
        specs = np.asarray(specs)[..., 0]  # (B, 49, 40)
        prof = specs.mean(axis=1)  # (B, 40)
        d = np.linalg.norm(prof[:, None] - self.templates[None], axis=-1)
        logits = -d / 2.0
        e = np.exp(logits - logits.max(axis=1, keepdims=True))
        return e / e.sum(axis=1, keepdims=True)


@pytest.fixture(scope="module")
def stream_audio():
    from helpers import keyword_clip
    from multilingual_kws_tpu.tools.stream_synth import synthesize_stream

    spec = synthesize_stream(
        "alpha",
        [keyword_clip("alpha", seed=100 + i) for i in range(3)],
        [keyword_clip("charlie", seed=200 + i) for i in range(3)],
        num_targets=3, num_distractors=3, seed=7, noise_rms=0.003,
    )
    return spec.waveform, [t for _, t in spec.labels]


@pytest.fixture(scope="module")
def predictor():
    return SpectralPredictor()


def run_chunked(audio, chunk, predictor, threshold=0.5):
    det = RealtimeDetector(
        "alpha", predictor, detection_threshold=threshold
    )
    out = []
    for i in range(0, len(audio), chunk):
        out.extend(det.feed(audio[i : i + chunk]))
    return out


@slow
def test_detections_found_near_groundtruth(stream_audio, predictor):
    audio, gt = stream_audio
    dets = run_chunked(audio, 1600, predictor)
    det_times = [d.time_ms for d in dets]
    # every ground-truth target has a detection within tolerance
    for t in gt:
        assert any(abs(dt - t) <= 750 for dt in det_times), (det_times, gt)


@slow
def test_chunk_size_invariance(stream_audio, predictor):
    audio, _ = stream_audio
    a = [(d.time_ms, round(d.confidence, 6)) for d in run_chunked(audio, 320, predictor)]
    b = [(d.time_ms, round(d.confidence, 6)) for d in run_chunked(audio, 7777, predictor)]
    c = [(d.time_ms, round(d.confidence, 6)) for d in run_chunked(audio, len(audio), predictor)]
    assert a == b == c


@slow
def test_matches_offline_engine(stream_audio, predictor):
    """Online detections == the offline engine at the same threshold."""
    from multilingual_kws_tpu.stream.detector import (
        DetectorParams,
        detect_all_thresholds,
    )
    from multilingual_kws_tpu.stream.engine import StreamFlags, featurize_stream

    audio, _ = stream_audio
    flags = StreamFlags(
        wav="", ground_truth="", target_keyword="alpha",
        detection_thresholds=[0.5],
    )
    windows = featurize_stream(audio, 16000, flags)
    probs = predictor(windows[..., None])
    times = np.arange(windows.shape[0]) * 20
    offline, _ = detect_all_thresholds(
        probs, times, [0.5], DetectorParams(), target_name="alpha"
    )[0.5]

    online = run_chunked(audio, 4000, predictor)
    assert [d.time_ms for d in online] == [t for _, t in offline]


class _FakeFrontend:
    """Constant-feature frontend so reset tests need no JAX/native compile."""

    def features(self, windows):
        return np.zeros((windows.shape[0], 49, 40), np.float32)


def _uniform_predict(specs):
    return np.full((np.asarray(specs).shape[0], 3), 1.0 / 3, np.float32)


def test_reset_preserves_constructor_settings():
    """Regression (VERDICT r3 weak #3): reset() used to drop non-default
    clip_duration_ms/clip_stride_ms, reverting to 1000 ms / 20 ms."""
    det = RealtimeDetector(
        "alpha",
        _uniform_predict,
        detection_threshold=0.7,
        clip_duration_ms=500,
        clip_stride_ms=40,
        average_window_duration_ms=200,
        suppression_ms=900,
        minimum_count=2,
        frontend=_FakeFrontend(),
    )
    before = (
        det.clip_samples,
        det.stride_samples,
        det.recognizer._threshold,
        det.recognizer._window,
        det.recognizer._suppression,
        det.recognizer._minimum_count,
    )
    det.feed(np.zeros(16000, np.float32))
    assert det.stream_position_ms > 0
    det.reset()
    after = (
        det.clip_samples,
        det.stride_samples,
        det.recognizer._threshold,
        det.recognizer._window,
        det.recognizer._suppression,
        det.recognizer._minimum_count,
    )
    assert after == before == (8000, 640, 0.7, 200, 900, 2)
    assert det.stream_position_ms == 0


def test_reset_restarts_window_clock():
    """After reset, window times restart from 0 with the configured hop."""
    times = []

    det = RealtimeDetector(
        "alpha",
        _uniform_predict,
        clip_duration_ms=500,
        clip_stride_ms=40,
        frontend=_FakeFrontend(),
    )

    def attach_spy():
        orig = det.recognizer.process_latest_result

        def spy(p, t_ms):
            times.append(t_ms)
            return orig(p, t_ms)

        det.recognizer.process_latest_result = spy

    attach_spy()
    det.feed(np.zeros(10000, np.float32))
    first = list(times)
    assert first == [0, 40, 80, 120]  # 40 ms hop honored
    det.reset()
    attach_spy()  # reset rebuilt the recognizer; spy the new one
    times.clear()
    det.feed(np.zeros(10000, np.float32))
    assert times == first  # identical window clock after reset
