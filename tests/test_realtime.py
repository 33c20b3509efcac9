"""Real-time incremental detector: chunked feeding must reproduce the
offline engine's detections regardless of chunk size."""

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # heavy e2e: run with --slow

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


def test_detections_found_near_groundtruth(stream_audio, predictor):
    audio, gt = stream_audio
    dets = run_chunked(audio, 1600, predictor)
    det_times = [d.time_ms for d in dets]
    # every ground-truth target has a detection within tolerance
    for t in gt:
        assert any(abs(dt - t) <= 750 for dt in det_times), (det_times, gt)


def test_chunk_size_invariance(stream_audio, predictor):
    audio, _ = stream_audio
    a = [(d.time_ms, round(d.confidence, 6)) for d in run_chunked(audio, 320, predictor)]
    b = [(d.time_ms, round(d.confidence, 6)) for d in run_chunked(audio, 7777, predictor)]
    c = [(d.time_ms, round(d.confidence, 6)) for d in run_chunked(audio, len(audio), predictor)]
    assert a == b == c


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
