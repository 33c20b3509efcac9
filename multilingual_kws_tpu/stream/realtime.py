"""Online (real-time) keyword detection over incremental audio.

New serving capability with no reference counterpart (the reference only
scores prerecorded files, batch_streaming_analysis.py): push arbitrary-sized
audio chunks as they arrive, get detections out with ~1-window latency.

Design: a ring buffer holds the most recent clip_duration of samples; every
`clip_stride` new samples one 49x40 feature window is produced and scored,
and the reference's averaging/suppression detector
(stream/detector.SingleTargetRecognizeCommands) decides on firings. The
featurizer backend is pluggable:
 - the native C++ host frontend (default when built — lowest latency,
   no device round-trip)
 - the JAX frontend (batched across the windows completed by one feed())

Latency per detection = detector window (100 ms) behind real time; compute
per hop is ~1 window of frontend + model.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable, Dict, List, Optional, Sequence, Tuple

import numpy as np

from ..settings import SILENCE_LABEL, UNKNOWN_WORD_LABEL
from .detector import SingleTargetRecognizeCommands


@dataclass
class Detection:
    keyword: str
    time_ms: int
    confidence: float


class RealtimeDetector:
    """Incremental single-target detector session.

    predict_fn: jitted (B, 49, 40, 1) -> (B, 3) softmax (e.g.
    FinetuneResult.predict_fn()).
    """

    def __init__(
        self,
        target_keyword: str,
        predict_fn: Callable[[np.ndarray], np.ndarray],
        detection_threshold: float = 0.9,
        sample_rate: int = 16000,
        clip_duration_ms: int = 1000,
        clip_stride_ms: int = 20,
        average_window_duration_ms: int = 100,
        suppression_ms: int = 500,
        minimum_count: int = 4,
        frontend: Optional[object] = None,  # NativeMicroFrontend-like
    ):
        self.target_keyword = target_keyword
        self.predict_fn = predict_fn
        self.sample_rate = sample_rate
        self.clip_duration_ms = clip_duration_ms
        self.clip_stride_ms = clip_stride_ms
        self.clip_samples = clip_duration_ms * sample_rate // 1000
        self.stride_samples = clip_stride_ms * sample_rate // 1000

        if frontend is None:
            try:
                from ..native.host_frontend import NativeMicroFrontend

                frontend = NativeMicroFrontend()
            except Exception:  # no toolchain: JAX fallback
                from ..ops.micro_jax import default_frontend

                frontend = default_frontend()
        self.frontend = frontend

        self.recognizer = SingleTargetRecognizeCommands(
            labels=[SILENCE_LABEL, UNKNOWN_WORD_LABEL, target_keyword],
            average_window_duration_ms=average_window_duration_ms,
            detection_threshold=detection_threshold,
            suppression_ms=suppression_ms,
            minimum_count=minimum_count,
            target_id=2,
        )

        self._buffer = np.zeros(0, np.float32)
        self._consumed = 0  # samples consumed from the stream start
        self._next_window_start = 0  # absolute sample index of next window

    @property
    def stream_position_ms(self) -> int:
        return int(
            (self._consumed + self._buffer.shape[0]) * 1000 / self.sample_rate
        )

    def feed(self, audio_chunk: np.ndarray) -> List[Detection]:
        """Push float waveform samples in [-1, 1]; returns new detections."""
        self._buffer = np.concatenate(
            [self._buffer, np.asarray(audio_chunk, np.float32)]
        )
        windows = []
        window_times = []
        while True:
            rel = self._next_window_start - self._consumed
            if rel + self.clip_samples > self._buffer.shape[0]:
                break
            windows.append(self._buffer[rel : rel + self.clip_samples])
            window_times.append(
                int(self._next_window_start * 1000 / self.sample_rate)
            )
            self._next_window_start += self.stride_samples

        detections: List[Detection] = []
        if windows:
            specs = np.asarray(
                self.frontend.features(np.stack(windows)), np.float32
            )
            probs = np.asarray(self.predict_fn(specs[..., None]))
            for t_ms, p in zip(window_times, probs):
                label, score, is_new = self.recognizer.process_latest_result(
                    p, t_ms
                )
                if is_new and label == self.target_keyword:
                    detections.append(
                        Detection(self.target_keyword, t_ms, float(score))
                    )

        # drop samples no longer needed by any future window
        keep_from = self._next_window_start - self._consumed
        if keep_from > 0:
            self._buffer = self._buffer[keep_from:]
            self._consumed += keep_from
        return detections

    def reset(self) -> None:
        """Clear all stream/detector state; every constructor setting
        (including non-default clip_duration_ms/clip_stride_ms) survives."""
        self.__init__(
            self.target_keyword,
            self.predict_fn,
            detection_threshold=self.recognizer._threshold,
            sample_rate=self.sample_rate,
            clip_duration_ms=self.clip_duration_ms,
            clip_stride_ms=self.clip_stride_ms,
            suppression_ms=self.recognizer._suppression,
            average_window_duration_ms=self.recognizer._window,
            minimum_count=self.recognizer._minimum_count,
            frontend=self.frontend,
        )
