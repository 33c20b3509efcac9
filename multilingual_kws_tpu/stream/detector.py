"""Streaming detection post-processor.

Semantic port of the reference SingleTargetRecognizeCommands
(single_target_recognize_commands.py:54-207): a sliding averaging window
over per-hop softmax outputs, reliability gating (minimum count / quarter
window span), threshold + label-change + suppression logic.

Re-designed for throughput: the reference replays the full inference array
once per threshold in Python (batch_streaming_analysis.py:126-177); here one
pass over time updates all thresholds at once with vectorized numpy state —
identical per-threshold outputs.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List, Sequence, Tuple

import numpy as np

SILENCE = "_silence_"


@dataclass(frozen=True)
class DetectorParams:
    """Defaults from reference StreamFlags (batch_streaming_analysis.py:27-47)."""

    average_window_duration_ms: int = 100
    suppression_ms: int = 500
    minimum_count: int = 4
    target_id: int = 2


def detect_all_thresholds(
    inferences: np.ndarray,  # (T, num_labels) softmax outputs per hop
    times_ms: np.ndarray,  # (T,) hop start times (int ms)
    thresholds: Sequence[float],
    params: DetectorParams = DetectorParams(),
    target_name: str = "target",
) -> Dict[float, Tuple[List[List], List[List]]]:
    """Returns {threshold: (found_words, found_words_w_confidences)} where
    found_words = [[label, time_ms], ...] — exactly the reference's replay
    output (calculate_streaming_accuracy, batch_streaming_analysis.py:140-177).
    """
    inferences = np.asarray(inferences)
    times_ms = np.asarray(times_ms, dtype=np.int64)
    t_steps = inferences.shape[0]
    thr = np.asarray(list(thresholds), dtype=np.float64)
    n_thr = thr.shape[0]

    # per-threshold detector state
    prev_is_target = np.zeros(n_thr, dtype=bool)  # previous top label == target
    prev_time = np.full(n_thr, -np.inf)

    found: Dict[float, Tuple[List[List], List[List]]] = {
        float(th): ([], []) for th in thr
    }

    window = params.average_window_duration_ms
    target = params.target_id

    start = 0  # earliest index still inside the averaging window
    run_sum = np.zeros(inferences.shape[1], dtype=np.float64)
    count = 0

    for ix in range(t_steps):
        now = times_ms[ix]
        run_sum += inferences[ix]
        count += 1
        time_limit = now - window
        while time_limit > times_ms[start]:
            run_sum -= inferences[start]
            start += 1
            count -= 1

        sample_duration = now - times_ms[start]
        if count < params.minimum_count or sample_duration < window / 4:
            continue  # unreliable: no state change (reference :132-141)

        score = run_sum[target] / count

        above = score > thr
        # reference: time_since_last_top = inf when previous top label is
        # _silence_ (single_target_recognize_commands.py:187-191), so from the
        # silence state a target fires immediately and a reset is free; from
        # the target state transitions gate on suppression_ms.
        elapsed_ok = (now - prev_time) > params.suppression_ms

        fire = above & (~prev_is_target)  # since==inf in silence state
        reset = prev_is_target & (score < thr) & elapsed_ok

        prev_time = np.where(fire, float(now), prev_time)
        prev_is_target = (prev_is_target & ~reset) | fire

        for ti in np.nonzero(fire)[0]:
            th = float(thr[ti])
            found[th][0].append([target_name, int(now)])
            found[th][1].append([target_name, int(now), float(score)])

    return found


class SingleTargetRecognizeCommands:
    """Streaming (online) single-threshold detector with the exact reference
    interface — for incremental/live use. Same math as detect_all_thresholds.
    """

    def __init__(
        self,
        labels: Sequence[str],
        average_window_duration_ms: int,
        detection_threshold: float,
        suppression_ms: int,
        minimum_count: int,
        target_id: int = 2,
    ):
        self._labels = list(labels)
        self._window = average_window_duration_ms
        self._threshold = detection_threshold
        self._suppression = suppression_ms
        self._minimum_count = minimum_count
        self._target_id = target_id
        self._times: List[int] = []
        self._scores: List[np.ndarray] = []
        self._prev_top = SILENCE
        self._prev_time = -np.inf

    def process_latest_result(self, latest: np.ndarray, now_ms: int):
        """Returns (found_command, score, is_new_command)."""
        if latest.shape[0] != len(self._labels):
            raise ValueError(
                f"results size {latest.shape[0]} != label count {len(self._labels)}"
            )
        if self._times and now_ms < self._times[0]:
            raise ValueError("results must be fed in increasing time order")
        self._times.append(int(now_ms))
        self._scores.append(np.asarray(latest, dtype=np.float64))
        time_limit = now_ms - self._window
        while time_limit > self._times[0]:
            self._times.pop(0)
            self._scores.pop(0)

        count = len(self._times)
        span = now_ms - self._times[0]
        if count < self._minimum_count or span < self._window / 4:
            return self._prev_top, 0.0, False

        score = float(np.mean([s[self._target_id] for s in self._scores]))
        label = self._labels[self._target_id] if score > self._threshold else SILENCE
        since = (
            np.inf
            if (self._prev_top == SILENCE or self._prev_time == -np.inf)
            else now_ms - self._prev_time
        )
        is_new = False
        if score > self._threshold and label != self._prev_top and since > self._suppression:
            self._prev_top = label
            self._prev_time = now_ms
            is_new = True
        elif score < self._threshold and label == SILENCE and since > self._suppression:
            self._prev_top = label
            self._prev_time = now_ms
            is_new = True
        return label, score, is_new
