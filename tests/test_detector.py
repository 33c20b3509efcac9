"""Detector + stats semantics (reference single_target_recognize_commands.py
and accuracy_utils.py)."""

import numpy as np
import pytest

from multilingual_kws_tpu.stream.detector import (
    DetectorParams,
    SingleTargetRecognizeCommands,
    detect_all_thresholds,
)
from multilingual_kws_tpu.stream.stats import StreamingAccuracyStats
from multilingual_kws_tpu.stream.tprfpr import get_groundtruth, tpr_fpr


def synth_inferences(seed=0, steps=600):
    """Random-walk target confidence with distinct bursts."""
    rng = np.random.default_rng(seed)
    conf = np.full(steps, 0.05)
    # bursts of high confidence at known hops
    for start, dur, level in [(50, 20, 0.97), (200, 25, 0.85), (400, 15, 0.99)]:
        conf[start : start + dur] = level + rng.normal(0, 0.01, dur)
    conf = np.clip(conf + rng.normal(0, 0.01, steps), 0, 1)
    inf = np.zeros((steps, 3))
    inf[:, 2] = conf
    inf[:, 0] = 1 - conf
    times = np.arange(steps) * 20
    return inf, times


def reference_replay(inferences, times, threshold, params, target_name="target"):
    """Replay through the online (reference-literal) detector."""
    det = SingleTargetRecognizeCommands(
        labels=["_silence_", "_unknown_", target_name],
        average_window_duration_ms=params.average_window_duration_ms,
        detection_threshold=threshold,
        suppression_ms=params.suppression_ms,
        minimum_count=params.minimum_count,
        target_id=params.target_id,
    )
    found = []
    for i in range(len(times)):
        label, score, is_new = det.process_latest_result(inferences[i], times[i])
        if is_new and label != "_silence_":
            found.append([label, int(times[i])])
    return found


@pytest.mark.parametrize("threshold", [0.5, 0.7, 0.9, 0.95])
def test_vectorized_matches_online(threshold):
    inf, times = synth_inferences()
    params = DetectorParams()
    vec = detect_all_thresholds(inf, times, [threshold], params, "target")
    online = reference_replay(inf, times, threshold, params)
    assert vec[threshold][0] == online


def test_vectorized_many_thresholds_consistent():
    inf, times = synth_inferences(seed=3)
    params = DetectorParams()
    ths = list(np.linspace(0.05, 1, 20))
    vec = detect_all_thresholds(inf, times, ths, params, "target")
    for th in ths:
        assert vec[float(th)][0] == reference_replay(inf, times, th, params)


def test_detection_count_and_times():
    inf, times = synth_inferences()
    out = detect_all_thresholds(inf, times, [0.9], DetectorParams(), "kw")
    found = out[0.9][0]
    # three bursts above 0.9: at hops 50, 400 (0.85 burst below threshold)
    assert len(found) == 2
    assert abs(found[0][1] - 50 * 20) < 200
    assert abs(found[1][1] - 400 * 20) < 200


def test_confidences_recorded():
    inf, times = synth_inferences()
    out = detect_all_thresholds(inf, times, [0.9], DetectorParams(), "kw")
    for label, t, conf in out[0.9][1]:
        assert label == "kw"
        assert conf > 0.9


def test_minimum_count_gate():
    """First few hops are unreliable (count < minimum_count)."""
    inf = np.zeros((3, 3))
    inf[:, 2] = 0.99
    times = np.arange(3) * 20
    out = detect_all_thresholds(inf, times, [0.5], DetectorParams(), "kw")
    assert out[0.5][0] == []


def test_suppression_blocks_refire():
    """After a reset within suppression the detector must not refire."""
    steps = 100
    inf = np.zeros((steps, 3))
    conf = np.zeros(steps)
    conf[10:20] = 0.99  # fire
    conf[22:30] = 0.99  # re-fire attempt right after a short dip (suppressed)
    inf[:, 2] = conf
    times = np.arange(steps) * 20
    out = detect_all_thresholds(inf, times, [0.9], DetectorParams(), "kw")
    found = out[0.9][0]
    online = reference_replay(inf, times, 0.9, DetectorParams(), target_name="kw")
    assert found == online
    assert len(found) == 1  # dip is < suppression_ms after prev_time


def test_stats_matching():
    stats = StreamingAccuracyStats(target_keyword="kw")
    stats.set_ground_truth([("kw", 1000), ("kw", 5000), ("kw", 9000)])
    found = [["kw", 1100], ["kw", 5300], ["kw", 7000]]  # 2 correct, 1 FP
    stats.calculate_accuracy_stats(found, -1, time_tolerance_ms=750)
    info, stat = stats.print_accuracy_stats(do_print=False)
    assert stat["matched"]["kw"] == 2
    assert stat["howmanyfp"] == 1
    assert stat["howmanyfn"] == 1  # kw@9000 missed
    assert stat["num_groundtruth_target"] == 3


def test_stats_wrong_label_counting():
    stats = StreamingAccuracyStats(target_keyword="kw")
    stats.set_ground_truth([("_unknown_", 2000), ("kw", 6000)])
    found = [["kw", 2100], ["kw", 6100]]
    stats.calculate_accuracy_stats(found, -1, time_tolerance_ms=750)
    _, stat = stats.print_accuracy_stats(do_print=False)
    # detection at 2100 matches the _unknown_ GT slot -> wrong
    assert stat["wrong"]["_unknown_"] == 1
    assert stat["matched"]["kw"] == 1


def test_tpr_fpr():
    found = [["kw", 1000], ["kw", 5000], ["kw", 20000]]
    gt = [900, 5100, 30000]
    r = tpr_fpr("kw", 0.9, found, gt, duration_s=3600, time_tolerance_ms=750)
    assert r["true_positives"] == 2
    assert r["false_positives"] == 1
    assert r["false_negatives"] == 1
    assert r["tpr"] == pytest.approx(2 / 3)
    assert r["false_accepts_per_hour"] == pytest.approx(1.0)


def test_get_groundtruth_tagging():
    found = [["kw", 1000, 0.95], ["kw", 8000, 0.92]]
    gt = [("kw", 1100), ("kw", 20000)]
    dets = get_groundtruth(found, ["kw"], gt)
    kinds = sorted(d["groundtruth"] for d in dets)
    assert kinds == ["fn", "fp", "tp"]


def test_get_groundtruth_multi_keyword():
    # The reference returns inside the first target iteration
    # (tpr_fpr.py:60) so a second keyword never gets tagged; our fix tags
    # every keyword and concatenates.
    found = [
        ["alpha", 1000, 0.95],
        ["beta", 3000, 0.91],
        ["alpha", 8000, 0.92],
        ["beta", 9000, 0.97],
    ]
    gt = [("alpha", 1100), ("beta", 9100), ("beta", 20000)]
    dets = get_groundtruth(found, ["alpha", "beta"], gt)
    by_kw = {}
    for d in dets:
        by_kw.setdefault(d["keyword"], []).append(d["groundtruth"])
    assert sorted(by_kw["alpha"]) == ["fp", "tp"]
    assert sorted(by_kw["beta"]) == ["fn", "fp", "tp"]


def test_get_groundtruth_unsorted_input():
    # early-break scan must survive unsorted detection/gt order
    found = [["kw", 8000, 0.92], ["kw", 1000, 0.95]]
    gt = [("kw", 20000), ("kw", 1100)]
    dets = get_groundtruth(found, ["kw"], gt)
    kinds = sorted(d["groundtruth"] for d in dets)
    assert kinds == ["fn", "fp", "tp"]


def _sequential_detect_all_thresholds(
    inferences, times_ms, thresholds, params, target_name="target"
):
    """Direct port of the pre-round-5 sequential replay (one pass over
    time, vectorized only across thresholds) — the behavioral spec the
    jump-automaton detect_all_thresholds must match exactly."""
    inferences = np.asarray(inferences)
    times_ms = np.asarray(times_ms, dtype=np.int64)
    thr = np.asarray(list(thresholds), dtype=np.float64)
    prev_is_target = np.zeros(thr.shape[0], dtype=bool)
    prev_time = np.full(thr.shape[0], -np.inf)
    found = {float(th): ([], []) for th in thr}
    window = params.average_window_duration_ms
    start, count = 0, 0
    run_sum = np.zeros(inferences.shape[1], dtype=np.float64)
    for ix in range(inferences.shape[0]):
        now = times_ms[ix]
        run_sum += inferences[ix]
        count += 1
        while now - window > times_ms[start]:
            run_sum -= inferences[start]
            start += 1
            count -= 1
        if count < params.minimum_count or now - times_ms[start] < window / 4:
            continue
        score = run_sum[params.target_id] / count
        above = score > thr
        elapsed_ok = (now - prev_time) > params.suppression_ms
        fire = above & ~prev_is_target
        reset = prev_is_target & (score < thr) & elapsed_ok
        prev_time = np.where(fire, float(now), prev_time)
        prev_is_target = (prev_is_target & ~reset) | fire
        for ti in np.nonzero(fire)[0]:
            th = float(thr[ti])
            found[th][0].append([target_name, int(now)])
            found[th][1].append([target_name, int(now), float(score)])
    return found


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_jump_automaton_matches_sequential_replay(seed):
    """Randomized differential test: bursty target-probability traces,
    irregular hop times, all 19 thresholds."""
    rng = np.random.default_rng(seed)
    t = 4000
    # bursty trace: smoothed square wave + noise, so scores cross every
    # threshold repeatedly and suppression/reset paths all exercise
    bursts = (rng.random(t // 50) > 0.6).repeat(50).astype(np.float64)
    p = np.clip(bursts * 0.9 + rng.normal(0, 0.15, t), 0, 1)
    inferences = np.stack([(1 - p) / 2, (1 - p) / 2, p], axis=1)
    # 20 ms hops with occasional gaps (chunk boundaries / dropped frames)
    gaps = np.where(rng.random(t) < 0.01, 400, 20)
    times = np.cumsum(gaps).astype(np.int64)
    thresholds = [round(0.05 * i, 2) for i in range(1, 20)]
    params = DetectorParams()
    got = detect_all_thresholds(inferences, times, thresholds, params)
    want = _sequential_detect_all_thresholds(
        inferences, times, thresholds, params
    )
    assert got.keys() == want.keys()
    for th in thresholds:
        assert got[float(th)][0] == want[float(th)][0], th
        g, w = got[float(th)][1], want[float(th)][1]
        assert len(g) == len(w)
        for a, b in zip(g, w):
            assert a[:2] == b[:2] and abs(a[2] - b[2]) < 1e-9, (th, a, b)


def test_jump_automaton_empty_and_unreliable():
    params = DetectorParams()
    got = detect_all_thresholds(
        np.zeros((0, 3)), np.zeros(0, np.int64), [0.5], params
    )
    assert got[0.5] == ([], [])
    # all hops unreliable (fewer than minimum_count)
    inf2 = np.tile([[0.0, 0.0, 1.0]], (2, 1))
    got = detect_all_thresholds(
        inf2, np.array([0, 20], np.int64), [0.5], params
    )
    assert got[0.5] == ([], [])
