"""Analysis layer: ROC math, EER, k-means distance filtering, sweeps, batch
driver resume semantics."""

import pickle

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from multilingual_kws_tpu.analysis.model_analysis import analyze_model, auc, calc_roc
from multilingual_kws_tpu.analysis.roc import eer, roc_sc, roc_single_target
from multilingual_kws_tpu.analysis.distance_filtering import (
    cluster_and_sort,
    kmeans_fit,
    make_embedding_fn,
)

from helpers import make_corpus, tiny_transfer_model


def test_roc_sc_monotone_and_endpoints():
    rng = np.random.default_rng(0)
    target = dict(
        correct=list(rng.uniform(0.7, 1.0, 200)),
        incorrect=list(rng.uniform(0.3, 0.6, 20)),
    )
    unknown = dict(
        correct=list(rng.uniform(0.5, 1.0, 300)),
        incorrect=list(rng.uniform(0.0, 0.4, 30)),
    )
    tprs, fprs, threshs = roc_sc(target, unknown)
    assert len(tprs) == len(fprs) == len(threshs) == 101
    # sweeping the threshold up can only reduce rates
    assert all(a >= b for a, b in zip(tprs, tprs[1:]))
    assert all(a >= b for a, b in zip(fprs, fprs[1:]))
    assert tprs[0] == pytest.approx(200 / 220)
    assert fprs[-1] == 0.0


def test_roc_single_target_eer():
    rng = np.random.default_rng(1)
    target_conf = rng.uniform(0.6, 1.0, 500)
    unknown_conf = rng.uniform(0.0, 0.4, 500)
    tprs, fprs, threshs, info = roc_single_target(target_conf, unknown_conf)
    # perfectly separable: EER ~ 0, f1 ~ 1 at the EER threshold
    err, thresh, f1, fpr, tpr = info
    assert f1 == pytest.approx(1.0)
    assert fpr == 0.0 and tpr == 1.0
    e, t = eer(target_conf, unknown_conf)
    assert e == 0.0 and 0.4 <= t <= 0.6


def test_calc_roc_and_auc():
    res = {
        "target_keywords": dict(correct=[0.9, 0.95, 0.8], incorrect=[0.5]),
        "oov": dict(correct=[0.9], incorrect=[0.2]),
        "unknown_training": dict(correct=[0.8, 0.7], incorrect=[]),
        "original_embedding": dict(correct=[0.6], incorrect=[0.3]),
        "words": ["w"],
        "val_acc": 1.0,
    }
    tprs, fprs = calc_roc(res)
    assert len(tprs) == 101
    assert tprs[0] == pytest.approx(3 / 4)
    assert fprs[0] == pytest.approx(2 / 6)
    a = auc(tprs, fprs)
    assert 0.0 <= a <= 1.0


def test_kmeans_clusters_separated_points():
    rng = np.random.default_rng(0)
    pts = np.concatenate(
        [rng.normal(c, 0.05, (40, 8)) for c in (0.0, 1.0, -1.0)]
    ).astype(np.float32)
    centers = np.asarray(kmeans_fit(jax.random.PRNGKey(0), jnp.asarray(pts), 3))
    got = np.sort(centers.mean(axis=1))
    np.testing.assert_allclose(got, [-1.0, 0.0, 1.0], atol=0.05)


@pytest.mark.slow
def test_cluster_and_sort_flags_outliers(tmp_path):
    """Outlier clips (a different keyword) must sort to the far end."""
    from multilingual_kws_tpu.utils.wav import write_wav
    from helpers import keyword_clip

    model = tiny_transfer_model()
    rng = jax.random.PRNGKey(0)
    variables = model.init(rng, jnp.zeros((1, 49, 40, 1), jnp.float32), train=False)
    emb_fn = make_embedding_fn(model, variables)

    files = []
    for i in range(14):
        p = tmp_path / f"good_{i}.wav"
        write_wav(p, keyword_clip("alpha", seed=100 + i))
        files.append(str(p))
    outliers = []
    for i in range(2):
        p = tmp_path / f"bad_{i}.wav"
        write_wav(p, keyword_clip("charlie", seed=200 + i))
        outliers.append(str(p))
        files.append(str(p))

    res = cluster_and_sort(files, emb_fn, seed=3, n_train=10, n_clusters=2)
    assert len(res["sorted_clips"]) == 6
    assert res["cluster_centers"].shape[0] == 2
    # distances ascending
    assert np.all(np.diff(res["distances"]) >= 0)


@pytest.mark.slow
def test_sweep_point_resume(tmp_path):
    """run_sweep_point writes hpsweep pickles and skips existing ones."""
    from multilingual_kws_tpu.analysis.sweeps import (
        SweepPoint,
        load_sweep_results,
        run_sweep_point,
    )

    corpus = make_corpus(tmp_path / "corpus", clips_per_word=8)
    data_dir = tmp_path / "corpus"
    sp = SweepPoint(
        ix=0, trial=0, target="alpha",
        train_files=corpus["alpha"][:5], val_files=corpus["alpha"][5:],
        unknown_files=corpus["unknown_files"],
        unknown_sample=["bravo"],
        num_epochs=1, num_batches=1, batch_size=8, primary_lr=1e-2,
    )
    out = run_sweep_point(
        sp, tmp_path / "sweep", data_dir,
        bg_datadir=corpus["bg_dir"], model=tiny_transfer_model(),
        n_target_eval=6, n_unknown_eval=6,
    )
    assert out is not None
    assert (tmp_path / "sweep/results/hpsweep_000.pkl").exists()
    # resume: existing pickle short-circuits
    assert run_sweep_point(sp, tmp_path / "sweep", data_dir) is None

    loaded = load_sweep_results(tmp_path / "sweep")
    assert len(loaded) == 1
    assert "tprs" in loaded[0] and len(loaded[0]["tprs"]) == 101


def test_frr_far_and_roc_band():
    from multilingual_kws_tpu.analysis.viz import frr_far_curves, roc_band

    rng = np.random.default_rng(0)
    c = frr_far_curves(rng.uniform(0.7, 1, 100), rng.uniform(0, 0.3, 100))
    assert c["frr"][0] == 0.0 and c["far"][0] == 1.0
    assert c["frr"][-1] == 1.0 and c["far"][-1] == 0.0

    curves = [
        ([1.0, 0.8, 0.2], [1.0, 0.5, 0.0]),
        ([1.0, 0.6, 0.4], [1.0, 0.4, 0.0]),
    ]
    band = roc_band(curves)
    assert band["num_words"] == 2
    assert np.all(band["tpr_max"] >= band["tpr_mean"])
    assert np.all(band["tpr_mean"] >= band["tpr_min"])


def test_confusion_matrix_and_top():
    from multilingual_kws_tpu.analysis.viz import confusion_matrix, top_confusions

    cm = confusion_matrix([0, 0, 1, 2, 2], [0, 1, 1, 2, 0], num_labels=3)
    assert cm[0, 0] == 1 and cm[0, 1] == 1 and cm[2, 0] == 1
    top = top_confusions(cm, ["a", "b", "c"], k=2)
    assert ("a", "b", 1) in top or ("c", "a", 1) in top


def test_detection_video_frames():
    from multilingual_kws_tpu.analysis.viz import detection_video_frames

    times = np.arange(0, 3000, 20)
    inf = np.zeros((len(times), 3))
    frames = detection_video_frames(
        inf, times, [["kw", 1500]], "kw", window_s=1.0, fps=2.0
    )
    assert len(frames) == int(times[-1] / 1000 * 2.0) + 1  # ~3 s at 2 fps
    f4 = frames[4]  # now = 2000ms, window [1000, 2000]
    assert f4["detections"] == [("kw", 1500)]
    assert f4["trace_times"].min() >= 1000
