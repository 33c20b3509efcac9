"""DS-CNN family, hash splits, streaming ROC, dataperf harness, labeling."""

import csv

import numpy as np
import pytest

import jax
import jax.numpy as jnp


@pytest.mark.slow
def test_dscnn_forward_and_train_step():
    import optax

    from multilingual_kws_tpu.models.dscnn import DSCNN, dscnn_optimizer

    model = DSCNN(num_labels=5, filters=16, num_blocks=2)
    rng = jax.random.PRNGKey(0)
    x = jnp.zeros((2, 49, 40, 1))
    variables = model.init(rng, x, train=False)
    probs = model.apply(variables, x, train=False)
    assert probs.shape == (2, 5)
    np.testing.assert_allclose(np.asarray(probs).sum(-1), 1.0, atol=1e-5)

    # one optimizer step with the reference's weight-decayed step-LR Adam
    tx = dscnn_optimizer(steps_per_epoch=10)
    opt_state = tx.init(variables["params"])

    def loss_fn(params):
        p, mut = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            x, train=True, mutable=["batch_stats"],
            rngs={"dropout": jax.random.PRNGKey(1)},
        )
        return -jnp.log(p[:, 0] + 1e-7).mean()

    grads = jax.grad(loss_fn)(variables["params"])
    updates, _ = tx.update(grads, opt_state, variables["params"])
    new_params = optax.apply_updates(variables["params"], updates)
    # parameters moved somewhere in the tree
    moved = any(
        not np.array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(
            jax.tree_util.tree_leaves(variables["params"]),
            jax.tree_util.tree_leaves(new_params),
        )
    )
    assert moved


def test_which_set_stable_and_speaker_coherent():
    from multilingual_kws_tpu.data.splits import split_files, which_set

    # deterministic across calls
    assert which_set("abc_nohash_0.wav", 10, 10) == which_set(
        "abc_nohash_5.wav", 10, 10
    )
    files = [f"spk{i}_nohash_{j}.wav" for i in range(200) for j in range(2)]
    splits = split_files(files, 10, 10)
    n = sum(len(v) for v in splits.values())
    assert n == 400
    # rough proportions
    assert 0.04 < len(splits["validation"]) / n < 0.2
    assert 0.04 < len(splits["testing"]) / n < 0.2
    # same speaker never straddles splits
    for s, members in splits.items():
        for m in members:
            spk = m.split("_nohash_")[0]
            assert which_set(f"{spk}_nohash_99.wav", 10, 10) == s


def test_mswc_split_csv(tmp_path):
    from multilingual_kws_tpu.data.splits import read_mswc_splits, train_dev_test

    p = tmp_path / "en_splits.csv"
    with open(p, "w", newline="") as fh:
        w = csv.writer(fh)
        w.writerow(["SET", "LINK", "WORD", "VALID", "SPEAKER", "GENDER"])
        w.writerow(["TRAIN", "aachen/c1.opus", "hello", "True", "s1", "m"])
        w.writerow(["DEV", "aachen/c2.opus", "hello", "True", "s2", "f"])
        w.writerow(["TEST", "aachen/c3.opus", "hello", "True", "s3", "f"])
    s2s = read_mswc_splits(p)
    assert s2s["c2.opus"]["split"] == "dev"
    tdt = train_dev_test("hello", ["c1.opus", "c2.opus", "c3.opus"], s2s)
    assert tdt["train"] == ["hello/c1.wav"]
    assert tdt["dev"] == ["hello/c2.wav"]
    assert tdt["test"] == ["hello/c3.wav"]


def test_streaming_roc_and_operating_point():
    from multilingual_kws_tpu.analysis.streaming_roc import (
        operating_point,
        streaming_roc,
    )
    from multilingual_kws_tpu.stream.engine import StreamFlags

    flags = StreamFlags(
        wav="x.wav", ground_truth="", target_keyword="kw",
        detection_thresholds=[0.5, 0.9],
    )
    gt = [1000, 5000]
    results = {
        "kw": [
            (
                flags,
                {
                    # low threshold: both hits + one FA
                    0.5: ([["kw", 1100], ["kw", 5100], ["kw", 9000]], None),
                    # high threshold: one hit, no FA
                    0.9: ([["kw", 1100]], None),
                },
            )
        ]
    }
    roc = streaming_roc(results, "kw", gt, duration_s=3600)
    assert roc["thresholds"] == [0.5, 0.9]
    assert roc["tprs"] == [1.0, 0.5]
    assert roc["fa_per_hour"] == [1.0, 0.0]
    op = operating_point(roc, max_fa_per_hour=50)
    assert op["threshold"] == 0.5 and op["tpr"] == 1.0
    op_strict = operating_point(roc, max_fa_per_hour=0.5)
    assert op_strict["threshold"] == 0.9


def test_dataperf_harness_separable():
    from multilingual_kws_tpu.analysis.dataperf import (
        TestParams,
        candidate_words,
        run_harness,
    )

    assert candidate_words({"a": 600, "b": 100}, 500) == ["a"]

    rng = np.random.default_rng(0)
    # pool: targets cluster at +1, nontargets at -1; some mislabeled noise
    pool_t = rng.normal(1, 0.3, (80, 8))
    pool_n = rng.normal(-1, 0.3, (80, 8))
    pool = np.concatenate([pool_t, pool_n]).astype(np.float32)
    labels = np.concatenate([np.ones(80, int), np.zeros(80, int)])
    ev = np.concatenate(
        [rng.normal(1, 0.3, (40, 8)), rng.normal(-1, 0.3, (40, 8))]
    ).astype(np.float32)
    ev_labels = np.concatenate([np.ones(40, int), np.zeros(40, int)])

    def select_confident(vectors, n):
        # pick points far from the origin (a real selection heuristic)
        score = np.abs(vectors.sum(axis=1))
        return np.argsort(-score)[:n]

    out = run_harness(
        select_confident, pool, labels, ev, ev_labels, num_to_select=40,
        params=TestParams(num_splits_per_experiment=3),
    )
    assert out["selection"]["accuracy_mean"] >= 0.9
    assert out["random_baseline"]["accuracy_mean"] >= 0.8


def test_labeling_loop_scripted(tmp_path):
    from multilingual_kws_tpu.api.labeling import label_clips, read_distance_csv

    clips = [("a.wav", 0.1), ("b.wav", 0.5), ("c.wav", 0.9)]
    keys = iter(["g", "r", "b", "q"])  # rate a good, replay+bad b, quit at c
    played = []
    out_csv = tmp_path / "ratings.csv"
    res = label_clips(
        clips, out_csv,
        getch_fn=lambda: next(keys),
        play_fn=played.append,
        echo=lambda *_: None,
    )
    assert res == [("a.wav", 0.1, "good"), ("b.wav", 0.5, "bad")]
    assert played == ["a.wav", "b.wav", "b.wav", "c.wav"]
    rows = read_distance_csv(out_csv)
    assert rows[0] == ("a.wav", 0.1)


def test_frr_fa_view():
    from multilingual_kws_tpu.analysis.streaming_roc import frr_fa_view

    roc = dict(
        keyword="kw",
        thresholds=[0.5, 0.9],
        tprs=[1.0, 0.5],
        fa_per_hour=[36.0, 0.0],
        analyses=[
            {"false_rejections_per_instance": 0.0},
            {"false_rejections_per_instance": 0.5},
        ],
    )
    v = frr_fa_view(roc)
    assert v["false_rejection_rates"] == [0.0, 0.5]
    assert v["false_accepts_per_sec"] == [0.01, 0.0]


@pytest.mark.slow  # re-tiered r5: fast suite back under ~4 min (CLAUDE.md)
# 78 s: full-model bf16-vs-f32 sweep; test_bf16_inference_contract
# stays fast as the bf16 smoke
def test_bf16_compute_dtype_matches_f32_closely():
    """Mixed precision: dtype=bf16 models share the f32 param tree and
    produce logits close to the f32 path (params, BN stats, embedding and
    logits all stay f32 — only conv/dense/BN compute runs bf16)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from multilingual_kws_tpu.models.efficientnet import EfficientNet
    from multilingual_kws_tpu.models.kws_model import KWSEmbeddingModel

    def make(dtype):
        return KWSEmbeddingModel(
            num_labels=5,
            trunk=EfficientNet(
                width_coefficient=0.25, depth_coefficient=0.25, dtype=dtype
            ),
        )

    m32, mbf = make(jnp.float32), make(jnp.bfloat16)
    v = m32.init(jax.random.PRNGKey(0), jnp.zeros((1, 49, 40, 1)), train=False)
    assert jax.tree_util.tree_structure(v) == jax.tree_util.tree_structure(
        mbf.init(jax.random.PRNGKey(0), jnp.zeros((1, 49, 40, 1)), train=False)
    )
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 49, 40, 1)) * 5 + 10
    o32 = np.asarray(m32.apply(v, x, train=False))
    obf = np.asarray(mbf.apply(v, x, train=False))
    assert obf.dtype == np.float32
    scale = np.abs(o32).max() + 1e-9
    assert np.abs(o32 - obf).max() / scale < 0.1, (o32, obf)

    # embedding vector stays float32 too
    emb = mbf.apply(v, x, train=False, method=mbf.embed)
    assert emb.dtype == jnp.float32 and emb.shape == (2, 192)


def test_bf16_inference_contract():
    """compute_dtype="bfloat16" mixed precision for inference surfaces
    (transfer_learn / eval_stream_test / CLI --compute-dtype): the SAME f32
    params drive a bf16-compute model; softmax output stays f32 and close to
    the f32 forward (the head runs f32 by design — kws_model.py keeps the
    192-d embedding and both head denses in f32)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from helpers import tiny_transfer_model

    m32 = tiny_transfer_model()
    m16 = tiny_transfer_model(dtype=jnp.bfloat16)
    x = jax.random.normal(jax.random.PRNGKey(0), (4, 49, 40, 1)) * 2.0
    variables = m32.init(jax.random.PRNGKey(1), x, train=False)

    y32 = np.asarray(m32.apply(variables, x, train=False))
    y16 = np.asarray(m16.apply(variables, x, train=False))
    assert y16.dtype == np.float32  # softmax rows come home f32
    np.testing.assert_allclose(y16, y32, atol=0.05)
    np.testing.assert_allclose(y16.sum(-1), 1.0, atol=1e-3)

    # params remain f32 regardless of compute dtype (checkpoint compatible)
    v16 = m16.init(jax.random.PRNGKey(1), x, train=False)
    leaf = jax.tree_util.tree_leaves(v16["params"])[0]
    assert leaf.dtype == jnp.float32
