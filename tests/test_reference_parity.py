"""Differential accuracy/behavior parity vs the ACTUAL reference code.

These tests import /root/reference/multilingual_kws (TF/Keras + the real
TFLite microfrontend op) and run it head-to-head with this framework:

1. exec parity — a reference-TRAINED transfer model is imported and must
   produce the same confidences through our frontend+model stack.
2. streaming parity — reference calculate_streaming_accuracy vs our
   stream engine on the same synthetic stream: near-identical softmax
   streams, identical detections; our detector replayed on the REFERENCE's
   inferences must match the reference detections exactly.
3. training-distribution parity — both sides fine-tune from the SAME base
   weights over several seeds; val-accuracy and confidence-separation
   distributions must overlap.

All marked slow (TF on the 1-core host). The 10-seed PARITY.md numbers
come from tools_dev/parity_experiment.py using the same harness.
"""

import sys
from pathlib import Path

import numpy as np
import pytest

pytestmark = pytest.mark.slow

tf = pytest.importorskip("tensorflow")

sys.path.insert(0, str(Path(__file__).resolve().parent))

import parity_harness as ph  # noqa: E402
from helpers import make_corpus, make_fewshot_hard_corpus  # noqa: E402

if not ph.reference_available():  # pragma: no cover
    pytest.skip("reference checkout not present", allow_module_level=True)

TARGET = "alpha"
WORDS = ["alpha", "bravo", "charlie"]
N_SHOTS = 5


@pytest.fixture(scope="module")
def workspace(tmp_path_factory):
    """Corpus + briefly-pretrained shared base model (.keras + live)."""
    tmp = tmp_path_factory.mktemp("refparity")
    corpus = make_corpus(tmp / "corpus", clips_per_word=14)
    base_path = tmp / "base_model.keras"
    keras_base = ph.pretrain_base_model(
        corpus, WORDS, base_path, steps=150, batch_size=32, seed=0
    )
    imported = ph.import_base_to_flax(keras_base)
    train_files = corpus[TARGET][:N_SHOTS]
    val_files = corpus[TARGET][N_SHOTS:]
    nontarget_files = corpus["bravo"] + corpus["charlie"]
    return dict(
        tmp=tmp,
        corpus=corpus,
        base_path=str(base_path),
        keras_base=keras_base,
        imported=imported,
        train_files=train_files,
        val_files=val_files,
        nontarget_files=nontarget_files,
    )


@pytest.fixture(scope="module")
def ref_run(workspace):
    """One reference few-shot fine-tune (shared by exec + streaming tests)."""
    w = workspace
    return ph.ref_transfer_learn(
        TARGET,
        w["train_files"],
        w["val_files"],
        w["nontarget_files"],
        w["corpus"]["unknown_files"],
        w["corpus"]["bg_dir"],
        w["base_path"],
        seed=123,
    )


def test_imported_base_embedding_matches_keras(workspace):
    """The shared base weights produce the same 192-d embedding through
    both stacks on reference-featurized inputs (import-path sanity for
    everything downstream)."""
    w = workspace
    specs = ph.ref_featurize(w["val_files"][:4])[..., None]
    emb_keras = tf.keras.Model(
        w["keras_base"].input,
        w["keras_base"].get_layer("parity_embedding").output,
    )
    ref_emb = emb_keras(specs, training=False).numpy()

    from multilingual_kws_tpu.models.efficientnet import EfficientNetB0
    from multilingual_kws_tpu.models.kws_model import KWSEmbeddingModel

    imp = w["imported"]
    module = KWSEmbeddingModel(
        num_labels=imp["num_outputs"],
        trunk=EfficientNetB0(
            input_scale=imp["input_scale"], input_bias=imp["input_bias"]
        ),
    )
    _, got = module.apply(
        {"params": imp["params"], "batch_stats": imp["batch_stats"]},
        specs,
        train=False,
        return_embedding=True,
    )
    np.testing.assert_allclose(np.asarray(got), ref_emb, atol=2e-3, rtol=1e-3)


def test_exec_parity_reference_trained_model(workspace, ref_run):
    """A reference-TRAINED transfer model imported into our stack yields
    the same confidences on the same files (frontend + model exec parity
    on real artifacts, not random weights)."""
    from multilingual_kws_tpu.models.import_tf import import_keras_kws_model
    from multilingual_kws_tpu.models.efficientnet import EfficientNetB0
    from multilingual_kws_tpu.models.kws_model import KWSTransferModel
    import jax

    w = workspace
    imported = import_keras_kws_model(ref_run.model)
    assert imported["kind"] == "transfer"
    model = KWSTransferModel(
        trunk=EfficientNetB0(
            input_scale=imported["input_scale"],
            input_bias=imported["input_bias"],
        ),
        num_categories=3,
    )
    variables = {
        "params": imported["params"],
        "batch_stats": imported["batch_stats"],
    }
    predict = jax.jit(lambda s: model.apply(variables, s, train=False))

    files = w["val_files"] + w["nontarget_files"][:6]
    # identical inputs: reference-op features through both models
    specs = ph.ref_featurize(files)[..., None]
    ref_preds = ref_run.model.predict(specs, verbose=0)
    our_preds = np.asarray(predict(specs))
    np.testing.assert_allclose(our_preds, ref_preds, atol=2e-3, rtol=1e-3)

    # now OUR frontend instead of the reference op: confidences must stay
    # within a grid-step-scale tolerance
    from multilingual_kws_tpu.train.evaluate import featurize_files

    our_specs = featurize_files(files)[..., None]
    assert np.abs(our_specs - specs).max() <= 0.04 + 1e-6  # one 10/256 step
    our_preds2 = np.asarray(predict(our_specs))
    np.testing.assert_allclose(our_preds2, ref_preds, atol=2e-2, rtol=1e-2)


def test_streaming_parity(workspace, ref_run, tmp_path):
    """Reference streaming engine vs ours on one synthetic stream, same
    trained model: softmax streams close, detections identical; our
    detector on the reference's inferences replays its detections."""
    from multilingual_kws_tpu.tools.stream_synth import (
        synthesize_stream,
        write_stream,
    )
    from multilingual_kws_tpu.utils.wav import read_wav

    w = workspace
    wav = tmp_path / "stream.wav"
    labels = tmp_path / "labels.txt"
    spec = synthesize_stream(
        target_name=TARGET,
        target_clips=[read_wav(f)[0] for f in w["val_files"][:4]],
        distractor_clips=[read_wav(f)[0] for f in w["nontarget_files"][:8]],
        num_targets=4,
        num_distractors=8,
        seed=7,
    )
    write_stream(spec, wav, labels)
    thresholds = [0.35, 0.6, 0.85]

    ref_found, ref_inf = ph.ref_streaming(
        ref_run.model, str(wav), str(labels), TARGET, thresholds
    )
    our_found, our_inf = ph.our_streaming_from_keras_weights(
        ref_run.model, str(wav), str(labels), TARGET, thresholds
    )

    assert our_inf.shape == ref_inf.shape
    # same window timing, same features (one grid step), same model
    assert np.abs(our_inf - ref_inf).max() < 2e-2

    # detector semantic parity in isolation: our detector replayed on the
    # REFERENCE inferences must reproduce the reference detections exactly
    our_on_ref, _ = ph.our_streaming_from_keras_weights(
        ref_run.model, str(wav), str(labels), TARGET, thresholds,
        existing_inferences=ref_inf,
    )
    for t in thresholds:
        ref_times = [time for _w, time in ref_found[t]]
        got_times = [time for _w, time in our_on_ref[t]]
        assert got_times == ref_times, (t, got_times, ref_times)

    # end-to-end (our frontend): detection times within one hop of the
    # reference's
    for t in thresholds:
        ref_times = [time for _w, time in ref_found[t]]
        got_times = [time for _w, time in our_found[t]]
        assert len(got_times) == len(ref_times), (t, got_times, ref_times)
        for a, b in zip(got_times, ref_times):
            assert abs(a - b) <= 40, (t, got_times, ref_times)


def test_training_distribution_parity(workspace):
    """Both sides fine-tune from the SAME base weights, 3 seeds each: val
    accuracies and confidence separation must land in the same band."""
    w = workspace
    seeds = [0, 1, 2]
    ref_runs = [
        ph.ref_transfer_learn(
            TARGET, w["train_files"], w["val_files"], w["nontarget_files"],
            w["corpus"]["unknown_files"], w["corpus"]["bg_dir"],
            w["base_path"], seed=1000 + s,
        )
        for s in seeds
    ]
    our_runs = [
        ph.our_transfer_learn(
            w["imported"], TARGET, w["train_files"], w["val_files"],
            w["nontarget_files"], w["corpus"]["unknown_files"],
            w["corpus"]["bg_dir"], seed=s,
        )
        for s in seeds
    ]
    ref_s = ph.summarize_runs(ref_runs)
    our_s = ph.summarize_runs(our_runs)
    print("reference:", ref_s)
    print("ours:     ", our_s)

    # bands tightened to the measured 10-seed spread (1.0 +- 0.0 both
    # sides, benchmarks/parity_fewshot.json) — this easy-corpus variant
    # IS at ceiling; the off-ceiling discrimination comparison is
    # test_training_distribution_parity_hard below
    assert ref_s["val_accuracy_mean"] > 0.9, ref_s
    assert our_s["val_accuracy_mean"] > 0.9, our_s
    assert abs(ref_s["val_accuracy_mean"] - our_s["val_accuracy_mean"]) <= 0.1
    # and separate target from confusable nontargets comparably
    # (10-seed separations: ref 0.920, ours 0.937)
    assert our_s["separation"] > ref_s["separation"] - 0.15


@pytest.fixture(scope="module")
def hard_workspace(tmp_path_factory):
    """Confusable phoneme-order corpus + 300-step base: the de-saturated
    fixture (VERDICT r2 weak-item 1). Target 'abc' vs order-swap 'acb'
    and substitution 'abd'; 3 shots."""
    tmp = tmp_path_factory.mktemp("refparity_hard")
    corpus = make_fewshot_hard_corpus(tmp / "corpus", clips_per_word=21)
    base_path = tmp / "hard_base.keras"
    keras_base = ph.pretrain_base_model(
        corpus, corpus["words"], base_path, steps=300, batch_size=32,
        seed=0, min_acc=0.8,
    )
    imported = ph.import_base_to_flax(keras_base)
    target = corpus["words"][0]
    others = corpus["words"][1:]
    return dict(
        corpus=corpus,
        base_path=str(base_path),
        imported=imported,
        target=target,
        train_files=corpus[target][:3],
        val_files=corpus[target][3:],
        nontarget_files=[f for w in others for f in corpus[w]],
    )


def test_training_distribution_parity_hard(hard_workspace):
    """Off-ceiling differential: both sides fine-tune 3 shots of a word
    that differs from its distractors only by phoneme ORDER (acb) or one
    phoneme (abd). Argmax val accuracy may saturate, so the compared
    metric is balanced discrimination accuracy (target recall vs
    confusable specificity at P(target)>0.5) — mid-band by construction."""
    w = hard_workspace
    seeds = [0, 1, 2]
    ref_runs = [
        ph.ref_transfer_learn(
            w["target"], w["train_files"], w["val_files"],
            w["nontarget_files"], w["corpus"]["unknown_files"],
            w["corpus"]["bg_dir"], w["base_path"], seed=1000 + s,
        )
        for s in seeds
    ]
    our_runs = [
        ph.our_transfer_learn(
            w["imported"], w["target"], w["train_files"], w["val_files"],
            w["nontarget_files"], w["corpus"]["unknown_files"],
            w["corpus"]["bg_dir"], seed=s,
        )
        for s in seeds
    ]
    ref_s = ph.summarize_runs(ref_runs)
    our_s = ph.summarize_runs(our_runs)
    print("reference:", ref_s)
    print("ours:     ", our_s)

    # the fixture has discriminative power: balanced accuracy off both
    # ceilings on BOTH sides (10-seed experiment at the shipped noise
    # 0.016: ref 0.949 +- 0.115, ours 0.938 +- 0.096, dmean 0.011; these
    # seeds 0-2 land ref ~0.94-0.95 / ours ~0.88 on the deterministic
    # fixture — benchmarks/parity_fewshot_hard.json)...
    assert 0.55 < ref_s["balanced_accuracy_mean"] < 0.995, ref_s
    assert 0.55 < our_s["balanced_accuracy_mean"] < 0.995, our_s
    # ...and the sides agree within the measured multi-seed spread
    # (max |dmean| consistent with the 10-seed stds at n=3 is ~0.17)
    assert (
        abs(ref_s["balanced_accuracy_mean"] - our_s["balanced_accuracy_mean"])
        < 0.2
    ), (ref_s, our_s)
    # confidence separation on confusables comparable
    assert our_s["separation"] > ref_s["separation"] - 0.2
