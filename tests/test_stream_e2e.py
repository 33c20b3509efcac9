"""End-to-end streaming KWS on a synthesized stream with known label times.

The reference validates streaming via generated streams + streaming_labels
(generate_stream_sentences.py, SURVEY.md section 4); here it's a real test
of the full pipeline: pretrain a tiny embedding on non-target keywords,
few-shot transfer to the target, synthesize a stream with target
occurrences at known times, run the engine, assert detections line up.
"""

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # heavy e2e: run with --slow

from multilingual_kws_tpu.stream.engine import (
    StreamFlags,
    StreamTarget,
    calculate_streaming_accuracy,
    eval_stream_test,
    featurize_stream,
)
from multilingual_kws_tpu.stream.tprfpr import tpr_fpr
from multilingual_kws_tpu.tools.stream_synth import synthesize_stream, write_stream
from multilingual_kws_tpu.train.finetune import transfer_learn
from multilingual_kws_tpu.utils.wav import read_wav

from helpers import keyword_clip, make_corpus, tiny_embedding_model, tiny_transfer_model


@pytest.fixture(scope="module")
def trained(tmp_path_factory):
    """Full reference workflow: pretrain embedding on bravo/charlie, then
    5-shot transfer to the unseen keyword alpha."""
    from multilingual_kws_tpu.parallel import mesh as meshlib
    from multilingual_kws_tpu.train.pretrain import PretrainConfig, pretrain

    corpus = make_corpus(tmp_path_factory.mktemp("corpus"), clips_per_word=12)
    words = ["bravo", "charlie"]
    train_files = [f for w in words for f in corpus[w][:10]]
    val_files = [f for w in words for f in corpus[w][10:]]
    state, _, hist, _ = pretrain(
        train_files,
        val_files,
        commands=words,
        background_data_dir=corpus["bg_dir"],
        unknown_files=corpus["unknown_files"],
        config=PretrainConfig(
            num_labels=4,
            batch_size=16,
            num_epochs=5,
            learning_rate=3e-3,
            silence_percentage=10,
            unknown_percentage=15,
            shuffle_seed=0,
            steps_per_epoch=12,
        ),
        mesh=meshlib.make_mesh(num_devices=1),
        verbose=0,
        model=tiny_embedding_model(num_labels=4),
    )
    assert hist["val_accuracy"][-1] >= 0.75, hist

    result = transfer_learn(
        target="alpha",
        train_files=corpus["alpha"][:5],
        val_files=corpus["alpha"][5:],
        unknown_files=corpus["unknown_files"],
        num_epochs=4,
        num_batches=1,
        batch_size=16,
        primary_lr=1e-2,
        backprop_into_embedding=False,
        embedding_lr=0,
        bg_datadir=corpus["bg_dir"],
        seed=0,
        verbose=0,
        model=tiny_transfer_model(),
        base_params={
            "trunk": state.params["trunk"],
            "embedding_head": state.params["embedding_head"],
        },
        base_batch_stats={"trunk": state.batch_stats["trunk"]},
    )
    return corpus, result


@pytest.fixture(scope="module")
def stream(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("stream")
    targets = [keyword_clip("alpha", seed=1000 + i) for i in range(4)]
    distractors = [keyword_clip("charlie", seed=2000 + i) for i in range(4)]
    spec = synthesize_stream(
        "alpha", targets, distractors,
        num_targets=4, num_distractors=4, seed=5, noise_rms=0.003,
    )
    wav_path = tmp / "streaming_test.wav"
    labels_path = tmp / "streaming_labels.txt"
    write_stream(spec, wav_path, labels_path)
    return spec, str(wav_path), str(labels_path)


def make_predict(result):
    return result.predict_fn()


def test_featurize_stream_window_count(stream):
    spec, wav_path, _ = stream
    audio, sr = read_wav(wav_path)
    flags = StreamFlags(
        wav=wav_path, ground_truth="", target_keyword="alpha",
        detection_thresholds=[0.9],
    )
    windows = featurize_stream(audio, sr, flags)
    expect = int(np.ceil((audio.shape[0] - 16000) / 320))
    assert windows.shape == (expect, 49, 40)


def test_streaming_detection_finds_targets(stream, trained):
    spec, wav_path, labels_path = stream
    _, result = trained
    flags = StreamFlags(
        wav=wav_path,
        ground_truth=labels_path,
        target_keyword="alpha",
        detection_thresholds=[0.7, 0.8],
    )
    results, inferences = calculate_streaming_accuracy(
        make_predict(result), [flags], verbose=False
    )
    assert inferences.shape[1] == 3
    (fl, per_thresh) = results[0]
    found, found_conf = per_thresh[0.8]
    gt_times = [t for _, t in spec.labels]
    r = tpr_fpr("alpha", 0.8, found, gt_times, duration_s=60,
                time_tolerance_ms=750)
    # all targets detected, distractor keyword does not false-fire
    assert r["true_positives"] == 4, (found, gt_times)
    assert r["false_positives"] == 0, (found, gt_times)
    assert r["false_negatives"] == 0


def test_chunked_featurization_matches_unchunked(stream):
    """HBM-bounded chunking must not change windows (the reference's
    chunker lost/recomputed boundary windows — fixed behavior)."""
    spec, wav_path, _ = stream
    audio, sr = read_wav(wav_path)
    base_flags = dict(
        wav=wav_path, ground_truth="", target_keyword="alpha",
        detection_thresholds=[0.9],
    )
    full = featurize_stream(audio, sr, StreamFlags(**base_flags))
    chunked = featurize_stream(
        audio, sr, StreamFlags(**base_flags, max_chunk_length_sec=5)
    )
    np.testing.assert_array_equal(full, chunked)


def test_eval_stream_test_memoization(stream, trained, tmp_path):
    spec, wav_path, labels_path = stream
    _, result = trained
    flags = StreamFlags(
        wav=wav_path, ground_truth=labels_path, target_keyword="alpha",
        detection_thresholds=[0.7],
    )
    pkl = tmp_path / "stream_results.pkl"
    npy = tmp_path / "raw_inferences.npy"
    st = StreamTarget(
        target_lang="syn", target_word="alpha", model_path=None,
        stream_flags=[flags],
        destination_result_pkl=str(pkl),
        destination_result_inferences=str(npy),
    )
    res = eval_stream_test(st, predict_fn=make_predict(result), verbose=False)
    assert pkl.exists() and npy.exists()
    assert "alpha" in res
    # second call: results memoized, returns None without recompute
    assert eval_stream_test(st, predict_fn=make_predict(result)) is None
