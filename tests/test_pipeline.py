"""Input-pipeline parallelism (data/pipeline.py): the tf.data-AUTOTUNE role
(reference input_data.py:452-471) replaced by thread-backed host prefetch."""

import time

import jax

import numpy as np
import pytest

from multilingual_kws_tpu.data.pipeline import prefetch


def test_prefetch_preserves_order_and_values():
    assert list(prefetch(iter(range(100)), size=4)) == list(range(100))


def test_prefetch_size_zero_is_synchronous():
    assert list(prefetch(iter(range(10)), size=0)) == list(range(10))


def test_prefetch_propagates_producer_exception():
    def gen():
        yield 1
        yield 2
        raise ValueError("boom")

    it = prefetch(gen(), size=2)
    assert next(it) == 1
    assert next(it) == 2
    with pytest.raises(ValueError, match="boom"):
        next(it)


def test_prefetch_early_abandon_stops_producer():
    produced = []

    def gen():
        for i in range(10_000):
            produced.append(i)
            yield i

    it = prefetch(gen(), size=2)
    for _ in range(3):
        next(it)
    it.close()
    time.sleep(0.3)  # give the producer time to notice the stop event
    n = len(produced)
    time.sleep(0.2)
    assert len(produced) == n  # no longer producing
    assert n < 100  # and it never ran ahead of the bounded queue


def test_prefetch_actually_overlaps():
    """Producer sleep and consumer sleep must overlap: total wall-clock is
    well under the sum of both."""
    N, DELAY = 8, 0.05

    def slow_gen():
        for i in range(N):
            time.sleep(DELAY)
            yield i

    t0 = time.perf_counter()
    for _ in prefetch(slow_gen(), size=2):
        time.sleep(DELAY)  # consumer work
    overlapped = time.perf_counter() - t0
    assert overlapped < 2 * N * DELAY * 0.8, overlapped


def test_prefetch_and_resident_bit_identical(tmp_path):
    """The HBM-resident device-gather path must yield batches bit-identical
    to the synchronous streaming path: same draws, same augment keys, same
    features. (prefetch>0 identity follows from the single-producer design
    + test_prefetch_preserves_order_and_values, both covered above at the
    iterator level — compiling a third featurizer here would only re-prove
    that.)"""
    import sys

    sys.path.insert(0, str(__import__("pathlib").Path(__file__).parent))
    from helpers import make_corpus

    from multilingual_kws_tpu.data.dataset import AudioDataset
    from multilingual_kws_tpu.settings import standard_microspeech_model_settings

    corpus = make_corpus(tmp_path / "c", clips_per_word=4)
    settings = standard_microspeech_model_settings(3)

    def make_ds():
        return AudioDataset(
            model_settings=settings,
            commands=["alpha"],
            background_data_dir=corpus["bg_dir"],
            unknown_files=corpus["unknown_files"],
            silence_percentage=10,
            unknown_percentage=10,
            seed=123,
        )

    def collect(it):
        return [(np.asarray(s), np.asarray(l)) for s, l in it]

    sync = collect(make_ds().train_batches(corpus["alpha"], 8, 5))
    resident = collect(
        make_ds().train_batches_resident(corpus["alpha"], 8, 5)
    )
    assert len(sync) == len(resident) == 5
    for (s0, l0), (s2, l2) in zip(sync, resident):
        np.testing.assert_array_equal(l0, l2)
        np.testing.assert_array_equal(s0, s2)


@pytest.mark.slow
def test_pretrain_resident_matches_streaming(tmp_path):
    """pretrain with the HBM-resident fused step must train equivalently to
    the streaming path (same data order + keys; loss curves match)."""
    import sys

    sys.path.insert(0, str(__import__("pathlib").Path(__file__).parent))
    from helpers import make_corpus, tiny_embedding_model

    from multilingual_kws_tpu.parallel import mesh as meshlib
    from multilingual_kws_tpu.train.pretrain import PretrainConfig, pretrain

    corpus = make_corpus(tmp_path / "c", clips_per_word=8)
    words = ["alpha", "bravo"]
    train_files = [f for w in words for f in corpus[w][:6]]
    val_files = [f for w in words for f in corpus[w][6:]]

    def run(resident):
        _, _, hist, _ = pretrain(
            train_files,
            val_files,
            commands=words,
            background_data_dir=corpus["bg_dir"],
            unknown_files=corpus["unknown_files"],
            config=PretrainConfig(
                num_labels=4, batch_size=8, num_epochs=2,
                learning_rate=3e-3, silence_percentage=10,
                unknown_percentage=15, shuffle_seed=0, steps_per_epoch=4,
                resident_data=resident,
            ),
            mesh=meshlib.make_mesh(num_devices=1),
            verbose=0,
            model=tiny_embedding_model(num_labels=4),
        )
        return hist

    h_stream = run(False)
    h_res = run(True)
    np.testing.assert_allclose(h_res["loss"], h_stream["loss"], rtol=1e-4)
    np.testing.assert_allclose(
        h_res["val_accuracy"], h_stream["val_accuracy"], atol=1e-6
    )


@pytest.mark.slow  # re-tiered r5: fast suite back under ~4 min (CLAUDE.md)
# 169 s: the scanned-vs-per-step equivalence; the fast suite keeps
# test_prefetch_and_resident_bit_identical as the pipeline smoke
def test_pretrain_scanned_epoch_bit_identical_to_per_step(tmp_path):
    """The scanned-epoch resident program (build_fused_resident_epoch,
    scan_epoch=True default) must reproduce the per-step fused path
    numerically: same draws and key chains carried through the scan; XLA
    compiles the scanned body separately from the standalone step, so
    outputs match to fusion-order float rounding, not bitwise."""
    import sys

    sys.path.insert(0, str(__import__("pathlib").Path(__file__).parent))
    from helpers import make_corpus, tiny_embedding_model

    from multilingual_kws_tpu.parallel import mesh as meshlib
    from multilingual_kws_tpu.train.pretrain import PretrainConfig, pretrain

    corpus = make_corpus(tmp_path / "c", clips_per_word=8)
    words = ["alpha", "bravo"]
    train_files = [f for w in words for f in corpus[w][:6]]
    val_files = [f for w in words for f in corpus[w][6:]]

    def run(scan):
        state, _, hist, _ = pretrain(
            train_files,
            val_files,
            commands=words,
            background_data_dir=corpus["bg_dir"],
            unknown_files=corpus["unknown_files"],
            config=PretrainConfig(
                num_labels=4, batch_size=8, num_epochs=2,
                learning_rate=3e-3, silence_percentage=10,
                unknown_percentage=15, shuffle_seed=0, steps_per_epoch=3,
                resident_data=True, scan_epoch=scan,
            ),
            mesh=meshlib.make_mesh(num_devices=2),
            verbose=0,
            model=tiny_embedding_model(num_labels=4),
        )
        return state, hist

    s_step, h_step = run(False)
    s_scan, h_scan = run(True)
    # the per-epoch losses are the sharp instrument: a key-chain mismatch
    # would diverge them wildly by epoch 2
    np.testing.assert_allclose(h_scan["loss"], h_step["loss"], rtol=1e-5)
    np.testing.assert_allclose(
        h_scan["val_accuracy"], h_step["val_accuracy"], atol=1e-6
    )
    # params: adam's update magnitude is ~lr even for near-zero gradients,
    # so fusion-order float drift (~1e-7) on a near-zero gradient can flip
    # an update's sign on a few elements (observed: BN biases). Assert the
    # overwhelming majority matches tightly instead of exactness.
    a = np.concatenate(
        [np.ravel(x) for x in jax.tree_util.tree_leaves(s_scan.params)]
    )
    b = np.concatenate(
        [np.ravel(x) for x in jax.tree_util.tree_leaves(s_step.params)]
    )
    frac = np.mean(np.abs(a - b) <= 1e-4)
    assert frac >= 0.999, frac
