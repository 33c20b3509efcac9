"""Pretraining checkpoint/resume continues from checkpointed state.

The reference's modus operandi is multi-epoch runs resumed from the best-val
checkpoint (train_multilingual_embedding.py:96-133: load_model + recompile +
ModelCheckpoint). Our CLI --resume loads params + BN stats and keeps
training. This asserts the resumed run CONTINUES (first resumed epoch is at
or above the checkpointed accuracy, far above a cold first epoch) rather
than silently restarting from scratch. At-scale on-chip evidence (kill -9
mid-run + CLI --resume on the 30k-clip corpus) lives in
benchmarks/pretrain_scale_run.json (tools_dev/pretrain_scale_run.py).
"""

import json

import pytest

pytestmark = pytest.mark.slow  # trains a slim trunk twice: run with --slow

from helpers import make_corpus


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    return make_corpus(tmp_path_factory.mktemp("corpus"), clips_per_word=12)


def _config(tmp, epochs, **kw):
    from multilingual_kws_tpu.train.pretrain import PretrainConfig

    return PretrainConfig(
        num_labels=4,
        batch_size=16,
        num_epochs=epochs,
        learning_rate=3e-3,
        silence_percentage=10,
        unknown_percentage=15,
        shuffle_seed=0,
        steps_per_epoch=12,
        **kw,
    )


def test_resume_continues_from_checkpoint(corpus, tmp_path):
    from helpers import tiny_embedding_model
    from multilingual_kws_tpu.parallel import mesh as meshlib
    from multilingual_kws_tpu.train.checkpoints import load_model
    from multilingual_kws_tpu.train.pretrain import pretrain

    words = ["bravo", "charlie"]
    train_files = [f for w in words for f in corpus[w][:10]]
    val_files = [f for w in words for f in corpus[w][10:]]
    mesh = meshlib.make_mesh(num_devices=1)
    common = dict(
        commands=words,
        background_data_dir=corpus["bg_dir"],
        unknown_files=corpus["unknown_files"],
        mesh=mesh,
        verbose=0,
    )

    ckpt_dir = tmp_path / "ckpt"
    _, _, hist_a, _ = pretrain(
        train_files, val_files,
        config=_config(tmp_path, 5, checkpoint_dir=str(ckpt_dir)),
        model=tiny_embedding_model(num_labels=4),
        **common,
    )
    best_a = max(hist_a["val_accuracy"])
    assert best_a >= 0.75, hist_a

    # checkpoint metadata records the epoch it was taken at
    meta = json.loads((ckpt_dir / "kws_metadata.json").read_text())
    assert meta["epoch"] == int(
        max(range(5), key=lambda i: hist_a["val_accuracy"][i])
    )
    assert meta["val_accuracy"] == pytest.approx(best_a)

    # resume: load the checkpoint payload exactly like api/cli.py:238-245
    payload, _ = load_model(ckpt_dir)
    _, _, hist_b, _ = pretrain(
        train_files, val_files,
        config=_config(tmp_path, 2),
        model=tiny_embedding_model(num_labels=4),
        resume_params=payload,
        **common,
    )

    cold_first = hist_a["val_accuracy"][0]
    resumed_first = hist_b["val_accuracy"][0]
    # continuation, not a restart: the first resumed epoch sits near the
    # checkpointed accuracy and clearly above the cold first epoch
    assert resumed_first >= best_a - 0.15, (hist_a, hist_b)
    assert resumed_first > cold_first + 0.2, (hist_a, hist_b)
