"""Checkpoint saves survive a kill at any point (round-4 scale-run bug).

The old save_model rmtree'd the previous best BEFORE writing the new one;
a SIGKILL mid-save (exactly what tools_dev/pretrain_scale_run.py does, and
what the reference's resume workflow train_multilingual_embedding.py:96-133
must survive) destroyed the only checkpoint on disk. The atomic scheme
builds the new checkpoint in `<dir>.saving` (metadata written LAST as the
completion marker) and swaps with two renames; these tests reconstruct the
on-disk state of every crash window and assert load_model recovers the
newest complete checkpoint from each.
"""

import numpy as np
import pytest

from multilingual_kws_tpu.train import checkpoints as ck


def _params(tag: float):
    return {"dense": {"kernel": np.full((2, 2), tag, np.float32)}}


def _tag(payload) -> float:
    return float(payload["params"]["dense"]["kernel"][0, 0])


@pytest.fixture
def ckpt(tmp_path):
    return tmp_path / "ckpt"


def test_save_then_load_roundtrip(ckpt):
    ck.save_model(ckpt, _params(1.0), metadata={"epoch": 3})
    payload, meta = ck.load_model(ckpt)
    assert _tag(payload) == 1.0 and meta["epoch"] == 3
    assert not (ckpt.parent / "ckpt.saving").exists()
    assert not (ckpt.parent / "ckpt.prev").exists()


def test_overwrite_keeps_no_siblings(ckpt):
    ck.save_model(ckpt, _params(1.0), metadata={"epoch": 1})
    ck.save_model(ckpt, _params(2.0), metadata={"epoch": 2})
    payload, meta = ck.load_model(ckpt)
    assert _tag(payload) == 2.0 and meta["epoch"] == 2
    assert not (ckpt.parent / "ckpt.saving").exists()
    assert not (ckpt.parent / "ckpt.prev").exists()


def test_crash_mid_build_falls_back_to_old(ckpt):
    """Killed while orbax was still writing .saving (no metadata yet):
    the incomplete .saving must be ignored and the old checkpoint used."""
    ck.save_model(ckpt, _params(1.0), metadata={"epoch": 1})
    saving = ckpt.parent / "ckpt.saving"
    (saving / "state").mkdir(parents=True)
    (saving / "state" / "garbage").write_bytes(b"partial orbax write")
    payload, meta = ck.load_model(ckpt)
    assert _tag(payload) == 1.0 and meta["epoch"] == 1
    # and the next save cleans the stale partial dir
    ck.save_model(ckpt, _params(3.0), metadata={"epoch": 3})
    assert not saving.exists()
    assert _tag(ck.load_model(ckpt)[0]) == 3.0


def test_crash_after_build_before_swap_prefers_new(ckpt):
    """Killed after .saving completed but before any rename: .saving is
    the newest complete checkpoint and must win over the old dir."""
    ck.save_model(ckpt, _params(1.0), metadata={"epoch": 1})
    ck.save_model(ckpt, _params(2.0), metadata={"epoch": 2})
    # reconstruct the window: a complete build of epoch 3 left in .saving
    ck.save_model(ckpt.parent / "other", _params(3.0), metadata={"epoch": 3})
    (ckpt.parent / "other").rename(ckpt.parent / "ckpt.saving")
    payload, meta = ck.load_model(ckpt)
    assert _tag(payload) == 3.0 and meta["epoch"] == 3


def test_crash_between_swap_renames_recovers(ckpt):
    """Killed between `path -> .prev` and `.saving -> path`: path is gone;
    the complete .saving (newest) must be preferred, .prev as fallback."""
    ck.save_model(ckpt, _params(2.0), metadata={"epoch": 2})
    ckpt.rename(ckpt.parent / "ckpt.prev")
    ck.save_model(ckpt.parent / "other", _params(3.0), metadata={"epoch": 3})
    (ckpt.parent / "other").rename(ckpt.parent / "ckpt.saving")
    payload, meta = ck.load_model(ckpt)
    assert _tag(payload) == 3.0 and meta["epoch"] == 3
    # without .saving, .prev is the survivor
    import shutil

    shutil.rmtree(ckpt.parent / "ckpt.saving")
    payload, meta = ck.load_model(ckpt)
    assert _tag(payload) == 2.0 and meta["epoch"] == 2


def test_load_metadata_uses_same_recovery(ckpt):
    ck.save_model(ckpt, _params(2.0), metadata={"epoch": 2})
    ckpt.rename(ckpt.parent / "ckpt.prev")
    assert ck.load_metadata(ckpt)["epoch"] == 2


def test_missing_checkpoint_raises_naturally(ckpt):
    with pytest.raises(FileNotFoundError):
        ck.load_model(ckpt)
