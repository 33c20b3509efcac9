"""Orbax checkpointing with KWS metadata.

Replaces Keras SavedModel dirs + ModelCheckpoint(save_best_only) semantics
(reference train_monolingual_embedding.py:130-135, run.py:299-300). The
embedding layer is identified by checkpoint metadata instead of the Keras
layer name "dense_2" (reference transfer_learning.py:41).
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Any, Dict, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp

METADATA_FILE = "kws_metadata.json"


def _to_pure(tree):
    return jax.tree_util.tree_map(np.asarray, tree)


def _sibling(path: Path, suffix: str) -> Path:
    return path.parent / (path.name + suffix)


def save_model(
    path,
    params,
    batch_stats=None,
    metadata: Optional[Dict] = None,
) -> None:
    """Save params (+ batch stats) with metadata. Overwrites CRASH-SAFELY:
    the new checkpoint is fully written to a sibling ".saving" dir (state
    first, metadata last as the completion marker), then swapped in with
    two renames. A SIGKILL at ANY point leaves a loadable checkpoint on
    disk — either the old one at `path`/`path.prev` or the completed new
    one. (Round-4 scale run caught the old rmtree-then-save destroying
    the previous best when killed mid-save: the exact crash the
    reference's resume workflow, train_multilingual_embedding.py:96-133,
    must survive.) load_model knows the recovery order."""
    import shutil

    path = Path(path).resolve()
    tmp = _sibling(path, ".saving")
    prev = _sibling(path, ".prev")
    for stale in (tmp, prev):
        if stale.exists():
            shutil.rmtree(stale)
    ckptr = ocp.StandardCheckpointer()
    payload = {"params": _to_pure(params)}
    if batch_stats is not None:
        payload["batch_stats"] = _to_pure(batch_stats)
    ckptr.save(tmp / "state", payload)
    ckptr.wait_until_finished()
    meta = dict(metadata or {})
    meta.setdefault("format", "multilingual_kws_tpu.v1")
    meta.setdefault("embedding_output", "embedding_head/dense_2")
    meta["has_batch_stats"] = batch_stats is not None
    with open(tmp / METADATA_FILE, "w") as fh:
        json.dump(meta, fh, indent=1)
        fh.flush()
        import os

        os.fsync(fh.fileno())
    # swap: old -> .prev, new -> path, drop .prev. Each step is a single
    # rename; a crash leaves at worst {path missing, .prev complete} which
    # _resolve_checkpoint_dir recovers.
    if path.exists():
        path.rename(prev)
    tmp.rename(path)
    if prev.exists():
        shutil.rmtree(prev)


def _resolve_checkpoint_dir(path: Path) -> Path:
    """The directory holding the newest COMPLETE checkpoint for `path`
    (metadata present = save completed, since metadata is written last).
    Newest-first recovery order: a COMPLETE `path.saving` always postdates
    `path` (save_model clears stale .saving before building a new one),
    then `path` itself, then `path.prev` (killed between the two swap
    renames)."""
    for cand in (_sibling(path, ".saving"), path, _sibling(path, ".prev")):
        if (cand / METADATA_FILE).is_file():
            return cand
    return path  # let the caller's open() raise the natural error


def load_metadata(path) -> Dict:
    with open(_resolve_checkpoint_dir(Path(path).resolve()) / METADATA_FILE) as fh:
        return json.load(fh)


def load_model(path):
    """Returns (payload dict with 'params' [+ 'batch_stats'], metadata)."""
    path = _resolve_checkpoint_dir(Path(path).resolve())
    with open(path / METADATA_FILE) as fh:
        meta = json.load(fh)
    ckptr = ocp.StandardCheckpointer()
    payload = ckptr.restore(path / "state")
    return payload, meta


def load_embedding_variables(path):
    """Load the trunk + embedding head (params AND BN running stats) from a
    saved model — either a pretraining or a transfer checkpoint. This is the
    reference's load-and-truncate-at-"dense_2" (transfer_learning.py:36-43),
    by named collection instead of Keras layer surgery."""
    payload, _ = load_model(path)
    params = payload["params"]
    out = {
        "params": {
            "trunk": params["trunk"],
            "embedding_head": params["embedding_head"],
        }
    }
    stats = payload.get("batch_stats")
    if stats is not None and "trunk" in stats:
        out["batch_stats"] = {"trunk": stats["trunk"]}
    return out


def load_embedding_params(path):
    """Params-only view of load_embedding_variables."""
    return load_embedding_variables(path)["params"]


class BestValCheckpoint:
    """ModelCheckpoint(save_best_only=True, monitor=val_accuracy) parity."""

    def __init__(self, directory, monitor: str = "val_accuracy"):
        self.directory = Path(directory)
        self.monitor = monitor
        self.best: Optional[float] = None

    def update(self, metrics: Dict, params, batch_stats=None, extra_meta=None):
        val = float(metrics[self.monitor])
        if self.best is None or val > self.best:
            self.best = val
            meta = dict(extra_meta or {})
            meta[self.monitor] = val
            save_model(self.directory, params, batch_stats, meta)
            return True
        return False
