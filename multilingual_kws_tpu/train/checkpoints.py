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


def save_model(
    path,
    params,
    batch_stats=None,
    metadata: Optional[Dict] = None,
) -> None:
    """Save params (+ batch stats) with metadata. Overwrites."""
    path = Path(path).resolve()
    if path.exists():
        import shutil

        shutil.rmtree(path)
    ckptr = ocp.StandardCheckpointer()
    payload = {"params": _to_pure(params)}
    if batch_stats is not None:
        payload["batch_stats"] = _to_pure(batch_stats)
    ckptr.save(path / "state", payload)
    ckptr.wait_until_finished()
    meta = dict(metadata or {})
    meta.setdefault("format", "multilingual_kws_tpu.v1")
    meta.setdefault("embedding_output", "embedding_head/dense_2")
    meta["has_batch_stats"] = batch_stats is not None
    with open(path / METADATA_FILE, "w") as fh:
        json.dump(meta, fh, indent=1)


def load_metadata(path) -> Dict:
    with open(Path(path).resolve() / METADATA_FILE) as fh:
        return json.load(fh)


def load_model(path):
    """Returns (payload dict with 'params' [+ 'batch_stats'], metadata)."""
    path = Path(path).resolve()
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
