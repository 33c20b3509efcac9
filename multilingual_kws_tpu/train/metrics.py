"""Metrics logging: CSVLogger parity + history dicts.

Replaces Keras CSVLogger (reference transfer_learning.py:81-84,
train_multilingual_embedding.py:117) and the pickled history.history
(train_monolingual_embedding.py:145-149).
"""

from __future__ import annotations

import csv
import json
import time
from pathlib import Path
from typing import Dict, Optional


class CSVLogger:
    """Appends one row per epoch; header from the first row's keys."""

    def __init__(self, dest, append: bool = False):
        self.dest = Path(dest)
        self.dest.parent.mkdir(parents=True, exist_ok=True)
        self._writer = None
        self._fh = None
        self._mode = "a" if append else "w"

    def log(self, row: Dict):
        if self._fh is None:
            self._fh = open(self.dest, self._mode, newline="")
            self._writer = csv.DictWriter(self._fh, fieldnames=list(row.keys()))
            if self._mode == "w" or self._fh.tell() == 0:
                self._writer.writeheader()
        self._writer.writerow(row)
        self._fh.flush()

    def close(self):
        if self._fh is not None:
            self._fh.close()
            self._fh = None


def save_history(history: Dict, dest) -> None:
    dest = Path(dest)
    dest.parent.mkdir(parents=True, exist_ok=True)
    with open(dest, "w") as fh:
        json.dump(history, fh, indent=1)


class PhaseTimer:
    """Simple per-phase wall-clock metrics (the reference only had ad hoc
    datetime prints; this is a first-class hook, optionally wrapping
    jax.profiler traces)."""

    def __init__(self):
        self.phases: Dict[str, float] = {}

    def __call__(self, name: str):
        return _PhaseCtx(self, name)


class _PhaseCtx:
    def __init__(self, timer: PhaseTimer, name: str):
        self.timer = timer
        self.name = name

    def __enter__(self):
        self.t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.timer.phases[self.name] = (
            self.timer.phases.get(self.name, 0.0) + time.perf_counter() - self.t0
        )
        return False
