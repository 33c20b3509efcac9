"""Batch clip evaluation — reference transfer_learning.py:177-273 equivalents.

evaluate_files_* featurize a list of wavs and split prediction confidences by
argmax vs the target id; evaluate_fast_* sample up to N utterances per word
from a data dir. The featurization is batched on device instead of one
file2spec graph call per clip.
"""

from __future__ import annotations

import glob
import os
from typing import Callable, Dict, List, Optional, Sequence, Tuple

import numpy as np

from ..ops.micro_exact import FrontendConfig
from ..ops.micro_jax import MicroFrontendJax
from ..utils.wav import read_wav


def featurize_files(
    files: Sequence[str],
    frontend: Optional[MicroFrontendJax] = None,
    desired_samples: int = 16000,
    batch_size: int = 256,
    backend: str = "jax",
) -> np.ndarray:
    """wav paths -> (N, 49, 40) float32 features.

    backend="jax": batched on the accelerator (default).
    backend="native": the multithreaded C++ host frontend (bit-identical;
    fastest for CPU-side corpus tooling — no device round-trip).
    """
    if backend == "native":
        from ..native.host_frontend import NativeMicroFrontend

        native = NativeMicroFrontend(frontend.config if frontend else FrontendConfig())
        out = []
        for i in range(0, len(files), batch_size):
            chunk = files[i : i + batch_size]
            wavs = np.stack(
                [read_wav(f, desired_samples=desired_samples)[0] for f in chunk]
            )
            out.append(native.features(wavs))
        return (
            np.concatenate(out, axis=0)
            if out
            else np.zeros((0, 49, 40), np.float32)
        )

    # process-cached: a fresh instance would re-trace its jitted programs
    # on every call (see ops/micro_jax.cached_stream_frontend)
    from ..ops.micro_jax import default_frontend

    frontend = frontend or default_frontend()
    out = []
    for i in range(0, len(files), batch_size):
        chunk = files[i : i + batch_size]
        wavs = np.stack(
            [read_wav(f, desired_samples=desired_samples)[0] for f in chunk]
        )
        out.append(np.asarray(frontend.features(wavs)))
    return (
        np.concatenate(out, axis=0)
        if out
        else np.zeros((0, 49, 40), np.float32)
    )


def evaluate_files_multiclass(
    files_to_evaluate: Sequence[str],
    target_id: int,
    predict_fn: Callable[[np.ndarray], np.ndarray],
    frontend: Optional[MicroFrontendJax] = None,
) -> Dict[str, List[float]]:
    """Reference evaluate_files_multiclass (:238-261)."""
    specs = featurize_files(files_to_evaluate, frontend)
    preds = np.asarray(predict_fn(specs[..., None]))
    cols = np.argmax(preds, axis=1)
    conf = preds[np.arange(len(cols)), cols]
    return dict(
        correct=[float(c) for c, k in zip(conf, cols) if k == target_id],
        incorrect=[float(c) for c, k in zip(conf, cols) if k != target_id],
    )


def evaluate_files_single_target(
    files_to_evaluate: Sequence[str],
    target_id: int,
    predict_fn: Callable[[np.ndarray], np.ndarray],
    frontend: Optional[MicroFrontendJax] = None,
) -> Tuple[np.ndarray, np.ndarray]:
    """Reference evaluate_files_single_target (:264-273)."""
    specs = featurize_files(files_to_evaluate, frontend)
    preds = np.asarray(predict_fn(specs[..., None]))
    return preds[:, target_id], preds


def evaluate_fast_multiclass(
    words_to_evaluate: Sequence[str],
    target_id: int,
    data_dir: str,
    utterances_per_word: int,
    predict_fn: Callable,
    frontend: Optional[MicroFrontendJax] = None,
    rng: Optional[np.random.Generator] = None,
) -> Dict[str, List[float]]:
    """Reference evaluate_fast_multiclass (:177-213)."""
    rng = rng or np.random.default_rng()
    files: List[str] = []
    for word in words_to_evaluate:
        wavs = glob.glob(os.path.join(data_dir, word, "*.wav"))
        if len(wavs) > utterances_per_word:
            wavs = list(rng.choice(wavs, utterances_per_word, replace=False))
        files.extend(wavs)
    return evaluate_files_multiclass(files, target_id, predict_fn, frontend)


def evaluate_fast_single_target(
    words_to_evaluate: Sequence[str],
    target_id: int,
    data_dir: str,
    utterances_per_word: int,
    predict_fn: Callable,
    frontend: Optional[MicroFrontendJax] = None,
    rng: Optional[np.random.Generator] = None,
) -> Tuple[np.ndarray, np.ndarray]:
    """Reference evaluate_fast_single_target (:216-235)."""
    rng = rng or np.random.default_rng()
    files: List[str] = []
    for word in words_to_evaluate:
        wavs = glob.glob(os.path.join(data_dir, word, "*.wav"))
        if len(wavs) > utterances_per_word:
            wavs = list(rng.choice(wavs, utterances_per_word, replace=False))
        files.extend(wavs)
    return evaluate_files_single_target(files, target_id, predict_fn, frontend)
