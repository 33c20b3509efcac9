"""ctypes bindings for the native threaded WAV batch loader.

load_batch reads N 16-bit PCM wavs into one int16 (N, desired_samples)
array with a C++ worker pool (native/src/wavloader.cc) — the data-loader
role the reference fills with TF's C++ decode ops under tf.data AUTOTUNE.
Files the native path cannot handle (non-16-bit, exotic chunks) fall back
per-file to utils/wav.read_wav_int16, so results always match the Python
reader bit for bit (tested in tests/test_native.py).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from pathlib import Path
from typing import Sequence, Tuple

import numpy as np

from ..utils.wav import read_wav_int16

_SRC = Path(__file__).parent / "src" / "wavloader.cc"
_BUILD_DIR = Path(__file__).parent / "_build"
_LIB_PATH = _BUILD_DIR / "_wavloader.so"


def build_library(force: bool = False) -> Path:
    if (
        not force
        and _LIB_PATH.exists()
        and _LIB_PATH.stat().st_mtime >= _SRC.stat().st_mtime
    ):
        return _LIB_PATH
    _BUILD_DIR.mkdir(parents=True, exist_ok=True)
    subprocess.run(
        ["g++", "-O3", "-std=c++17", "-shared", "-fPIC", "-pthread",
         str(_SRC), "-o", str(_LIB_PATH)],
        check=True, capture_output=True,
    )
    return _LIB_PATH


_lib = None


def _load():
    global _lib
    if _lib is None:
        lib = ctypes.CDLL(str(build_library()))
        lib.wl_load_batch.argtypes = [
            ctypes.c_char_p,
            ctypes.c_int,
            ctypes.c_int,
            ctypes.c_int,
            np.ctypeslib.ndpointer(np.int16, flags="C_CONTIGUOUS"),
            np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
        ]
        lib.wl_load_batch.restype = None
        _lib = lib
    return _lib


def available() -> bool:
    try:
        _load()
        return True
    except Exception:
        return False


def load_batch(
    paths: Sequence[str],
    desired_samples: int,
    num_threads: int = 0,
) -> np.ndarray:
    """Paths -> int16 (N, desired_samples); bit-identical to
    utils/wav.read_wav_int16 per file (which also serves as the fallback
    for files the native reader rejects)."""
    paths = list(paths)
    if not paths:
        return np.zeros((0, desired_samples), np.int16)
    out = np.empty((len(paths), desired_samples), np.int16)
    status = np.empty(len(paths), np.int32)
    blob = b"".join(os.fsencode(p) + b"\0" for p in paths)
    threads = num_threads or min(8, os.cpu_count() or 1)
    _load().wl_load_batch(blob, len(paths), desired_samples, threads, out, status)
    for i in np.nonzero(status)[0]:
        out[i], _ = read_wav_int16(paths[i], desired_samples=desired_samples)
    return out
