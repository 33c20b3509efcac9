"""ctypes bindings for the native C++ micro frontend.

The C++ library (native/src/microfrontend.cc) is the host-side data-loader
equivalent of the reference's TFLite microfrontend C++ op: multithreaded
batch featurization for corpus tooling / CPU pipelines, bit-exact to
ops/micro_exact.py (whose golden tests pin it to the real op). All
float-derived tables are built here (by the validated numpy implementation)
and passed in, keeping the C++ purely integer.

Build on demand with g++ (no pybind11 in this environment; plain C ABI).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from pathlib import Path
from typing import Optional

import numpy as np

from ..ops.micro_exact import FrontendConfig, MicroFrontend, _LOG_LUT

_SRC = Path(__file__).parent / "src" / "microfrontend.cc"
_BUILD_DIR = Path(__file__).parent / "_build"
_LIB_PATH = _BUILD_DIR / "_microfrontend.so"

_I64P = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")


def build_library(force: bool = False) -> Path:
    """Compile the shared library if missing/stale. Requires g++."""
    if (
        not force
        and _LIB_PATH.exists()
        and _LIB_PATH.stat().st_mtime >= _SRC.stat().st_mtime
    ):
        return _LIB_PATH
    _BUILD_DIR.mkdir(parents=True, exist_ok=True)
    cmd = [
        "g++", "-O3", "-std=c++17", "-shared", "-fPIC", "-pthread",
        str(_SRC), "-o", str(_LIB_PATH),
    ]
    subprocess.run(cmd, check=True, capture_output=True)
    return _LIB_PATH


_lib = None


def _load():
    global _lib
    if _lib is not None:
        return _lib
    lib = ctypes.CDLL(str(build_library()))
    lib.mf_create.restype = ctypes.c_void_p
    lib.mf_create.argtypes = (
        [ctypes.c_int] * 5
        + [ctypes.c_int, ctypes.c_longlong, ctypes.c_longlong, ctypes.c_longlong]
        + [ctypes.c_int] * 5
        + [_I64P] * 5
        + [_I64P, ctypes.c_int, _I64P, ctypes.c_int]
    )
    lib.mf_destroy.argtypes = [ctypes.c_void_p]
    lib.mf_compute_batch.argtypes = [
        ctypes.c_void_p,
        np.ctypeslib.ndpointer(np.int16, flags="C_CONTIGUOUS"),
        ctypes.c_int,
        ctypes.c_int,
        np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS"),
        ctypes.c_int,
    ]
    lib.mf_num_frames.restype = ctypes.c_int
    lib.mf_num_frames.argtypes = [ctypes.c_void_p, ctypes.c_int]
    lib.mf_compute_stream.argtypes = [
        ctypes.c_void_p,
        np.ctypeslib.ndpointer(np.int16, flags="C_CONTIGUOUS"),
        ctypes.c_longlong,
        ctypes.c_int,
        ctypes.c_int,
        np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS"),
        ctypes.c_int,
    ]
    _lib = lib
    return lib


def default_threads() -> int:
    return max(1, os.cpu_count() or 1)


class NativeMicroFrontend:
    """Multithreaded native frontend; output matches
    MicroFrontendJax.features_from_int16 (reference 10/256 scale) bit-exactly.
    """

    def __init__(self, config: FrontendConfig = FrontendConfig(),
                 num_threads: Optional[int] = None):
        self.config = config
        self.num_threads = num_threads or default_threads()
        lib = _load()
        host = MicroFrontend(config)  # table construction (validated numpy)
        self._host = host
        fb = host.fb
        weights_flat = np.concatenate(fb.weights).astype(np.int64)
        unweights_flat = np.concatenate(fb.unweights).astype(np.int64)
        pcan_lut = (
            host.pcan_lut.astype(np.int64)
            if config.enable_pcan
            else np.zeros(1, np.int64)
        )
        log_lut = _LOG_LUT.astype(np.int64)
        self._handle = lib.mf_create(
            host.window_size, host.window_step, host.fft_size,
            host.spectrum_size, config.num_channels,
            config.smoothing_bits,
            host.even_smoothing, host.odd_smoothing, host.min_signal_remaining,
            int(config.enable_pcan), host.snr_shift, host.correction_bits,
            config.scale_shift, int(config.enable_log),
            host.window_coeffs.astype(np.int64),
            fb.band_starts.astype(np.int64),
            fb.band_widths.astype(np.int64),
            weights_flat, unweights_flat,
            pcan_lut, len(pcan_lut), log_lut, len(log_lut),
        )
        self._lib = lib

    def __del__(self):
        if getattr(self, "_handle", None):
            try:
                self._lib.mf_destroy(self._handle)
            except Exception:
                pass
            self._handle = None

    def num_frames(self, num_samples: int) -> int:
        return self._lib.mf_num_frames(self._handle, num_samples)

    def features_from_int16(self, audio: np.ndarray) -> np.ndarray:
        """(B, N) or (N,) int16 -> (B, F, C) / (F, C) float32 (10/256 scale)."""
        squeeze = audio.ndim == 1
        a = np.ascontiguousarray(
            audio[None] if squeeze else audio, dtype=np.int16
        )
        b, n = a.shape
        f = self.num_frames(n)
        out = np.zeros((b, f, self.config.num_channels), np.float32)
        self._lib.mf_compute_batch(self._handle, a, b, n, out, self.num_threads)
        return out[0] if squeeze else out

    def features(self, audio_float: np.ndarray) -> np.ndarray:
        """Float waveform [-1,1] -> features (to_micro_spectrogram cast)."""
        i16 = np.clip(
            np.trunc(np.asarray(audio_float) * 32768.0), -32768, 32767
        ).astype(np.int16)
        return self.features_from_int16(i16)

    def stream_features(
        self, audio_int16: np.ndarray, num_windows: int,
        clip_samples: int = 16000,
    ) -> np.ndarray:
        """Long (N,) int16 stream -> (num_windows, F_clip, C) float32.

        Hop = frame stride; shares the stateless per-hop prefix across
        windows (same trick as ops/micro_jax.stream_features).
        """
        host = self._host
        clip_frames = 1 + (clip_samples - host.window_size) // host.window_step
        a = np.ascontiguousarray(audio_int16, dtype=np.int16)
        need = (num_windows - 1 + clip_frames - 1) * host.window_step + host.window_size
        assert a.shape[0] >= need, (a.shape[0], need)
        out = np.zeros(
            (num_windows, clip_frames, self.config.num_channels), np.float32
        )
        self._lib.mf_compute_stream(
            self._handle, a, a.shape[0], num_windows, clip_frames, out,
            self.num_threads,
        )
        return out
