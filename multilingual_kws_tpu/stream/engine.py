"""Streaming KWS evaluation engine.

Equivalent of reference embedding/batch_streaming_analysis.py: StreamFlags /
StreamTarget configs, calculate_streaming_accuracy, eval_stream_test — with
the TPU-native featurization design:

- the reference builds one 49x40 spectrogram per 20 ms hop in a Python loop
  (one op dispatch each, :99-116) then batch-predicts; here the stateless
  frontend stages run once over the whole stream and windows share them
  (ops/micro_jax.stream_features), and the model runs over large batches.
- the detector replay is vectorized across all thresholds in one pass
  (stream/detector.py) instead of one full replay per threshold (:126-177).
- audio is processed in chunks bounded by max_chunk_length_sec for HBM
  headroom; chunks OVERLAP by one clip so no window is lost at boundaries
  (the reference's chunker, :72-87, has a swapped branch that accidentally
  recomputes the whole stream — behavior fixed here, windows identical).
- raw inferences are memoized to .npy exactly like the reference
  (:88-89, 213-237) so threshold sweeps don't re-run the model.
"""

from __future__ import annotations

import os
import pickle
from dataclasses import dataclass, field
from pathlib import Path
from typing import Callable, Dict, List, Optional, Sequence, Tuple

import numpy as np

from ..ops.micro_exact import FrontendConfig
from ..ops.micro_jax import MicroFrontendJax
from ..settings import SILENCE_LABEL, UNKNOWN_WORD_LABEL, standard_microspeech_model_settings
from ..utils.wav import read_wav
from .detector import DetectorParams, detect_all_thresholds
from .stats import StreamingAccuracyStats


@dataclass(frozen=True)
class StreamFlags:
    """Reference StreamFlags (batch_streaming_analysis.py:27-47)."""

    wav: str
    ground_truth: str
    target_keyword: str
    detection_thresholds: Sequence[float]
    clip_duration_ms: int = 1000
    clip_stride_ms: int = 20
    average_window_duration_ms: int = 100
    suppression_ms: int = 500
    time_tolerance_ms: int = 750
    minimum_count: int = 4
    max_chunk_length_sec: int = 1200

    def labels(self) -> List[str]:
        return [SILENCE_LABEL, UNKNOWN_WORD_LABEL, self.target_keyword]


@dataclass
class StreamTarget:
    """Reference StreamTarget (batch_streaming_analysis.py:187-194)."""

    target_lang: str
    target_word: str
    model_path: Optional[str]
    stream_flags: Sequence[StreamFlags]
    destination_result_pkl: Optional[str] = None
    destination_result_inferences: Optional[str] = None


def stream_feature_chunks(
    audio: np.ndarray,
    sample_rate: int,
    flags: StreamFlags,
    frontend: Optional[MicroFrontendJax] = None,
):
    """Long waveform -> iterator of DEVICE (n_w, 49, 40) float32 feature
    windows, chunked by max_chunk_length_sec.

    Number/timing of windows matches the reference exactly:
    range(0, len(audio) - clip_samples, stride_samples). Keeping the
    windows on device matters: at 20 ms hop a window batch is ~400 KB of
    features per second of audio, and pulling it to host only to push it
    back for the model predict doubles a multi-hundred-MB transfer.

    The default frontend is process-cached (cached_stream_frontend): a
    fresh instance per stream would re-trace the whole stream program per
    call (~9 s on a 10-min stream, the dominant cost of the old engine —
    benchmarks/stream_cost_decomposition.json)."""
    from ..ops.micro_jax import cached_stream_frontend

    frontend = frontend or cached_stream_frontend(int(sample_rate))
    clip_samples = int(flags.clip_duration_ms * sample_rate / 1000)
    stride_samples = int(flags.clip_stride_ms * sample_rate / 1000)
    audio_data_end = audio.shape[0] - clip_samples
    if audio_data_end <= 0:
        return
    num_windows = int(np.ceil(audio_data_end / stride_samples))

    # int16 on the wire (the frontend converts to int32 in-graph,
    # micro_jax.base_frames): halves the host->device bytes — ~0.25 s on a
    # 10-min stream through the 47 MB/s tunnel (stream_cost_decomposition)
    i16 = np.clip(np.trunc(audio * 32768.0), -32768, 32767).astype(np.int16)

    max_chunk_windows = max(
        1, int(flags.max_chunk_length_sec * sample_rate) // stride_samples
    )
    w = 0
    while w < num_windows:
        n_w = min(max_chunk_windows, num_windows - w)
        start = w * stride_samples
        end = start + (n_w - 1) * stride_samples + clip_samples
        chunk = i16[start:end]
        yield frontend.stream_features(chunk, n_w)
        w += n_w


def featurize_stream(
    audio: np.ndarray,
    sample_rate: int,
    flags: StreamFlags,
    frontend: Optional[MicroFrontendJax] = None,
) -> np.ndarray:
    """Long waveform -> host (num_windows, 49, 40) float32 feature windows
    (materialized; calculate_streaming_accuracy uses the device-resident
    stream_feature_chunks instead)."""
    outs = [
        np.asarray(c)
        for c in stream_feature_chunks(audio, sample_rate, flags, frontend)
    ]
    if not outs:
        return np.zeros((0, 49, 40), np.float32)
    return np.concatenate(outs, axis=0)


def _batch_slicer(batch_size: int):
    """One jitted (window-array, start) -> (batch_size, F, C, 1) program.

    The start index is a TRACED operand (lax.dynamic_slice), so every batch
    of a stream reuses ONE executable regardless of its offset. Through the
    remote-tunnel deployment each distinct program submit costs ~10-30 ms;
    the old per-batch `wdev[i:i+bs][..., None]` emitted a fresh static-slice
    + reshape + predict trio per offset — 16 variable offsets cost 0.62 s
    against ~0.1 s of model compute (benchmarks/
    stream_cost_decomposition.json, predict_sync/predict_async)."""
    import jax

    def f(w, i):
        return jax.lax.dynamic_slice_in_dim(w, i, batch_size, 0)[..., None]

    return jax.jit(f)


_BATCH_SLICERS: Dict[int, Callable] = {}


def _predict_batches(predict_fn, wdev, batch_size: int) -> list:
    """predict_fn over (n, F, C) windows in fixed-shape batches.

    Device arrays are zero-padded to a batch multiple so predict_fn only
    ever sees ONE batch shape (one compile, one executable fetch); the pad
    rows' predictions are sliced off before they reach the caller. The
    model is row-independent in eval mode, so real rows are bit-identical
    to the variable-shape loop (tests/test_stream_e2e.py e2e-asserts the
    detections). Host numpy windows keep the plain variable-tail loop."""
    n_w = int(wdev.shape[0])
    if n_w == 0:
        return []
    try:
        import jax
        import jax.numpy as jnp

        is_dev = isinstance(wdev, jax.Array)
    except Exception:  # pragma: no cover - jax always present in this repo
        is_dev = False
    if not is_dev:
        return [
            predict_fn(wdev[i : i + batch_size][..., None])
            for i in range(0, n_w, batch_size)
        ]
    nb = -(-n_w // batch_size)
    pad = nb * batch_size - n_w
    wpad = jnp.pad(wdev, ((0, pad), (0, 0), (0, 0))) if pad else wdev
    slicer = _BATCH_SLICERS.setdefault(batch_size, _batch_slicer(batch_size))
    preds = []
    for bi in range(nb):
        p = predict_fn(slicer(wpad, bi * batch_size))
        keep = min(batch_size, n_w - bi * batch_size)
        preds.append(p[:keep] if keep < batch_size else p)
    return preds


def calculate_streaming_accuracy(
    predict_fn: Callable[[np.ndarray], np.ndarray],
    flag_list: Sequence[StreamFlags],
    existing_inferences: Optional[np.ndarray] = None,
    frontend: Optional[MicroFrontendJax] = None,
    batch_size: int = 8192,
    verbose: bool = True,
):
    """Reference calculate_streaming_accuracy (:50-179).

    predict_fn: (B, 49, 40, 1) float32 -> (B, 3) softmax.
    Returns (results list [(flags, {thresh: (found, found_w_conf)})], inferences).
    """
    assert len({f.wav for f in flag_list}) == 1, "can only process one wav"
    assert len({f.clip_duration_ms for f in flag_list}) == 1, "cannot vary"
    assert len({f.clip_stride_ms for f in flag_list}) == 1, "cannot vary"
    f0 = flag_list[0]

    audio, sample_rate = read_wav(f0.wav)
    clip_samples = int(f0.clip_duration_ms * sample_rate / 1000)
    stride_samples = int(f0.clip_stride_ms * sample_rate / 1000)
    audio_data_end = audio.shape[0] - clip_samples

    if existing_inferences is not None:
        inferences = np.asarray(existing_inferences)
    else:
        # features stay ON DEVICE end to end; only the (B, 3) softmax rows
        # come back to host (~1000x less transfer than materializing the
        # feature windows)
        preds = []
        for wdev in stream_feature_chunks(
            audio, sample_rate, f0, frontend=frontend
        ):
            preds.extend(_predict_batches(predict_fn, wdev, batch_size))
        import jax
        import jax.numpy as jnp

        if preds and all(isinstance(p, jax.Array) for p in preds):
            # one device-side concat + ONE host pull: per-batch np.asarray
            # paid a ~36 ms tunnel round trip per batch (~0.5 s over a
            # 10-min stream)
            inferences = np.asarray(jnp.concatenate(preds, axis=0))
        elif preds:
            inferences = np.concatenate([np.asarray(p) for p in preds], axis=0)
        else:
            inferences = np.zeros((0, 3), np.float32)

    times_ms = np.array(
        [
            int(off * 1000 / sample_rate)
            for off in range(0, audio_data_end, stride_samples)
        ],
        dtype=np.int64,
    )
    n = min(len(times_ms), inferences.shape[0])
    times_ms = times_ms[:n]

    results = []
    for flags in flag_list:
        params = DetectorParams(
            average_window_duration_ms=flags.average_window_duration_ms,
            suppression_ms=flags.suppression_ms,
            minimum_count=flags.minimum_count,
            target_id=2,
        )
        per_thresh = detect_all_thresholds(
            inferences[:n],
            times_ms,
            flags.detection_thresholds,
            params,
            target_name=flags.target_keyword,
        )
        res_thresh = {}
        for threshold in flags.detection_thresholds:
            found, found_w_conf = per_thresh[float(threshold)]
            stats = StreamingAccuracyStats(target_keyword=flags.target_keyword)
            stats.read_ground_truth_file(flags.ground_truth)
            stats.calculate_accuracy_stats(found, -1, flags.time_tolerance_ms)
            if verbose:
                print(f"results for {threshold:0.2f}")
                stats.print_accuracy_stats()
            res_thresh[threshold] = (found, found_w_conf)
        results.append((flags, res_thresh))
    return results, inferences


def eval_stream_test(
    st: StreamTarget,
    predict_fn: Optional[Callable] = None,
    frontend: Optional[MicroFrontendJax] = None,
    verbose: bool = True,
    compute_dtype: Optional[str] = None,
):
    """Reference eval_stream_test (:197-241): result/inference memoization +
    streaming accuracy. predict_fn may be omitted if st.model_path points to
    a saved transfer model (loaded here). compute_dtype="bfloat16" runs the
    trunk conv/dense/BN compute in bf16 (~45% faster forward on v5e,
    docs/PERFORMANCE.md §1); the f32 params load unchanged and the softmax
    rows stay f32. Default f32 — the streaming-detection parity evidence
    was replayed at f32."""
    if predict_fn is None:
        from ..train import checkpoints as ckpt
        from ..models.kws_model import make_transfer_model
        import jax
        import jax.numpy as jnp

        trunk_kw = {}
        if compute_dtype is not None and compute_dtype != "float32":
            trunk_kw["dtype"] = jnp.dtype(compute_dtype)
        payload, meta = ckpt.load_model(st.model_path)
        wc = float(meta.get("width_coefficient", 1.0))
        dc = float(meta.get("depth_coefficient", 1.0))
        if wc != 1.0 or dc != 1.0:
            from ..models.efficientnet import EfficientNet
            from ..models.kws_model import KWSTransferModel

            model = KWSTransferModel(
                trunk=EfficientNet(
                    width_coefficient=wc, depth_coefficient=dc, **trunk_kw
                ),
                num_categories=3,
            )
        else:
            model = make_transfer_model(num_categories=3, **trunk_kw)
        cols = {"params": payload["params"]}
        if payload.get("batch_stats") is not None:
            cols["batch_stats"] = payload["batch_stats"]

        @jax.jit
        def predict_fn(specs):
            return model.apply(cols, specs, train=False)

    if st.destination_result_pkl is not None and os.path.isfile(
        st.destination_result_pkl
    ):
        print("results already present", st.destination_result_pkl, flush=True)
        return

    inferences_exist = False
    loaded_inferences = None
    if st.destination_result_inferences is not None and os.path.isfile(
        st.destination_result_inferences
    ):
        print("inferences already present", flush=True)
        loaded_inferences = np.load(st.destination_result_inferences)
        inferences_exist = True

    results = {}
    results[st.target_word], inferences = calculate_streaming_accuracy(
        predict_fn,
        st.stream_flags,
        existing_inferences=loaded_inferences,
        frontend=frontend,
        verbose=verbose,
    )

    if st.destination_result_pkl is not None:
        Path(st.destination_result_pkl).parent.mkdir(parents=True, exist_ok=True)
        with open(st.destination_result_pkl, "wb") as fh:
            pickle.dump(results, fh)
    if not inferences_exist and st.destination_result_inferences is not None:
        Path(st.destination_result_inferences).parent.mkdir(
            parents=True, exist_ok=True
        )
        np.save(st.destination_result_inferences, inferences)
    return results
