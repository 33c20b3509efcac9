"""Device mesh + sharding helpers.

The reference is single-device (SURVEY.md section 2.2/2.3 — no distributed
backend at all); this module is the new first-class TPU-native component:
one mesh with named axes, batch sharding over "data", replicated params,
XLA collectives over ICI. Kept deliberately thin — axes ("data",) suffice at
EfficientNetB0 scale, but "model" is reserved so tensor parallelism can be
added without API change.

Multi-host: call jax.distributed.initialize() before make_mesh() (see
initialize_distributed).
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def initialize_distributed(**kw) -> None:
    """Multi-host init (no-op when single-process)."""
    if jax.process_count() > 1 or os.environ.get("JAX_COORDINATOR_ADDRESS"):
        jax.distributed.initialize(**kw)


def make_mesh(
    num_devices: Optional[int] = None,
    model_parallelism: int = 1,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """Mesh over (data, model). Default: all devices on the data axis."""
    devices = list(devices if devices is not None else jax.devices())
    if num_devices is not None:
        devices = devices[:num_devices]
    n = len(devices)
    assert n % model_parallelism == 0, (n, model_parallelism)
    arr = np.array(devices).reshape(n // model_parallelism, model_parallelism)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, *arrays):
    """Place host arrays as global batch-sharded device arrays."""
    sh = batch_sharding(mesh)
    out = tuple(jax.device_put(a, sh) for a in arrays)
    return out if len(out) > 1 else out[0]


def replicate(mesh: Mesh, tree):
    """Replicate a pytree (params/opt state) across the mesh."""
    sh = replicated(mesh)
    return jax.tree_util.tree_map(lambda a: jax.device_put(a, sh), tree)


def make_sharded_predict(predict_fn, mesh: Mesh, pad_batch_to: int = 1):
    """Wrap a jitted (B, ...) -> (B, ...) predictor so the batch axis is
    sharded over the mesh "data" axis — the window-axis parallelism for
    long-audio streaming eval (SURVEY 2.2: the CP analogue for a CNN; the
    reference chunks long audio onto ONE device, batch_streaming_analysis.py
    :72-87). Pads the batch to a device multiple and strips the padding.
    """
    n_dev = mesh.shape[DATA_AXIS]
    multiple = max(n_dev * pad_batch_to, 1)
    sh = batch_sharding(mesh)

    def wrapped(batch):
        batch = np.asarray(batch)
        padded, real = pad_to_multiple(batch, multiple)
        with mesh:
            out = predict_fn(jax.device_put(padded, sh))
        return np.asarray(out)[:real]

    return wrapped


def pad_to_multiple(batch: np.ndarray, multiple: int, axis: int = 0):
    """Pad a host batch so it divides evenly across the data axis; returns
    (padded, real_count)."""
    n = batch.shape[axis]
    rem = (-n) % multiple
    if rem == 0:
        return batch, n
    pad_widths = [(0, 0)] * batch.ndim
    pad_widths[axis] = (0, rem)
    return np.pad(batch, pad_widths, mode="edge"), n
