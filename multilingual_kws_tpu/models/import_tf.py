"""TF/Keras -> Flax weight importer for the reference KWS models.

The reference ships its pretrained multilingual embedding model as a Keras
SavedModel (EfficientNetB0 include_top=False + GAP + Dense1024 relu x2 +
Dense192 selu ["dense_2"] + Dense logits; train_monolingual_embedding.py:81-100)
and its few-shot transfer models as the truncated trunk + Dense18 tanh +
Dense3 softmax (transfer_learning.py:38-53). This module maps those weights
tensor-by-tensor onto the Flax modules in models/efficientnet.py /
models/kws_model.py so the released checkpoint (e.g.
`multilingual_context_73_0.8011`, docker/Dockerfile:83-84) can be used for
few-shot parity without re-pretraining.

Layer-name mapping (Keras -> Flax param tree):
  stem_conv / stem_bn                     -> trunk/stem/{conv,bn}
  block{S}{r}_expand_conv|_expand_bn      -> trunk/block{S}{r}/{expand_conv,expand_bn}
  block{S}{r}_dwconv|_bn                  -> trunk/block{S}{r}/{dw_conv,dw_bn}
  block{S}{r}_se_reduce|_se_expand        -> trunk/block{S}{r}/{se_reduce,se_expand}
  block{S}{r}_project_conv|_project_bn    -> trunk/block{S}{r}/{project_conv,project_bn}
  top_conv / top_bn                       -> trunk/top/{conv,bn}
  dense layers (appearance order)         -> embedding_head/dense_0, dense_1,
                                             dense_2 (the 192-d embedding),
                                             then classifier / transfer_head

Weight-layout notes: Keras Conv2D kernels are (H, W, Cin, Cout) == Flax.
Keras DepthwiseConv2D kernels are (H, W, C, mult) -> reshaped to Flax
grouped-conv (H, W, 1, C*mult). Keras BN (gamma, beta, mean, var) ->
Flax (scale, bias) params + (mean, var) batch_stats. The Keras
Rescaling(1/255) + unadapted Normalization prefix is folded into the Flax
trunk's (input_scale, input_bias) hyperparameters.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import numpy as np


def _iter_leaf_layers(keras_model):
    """Depth-first leaf layers, recursing into nested Models/Sequentials.

    The reference saves transfer models as Sequential([truncated base
    Model, Dense 18, Dense 3]) (transfer_learning.py:38-53, saved by
    run.py:299-300), so the trunk's layers are nested one level down."""
    for layer in keras_model.layers:
        if hasattr(layer, "layers") and layer.layers:
            yield from _iter_leaf_layers(layer)
        else:
            yield layer


def _keras_weights_by_layer(keras_model) -> Dict[str, list]:
    out = {}
    for layer in _iter_leaf_layers(keras_model):
        w = layer.get_weights()
        if not w:
            continue
        name = layer.name
        while name in out:  # nested models can reuse auto-generated names
            name += "#"
        out[name] = [np.asarray(a) for a in w]
    return out


def _conv(weights: list) -> Dict[str, np.ndarray]:
    if len(weights) == 2:
        return {"kernel": weights[0], "bias": weights[1]}
    return {"kernel": weights[0]}


def _dwconv(weights: list) -> Dict[str, np.ndarray]:
    k = weights[0]  # (H, W, C, mult)
    h, w, c, m = k.shape
    # Flax grouped conv with feature_group_count=C*m expects (H, W, 1, C*m)
    return {"kernel": k.reshape(h, w, 1, c * m)}


def _bn(weights: list) -> Tuple[Dict[str, np.ndarray], Dict[str, np.ndarray]]:
    gamma, beta, mean, var = weights
    return {"scale": gamma, "bias": beta}, {"mean": mean, "var": var}


def _dense(weights: list) -> Dict[str, np.ndarray]:
    return {"kernel": weights[0], "bias": weights[1]}


def import_keras_kws_model(keras_model) -> Dict[str, Any]:
    """Keras KWS model (embedding OR transfer shape) -> dict with:
      params        Flax param tree for KWSEmbeddingModel/KWSTransferModel
      batch_stats   BN running statistics tree
      input_scale   folded Rescaling+Normalization scale (float)
      input_bias    folded Normalization bias (float)
      kind          "embedding" | "transfer"
      num_outputs   width of the final dense layer
    """
    by_name = _keras_weights_by_layer(keras_model)
    dense_order = []
    seen = set()
    for layer in _iter_leaf_layers(keras_model):
        if layer.__class__.__name__ != "Dense":
            continue
        name = layer.name
        while name in seen:
            name += "#"
        seen.add(name)
        if name in by_name:
            dense_order.append(name)
    return _import_weight_map(by_name, dense_order)


def _import_weight_map(
    by_name: Dict[str, list], dense_order: list
) -> Dict[str, Any]:
    """Core layer-name -> Flax-tree mapping shared by the live-Keras and
    name-based SavedModel import paths. by_name holds each layer's weights
    in Keras get_weights() order; dense_order lists dense layer names in
    graph order."""

    trunk_p: Dict[str, Any] = {}
    trunk_s: Dict[str, Any] = {}

    def put(block: str, name: str, params, stats=None):
        trunk_p.setdefault(block, {})[name] = params
        if stats is not None:
            trunk_s.setdefault(block, {})[name] = stats

    # input preprocessing fold
    input_scale = 1.0 / 255.0
    input_bias = 0.0
    for lname, w in by_name.items():
        if lname.startswith("normalization") and len(w) >= 2:
            mean, var = np.ravel(w[0]), np.ravel(w[1])
            if mean.size == 1:
                s = 1.0 / float(np.sqrt(var[0]))
                input_scale *= s
                input_bias = -float(mean[0]) * s

    # trunk
    for lname, w in sorted(by_name.items()):
        if lname == "stem_conv":
            put("stem", "conv", _conv(w))
        elif lname == "stem_bn":
            p, s = _bn(w)
            put("stem", "bn", p, s)
        elif lname == "top_conv":
            put("top", "conv", _conv(w))
        elif lname == "top_bn":
            p, s = _bn(w)
            put("top", "bn", p, s)
        elif lname.startswith("block"):
            block, suffix = lname.split("_", 1)
            if suffix == "expand_conv":
                put(block, "expand_conv", _conv(w))
            elif suffix == "expand_bn":
                p, s = _bn(w)
                put(block, "expand_bn", p, s)
            elif suffix == "dwconv":
                put(block, "dw_conv", _dwconv(w))
            elif suffix == "bn":
                p, s = _bn(w)
                put(block, "dw_bn", p, s)
            elif suffix == "se_reduce":
                put(block, "se_reduce", _conv(w))
            elif suffix == "se_expand":
                put(block, "se_expand", _conv(w))
            elif suffix == "project_conv":
                put(block, "project_conv", _conv(w))
            elif suffix == "project_bn":
                p, s = _bn(w)
                put(block, "project_bn", p, s)
            # block*_drop / activations carry no weights

    # dense layers in graph order (leaf-flattened for nested transfer models)
    dense_layers = [(name, _dense(by_name[name])) for name in dense_order]
    if len(dense_layers) == 4:  # embedding model: 1024, 1024, 192, logits
        kind = "embedding"
        head = {
            "dense_0": dense_layers[0][1],
            "dense_1": dense_layers[1][1],
            "dense_2": dense_layers[2][1],
        }
        params = {
            "trunk": trunk_p,
            "embedding_head": head,
            "classifier": dense_layers[3][1],
        }
        num_outputs = dense_layers[3][1]["bias"].shape[0]
    elif len(dense_layers) == 5:  # transfer model: ... 192, 18 tanh, 3 softmax
        kind = "transfer"
        head = {
            "dense_0": dense_layers[0][1],
            "dense_1": dense_layers[1][1],
            "dense_2": dense_layers[2][1],
        }
        params = {
            "trunk": trunk_p,
            "embedding_head": head,
            "transfer_head": {
                "hidden": dense_layers[3][1],
                "out": dense_layers[4][1],
            },
        }
        num_outputs = dense_layers[4][1]["bias"].shape[0]
    else:
        raise ValueError(
            f"unrecognized head: {len(dense_layers)} dense layers "
            f"({[n for n, _ in dense_layers]})"
        )

    return {
        "params": params,
        "batch_stats": {"trunk": trunk_s},
        "input_scale": input_scale,
        "input_bias": input_bias,
        "kind": kind,
        "num_outputs": num_outputs,
    }


def load_keras_model(path):
    """Load a Keras SavedModel/keras-file from disk (requires tensorflow)."""
    import tensorflow as tf

    tf.config.set_visible_devices([], "GPU")
    return tf.keras.models.load_model(path, compile=False)


# within-layer ordering of named variables == Keras get_weights() order
_WEIGHT_RANK = {
    "kernel": 0, "depthwise_kernel": 0, "gamma": 0,  # conv/dense/bn first slot
    "bias": 1, "beta": 1,
    "moving_mean": 2, "moving_variance": 3,
    "mean": 0, "variance": 1, "count": 2,  # Normalization layer
}


def import_savedmodel_kws_model(path) -> Dict[str, Any]:
    """Name-based import of a TF SavedModel directory (the format the
    reference's released `multilingual_context_73_0.8011` checkpoint ships
    in, docker/Dockerfile:83-84).

    Keras 3 cannot `load_model` legacy Keras SavedModels, but
    `tf.saved_model.load` exposes every variable with its layer-pathed name
    (e.g. `block1a_dwconv/depthwise_kernel:0`); layer identity and
    within-layer ordering reconstruct exactly from those names, feeding the
    same mapping as the live-Keras path. Works for legacy Keras
    SavedModels and Keras-3 `model.export()` artifacts alike.
    """
    import tensorflow as tf

    tf.config.set_visible_devices([], "GPU")
    obj = tf.saved_model.load(str(path))
    grouped: Dict[str, list] = {}
    for v in obj.variables:
        name = v.name.split(":")[0]
        parts = name.split("/")
        if len(parts) < 2:
            continue
        layer, weight = parts[-2], parts[-1]
        if weight not in _WEIGHT_RANK:
            continue
        grouped.setdefault(layer, []).append((_WEIGHT_RANK[weight], np.asarray(v)))
    by_name = {
        layer: [w for _, w in sorted(ws, key=lambda t: t[0])]
        for layer, ws in grouped.items()
    }

    def dense_sort_key(name: str):
        # Keras auto-names record creation order: dense, dense_1, dense_2, ...
        suffix = name.split("dense_")[-1]
        return int(suffix) if suffix.isdigit() else -1

    dense_order = sorted(
        (
            n
            for n, w in by_name.items()
            if n.split("/")[-1].startswith("dense")
            and len(w) == 2 and w[0].ndim == 2 and w[1].ndim == 1
        ),
        key=dense_sort_key,
    )
    return _import_weight_map(by_name, dense_order)


def import_tf_checkpoint(
    path,
) -> Tuple[Any, Dict[str, Any], Dict[str, Any], Dict[str, Any]]:
    """SavedModel dir -> (flax_module, params, batch_stats, meta).

    Builds the matching Flax module (KWSEmbeddingModel or KWSTransferModel
    with the folded input preprocessing) and returns ready-to-use variables.
    """
    import os

    from .efficientnet import EfficientNetB0
    from .kws_model import KWSEmbeddingModel, KWSTransferModel

    if os.path.isdir(path) and os.path.exists(
        os.path.join(path, "saved_model.pb")
    ):
        # TF SavedModel directory (the released-checkpoint format): Keras 3
        # cannot load_model these — import by variable name instead
        imported = import_savedmodel_kws_model(path)
    else:
        imported = import_keras_kws_model(load_keras_model(path))
    trunk = EfficientNetB0(
        input_scale=imported["input_scale"], input_bias=imported["input_bias"]
    )
    if imported["kind"] == "embedding":
        module = KWSEmbeddingModel(num_labels=imported["num_outputs"], trunk=trunk)
    else:
        module = KWSTransferModel(
            trunk=trunk, num_categories=imported["num_outputs"]
        )
    meta = {k: imported[k] for k in ("kind", "num_outputs", "input_scale", "input_bias")}
    return module, imported["params"], imported["batch_stats"], meta


def convert_and_save(tf_path, dest) -> None:
    """One-shot: TF SavedModel -> orbax checkpoint (train/checkpoints.py
    format, loadable by transfer_learn via base_model_path)."""
    from ..train.checkpoints import save_model

    module, params, batch_stats, meta = import_tf_checkpoint(tf_path)
    save_model(
        dest,
        params,
        batch_stats=batch_stats,
        metadata={"kind": meta["kind"], "source": str(tf_path),
                  "input_scale": meta["input_scale"],
                  "input_bias": meta["input_bias"],
                  "num_outputs": meta["num_outputs"]},
    )


if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser(description="Convert a reference Keras "
                                 "SavedModel to an orbax checkpoint")
    ap.add_argument("tf_model")
    ap.add_argument("dest")
    a = ap.parse_args()
    convert_and_save(a.tf_model, a.dest)
