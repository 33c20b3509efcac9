"""Flax -> TF/Keras weight exporter: the reverse of models/import_tf.py.

Lets a model trained in THIS framework flow back into the reference's TF
tooling: the exported Keras model has the reference's exact architecture
and layer names (train_monolingual_embedding.py:81-100 for the embedding
model; transfer_learning.py:38-53 head shape for transfer models), so
reference code that loads a base model and truncates at layer "dense_2"
(transfer_learning.py:36-43) or batch-predicts with Keras works unchanged
on our checkpoints. Round-trip guarantee: import_keras_kws_model(
export_keras_kws_model(tree)) reproduces the tree exactly, and Keras
predict matches Flax apply (inference mode) to float tolerance
(tests/test_export_tf.py).

Weight-layout notes are the inverse of import_tf's: Flax grouped-conv
depthwise kernels (H, W, 1, C) -> Keras DepthwiseConv2D (H, W, C, 1);
Flax BN {scale, bias} + batch_stats {mean, var} -> Keras (gamma, beta,
moving_mean, moving_variance). The Flax trunk's folded input preprocessing
must be the Keras-default Rescaling(1/255) + identity Normalization
(input_scale=1/255, input_bias=0) — anything else cannot be represented in
the stock keras.applications prefix and raises.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import numpy as np

from .import_tf import _iter_leaf_layers


def _np(tree_leaf) -> np.ndarray:
    return np.asarray(tree_leaf, dtype=np.float32)


def build_reference_keras_model(
    num_labels: int, kind: str = "embedding", transfer_categories: int = 3
):
    """The reference architectures with deterministic reference layer names.

    kind="embedding": EfficientNetB0(include_top=False, weights=None) +
    GAP + Dense1024 relu x2 + Dense192 selu ("dense_2") + Dense num_labels
    (train_monolingual_embedding.py:81-100; denses named dense..dense_3 as
    the reference's auto-naming produces in a fresh session).
    kind="transfer": the same trunk+head truncated at "dense_2" + Dense 18
    tanh + Dense softmax (transfer_learning.py:38-53)."""
    import tensorflow as tf

    tf.config.set_visible_devices([], "GPU")
    inputs = tf.keras.Input((49, 40, 1))
    trunk = tf.keras.applications.EfficientNetB0(
        include_top=False, weights=None, input_tensor=inputs
    )
    x = tf.keras.layers.GlobalAveragePooling2D()(trunk.output)
    x = tf.keras.layers.Dense(1024, activation="relu", name="dense")(x)
    x = tf.keras.layers.Dense(1024, activation="relu", name="dense_1")(x)
    x = tf.keras.layers.Dense(
        192, activation="selu", kernel_initializer="lecun_normal",
        name="dense_2",
    )(x)
    if kind == "embedding":
        out = tf.keras.layers.Dense(num_labels, name="dense_3")(x)
    elif kind == "transfer":
        x = tf.keras.layers.Dense(18, activation="tanh", name="dense_3")(x)
        out = tf.keras.layers.Dense(
            transfer_categories, activation="softmax", name="dense_4"
        )(x)
    else:
        raise ValueError(f"unknown kind {kind!r}")
    return tf.keras.Model(inputs, out)


def export_keras_kws_model(
    params: Dict[str, Any],
    batch_stats: Dict[str, Any],
    input_scale: float = 1.0 / 255.0,
    input_bias: float = 0.0,
    keras_model=None,
):
    """Flax KWS trees (KWSEmbeddingModel or KWSTransferModel layout) ->
    a reference-architecture Keras model carrying the same weights.

    params/batch_stats: as produced by model.init / training (f32 leaves).
    keras_model: optionally a pre-built destination (must use reference
    layer names); built fresh via build_reference_keras_model otherwise.
    """
    if not (
        np.isclose(input_scale, 1.0 / 255.0) and np.isclose(input_bias, 0.0)
    ):
        raise ValueError(
            "the stock Keras EfficientNetB0 prefix is Rescaling(1/255) + "
            f"identity Normalization; cannot represent input_scale="
            f"{input_scale}, input_bias={input_bias}"
        )
    trunk_p = params["trunk"]
    trunk_s = batch_stats["trunk"]
    head = params["embedding_head"]
    if "transfer_head" in params:
        kind = "transfer"
        dense_tail = [
            params["transfer_head"]["hidden"],
            params["transfer_head"]["out"],
        ]
    else:
        kind = "embedding"
        dense_tail = [params["classifier"]]
    num_outputs = dense_tail[-1]["bias"].shape[0]
    if keras_model is None:
        keras_model = build_reference_keras_model(
            num_outputs if kind == "embedding" else 761,
            kind=kind,
            transfer_categories=num_outputs,
        )

    dense_by_order = [
        head["dense_0"], head["dense_1"], head["dense_2"], *dense_tail
    ]
    dense_i = 0
    for layer in _iter_leaf_layers(keras_model):
        cls = layer.__class__.__name__
        name = layer.name
        if cls == "Dense":
            d = dense_by_order[dense_i]
            dense_i += 1
            layer.set_weights([_np(d["kernel"]), _np(d["bias"])])
            continue
        if not layer.get_weights():
            continue
        if name == "stem_conv":
            block, key = "stem", "conv"
        elif name == "stem_bn":
            block, key = "stem", "bn"
        elif name == "top_conv":
            block, key = "top", "conv"
        elif name == "top_bn":
            block, key = "top", "bn"
        elif name.startswith("block"):
            block, suffix = name.split("_", 1)
            key = {
                "expand_conv": "expand_conv",
                "expand_bn": "expand_bn",
                "dwconv": "dw_conv",
                "bn": "dw_bn",
                "se_reduce": "se_reduce",
                "se_expand": "se_expand",
                "project_conv": "project_conv",
                "project_bn": "project_bn",
            }.get(suffix)
            if key is None:
                raise ValueError(f"unmapped trunk layer {name!r}")
        elif name.startswith("normalization") or name.startswith("rescaling"):
            continue  # the (default) input prefix carries no learned state
        else:
            raise ValueError(f"unmapped weighted layer {name!r} ({cls})")

        p = trunk_p[block][key]
        if key.endswith("bn"):
            s = trunk_s[block][key]
            layer.set_weights(
                [_np(p["scale"]), _np(p["bias"]), _np(s["mean"]), _np(s["var"])]
            )
        elif cls == "DepthwiseConv2D":
            k = _np(p["kernel"])  # Flax grouped conv (H, W, 1, C)
            h, w, one, c = k.shape
            assert one == 1, k.shape
            layer.set_weights([k.reshape(h, w, c, 1)])
        else:
            weights = [_np(p["kernel"])]
            if "bias" in p:
                weights.append(_np(p["bias"]))
            layer.set_weights(weights)
    if dense_i != len(dense_by_order):
        raise ValueError(
            f"dense count mismatch: set {dense_i}, "
            f"expected {len(dense_by_order)}"
        )
    return keras_model


def export_and_save(
    params: Dict[str, Any],
    batch_stats: Dict[str, Any],
    dest: str,
    input_scale: float = 1.0 / 255.0,
    input_bias: float = 0.0,
) -> None:
    """Export + write to disk: `.keras`/`.h5` via model.save (loadable by
    tf.keras.models.load_model, i.e. by the reference's transfer_learn
    base_model_path), anything else via Keras-3 model.export (an
    inference SavedModel directory)."""
    model = export_keras_kws_model(
        params, batch_stats, input_scale=input_scale, input_bias=input_bias
    )
    if str(dest).endswith((".keras", ".h5")):
        model.save(dest)
    else:
        model.export(dest)


def convert_checkpoint_and_save(ckpt_path, dest) -> None:
    """One-shot: orbax checkpoint (train/checkpoints.py format, as written
    by pretraining or `import-tf`) -> Keras artifact. The inverse of
    import_tf.convert_and_save, closing the TF<->Flax loop: models
    pretrained HERE flow back into the reference's Keras tooling."""
    from ..train.checkpoints import load_model

    payload, meta = load_model(ckpt_path)
    if not payload.get("batch_stats"):
        raise ValueError(
            f"checkpoint {ckpt_path} has no batch_stats — the EfficientNet "
            "trunk's BN running statistics are required to build a working "
            "Keras model (save with save_model(..., batch_stats=...))"
        )
    export_and_save(
        payload["params"],
        payload["batch_stats"],
        dest,
        input_scale=float(meta.get("input_scale", 1.0 / 255.0)),
        input_bias=float(meta.get("input_bias", 0.0)),
    )


if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser(
        description="Convert an orbax KWS checkpoint to a Keras artifact"
    )
    ap.add_argument("ckpt")
    ap.add_argument("dest")
    a = ap.parse_args()
    convert_checkpoint_and_save(a.ckpt, a.dest)
