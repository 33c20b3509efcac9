"""KWS models: embedding classifier and few-shot transfer head.

Mirrors the reference's two model shapes:

- Embedding classifier (pretraining): EfficientNetB0 trunk (49x40x1 input)
  -> GlobalAveragePooling -> Dense 1024 relu -> Dense 1024 relu ->
  Dense 192 selu (lecun_normal) [the "embedding" layer, reference layer name
  "dense_2"] -> Dense num_labels logits
  (reference train_monolingual_embedding.py:81-100)

- Few-shot transfer model: frozen trunk through the 192-d embedding ->
  Dense 18 tanh -> Dense 3 softmax (reference transfer_learning.py:38-53)

Instead of Keras layer-name surgery ("dense_2"), the embedding is a named
output: apply with ``capture_embedding=True`` or call ``embed``.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from .efficientnet import EfficientNet, EfficientNetB0

EMBEDDING_DIM = 192


class EmbeddingHead(nn.Module):
    """GAP -> 1024 relu -> 1024 relu -> 192 selu (the embedding)."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feature_map):
        x = jnp.mean(feature_map, axis=(-3, -2))  # GlobalAveragePooling2D
        x = nn.relu(nn.Dense(1024, name="dense_0", dtype=self.dtype)(x))
        x = nn.relu(nn.Dense(1024, name="dense_1", dtype=self.dtype)(x))
        # reference: Dense(192, activation="selu", kernel_initializer="lecun_normal")
        x = nn.Dense(
            EMBEDDING_DIM,
            kernel_init=nn.initializers.lecun_normal(),
            name="dense_2",
            dtype=self.dtype,
        )(x)
        # the embedding itself stays f32 (it is the public 192-d vector and
        # feeds selu, which is precision-sensitive around alpha*expm1)
        return nn.activation.selu(x.astype(jnp.float32))


class KWSEmbeddingModel(nn.Module):
    """Trunk + embedding head + classifier logits (pretraining model)."""

    num_labels: int
    trunk: EfficientNet

    def setup(self):
        self.embedding_head = EmbeddingHead(dtype=self.trunk.dtype)
        # classifier logits in f32 (loss stability)
        self.classifier = nn.Dense(self.num_labels)

    def __call__(self, x, train: bool = False, return_embedding: bool = False):
        emb = self.embed(x, train=train)
        logits = self.classifier(emb)
        if return_embedding:
            return logits, emb
        return logits

    def embed(self, x, train: bool = False):
        """The 192-d embedding (reference layer "dense_2")."""
        return self.embedding_head(self.trunk(x, train=train))


class TransferHead(nn.Module):
    """Dense 18 tanh -> Dense 3 softmax (reference transfer_learning.py:46-53)."""

    num_categories: int = 3

    @nn.compact
    def __call__(self, embedding):
        x = jnp.tanh(nn.Dense(18, name="hidden")(embedding))
        return nn.softmax(nn.Dense(self.num_categories, name="out")(x))


class KWSTransferModel(nn.Module):
    """Frozen embedding trunk + trainable few-shot 3-class head.

    The split between frozen and trainable parameters is handled by the
    training step (train/finetune.py) via parameter partitioning, not by
    stop_gradient here, so backprop_into_embedding stays possible.
    """

    trunk: EfficientNet
    num_categories: int = 3

    def setup(self):
        self.embedding_head = EmbeddingHead(dtype=self.trunk.dtype)
        self.transfer_head = TransferHead(self.num_categories)

    def __call__(self, x, train: bool = False):
        return self.transfer_head(self.embed(x, train=train))

    def embed(self, x, train: bool = False):
        """The 192-d embedding (reference layer "dense_2")."""
        return self.embedding_head(self.trunk(x, train=train))


def make_embedding_model(num_labels: int, **trunk_kw) -> KWSEmbeddingModel:
    return KWSEmbeddingModel(num_labels=num_labels, trunk=EfficientNetB0(**trunk_kw))


def make_transfer_model(num_categories: int = 3, **trunk_kw) -> KWSTransferModel:
    return KWSTransferModel(trunk=EfficientNetB0(**trunk_kw), num_categories=num_categories)


def transfer_params_from_embedding(embedding_params, transfer_params):
    """Copy trunk + embedding-head params from a pretrained embedding model
    into a transfer model's param tree (the reference's load-and-truncate at
    "dense_2", transfer_learning.py:36-43)."""
    new = dict(transfer_params)
    new["trunk"] = embedding_params["trunk"]
    new["embedding_head"] = embedding_params["embedding_head"]
    return type(transfer_params)(new)
