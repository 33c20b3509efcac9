"""EfficientNet (B0 by default) in Flax linen, TPU-first.

From-scratch implementation of the EfficientNet architecture (Tan & Le 2019)
matching the structure the reference builds via Keras
(train_monolingual_embedding.py:81-90: EfficientNetB0 include_top=False,
weights=None, input 49x40x1) closely enough that Keras weights can be ported
tensor-by-tensor (models/import_tf.py).

Keras-compat notes (needed for exact weight-port equivalence):
- stride-2 convs use explicit asymmetric "correct_pad" zero padding then
  VALID conv (Keras imagenet_utils.correct_pad)
- BatchNorm: eps 1e-3, momentum 0.99
- SE bottleneck width = max(1, int(block_input_filters * se_ratio))
- swish activations; expansion ratio 6 except first stage
- Keras EfficientNet prepends Rescaling(1/255) (+ identity Normalization
  when weights=None); that input scaling is exposed here as `input_scale`.

NHWC layout throughout (TPU-native conv layout).
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from typing import Any, List, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


@dataclass(frozen=True)
class BlockArgs:
    kernel_size: int
    num_repeat: int
    filters_in: int
    filters_out: int
    expand_ratio: int
    strides: int
    se_ratio: float = 0.25


# EfficientNet-B0 baseline blocks (Tan & Le 2019, Table 1)
DEFAULT_BLOCKS: Tuple[BlockArgs, ...] = (
    BlockArgs(3, 1, 32, 16, 1, 1),
    BlockArgs(3, 2, 16, 24, 6, 2),
    BlockArgs(5, 2, 24, 40, 6, 2),
    BlockArgs(3, 3, 40, 80, 6, 2),
    BlockArgs(5, 3, 80, 112, 6, 1),
    BlockArgs(5, 4, 112, 192, 6, 2),
    BlockArgs(3, 1, 192, 320, 6, 1),
)


def round_filters(filters: int, width_coefficient: float, divisor: int = 8) -> int:
    filters *= width_coefficient
    new_filters = max(divisor, int(filters + divisor / 2) // divisor * divisor)
    if new_filters < 0.9 * filters:
        new_filters += divisor
    return int(new_filters)


def round_repeats(repeats: int, depth_coefficient: float) -> int:
    return int(math.ceil(depth_coefficient * repeats))


def correct_pad(size_hw: Tuple[int, int], kernel: int) -> Tuple[Tuple[int, int], Tuple[int, int]]:
    """Keras imagenet_utils.correct_pad for stride-2 convs (NHWC)."""
    adjust = (1 - size_hw[0] % 2, 1 - size_hw[1] % 2)
    correct = kernel // 2
    return (
        (correct - adjust[0], correct),
        (correct - adjust[1], correct),
    )


class ConvBnAct(nn.Module):
    filters: int
    kernel: int
    strides: int = 1
    use_act: bool = True
    name_prefix: str = ""
    dtype: Any = jnp.float32  # compute dtype; params/BN stats stay f32

    @nn.compact
    def __call__(self, x, train: bool):
        if self.strides == 2:
            pad = correct_pad((x.shape[-3], x.shape[-2]), self.kernel)
            x = jnp.pad(x, ((0, 0), pad[0], pad[1], (0, 0)))
            padding = "VALID"
        else:
            padding = "SAME"
        x = nn.Conv(
            self.filters,
            (self.kernel, self.kernel),
            strides=(self.strides, self.strides),
            padding=padding,
            use_bias=False,
            name="conv",
            dtype=self.dtype,
        )(x)
        x = nn.BatchNorm(
            use_running_average=not train, momentum=0.99, epsilon=1e-3,
            name="bn", dtype=self.dtype,
        )(x)
        if self.use_act:
            x = nn.swish(x)
        return x


class MBConvBlock(nn.Module):
    """Mobile inverted bottleneck with squeeze-excitation."""

    args: BlockArgs
    filters_in: int
    filters_out: int
    strides: int
    drop_rate: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        a = self.args
        inputs = x
        expanded = self.filters_in * a.expand_ratio

        if a.expand_ratio != 1:
            x = nn.Conv(
                expanded, (1, 1), use_bias=False, name="expand_conv",
                dtype=self.dtype,
            )(x)
            x = nn.BatchNorm(
                use_running_average=not train, momentum=0.99, epsilon=1e-3,
                name="expand_bn", dtype=self.dtype,
            )(x)
            x = nn.swish(x)

        # depthwise
        if self.strides == 2:
            pad = correct_pad((x.shape[-3], x.shape[-2]), a.kernel_size)
            x = jnp.pad(x, ((0, 0), pad[0], pad[1], (0, 0)))
            padding = "VALID"
        else:
            padding = "SAME"
        x = nn.Conv(
            expanded,
            (a.kernel_size, a.kernel_size),
            strides=(self.strides, self.strides),
            padding=padding,
            feature_group_count=expanded,
            use_bias=False,
            name="dw_conv",
            dtype=self.dtype,
        )(x)
        x = nn.BatchNorm(
            use_running_average=not train, momentum=0.99, epsilon=1e-3,
            name="dw_bn", dtype=self.dtype,
        )(x)
        x = nn.swish(x)

        # squeeze-excitation (bottleneck sized from block INPUT filters)
        if a.se_ratio and a.se_ratio > 0:
            se_filters = max(1, int(self.filters_in * a.se_ratio))
            se = jnp.mean(x, axis=(-3, -2), keepdims=True)
            se = nn.Conv(
                se_filters, (1, 1), name="se_reduce", dtype=self.dtype
            )(se)
            se = nn.swish(se)
            se = nn.Conv(
                expanded, (1, 1), name="se_expand", dtype=self.dtype
            )(se)
            se = nn.sigmoid(se)
            x = x * se

        x = nn.Conv(
            self.filters_out, (1, 1), use_bias=False, name="project_conv",
            dtype=self.dtype,
        )(x)
        x = nn.BatchNorm(
            use_running_average=not train, momentum=0.99, epsilon=1e-3,
            name="project_bn", dtype=self.dtype,
        )(x)

        if self.strides == 1 and self.filters_in == self.filters_out:
            if self.drop_rate > 0:
                x = nn.Dropout(
                    rate=self.drop_rate, broadcast_dims=(1, 2, 3),
                    deterministic=not train, name="drop",
                )(x)
            x = x + inputs
        return x


class EfficientNet(nn.Module):
    """EfficientNet trunk (no pooling/top). Input NHWC; returns feature map."""

    width_coefficient: float = 1.0
    depth_coefficient: float = 1.0
    drop_connect_rate: float = 0.2
    blocks: Tuple[BlockArgs, ...] = DEFAULT_BLOCKS
    input_scale: float = 1.0 / 255.0  # Keras Rescaling(1/255) equivalence
    # Keras prepends Normalization(axis=-1): (x - mean)/sqrt(var). Folded by
    # the TF importer into (scale, bias); identity when never adapted.
    input_bias: float = 0.0
    # compute dtype (activations/conv math); params and BN running stats
    # stay float32 — pass jnp.bfloat16 for mixed-precision on the MXU
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = x * self.input_scale + self.input_bias
        x = x.astype(self.dtype)
        stem = round_filters(32, self.width_coefficient)
        x = ConvBnAct(stem, 3, strides=2, name="stem", dtype=self.dtype)(x, train)

        total_blocks = sum(
            round_repeats(b.num_repeat, self.depth_coefficient) for b in self.blocks
        )
        bidx = 0
        for stage, b in enumerate(self.blocks):
            f_in = round_filters(b.filters_in, self.width_coefficient)
            f_out = round_filters(b.filters_out, self.width_coefficient)
            repeats = round_repeats(b.num_repeat, self.depth_coefficient)
            for r in range(repeats):
                drop = self.drop_connect_rate * bidx / total_blocks
                x = MBConvBlock(
                    args=b,
                    filters_in=f_in if r == 0 else f_out,
                    filters_out=f_out,
                    strides=b.strides if r == 0 else 1,
                    drop_rate=drop,
                    dtype=self.dtype,
                    name=f"block{stage + 1}{chr(ord('a') + r)}",
                )(x, train)
                bidx += 1

        head = round_filters(1280, self.width_coefficient)
        x = ConvBnAct(head, 1, strides=1, name="top", dtype=self.dtype)(x, train)
        return x


def EfficientNetB0(**kw) -> EfficientNet:
    return EfficientNet(width_coefficient=1.0, depth_coefficient=1.0, **kw)


def EfficientNetB1(**kw) -> EfficientNet:
    return EfficientNet(width_coefficient=1.0, depth_coefficient=1.1, **kw)


def EfficientNetB2(**kw) -> EfficientNet:
    return EfficientNet(width_coefficient=1.1, depth_coefficient=1.2, **kw)
