"""DS-CNN keyword-spotting model (depthwise-separable CNN baseline).

Flax reimplementation of the reference's DS-CNN comparison baseline
(notebooks/dscnn_comparison_filtering.py:48-150): Conv 10x4 stride 2 ->
4 x [depthwise 3x3 + pointwise 1x1] blocks (all BN+relu), dropout,
average-pool over the halved input size, dense softmax. The reference's
L2 kernel regularization (weight_decay 1e-4) is applied in the optimizer
(optax additive weight decay) rather than as a loss term; the step-function
learning-rate schedule (:131-146) is provided as an optax schedule.
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax.numpy as jnp
import optax


class SeparableBlock(nn.Module):
    filters: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = x.shape[-1]
        x = nn.Conv(
            c, (3, 3), padding="SAME", feature_group_count=c, use_bias=True,
            name="dw",
        )(x)
        x = nn.BatchNorm(use_running_average=not train, name="dw_bn")(x)
        x = nn.relu(x)
        x = nn.Conv(self.filters, (1, 1), padding="SAME", name="pw")(x)
        x = nn.BatchNorm(use_running_average=not train, name="pw_bn")(x)
        return nn.relu(x)


class DSCNN(nn.Module):
    """Input (B, 49, 40, 1) -> (B, num_labels) softmax."""

    num_labels: int
    filters: int = 64
    num_blocks: int = 4
    input_hw: Tuple[int, int] = (49, 40)

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(
            self.filters, (10, 4), strides=(2, 2), padding="SAME", name="stem"
        )(x)
        x = nn.BatchNorm(use_running_average=not train, name="stem_bn")(x)
        x = nn.relu(x)
        x = nn.Dropout(0.2, deterministic=not train, name="stem_drop")(x)
        for i in range(self.num_blocks):
            x = SeparableBlock(self.filters, name=f"block{i+1}")(x, train=train)
        x = nn.Dropout(0.4, deterministic=not train, name="head_drop")(x)
        # reference: AveragePooling2D(pool_size=(in_h//2, in_w//2)) then flatten
        pool = (self.input_hw[0] // 2, self.input_hw[1] // 2)
        x = nn.avg_pool(x, pool, strides=pool)
        x = x.reshape((x.shape[0], -1))
        return nn.softmax(nn.Dense(self.num_labels, name="out")(x))


def dscnn_lr_schedule() -> optax.Schedule:
    """Step-function LR (reference :131-141): 5e-4 until epoch 12, 1e-4 until
    24, 2e-5 until 36, then 1e-5 — expressed per-epoch; compose with your
    steps-per-epoch via optax.join_schedules at step granularity."""

    def schedule(epoch):
        return jnp.where(
            epoch < 12, 5e-4,
            jnp.where(epoch < 24, 1e-4, jnp.where(epoch < 36, 2e-5, 1e-5)),
        )

    return schedule


def dscnn_optimizer(steps_per_epoch: int, weight_decay: float = 1e-4):
    """Adam + step LR + additive L2 (the reference's kernel_regularizer)."""
    def per_step(step):
        return dscnn_lr_schedule()(step // max(steps_per_epoch, 1))

    return optax.chain(
        optax.add_decayed_weights(weight_decay),
        optax.adam(per_step),
    )
