"""Jitted train/eval steps (single device and data-parallel).

Replaces Keras compile/fit (reference transfer_learning.py:55-93,
train_monolingual_embedding.py:103-137) with explicit optax/jit steps:

- Adam with Keras defaults (eps 1e-7) at the given LR
- sparse categorical cross-entropy, from_logits matching the model
  (transfer model outputs softmax probs; embedding model outputs logits)
- donated train state (XLA buffer reuse — the reference ran each job in a
  subprocess to reclaim GPU memory, run.py:106-113; donation makes that
  unnecessary)
- optional mesh axis name: gradients are averaged with psum over "data"
  when running under shard_map/pjit for multi-chip pretraining
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Any, Callable, Optional, Tuple

import flax
import jax
import jax.numpy as jnp
import optax


@flax.struct.dataclass
class TrainState:
    params: Any
    opt_state: Any
    batch_stats: Any
    step: jnp.ndarray


def adam(learning_rate: float) -> optax.GradientTransformation:
    """Keras-default Adam (eps=1e-7)."""
    return optax.adam(learning_rate, b1=0.9, b2=0.999, eps=1e-7)


def flat_adam(learning_rate: float) -> optax.GradientTransformation:
    """adam() over ONE flattened parameter vector (optax.flatten).

    Bit-identical elementwise to adam() — flattening only concatenates
    the (all-f32) param leaves before the same IEEE elementwise update
    math — but it replaces the per-leaf tiny fused loops of the tree
    update (~300 leaves x the m/v/update chains, each a separate loop
    with fixed setup cost in the TPU's sequential instruction stream)
    with a handful of large vector ops. Measured on the v5e
    (benchmarks/step_variant_decomposition.json, interleaved-rep
    medians, bs 512): full 761-way pretrain step 12.7 -> 7.2 ms (bf16),
    13.8 -> 7.1 ms (f32), i.e. the update half of the step was costing
    more than fwd+bwd. The pretrain driver uses this; finetune keeps
    adam() inside multi_transform (a 3-unit head gains nothing and
    flatten does not compose with the label partitioning).
    tests/test_flat_adam.py pins the update-rule bitwise equivalence
    (end-to-end runs are not bitwise comparable on CPU: threaded conv
    gradients are 1-ulp nondeterministic and adam amplifies that).

    NOTE: the optimizer state is a single flat mu/nu vector, so orbax
    checkpoints written with flat_adam are not interchangeable with
    tree-adam checkpoints (model params are unaffected).
    """
    return optax.flatten(adam(learning_rate))


def sparse_ce_from_probs(probs, labels, eps=1e-7):
    """Keras SparseCategoricalCrossentropy(from_logits=False) semantics:
    probs clipped then -log p[label]."""
    p = jnp.clip(probs, eps, 1.0)
    ll = jnp.take_along_axis(jnp.log(p), labels[:, None], axis=-1)[:, 0]
    return -ll


def sparse_ce_from_logits(logits, labels):
    logp = jax.nn.log_softmax(logits)
    return -jnp.take_along_axis(logp, labels[:, None], axis=-1)[:, 0]


def calibrate_batch_stats(
    model, variables, specs_batches, momentum: float = 0.99, iterations: int = 3
):
    """Set BN running statistics to actual data moments.

    Keras-frozen BN uses *pretrained* running stats; when fine-tuning from a
    fresh trunk (tests, ablations) those stats are the init values (mean 0,
    var 1) and normalize nothing. One mutable forward pass per batch gives
    new = momentum*old + (1-momentum)*batch, so the exact batch moments are
    recovered as (new - momentum*old) / (1-momentum); we average across
    batches. A layer's batch moments depend on upstream normalization, so we
    iterate to a fixed point. Returns variables with replaced batch_stats.
    """
    stats = variables.get("batch_stats")
    if stats is None:
        return variables
    batches = list(specs_batches)
    if not batches:
        return variables
    for _ in range(iterations):
        moment_sum = None
        for specs in batches:
            _, mutated = model.apply(
                {"params": variables["params"], "batch_stats": stats},
                specs,
                train=True,
                mutable=["batch_stats"],
                rngs={"dropout": jax.random.PRNGKey(0)},
            )
            batch_moments = jax.tree_util.tree_map(
                lambda o, new: (new - momentum * o) / (1.0 - momentum),
                stats,
                mutated["batch_stats"],
            )
            moment_sum = (
                batch_moments
                if moment_sum is None
                else jax.tree_util.tree_map(jnp.add, moment_sum, batch_moments)
            )
        stats = jax.tree_util.tree_map(lambda s: s / len(batches), moment_sum)
    return {**variables, "batch_stats": stats}


@functools.lru_cache(maxsize=8)
def make_finetune_step(
    model,
    learning_rate: float,
    trainable: Callable[[Tuple[str, ...]], bool],
):
    """Few-shot fine-tune step: frozen trunk (inference-mode BN, like Keras
    trainable=False), trainable head; model outputs softmax probs.

    `trainable(path)` decides per-parameter trainability; frozen params get
    zero updates via optax.multi_transform.

    lru_cached by (model config, lr, trainable): Flax modules hash by
    value, so every transfer_learn call with the same architecture reuses
    the SAME jitted step/eval functions — batch jobs and sweeps pay the
    full-trunk compile once instead of per keyword (the reference rebuilds
    a Keras graph per job, batch_transfer_learn_streaming.py:200-206).
    """
    tx = optax.multi_transform(
        {"train": adam(learning_rate), "freeze": optax.set_to_zero()},
        lambda params: jax.tree_util.tree_map_with_path(
            lambda path, _: "train"
            if trainable(tuple(p.key for p in path))
            else "freeze",
            params,
        ),
    )

    def init_state(variables) -> TrainState:
        """variables: {"params": ..., "batch_stats": ...} from model.init
        (batch_stats stay frozen — Keras trainable=False BN uses the
        pretrained running statistics)."""
        return TrainState(
            params=variables["params"],
            opt_state=tx.init(variables["params"]),
            batch_stats=variables.get("batch_stats"),
            step=jnp.zeros((), jnp.int32),
        )

    def _apply(params, batch_stats, specs):
        cols = {"params": params}
        if batch_stats is not None:
            cols["batch_stats"] = batch_stats
        return model.apply(cols, specs, train=False)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def step(state: TrainState, specs, labels):
        def loss_fn(params):
            probs = _apply(params, state.batch_stats, specs)
            loss = sparse_ce_from_probs(probs, labels).mean()
            acc = (jnp.argmax(probs, -1) == labels).mean()
            return loss, acc

        (loss, acc), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return (
            TrainState(params, opt_state, state.batch_stats, state.step + 1),
            {"loss": loss, "accuracy": acc},
        )

    @jax.jit
    def evaluate(state: TrainState, specs, labels):
        probs = _apply(state.params, state.batch_stats, specs)
        loss = sparse_ce_from_probs(probs, labels).mean()
        acc = (jnp.argmax(probs, -1) == labels).mean()
        return {"loss": loss, "accuracy": acc}

    @jax.jit
    def predict(state: TrainState, specs):
        return _apply(state.params, state.batch_stats, specs)

    return init_state, step, evaluate, predict


@functools.lru_cache(maxsize=8)
def make_finetune_epoch_scan(
    model,
    learning_rate: float,
    trainable: Callable[[Tuple[str, ...]], bool],
    frontend,
    aug_params,
):
    """One fine-tune EPOCH as a single device program: lax.scan over
    (gather-from-resident-bank -> augment -> featurize -> step).

    The few-shot loop is 64 tiny steps per epoch (the reference's
    steps_per_epoch = batch_size * num_batches quirk); dispatching them
    one by one costs a host round trip per step, which dominates wall
    clock on a remote TPU. Scanning the whole epoch leaves ONE dispatch
    (plus one small index upload) per epoch. Numerics identical to the
    per-step path: same ops, same keys, compiled once and iterated.
    lru_cached like make_finetune_step so batch jobs compile it once.
    """
    from ..data.dataset import _augment_featurize, _resident_gather

    tx = optax.multi_transform(
        {"train": adam(learning_rate), "freeze": optax.set_to_zero()},
        lambda params: jax.tree_util.tree_map_with_path(
            lambda path, _: "train"
            if trainable(tuple(p.key for p in path))
            else "freeze",
            params,
        ),
    )

    @functools.partial(jax.jit, donate_argnums=(0,))
    def epoch(state: TrainState, bank, bg_data, bg_sizes, idx_all, lbl_all,
              sil_all, keys):
        """idx/lbl/sil_all: (steps, B); keys: (steps, 2) PRNG keys."""

        def body(st, xs):
            idx, lbl, sil, key = xs
            wav = _resident_gather(bank, idx, sil)
            specs = _augment_featurize(
                frontend, aug_params, key, wav, sil, bg_data, bg_sizes
            )

            def loss_fn(params):
                cols = {"params": params}
                if st.batch_stats is not None:
                    cols["batch_stats"] = st.batch_stats
                probs = model.apply(cols, specs, train=False)
                loss = sparse_ce_from_probs(probs, lbl).mean()
                acc = (jnp.argmax(probs, -1) == lbl).mean()
                return loss, acc

            (loss, acc), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                st.params
            )
            updates, opt_state = tx.update(grads, st.opt_state, st.params)
            params = optax.apply_updates(st.params, updates)
            return (
                TrainState(params, opt_state, st.batch_stats, st.step + 1),
                (loss, acc),
            )

        state, (losses, accs) = jax.lax.scan(
            body, state, (idx_all, lbl_all, sil_all, keys)
        )
        return state, losses, accs

    return epoch


def make_pretrain_step(
    model,
    tx: optax.GradientTransformation,
    axis_name: Optional[str] = None,
):
    """Embedding-pretraining step: BN updates, logits + CE, optional
    cross-device gradient mean over `axis_name` (data parallelism)."""

    def init_state(variables) -> TrainState:
        return TrainState(
            params=variables["params"],
            opt_state=tx.init(variables["params"]),
            batch_stats=variables.get("batch_stats"),
            step=jnp.zeros((), jnp.int32),
        )

    def step(state: TrainState, specs, labels, dropout_key):
        def loss_fn(params):
            logits, mutated = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                specs,
                train=True,
                mutable=["batch_stats"],
                rngs={"dropout": dropout_key},
            )
            loss = sparse_ce_from_logits(logits, labels).mean()
            acc = (jnp.argmax(logits, -1) == labels).mean()
            return loss, (acc, mutated["batch_stats"])

        (loss, (acc, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        if axis_name is not None:
            grads = jax.lax.pmean(grads, axis_name)
            new_stats = jax.lax.pmean(new_stats, axis_name)
            loss = jax.lax.pmean(loss, axis_name)
            acc = jax.lax.pmean(acc, axis_name)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return (
            TrainState(params, opt_state, new_stats, state.step + 1),
            {"loss": loss, "accuracy": acc},
        )

    def evaluate(state: TrainState, specs, labels):
        logits = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            specs,
            train=False,
        )
        loss = sparse_ce_from_logits(logits, labels).mean()
        acc = (jnp.argmax(logits, -1) == labels).mean()
        return {"loss": loss, "accuracy": acc}

    return init_state, step, evaluate
