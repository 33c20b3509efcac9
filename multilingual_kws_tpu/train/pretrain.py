"""Embedding-model pretraining: data-parallel over the TPU mesh.

Reference: train_monolingual_embedding.py / train_multilingual_embedding.py
(single-GPU Keras fit with ModelCheckpoint/CSVLogger). Here: global batch
sharded over the mesh "data" axis, one jitted train step with replicated
params (XLA inserts the gradient all-reduce over ICI from the sharding
annotations), orbax best-val checkpointing, CSV metrics.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from functools import partial
from pathlib import Path
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import NamedSharding, PartitionSpec as P

from ..data.dataset import AudioDataset
from ..data.manifests import label_from_parent_dir
from ..models.kws_model import make_embedding_model
from ..ops.augment import SpecAugParams
from ..parallel import mesh as meshlib
from ..settings import ModelSettings, standard_microspeech_model_settings
from .checkpoints import BestValCheckpoint
from .metrics import CSVLogger, save_history
from .steps import TrainState, flat_adam, sparse_ce_from_logits


@dataclass
class PretrainConfig:
    """Defaults mirror train_multilingual_embedding.py:40-55 (batch 64,
    silence% 1 for multilingual; monolingual used silence% 10/unknown% 10)."""

    num_labels: int = 761
    batch_size: int = 64
    num_epochs: int = 40
    learning_rate: float = 1e-3
    silence_percentage: float = 1.0
    unknown_percentage: float = 0.0
    shuffle_seed: int = 0
    csvlog_dest: Optional[str] = None
    checkpoint_dir: Optional[str] = None
    history_dest: Optional[str] = None
    steps_per_epoch: Optional[int] = None  # default: len(train)//batch
    # BN re-estimation before each validation pass: with momentum 0.99 the
    # EMA needs ~500 steps to converge, so short runs would evaluate (and
    # checkpoint) with stale running stats. 0 disables.
    bn_calibration_batches: int = 2
    # host batches assembled ahead on a background thread (data/pipeline.py);
    # 0 = synchronous. Bit-identical either way. Only used when the
    # device-resident bank is off (below). Default settled by a scripted
    # 5-rep alternating A/B on the tunnel rig (tools_dev/prefetch_ab.py ->
    # benchmarks/prefetch_ab.json): medians sync 1087 vs prefetch2 1398
    # clips/s, prefetch ahead in 4/5 pairs; run-to-run spread is large
    # (905-1758 sync) from tunnel load, so treat single-sample comparisons
    # (e.g. one bench pass) as noise. It pays off most when host
    # assembly/IO is the slow side, i.e. normal local hardware.
    prefetch: int = 2
    # keep the training audio HBM-resident and assemble batches by on-device
    # gather (data/dataset.py build_resident_bank) — removes the per-step
    # audio upload entirely. None = auto (on when the bank fits the cap);
    # features are bit-identical to the streaming path.
    resident_data: Optional[bool] = None
    resident_max_bytes: int = AudioDataset.RESIDENT_MAX_BYTES
    # run each epoch of the resident path as ONE scanned device program
    # (build_fused_resident_epoch) instead of one dispatch per step —
    # same draws/keys, equal to fusion-order float rounding
    # (tests/test_pipeline.py); removes the per-step host round trip.
    # False falls back to the per-step fused program.
    scan_epoch: bool = True
    # "bfloat16" runs conv/dense/BN compute in bf16 on the MXU (params, BN
    # running stats, the 192-d embedding, logits and the optimizer all stay
    # float32 — standard TPU mixed precision). "float32" = reference-exact.
    compute_dtype: str = "float32"


def build_pretrain_step(model, tx, mesh):
    """Returns (init_fn, step_fn, eval_fn) jitted over the mesh: params
    replicated, batch sharded on the data axis."""
    repl = NamedSharding(mesh, P())
    shard = NamedSharding(mesh, P(meshlib.DATA_AXIS))

    def loss_fn(params, batch_stats, specs, labels, dropout_key):
        logits, mutated = model.apply(
            {"params": params, "batch_stats": batch_stats},
            specs,
            train=True,
            mutable=["batch_stats"],
            rngs={"dropout": dropout_key},
        )
        loss = sparse_ce_from_logits(logits, labels).mean()
        acc = (jnp.argmax(logits, -1) == labels).mean()
        return loss, (acc, mutated["batch_stats"])

    @jax.jit
    def init_fn(variables):
        return TrainState(
            params=variables["params"],
            opt_state=tx.init(variables["params"]),
            batch_stats=variables["batch_stats"],
            step=jnp.zeros((), jnp.int32),
        )

    @jax.jit
    def step_fn(state: TrainState, specs, labels, dropout_key):
        (loss, (acc, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params, state.batch_stats, specs, labels, dropout_key)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = TrainState(params, opt_state, new_stats, state.step + 1)
        # keep replicated sharding stable across steps
        new_state = jax.lax.with_sharding_constraint(
            new_state, jax.tree_util.tree_map(lambda _: repl, new_state)
        )
        return new_state, {"loss": loss, "accuracy": acc}

    @jax.jit
    def eval_fn(state: TrainState, specs, labels):
        logits = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            specs,
            train=False,
        )
        loss = sparse_ce_from_logits(logits, labels).mean()
        correct = (jnp.argmax(logits, -1) == labels).sum()
        return loss * labels.shape[0], correct

    return init_fn, step_fn, eval_fn


def build_fused_resident_step(model, tx, mesh, dataset):
    """One jitted program per step for the HBM-resident data path:
    bank-gather + augmentation + featurization + fwd/bwd/adam, with the
    train state donated. A single dispatch and maximal XLA fusion — the
    intermediate waveform/spec tensors never round-trip HBM unfused.

    Numerics are bit-identical to the unfused path: the same
    dataset._train_device_resident followed by the same loss/update, with
    the same key stream (aug_key from the dataset chain, dropout from the
    trainer chain)."""
    repl = NamedSharding(mesh, P())

    def loss_fn(params, batch_stats, specs, labels, dropout_key):
        logits, mutated = model.apply(
            {"params": params, "batch_stats": batch_stats},
            specs,
            train=True,
            mutable=["batch_stats"],
            rngs={"dropout": dropout_key},
        )
        loss = sparse_ce_from_logits(logits, labels).mean()
        acc = (jnp.argmax(logits, -1) == labels).mean()
        return loss, (acc, mutated["batch_stats"])

    @partial(jax.jit, donate_argnums=0)
    def fused_step(state: TrainState, bank, idx, sil, labels, aug_key,
                   dropout_key):
        specs = dataset._train_device_resident(aug_key, bank, idx, sil)
        (loss, (acc, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params, state.batch_stats, specs, labels, dropout_key)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = TrainState(params, opt_state, new_stats, state.step + 1)
        new_state = jax.lax.with_sharding_constraint(
            new_state, jax.tree_util.tree_map(lambda _: repl, new_state)
        )
        return new_state, {"loss": loss, "accuracy": acc}

    return fused_step


def build_fused_resident_epoch(model, tx, mesh, dataset):
    """A whole epoch of the HBM-resident path as ONE device program:
    lax.scan over the fused gather+augment+featurize+fwd/bwd/adam step.

    The per-step fused path still pays one host dispatch + one ~3 KB index
    upload per step; at 10-15 ms/step through a remote tunnel the host loop
    is on the critical path. Scanning leaves one dispatch and one
    (steps, B) index upload per EPOCH (the same design as
    train/steps.make_finetune_epoch_scan).

    Same draws as per-step build_fused_resident_step: the augmentation and
    dropout key chains are carried THROUGH the scan with the same split
    recurrence (key, sub = split(key)), and the final keys are returned so
    the caller resynchronizes the dataset/trainer chains. Outputs match to
    XLA fusion-order float rounding (the scanned body compiles separately
    from the standalone step, so it is NOT bitwise-identical; adam can
    amplify ~1e-7 gradient drift to ~lr on near-zero-gradient elements —
    tests/test_pipeline.py pins the equivalence bands)."""
    repl = NamedSharding(mesh, P())

    def loss_fn(params, batch_stats, specs, labels, dropout_key):
        logits, mutated = model.apply(
            {"params": params, "batch_stats": batch_stats},
            specs,
            train=True,
            mutable=["batch_stats"],
            rngs={"dropout": dropout_key},
        )
        loss = sparse_ce_from_logits(logits, labels).mean()
        acc = (jnp.argmax(logits, -1) == labels).mean()
        return loss, (acc, mutated["batch_stats"])

    @partial(jax.jit, donate_argnums=0)
    def fused_epoch(state: TrainState, bank, idx_all, sil_all, lbl_all,
                    data_key, dropout_key):
        """idx/sil/lbl_all: (steps, B) batch-sharded on axis 1."""

        def body(carry, xs):
            st, dkey, rkey = carry
            idx, sil, lbl = xs
            dks = jax.random.split(dkey)
            dkey, aug_key = dks[0], dks[1]
            rks = jax.random.split(rkey)
            rkey, sub = rks[0], rks[1]
            specs = dataset._train_device_resident(aug_key, bank, idx, sil)
            (loss, (acc, new_stats)), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(st.params, st.batch_stats, specs, lbl, sub)
            updates, opt_state = tx.update(grads, st.opt_state, st.params)
            params = optax.apply_updates(st.params, updates)
            nst = TrainState(params, opt_state, new_stats, st.step + 1)
            return (nst, dkey, rkey), (loss, acc)

        (state, dkey, rkey), (losses, accs) = jax.lax.scan(
            body, (state, data_key, dropout_key), (idx_all, sil_all, lbl_all)
        )
        state = jax.lax.with_sharding_constraint(
            state, jax.tree_util.tree_map(lambda _: repl, state)
        )
        return state, dkey, rkey, {"loss": losses, "accuracy": accs}

    return fused_epoch


def pretrain(
    train_files: Sequence[str],
    val_files: Sequence[str],
    commands: Sequence[str],
    background_data_dir,
    unknown_files: Sequence[str] = (),
    config: PretrainConfig = PretrainConfig(),
    mesh=None,
    model_settings: Optional[ModelSettings] = None,
    resume_params=None,
    verbose: int = 1,
    model=None,
    checkpoint_meta: Optional[Dict] = None,
):
    """Data-parallel pretraining loop. Labels from parent dir names
    (init_from_parent_dir semantics, input_data.py:473-508)."""
    mesh = mesh or meshlib.make_mesh()
    n_dev = mesh.devices.size
    model_settings = model_settings or standard_microspeech_model_settings(
        config.num_labels
    )

    dataset = AudioDataset(
        model_settings=model_settings,
        commands=list(commands),
        background_data_dir=background_data_dir,
        unknown_files=list(unknown_files),
        silence_percentage=config.silence_percentage,
        unknown_percentage=config.unknown_percentage,
        spec_aug_params=SpecAugParams(percentage=80),
        seed=config.shuffle_seed,
        # upload int16 batches straight to their batch-sharded layout: XLA
        # partitions augmentation + featurization over the mesh, and the
        # train step consumes the specs with no reshard or host round trip
        input_sharding=meshlib.batch_sharding(mesh),
    )
    num_labels = len(dataset.commands)
    assert config.compute_dtype in ("float32", "bfloat16"), config.compute_dtype
    model = model or make_embedding_model(
        num_labels, dtype=jnp.dtype(config.compute_dtype)
    )

    rng = jax.random.PRNGKey(config.shuffle_seed)
    dummy = jnp.zeros(
        (1, model_settings.spectrogram_length, model_settings.fingerprint_width, 1),
        jnp.float32,
    )
    # init under jit: ONE compiled program instead of one tiny executable
    # per eager op (a full-B0 eager init through the remote-TPU tunnel
    # paid hundreds of sequential op compiles — minutes of cold start)
    variables = jax.jit(lambda r: model.init(r, dummy, train=False))(rng)
    if resume_params is not None:
        variables = {**variables, **resume_params}

    # flat_adam: bit-identical adam over one flattened vector — halves the
    # step (benchmarks/step_variant_decomposition.json)
    tx = flat_adam(config.learning_rate)
    init_fn, step_fn, eval_fn = build_pretrain_step(model, tx, mesh)

    with mesh:
        state = init_fn(meshlib.replicate(mesh, variables))

    train_labels = [label_from_parent_dir(f) for f in train_files]
    val_labels = [label_from_parent_dir(f) for f in val_files]

    logger = CSVLogger(config.csvlog_dest) if config.csvlog_dest else None
    ckpt = (
        BestValCheckpoint(config.checkpoint_dir) if config.checkpoint_dir else None
    )
    history: Dict[str, List[float]] = {
        "loss": [], "accuracy": [], "val_loss": [], "val_accuracy": []
    }

    steps_per_epoch = config.steps_per_epoch or max(
        1, len(train_files) // config.batch_size
    )

    use_resident = config.resident_data
    if use_resident is None:
        uniq = set(train_files) | set(unknown_files)
        est = len(uniq) * model_settings.desired_samples * 2  # int16 bytes
        use_resident = est <= config.resident_max_bytes
    bank = dataset.build_resident_bank(train_files) if use_resident else None

    def epoch_batches(num_steps):
        if use_resident:
            return dataset.train_batches_resident(
                train_files, batch_size=config.batch_size,
                num_steps=num_steps, labels=train_labels,
                single_target=False, bank=bank,
            )
        return dataset.train_batches(
            train_files, batch_size=config.batch_size, num_steps=num_steps,
            labels=train_labels, single_target=False,
            prefetch=config.prefetch,
        )
    # device-resident dropout key + jitted split (eager splits of a
    # host-resident key cost a host->device round trip per step)
    key = jax.device_put(jax.random.PRNGKey(config.shuffle_seed + 1))
    split_fn = jax.jit(lambda k: tuple(jax.random.split(k)))

    fused_step = (
        build_fused_resident_step(model, tx, mesh, dataset)
        if use_resident and not config.scan_epoch
        else None
    )
    fused_epoch = (
        build_fused_resident_epoch(model, tx, mesh, dataset)
        if use_resident and config.scan_epoch
        else None
    )
    epoch_in_sharding = NamedSharding(
        mesh, P(None, meshlib.DATA_AXIS)
    )  # (steps, B) batch axis sharded

    def run_train_steps(num_steps, losses, accs):
        """One pass of num_steps train steps; appends device metrics."""
        nonlocal state, key
        if use_resident and config.scan_epoch:
            # whole pass = ONE scanned device program + one (steps, B)
            # index upload; key chains carried through the scan and
            # resynchronized after (same draws as the per-step path)
            idx_a, lbl_a, sil_a = [], [], []
            for idx, lbl, sil in dataset.host_train_indices(
                train_files, config.batch_size, num_steps, bank,
                labels=train_labels, single_target=False,
            ):
                idx_a.append(idx)
                lbl_a.append(lbl)
                sil_a.append(sil)
            idx_d, lbl_d, sil_d = jax.device_put(
                (
                    np.asarray(idx_a, np.int32),
                    np.asarray(lbl_a, np.int32),
                    np.asarray(sil_a, bool),
                ),
                epoch_in_sharding,
            )
            state, dkey, rkey, m = fused_epoch(
                state, bank["bank"], idx_d, sil_d, lbl_d,
                dataset.key, key,
            )
            dataset.key = dkey
            key = rkey
            losses.extend(np.asarray(m["loss"]).tolist())
            accs.extend(np.asarray(m["accuracy"]).tolist())
        elif use_resident:
            # one fused program per step: gather+augment+featurize+train
            for idx, lbl, sil in dataset.host_train_indices(
                train_files, config.batch_size, num_steps, bank,
                labels=train_labels, single_target=False,
            ):
                idx, lbl, sil = dataset._put_batch((idx, lbl, sil))
                key, sub = split_fn(key)
                state, m = fused_step(
                    state, bank["bank"], idx, sil, lbl,
                    dataset._next_key(), sub,
                )
                losses.append(m["loss"])
                accs.append(m["accuracy"])
        else:
            for specs, labels in epoch_batches(num_steps):
                key, sub = split_fn(key)
                state, m = step_fn(state, specs, labels, sub)
                losses.append(m["loss"])
                accs.append(m["accuracy"])

    with mesh:
        for epoch in range(config.num_epochs):
            t0 = time.time()
            losses, accs = [], []
            run_train_steps(steps_per_epoch, losses, accs)

            if config.bn_calibration_batches > 0:
                from .steps import calibrate_batch_stats

                calib = [
                    specs
                    for specs, _ in epoch_batches(
                        config.bn_calibration_batches
                    )
                ]
                calibrated = calibrate_batch_stats(
                    model,
                    {"params": state.params, "batch_stats": state.batch_stats},
                    calib,
                )
                state = state.replace(
                    batch_stats=meshlib.replicate(
                        mesh, calibrated["batch_stats"]
                    )
                )

            # validation
            tot, loss_sum, correct = 0, 0.0, 0
            for specs, labels in dataset.eval_batches(
                val_files, batch_size=config.batch_size, labels=val_labels,
                single_target=False,
            ):
                sp, real = meshlib.pad_to_multiple(np.asarray(specs), n_dev)
                lb, _ = meshlib.pad_to_multiple(np.asarray(labels), n_dev)
                sp = meshlib.shard_batch(mesh, sp)
                lb = meshlib.shard_batch(mesh, lb)
                l, c = eval_fn(state, sp, lb)
                # padded entries replicate real ones; rescale by real count
                frac = real / lb.shape[0]
                loss_sum += float(l) * frac
                correct += float(c) * frac
                tot += real
            ep = {
                "epoch": epoch,
                "loss": float(np.mean([float(x) for x in losses])),
                "accuracy": float(np.mean([float(x) for x in accs])),
                "val_loss": loss_sum / max(tot, 1),
                "val_accuracy": correct / max(tot, 1),
            }
            for k in history:
                history[k].append(ep[k])
            if logger:
                logger.log(ep)
            if ckpt:
                ckpt.update(
                    ep,
                    state.params,
                    state.batch_stats,
                    extra_meta={"epoch": epoch, "num_labels": num_labels,
                                "commands": list(dataset.commands),
                                **(checkpoint_meta or {})},
                )
            if verbose:
                print(
                    f"epoch {epoch+1}/{config.num_epochs} "
                    f"loss={ep['loss']:.4f} acc={ep['accuracy']:.4f} "
                    f"val_acc={ep['val_accuracy']:.4f} ({time.time()-t0:.1f}s)",
                    flush=True,
                )

    if config.history_dest:
        save_history(history, config.history_dest)
    return state, model, history, dataset
