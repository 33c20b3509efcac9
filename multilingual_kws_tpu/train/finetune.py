"""Few-shot transfer learning — the reference transfer_learn equivalent.

Reference: multilingual_kws/embedding/transfer_learning.py:14-123. Loads the
pretrained embedding (trunk + embedding head), freezes it, trains the tiny
18-tanh -> 3-softmax head on a single-target AudioDataset (unknown% 50,
SpecAug 80%), optionally "backprop into embedding" phase 2 at a lower LR.

Defaults mirror run.py train (run.py:212-300): 4 epochs x 1 batch x bs 64,
LR 1e-3, UNKNOWN_PERCENTAGE 50.
"""

from __future__ import annotations

import functools
import json
import time
from dataclasses import dataclass, field
from pathlib import Path
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..data.dataset import AudioDataset
from ..models.kws_model import make_transfer_model
from ..ops.augment import SpecAugParams
from ..settings import ModelSettings, standard_microspeech_model_settings
from .steps import make_finetune_step
from . import checkpoints as ckpt
from .metrics import CSVLogger


HEAD_PREFIX = "transfer_head"


@functools.lru_cache(maxsize=8)
def _cached_predict(model):
    return jax.jit(
        lambda variables, specs: model.apply(variables, specs, train=False)
    )


def _head_only(path: Tuple[str, ...]) -> bool:
    return path[0] == HEAD_PREFIX


def _head_and_top(path: Tuple[str, ...]) -> bool:
    """Phase-2 unfreezing: head + embedding head + trunk top conv, excluding
    BatchNorm (reference transfer_learning.py:94-99 unfreezes the top layers
    while leaving BN frozen)."""
    if path[0] == HEAD_PREFIX or path[0] == "embedding_head":
        return True
    if path[0] == "trunk" and path[1] == "top":
        return "bn" not in path
    return False


@dataclass
class FinetuneResult:
    name: str
    state: object  # TrainState
    model: object  # flax module
    details: Dict
    dataset: AudioDataset

    def variables(self) -> Dict:
        cols = {"params": self.state.params}
        if self.state.batch_stats is not None:
            cols["batch_stats"] = self.state.batch_stats
        return cols

    def predict_fn(self):
        """Jitted (B, 49, 40, 1) -> (B, 3) softmax predictor.

        Weights are passed as ARGUMENTS to a jit cached by model config, so
        every fine-tune result of the same architecture shares one compiled
        executable (a closure-captured-weights jit would recompile the full
        trunk per result — ~35 s per keyword in a batch job)."""
        f = _cached_predict(self.model)
        variables = self.variables()
        return lambda specs: f(variables, specs)


def transfer_learn(
    target: str,
    train_files: Sequence[str],
    val_files: Sequence[str],
    unknown_files: Sequence[str],
    num_epochs: int = 4,
    num_batches: int = 1,
    batch_size: int = 64,
    primary_lr: float = 1e-3,
    backprop_into_embedding: bool = False,
    embedding_lr: float = 0.0,
    model_settings: Optional[ModelSettings] = None,
    base_model_path=None,
    unknown_percentage: float = 50.0,
    bg_datadir=None,
    csvlog_dest=None,
    seed: Optional[int] = None,
    verbose: int = 1,
    resident: Optional[bool] = None,
    resident_max_bytes: Optional[int] = None,
    base_params=None,
    base_batch_stats=None,
    model=None,
    compute_dtype: Optional[str] = None,
) -> FinetuneResult:
    """Few-shot fine-tune of `target`. Returns (name, state, details) wrapper.

    base_model_path: checkpoint directory of a pretrained embedding model
    (orbax); alternatively pass its params directly via base_params.
    model: optional KWSTransferModel override (e.g. a narrower trunk).
    compute_dtype: "bfloat16" switches trunk conv/dense/BN compute (params,
    BN stats, the 192-d embedding and softmax head stay f32 — the same
    mixed-precision contract as pretraining). Default f32: the few-shot
    accuracy parity evidence (PARITY.md) was measured at f32.
    """
    model_settings = model_settings or standard_microspeech_model_settings(3)
    trunk_kw = {}
    if compute_dtype is not None and compute_dtype != "float32":
        trunk_kw["dtype"] = jnp.dtype(compute_dtype)
    if model is None:
        # size the trunk to match the base checkpoint's (metadata carries the
        # EfficientNet coefficients; absent/1.0 = B0)
        wc = dc = 1.0
        if base_model_path is not None:
            try:
                meta = ckpt.load_metadata(base_model_path)
                wc = float(meta.get("width_coefficient", 1.0))
                dc = float(meta.get("depth_coefficient", 1.0))
            except FileNotFoundError:
                pass
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

    # init with dummy input, then overwrite trunk/embedding from base model
    rng = jax.random.PRNGKey(seed if seed is not None else 0)
    dummy = jnp.zeros(
        (1, model_settings.spectrogram_length, model_settings.fingerprint_width, 1),
        jnp.float32,
    )
    # init under jit: one compiled program, not hundreds of eager op
    # compiles (same cold-start fix as train/pretrain.py)
    variables = jax.jit(lambda r: model.init(r, dummy, train=False))(rng)
    params = dict(variables["params"])
    batch_stats = variables.get("batch_stats")

    if base_params is None and base_model_path is not None:
        base = ckpt.load_embedding_variables(base_model_path)
        base_params = base["params"]
        base_batch_stats = base.get("batch_stats")
    if base_params is not None:
        params["trunk"] = base_params["trunk"]
        params["embedding_head"] = base_params["embedding_head"]
    if base_batch_stats is not None and batch_stats is not None:
        batch_stats = dict(batch_stats)
        batch_stats["trunk"] = base_batch_stats["trunk"]

    dataset = AudioDataset(
        model_settings=model_settings,
        commands=[target],
        background_data_dir=bg_datadir,
        unknown_files=unknown_files,
        unknown_percentage=unknown_percentage,
        spec_aug_params=SpecAugParams(percentage=80),
        seed=seed,
    )

    if base_params is None and batch_stats is not None:
        # Fresh (un-pretrained) trunk: its BN running stats are the init
        # values and normalize nothing. Calibrate them to data moments so
        # frozen-BN inference-mode training still sees normalized features.
        from .steps import calibrate_batch_stats

        calib = [
            specs
            for specs, _ in dataset.train_batches(
                train_files, batch_size=min(batch_size, 64), num_steps=2
            )
        ]
        variables = calibrate_batch_stats(
            model, {"params": params, "batch_stats": batch_stats}, calib
        )
        batch_stats = variables["batch_stats"]

    logger = CSVLogger(csvlog_dest) if csvlog_dest else None

    # few-shot training sets (shots + unknowns) are small: keep the clips
    # HBM-resident so each of the ~256 steps uploads only indices instead of
    # re-shipping the audio (data/dataset.py build_resident_bank).
    # resident=None (default): auto by bank size.
    if resident is None:
        uniq = set(train_files) | set(unknown_files)
        cap = (
            resident_max_bytes
            if resident_max_bytes is not None
            else AudioDataset.RESIDENT_MAX_BYTES
        )
        resident = len(uniq) * model_settings.desired_samples * 2 <= cap
    bank = dataset.build_resident_bank(train_files) if resident else None

    def run_phase(params, stats, lr, trainable):
        init_state, step, evaluate, predict = make_finetune_step(
            model, lr, trainable
        )
        if resident:
            from .steps import make_finetune_epoch_scan

            epoch_scan = make_finetune_epoch_scan(
                model, lr, trainable, dataset.frontend, dataset.aug_params
            )
        state = init_state({"params": params, "batch_stats": stats})
        # reference quirk kept: steps_per_epoch = batch_size * num_batches
        # (transfer_learning.py:86-93)
        steps_per_epoch = batch_size * num_batches
        history = {"val_accuracy": [], "val_loss": [], "accuracy": [], "loss": []}
        for epoch in range(num_epochs):
            t0 = time.time()
            losses, accs = [], []
            if resident:
                # whole epoch = ONE device program (lax.scan over the
                # gather->augment->featurize->step chain): one dispatch and
                # one small index upload instead of 64 round trips
                idx_a, lbl_a, sil_a = [], [], []
                for idx, lbl, sil in dataset.host_train_indices(
                    train_files, batch_size, steps_per_epoch, bank
                ):
                    idx_a.append(idx)
                    lbl_a.append(lbl)
                    sil_a.append(sil)
                keys = jnp.stack(
                    [dataset._next_key() for _ in range(steps_per_epoch)]
                )
                idx_d, lbl_d, sil_d = dataset._put_batch(
                    (
                        np.asarray(idx_a, np.int32),
                        np.asarray(lbl_a, np.int32),
                        np.asarray(sil_a, bool),
                    )
                )
                state, loss_seq, acc_seq = epoch_scan(
                    state, bank["bank"], dataset.bg_data, dataset.bg_sizes,
                    idx_d, lbl_d, sil_d, keys,
                )
                losses = list(np.asarray(loss_seq))
                accs = list(np.asarray(acc_seq))
            else:
                for specs, labels in dataset.train_batches(
                    train_files, batch_size=batch_size,
                    num_steps=steps_per_epoch, prefetch=2,
                ):
                    state, metrics = step(state, specs, labels)
                    losses.append(metrics["loss"])
                    accs.append(metrics["accuracy"])
            val = evaluate_dataset(evaluate, state, dataset, val_files, batch_size)
            ep = {
                "epoch": epoch,
                "loss": float(np.mean([float(l) for l in losses])),
                "accuracy": float(np.mean([float(a) for a in accs])),
                "val_loss": val["loss"],
                "val_accuracy": val["accuracy"],
            }
            for k in ("loss", "accuracy", "val_loss", "val_accuracy"):
                history[k].append(ep[k])
            if logger:
                logger.log(ep)
            if verbose:
                print(
                    f"epoch {epoch+1}/{num_epochs} loss={ep['loss']:.4f} "
                    f"acc={ep['accuracy']:.4f} val_acc={ep['val_accuracy']:.4f} "
                    f"({time.time()-t0:.1f}s)",
                    flush=True,
                )
        return state, history, predict, evaluate

    state, history, predict, evaluate = run_phase(
        params, batch_stats, primary_lr, _head_only
    )

    if backprop_into_embedding:
        # phase 2 takes params AND batch_stats from phase 1's returned state:
        # the donating step/epoch_scan invalidated the enclosing-scope buffer
        # copies on TPU (donation is a no-op on CPU, so only real hardware
        # would crash on reuse)
        state, history, predict, evaluate = run_phase(
            state.params, state.batch_stats, embedding_lr, _head_and_top
        )

    va = history["val_accuracy"][-1]
    name = (
        f"xfer_epochs_{num_epochs}_bs_{batch_size}_nbs_{num_batches}"
        f"_val_acc_{va:0.2f}_target_{target}"
    )
    details = dict(
        num_epochs=num_epochs,
        batch_size=batch_size,
        num_batches=num_batches,
        val_accuracy=va,
        target=target,
    )
    return FinetuneResult(
        name=name, state=state, model=model, details=details, dataset=dataset
    )


def evaluate_dataset(evaluate_fn, state, dataset: AudioDataset, files, batch_size):
    """Weighted-mean metrics over eval batches."""
    tot_n = 0
    tot_loss = 0.0
    tot_acc = 0.0
    for specs, labels in dataset.eval_batches(files, batch_size=batch_size):
        m = evaluate_fn(state, specs, labels)
        n = labels.shape[0]
        tot_n += n
        tot_loss += float(m["loss"]) * n
        tot_acc += float(m["accuracy"]) * n
    if tot_n == 0:
        return {"loss": float("nan"), "accuracy": float("nan")}
    return {"loss": tot_loss / tot_n, "accuracy": tot_acc / tot_n}
