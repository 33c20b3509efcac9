"""Symmetric close of the pretraining-parity BN question (VERDICT r4 #5).

parity_pretrain.json shows ours +0.08 ahead of the reference, attributed
to BN evaluation methodology: our driver re-estimates batch stats before
validation (train/steps.calibrate_batch_stats), the Keras side validates
on EMA running stats. Round 4's ablation turned OUR calibration off (the
arm collapsed to chance — EMA@0.99-equivalent is uninformative at fixture
scale), but the decisive apples-to-apples arm was never run: evaluate the
SAME trained Keras models with re-estimated batch stats — our evaluation
convention applied reference-side.

This tool retrains the reference side (tests/parity_harness.ref_pretrain's
exact pipeline, deterministic per seed — retrained finals are recorded
next to the round-4 recorded finals as a reproducibility check), then for
each seed:
  ema_val_accuracy        — Keras model.evaluate as recorded (sanity arm)
  calibrated_val_accuracy — moving stats replaced by re-estimated batch
                            moments with EXACTLY our calibration semantics
                            (steps.calibrate_batch_stats: 2 augmented
                            train batches, 3 fixed-point iterations,
                            moments recovered from the EMA update
                            new = m*old + (1-m)*batch), then evaluate.

Writes a `reference_bn_calibrated` block into
benchmarks/parity_pretrain.json (preserving everything else).

Crash-safe/end-anytime like pretrain_parity_extend: per-seed results are
checkpointed to /tmp/ref_bn_cal_state.json and the artifact is rewritten
after every seed.

Run (~3-5 min/seed on the 1-core host; nice it):
    nice -n 10 python tools_dev/ref_bn_calibrate.py
"""

import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tests"))

import numpy as np  # noqa: E402

STATE = Path("/tmp/ref_bn_cal_state.json")
DEST = REPO / "benchmarks" / "parity_pretrain.json"

EPOCHS = 8
BATCH = 32
SEEDS = [0, 1, 2, 3, 4, 5, 6, 7]
CAL_BATCHES = 2  # = PretrainConfig.bn_calibration_batches default
CAL_ITERATIONS = 3  # = steps.calibrate_batch_stats default


def keras_calibrate_batch_stats(tf, model, batches, iterations=CAL_ITERATIONS):
    """steps.calibrate_batch_stats semantics on a Keras model: for each
    iteration, run every calibration batch in train mode, recover each
    BN layer's batch moments from the EMA update
    (new = m*old + (1-m)*batch  =>  batch = (new - m*old)/(1-m)),
    average the moments across batches, assign. Iterated because a
    layer's batch moments depend on upstream normalization."""
    bns = [
        l for l in model.layers
        if isinstance(l, tf.keras.layers.BatchNormalization)
    ]
    for _ in range(iterations):
        base = [
            (bn.moving_mean.numpy(), bn.moving_variance.numpy()) for bn in bns
        ]
        sums = [
            (np.zeros_like(m), np.zeros_like(v)) for m, v in base
        ]
        for x in batches:
            # measure every batch at the same operating point
            for bn, (m, v) in zip(bns, base):
                bn.moving_mean.assign(m)
                bn.moving_variance.assign(v)
            model(x, training=True)  # EMA update happens in-layer
            for j, bn in enumerate(bns):
                mom = float(bns[j].momentum)
                old_m, old_v = base[j]
                new_m = bn.moving_mean.numpy()
                new_v = bn.moving_variance.numpy()
                bm = (new_m - mom * old_m) / (1.0 - mom)
                bv = (new_v - mom * old_v) / (1.0 - mom)
                sums[j] = (sums[j][0] + bm, sums[j][1] + bv)
        n = float(len(batches))
        for bn, (sm, sv) in zip(bns, sums):
            bn.moving_mean.assign(sm / n)
            # batch variance can round slightly negative through the EMA
            # algebra; clamp like a fresh moment would be
            bn.moving_variance.assign(np.maximum(sv / n, 0.0))


def main():
    import parity_harness as ph
    from helpers import make_multiword_corpus

    prev = json.loads(DEST.read_text())
    root = Path("/tmp/pretrain_parity_corpus")
    corpus = make_multiword_corpus(root, clips_per_word=40, val_per_word=8)
    assert corpus["words"] == prev["config"]["words"], "corpus drifted"

    ref = ph.import_reference()
    tf, input_data = ref["tf"], ref["input_data"]

    state = json.loads(STATE.read_text()) if STATE.exists() else {}

    def write_dest():
        seeds = sorted(int(s) for s in state)
        cal = [state[str(s)]["calibrated_val_accuracy"] for s in seeds]
        ema = [state[str(s)]["ema_val_accuracy"] for s in seeds]
        ours_mean = prev["ours"]["final_val_accuracy_mean"]
        block = dict(
            seeds=seeds,
            ema_val_accuracies=[float(v) for v in ema],
            calibrated_val_accuracies=[float(v) for v in cal],
            ema_mean=float(np.mean(ema)),
            calibrated_mean=float(np.mean(cal)),
            calibrated_std=float(np.std(cal)),
            recorded_final_vals=[
                prev["reference"]["final_val_accuracies"][
                    prev["reference"]["seeds"].index(s)
                ]
                for s in seeds
            ],
            delta_calibrated_vs_ours_mean=float(np.mean(cal) - ours_mean),
            per_seed_calibration_gain={
                str(s): float(
                    state[str(s)]["calibrated_val_accuracy"]
                    - state[str(s)]["ema_val_accuracy"]
                )
                for s in seeds
            },
            note=(
                "the SAME retrained Keras models evaluated two ways: EMA "
                "moving stats (the recorded protocol; retrain sanity arm — "
                "compare ema_val_accuracies to recorded_final_vals) vs "
                "batch stats re-estimated with our "
                "steps.calibrate_batch_stats semantics (2 augmented train "
                "batches, 3 fixed-point iterations) applied to the Keras "
                "BN layers. If calibrated_mean rises toward ours "
                "(final_val_accuracy_mean) the +delta is evaluation "
                "methodology, closed from both ends."
            ),
        )
        cur = json.loads(DEST.read_text())
        cur["reference_bn_calibrated"] = block
        DEST.write_text(json.dumps(cur, indent=1))
        return block

    for seed in SEEDS:
        if str(seed) in state:
            continue
        t0 = time.time()
        # ---- retrain: exactly ph.ref_pretrain, but keep model + datasets
        tf.keras.utils.set_random_seed(seed)
        settings = input_data.standard_microspeech_model_settings(
            label_count=len(corpus["words"]) + 1
        )
        ds = input_data.AudioDataset(
            settings,
            list(corpus["words"]),
            corpus["bg_dir"],
            [],
            silence_percentage=10.0,
            unknown_percentage=0,
            spec_aug_params=input_data.SpecAugParams(percentage=80),
            seed=seed + 1,
        )
        AUTOTUNE = tf.data.experimental.AUTOTUNE
        train_ds = ds.init_from_parent_dir(
            AUTOTUNE, list(corpus["train_files"]), is_training=True
        )
        val_ds = ds.init_from_parent_dir(
            AUTOTUNE, list(corpus["val_files"]), is_training=False
        )
        train_b = train_ds.shuffle(buffer_size=4000).batch(BATCH)
        val_b = val_ds.batch(BATCH)

        model = ph.build_keras_base_model(
            num_labels=len(ds.commands), seed=seed
        )
        for layer in model.layers:
            if isinstance(layer, tf.keras.layers.BatchNormalization):
                layer.momentum = 0.8
        model.compile(
            optimizer=tf.keras.optimizers.Adam(1e-3),
            loss=tf.keras.losses.SparseCategoricalCrossentropy(
                from_logits=True
            ),
            metrics=["accuracy"],
        )
        hist = model.fit(
            train_b, validation_data=val_b, epochs=EPOCHS, verbose=0
        )
        ema_val = float(hist.history["val_accuracy"][-1])

        # ---- calibrate with our semantics, then re-evaluate
        cal_batches = [
            x for x, _y in train_b.take(CAL_BATCHES)
        ]
        keras_calibrate_batch_stats(tf, model, cal_batches)
        _, cal_val = model.evaluate(val_b, verbose=0)

        state[str(seed)] = dict(
            ema_val_accuracy=ema_val,
            calibrated_val_accuracy=float(cal_val),
        )
        STATE.write_text(json.dumps(state))
        block = write_dest()
        print(
            f"seed {seed}: ema={ema_val:.4f} calibrated={cal_val:.4f} "
            f"({time.time() - t0:.0f}s) [artifact updated: "
            f"calibrated_mean={block['calibrated_mean']:.4f}]",
            flush=True,
        )

    print(json.dumps(write_dest(), indent=1))


if __name__ == "__main__":
    main()
