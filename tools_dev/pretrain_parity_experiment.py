"""The PARITY.md pretraining-parity experiment (VERDICT r2 item 1).

Trains the REFERENCE pretraining pipeline (Keras fit over
AudioDataset.init_from_parent_dir — train_monolingual_embedding.py:55-135
driven as a library) and OUR train/pretrain.py from scratch on the same
confusable multi-word corpus, N seeds each, and writes
benchmarks/parity_pretrain.json with final val-accuracy distributions and
full learning curves.

Run on the 1-core host (hours-scale for 5 seeds/side):
    python tools_dev/pretrain_parity_experiment.py [n_seeds] [epochs]
"""

import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tests"))

import os

flags = os.environ.get("XLA_FLAGS", "")
if "collective_call_terminate_timeout" not in flags:
    # 8 virtual CPU devices on 1 core: raise XLA's 40 s collective
    # rendezvous abort deadline (a starved thread kills the process)
    os.environ["XLA_FLAGS"] = (
        flags
        + " --xla_cpu_collective_call_terminate_timeout_seconds=600"
        + " --xla_cpu_collective_call_warn_stuck_timeout_seconds=120"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
try:
    import jax._src.xla_bridge as _xb

    _xb._backend_factories.pop("axon", None)
except Exception:
    pass
jax.config.update("jax_num_cpu_devices", 8)

import numpy as np  # noqa: E402

import parity_harness as ph  # noqa: E402
from helpers import make_multiword_corpus  # noqa: E402


def main():
    n_seeds = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    epochs = int(sys.argv[2]) if len(sys.argv) > 2 else 6
    batch = 32
    root = Path("/tmp/pretrain_parity_corpus")
    corpus = make_multiword_corpus(root, clips_per_word=40, val_per_word=8)
    print(f"corpus: {len(corpus['words'])} words, "
          f"{len(corpus['train_files'])} train / {len(corpus['val_files'])} val",
          flush=True)

    results = {"reference": [], "ours": []}
    for s in range(n_seeds):
        t0 = time.time()
        h = ph.ref_pretrain(
            corpus["words"], corpus["train_files"], corpus["val_files"],
            corpus["bg_dir"], num_epochs=epochs, batch_size=batch, seed=s,
        )
        results["reference"].append(h)
        print(f"ref  seed {s}: val_acc={h['val_accuracy']}"
              f" ({time.time()-t0:.0f}s)", flush=True)
        t0 = time.time()
        h = ph.our_pretrain(
            corpus["words"], corpus["train_files"], corpus["val_files"],
            corpus["bg_dir"], num_epochs=epochs, batch_size=batch, seed=s,
        )
        results["ours"].append(h)
        print(f"ours seed {s}: val_acc={h['val_accuracy']}"
              f" ({time.time()-t0:.0f}s)", flush=True)

    def summarize(hists):
        finals = np.array([h["val_accuracy"][-1] for h in hists])
        return dict(
            final_val_accuracy_mean=float(finals.mean()),
            final_val_accuracy_std=float(finals.std()),
            final_val_accuracies=[float(v) for v in finals],
            curves=[[float(v) for v in h["val_accuracy"]] for h in hists],
        )

    ref_s, our_s = summarize(results["reference"]), summarize(results["ours"])
    pooled = np.sqrt(
        (ref_s["final_val_accuracy_std"] ** 2 + our_s["final_val_accuracy_std"] ** 2)
        / 2
    )
    out = dict(
        config=dict(
            n_seeds=n_seeds, epochs=epochs, batch_size=batch,
            words=corpus["words"],
            clips_per_word=40, val_per_word=8,
            silence_percentage=10.0, spec_aug_percentage=80,
            learning_rate=1e-3,
            note=(
                "reference = Keras fit over AudioDataset.init_from_parent_dir "
                "(train_monolingual_embedding.py:55-135 as a library, real "
                "TFLite microfrontend op, BN momentum 0.8 for fixture scale); "
                "ours = train/pretrain.py on an 8-virtual-device CPU mesh "
                "(data-parallel, resident fused step)"
            ),
        ),
        reference=ref_s,
        ours=our_s,
        delta_mean=float(
            our_s["final_val_accuracy_mean"] - ref_s["final_val_accuracy_mean"]
        ),
        cohens_d=float(
            (our_s["final_val_accuracy_mean"] - ref_s["final_val_accuracy_mean"])
            / pooled
        )
        if pooled > 0
        else 0.0,
    )
    dest = REPO / "benchmarks" / "parity_pretrain.json"
    dest.write_text(json.dumps(out, indent=1))
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
