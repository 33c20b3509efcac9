"""10-seed differential accuracy-parity experiment vs the reference.

Runs the ACTUAL reference transfer_learn (TF/Keras + real TFLite
microfrontend op, /root/reference) and our transfer_learn from the SAME
briefly-pretrained base weights on the same synthetic corpus, N seeds per
side, and writes the summary JSON consumed by PARITY.md.

Usage (slow — ~30 min on the 1-core host):
    python tools_dev/parity_experiment.py --seeds 10 --out benchmarks/parity_fewshot.json
"""

from __future__ import annotations

import argparse
import json
import sys
import tempfile
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tests"))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--seeds", type=int, default=10)
    ap.add_argument("--shots", type=int, default=None,
                    help="default: 5 (easy) / 3 (hard)")
    ap.add_argument("--out", default=None)
    ap.add_argument("--pretrain-steps", type=int, default=None,
                    help="default: 150 (easy) / 300 (hard)")
    ap.add_argument("--noise", type=float, default=0.016,
                    help="hard-corpus noise level (0.016 = the measured "
                    "off-ceiling-without-collapse sweet spot, see "
                    "tests/helpers.make_fewshot_hard_corpus)")
    ap.add_argument(
        "--hard", action="store_true",
        help="confusable phoneme-order words (de-saturated fixture, "
        "VERDICT r2 item 2) instead of the separable tone words",
    )
    args = ap.parse_args()
    if args.shots is None:
        args.shots = 3 if args.hard else 5
    if args.pretrain_steps is None:
        args.pretrain_steps = 300 if args.hard else 150
    if args.out is None:
        args.out = str(
            REPO / "benchmarks"
            / ("parity_fewshot_hard.json" if args.hard else "parity_fewshot.json")
        )

    # CPU-only JAX without claiming the TPU tunnel (see tests/conftest.py)
    import jax

    jax.config.update("jax_platforms", "cpu")
    try:
        import jax._src.xla_bridge as _xb

        _xb._backend_factories.pop("axon", None)
    except Exception:
        pass

    import numpy as np

    import parity_harness as ph
    from helpers import make_corpus, make_fewshot_hard_corpus

    t0 = time.time()
    tmp = Path(tempfile.mkdtemp(prefix="parity_"))
    if args.hard:
        # 21 clips/word -> 16 val clips: finer val-accuracy granularity
        corpus = make_fewshot_hard_corpus(
            tmp / "corpus", clips_per_word=21, noise=args.noise
        )
        words = corpus["words"]
        target = words[0]
    else:
        words = ["alpha", "bravo", "charlie"]
        target = "alpha"
        corpus = make_corpus(tmp / "corpus", clips_per_word=14)
    base_path = tmp / "base_model.keras"
    print("pretraining shared base model...", flush=True)
    keras_base = ph.pretrain_base_model(
        corpus, words, base_path, steps=args.pretrain_steps, seed=0,
        min_acc=0.8 if args.hard else 0.9,
    )
    imported = ph.import_base_to_flax(keras_base)

    train_files = corpus[target][: args.shots]
    val_files = corpus[target][args.shots :]
    nontarget_files = [f for w in words[1:] for f in corpus[w]]

    ref_runs, our_runs = [], []
    for s in range(args.seeds):
        t = time.time()
        ref_runs.append(
            ph.ref_transfer_learn(
                target, train_files, val_files, nontarget_files,
                corpus["unknown_files"], corpus["bg_dir"], str(base_path),
                seed=1000 + s,
            )
        )
        print(f"ref seed {s}: val_acc={ref_runs[-1].val_accuracy:.3f} "
              f"({time.time()-t:.0f}s)", flush=True)
        t = time.time()
        our_runs.append(
            ph.our_transfer_learn(
                imported, target, train_files, val_files, nontarget_files,
                corpus["unknown_files"], corpus["bg_dir"], seed=s,
            )
        )
        print(f"ours seed {s}: val_acc={our_runs[-1].val_accuracy:.3f} "
              f"({time.time()-t:.0f}s)", flush=True)

    ref_s = ph.summarize_runs(ref_runs)
    our_s = ph.summarize_runs(our_runs)
    # effect size (Cohen's d) on val accuracy
    pooled = np.sqrt(
        (ref_s["val_accuracy_std"] ** 2 + our_s["val_accuracy_std"] ** 2) / 2
    )
    cohens_d = (
        (our_s["val_accuracy_mean"] - ref_s["val_accuracy_mean"]) / pooled
        if pooled > 0
        else 0.0
    )
    out = dict(
        config=dict(
            seeds=args.seeds, shots=args.shots, target=target,
            words=list(words), hard=bool(args.hard),
            pretrain_steps=args.pretrain_steps,
            transfer_defaults="4 epochs x 1 batch x bs 16, LR 1e-3, unknown% 50",
        ),
        reference=ref_s,
        ours=our_s,
        cohens_d_val_accuracy=float(cohens_d),
        wall_s=time.time() - t0,
    )
    Path(args.out).parent.mkdir(parents=True, exist_ok=True)
    Path(args.out).write_text(json.dumps(out, indent=2))
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
