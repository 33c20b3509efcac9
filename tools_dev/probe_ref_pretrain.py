"""Reference-side pretraining probe on the hard corpus: timing + accuracy
trajectory of the Keras pipeline (parity_harness.ref_pretrain) for fixture
difficulty tuning. Usage:
    python tools_dev/probe_ref_pretrain.py <corpus_root> [epochs] [seed]
"""
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tests"))

from helpers import HARD_WORDS  # noqa: E402
import parity_harness as ph  # noqa: E402


def main():
    root = Path(sys.argv[1])
    epochs = int(sys.argv[2]) if len(sys.argv) > 2 else 6
    seed = int(sys.argv[3]) if len(sys.argv) > 3 else 0
    words = [w for w in HARD_WORDS if (root / w).is_dir()]
    train_files, val_files = [], []
    for w in words:
        files = sorted(
            (root / w).glob("*.wav"),
            key=lambda p: int(p.stem.split("_")[-1]),
        )
        train_files += [str(p) for p in files[:-8]]
        val_files += [str(p) for p in files[-8:]]
    print(f"{len(words)} words, {len(train_files)} train, {len(val_files)} val",
          flush=True)
    t0 = time.time()
    hist = ph.ref_pretrain(
        words, train_files, val_files, str(root / "_background_noise_"),
        num_epochs=epochs, batch_size=32, seed=seed,
    )
    print(f"wall: {time.time()-t0:.0f}s", flush=True)
    print("val_accuracy:", [round(v, 3) for v in hist["val_accuracy"]])
    print("accuracy:", [round(v, 3) for v in hist["accuracy"]])


if __name__ == "__main__":
    main()
