"""Quick difficulty check for the harder at-scale corpus knobs.

Trains the flagship driver on a SUBSET of the scale corpus distribution
(20 words x 50 train clips, same hard_word_clip knobs as
tools_dev/pretrain_scale_run.py) for a few epochs on the chip and prints
the val trajectory. Purpose: catch gross mis-tuning (corpus saturating at
1.0 again, or collapsing toward chance) before paying for the full
24-epoch 30k-clip run. Subset difficulty only loosely transfers to the
100-word corpus (more words = harder), so aim for ~0.85-0.95 here.

Run (real chip): python tools_dev/probe_scale_difficulty.py [epochs]
"""

import json
import sys
import zlib
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tests"))

import numpy as np  # noqa: E402

from pretrain_scale_run import (  # noqa: E402
    CLIP_DUR_VAR,
    CLIP_NOISE,
    CLIP_PITCH_VAR,
    make_words,
)

N_WORDS = 20
TRAIN_PER_WORD = 50
VAL_PER_WORD = 10
EPOCHS = int(sys.argv[1]) if len(sys.argv) > 1 else 8

ROOT = Path("/tmp/scale_difficulty_probe")


def main():
    from helpers import hard_word_clip
    from multilingual_kws_tpu.train.pretrain import PretrainConfig, pretrain
    from multilingual_kws_tpu.utils.wav import write_wav

    words = make_words(N_WORDS)
    train_files, val_files = [], []
    for w in words:
        d = ROOT / w
        d.mkdir(parents=True, exist_ok=True)
        for i in range(TRAIN_PER_WORD + VAL_PER_WORD):
            p = d / f"{w}_{i}.wav"
            if not p.exists():
                write_wav(
                    p,
                    hard_word_clip(
                        w, seed=zlib.crc32(f"scale2/{w}/{i}".encode()),
                        noise=CLIP_NOISE, pitch_var=CLIP_PITCH_VAR,
                        dur_var=CLIP_DUR_VAR,
                    ),
                )
            (train_files if i < TRAIN_PER_WORD else val_files).append(str(p))
    bg = ROOT / "_background_noise_"
    bg.mkdir(exist_ok=True)
    rng = np.random.default_rng(777)
    for i in range(2):
        p = bg / f"noise_{i}.wav"
        if not p.exists():
            write_wav(
                p, rng.normal(0, 0.05, 5 * 16000).astype(np.float32).clip(-1, 1)
            )

    cfg = PretrainConfig(
        num_epochs=EPOCHS, batch_size=64, compute_dtype="bfloat16",
        scan_epoch=True,
    )
    _state, _model, history, _ = pretrain(
        commands=words, train_files=train_files, val_files=val_files,
        background_data_dir=str(bg), config=cfg, verbose=1,
    )
    print(json.dumps({
        "knobs": dict(noise=CLIP_NOISE, pitch_var=CLIP_PITCH_VAR,
                      dur_var=CLIP_DUR_VAR),
        "n_words": N_WORDS,
        "val_accuracy": history["val_accuracy"],
    }))


if __name__ == "__main__":
    main()
