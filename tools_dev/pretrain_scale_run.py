"""Sustained at-scale pretraining on the real chip, resume exercised in anger.

VERDICT r3 item 3: the flagship driver (DEFAULT config: scan_epoch, bf16,
orbax best-val, CSVLogger) had only ever run 12-step throughput probes or
8-epoch toy runs. This script:

 1. builds a synthetic corpus big enough to be honest (100 words x
    (300 train + 20 val) clips = 32k clips, ~1.0 GB as an int16 resident
    bank — MSWC itself is unavailable: zero egress),
 2. runs the real CLI (`python -m multilingual_kws_tpu.api.cli pretrain`)
    as a subprocess for PHASE_A_EPOCHS epochs, then SIGKILLs it mid-run
    (no graceful shutdown — the honest crash),
 3. resumes with --resume from the best-val orbax checkpoint and trains
    to completion,
 4. writes benchmarks/pretrain_scale_run.json (epochs, wall, clips/s,
    final/best val acc, kill+resume evidence) and copies the history CSVs
    into benchmarks/.

Corpus words are 4-phoneme sequences over tests/helpers.PHONEMES (many
confusable permutations), so val accuracy is meaningfully off the ceiling
for the first epochs. Reference modus operandi being exercised:
train_multilingual_embedding.py:96-133 (resume + recompile + ModelCheckpoint).

Run on the TPU host from /root/repo (NO PYTHONPATH — axon plugin):
    python tools_dev/pretrain_scale_run.py
"""

import itertools
import json
import os
import signal
import subprocess
import sys
import time
import zlib
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tests"))

CORPUS = Path("/tmp/scale_corpus")
RUN = Path("/tmp/scale_run")
DEST = REPO / "benchmarks" / "pretrain_scale_run.json"

N_WORDS = 100
TRAIN_PER_WORD = 300
VAL_PER_WORD = 20
TOTAL_EPOCHS = 24
PHASE_A_EPOCHS = 8  # kill partway through epoch PHASE_A_EPOCHS+1

# Corpus difficulty (VERDICT r4 missing #1): the round-4 run topped out at
# val 1.0 — mechanics proven, training quality not. These knobs create
# IRREDUCIBLE class overlap so the curve is informative: at pitch_var 0.18
# adjacent phoneme bands genuinely overlap (e [1886,2714] Hz vs
# f [2460,3540] — ~30% of e clips land inside f's band), dur_var 0.35
# overlaps the duration cue too, and noise 0.05 is 4x the round-4 floor.
# Reference anchor: MSWC 761-way val 0.8011 (docker/Dockerfile:83-84).
CLIP_NOISE = 0.05
CLIP_PITCH_VAR = 0.18
CLIP_DUR_VAR = 0.35


def make_words(n):
    """n distinct 4-phoneme words over the a..f inventory, deterministic,
    prefix-diverse (itertools.product order then shuffled by crc)."""
    all_words = ["".join(p) for p in itertools.product("abcdef", repeat=4)]
    all_words.sort(key=lambda w: zlib.crc32(w.encode()))
    return sorted(all_words[:n])


def build_corpus():
    from helpers import hard_word_clip  # noqa: E402
    import numpy as np  # noqa: E402
    from multilingual_kws_tpu.utils.wav import write_wav  # noqa: E402

    words = make_words(N_WORDS)
    difficulty = dict(
        noise=CLIP_NOISE, pitch_var=CLIP_PITCH_VAR, dur_var=CLIP_DUR_VAR
    )
    manifest = CORPUS / "MANIFEST.json"
    if manifest.exists():
        m = json.loads(manifest.read_text())
        if (
            m["words"] == words
            and m["train_per_word"] == TRAIN_PER_WORD
            and m.get("difficulty") == difficulty
        ):
            print(f"corpus already built at {CORPUS}", flush=True)
            return m
    t0 = time.time()
    train_files, val_files = [], []
    for w in words:
        d = CORPUS / w
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
    bg_dir = CORPUS / "_background_noise_"
    bg_dir.mkdir(exist_ok=True)
    rng = np.random.default_rng(777)
    for i in range(4):
        write_wav(
            bg_dir / f"noise_{i}.wav",
            rng.normal(0, 0.05, 5 * 16000).astype(np.float32).clip(-1, 1),
        )
    (CORPUS / "commands.txt").write_text("\n".join(words) + "\n")
    (CORPUS / "train_files.txt").write_text("\n".join(train_files) + "\n")
    (CORPUS / "val_files.txt").write_text("\n".join(val_files) + "\n")
    m = dict(
        words=words,
        train_per_word=TRAIN_PER_WORD,
        val_per_word=VAL_PER_WORD,
        n_train=len(train_files),
        n_val=len(val_files),
        difficulty=difficulty,
        build_seconds=round(time.time() - t0, 1),
    )
    manifest.write_text(json.dumps(m))
    print(
        f"corpus built: {len(train_files)} train / {len(val_files)} val wavs "
        f"in {m['build_seconds']}s",
        flush=True,
    )
    return m


def cli_cmd(epochs, csvlog, resume=None):
    cmd = [
        sys.executable, "-m", "multilingual_kws_tpu.api.cli", "pretrain",
        "--commands", str(CORPUS / "commands.txt"),
        "--train-files", str(CORPUS / "train_files.txt"),
        "--val-files", str(CORPUS / "val_files.txt"),
        "--background-noise", str(CORPUS / "_background_noise_"),
        "--output", str(RUN / "ckpt"),
        "--num-epochs", str(epochs),
        "--batch-size", "64",
        "--compute-dtype", "bfloat16",
        "--csvlog", str(csvlog),
        "--history", str(RUN / "history.json"),
        "--seed", "0",
    ]
    if resume:
        cmd += ["--resume", str(resume)]
    return cmd


def count_epochs(csvlog):
    if not Path(csvlog).exists():
        return 0
    lines = Path(csvlog).read_text().strip().splitlines()
    return max(0, len(lines) - 1)  # minus header


def main():
    corpus = build_corpus()
    RUN.mkdir(parents=True, exist_ok=True)
    log_a = RUN / "phase_a.csv"
    log_b = RUN / "phase_b.csv"
    out_a = RUN / "phase_a.out"
    out_b = RUN / "phase_b.out"
    for f in (log_a, log_b, out_a, out_b, RUN / "history.json"):
        if f.exists():
            f.unlink()

    # ---- phase A: fresh run, SIGKILL after PHASE_A_EPOCHS epochs land
    t0 = time.time()
    with open(out_a, "w") as fh:
        proc = subprocess.Popen(
            cli_cmd(TOTAL_EPOCHS, log_a), cwd=str(REPO), stdout=fh,
            stderr=subprocess.STDOUT,
        )
    killed_at_epoch = None
    while proc.poll() is None:
        time.sleep(2)  # CSVLogger flushes per epoch; poll fast so quick
        done = count_epochs(log_a)  # epochs can't race the whole run past us
        if done >= PHASE_A_EPOCHS:
            # kill MID-epoch: the next epoch is underway within ~a second
            time.sleep(3)
            os.kill(proc.pid, signal.SIGKILL)
            killed_at_epoch = count_epochs(log_a)
            proc.wait()
            break
    phase_a_wall = time.time() - t0
    if killed_at_epoch is None:
        raise SystemExit(
            f"phase A exited on its own (rc={proc.returncode}) before "
            f"{PHASE_A_EPOCHS} epochs — see {out_a}"
        )
    print(
        f"phase A: SIGKILLed after {killed_at_epoch} logged epochs "
        f"({phase_a_wall:.0f}s)",
        flush=True,
    )

    # ---- phase B: resume from the best-val checkpoint
    remaining = TOTAL_EPOCHS - killed_at_epoch
    t1 = time.time()
    with open(out_b, "w") as fh:
        rc = subprocess.call(
            cli_cmd(remaining, log_b, resume=RUN / "ckpt"), cwd=str(REPO),
            stdout=fh, stderr=subprocess.STDOUT,
        )
    phase_b_wall = time.time() - t1
    if rc != 0:
        raise SystemExit(f"phase B (resume) failed rc={rc} — see {out_b}")
    print(f"phase B: resumed + finished {remaining} epochs ({phase_b_wall:.0f}s)",
          flush=True)

    # ---- gather evidence
    import csv

    def read_csv(p):
        with open(p) as fh:
            return list(csv.DictReader(fh))

    rows_a, rows_b = read_csv(log_a), read_csv(log_b)
    val_a = [float(r["val_accuracy"]) for r in rows_a]
    val_b = [float(r["val_accuracy"]) for r in rows_b]
    from multilingual_kws_tpu.train.checkpoints import load_metadata

    resume_meta = load_metadata(RUN / "ckpt")
    n_train = corpus["n_train"]
    clips_a = killed_at_epoch * n_train
    clips_b = len(rows_b) * n_train
    out = dict(
        config=dict(
            words=N_WORDS,
            train_clips=n_train,
            val_clips=corpus["n_val"],
            corpus_difficulty=corpus.get("difficulty"),
            bank_bytes_int16=n_train * 16000 * 2,
            batch_size=64,
            compute_dtype="bfloat16",
            scan_epoch=True,
            total_epochs_planned=TOTAL_EPOCHS,
        ),
        phase_a=dict(
            epochs_completed=killed_at_epoch,
            kill="SIGKILL mid-epoch (no graceful shutdown)",
            wall_seconds=round(phase_a_wall, 1),
            val_accuracy=val_a,
        ),
        phase_b=dict(
            resumed_from="best-val orbax checkpoint (params + BN stats)",
            epochs_completed=len(rows_b),
            wall_seconds=round(phase_b_wall, 1),
            val_accuracy=val_b,
        ),
        final_val_accuracy=val_b[-1] if val_b else None,
        best_val_accuracy=max(val_a + val_b),
        checkpoint_metadata=resume_meta,
        e2e_clips_per_sec=dict(
            phase_a=round(clips_a / phase_a_wall, 1),
            phase_b=round(clips_b / phase_b_wall, 1),
            note=(
                "whole-phase wall clock incl. corpus load, bank upload, "
                "compiles, validation and checkpointing — not a kernel number"
            ),
        ),
    )
    DEST.write_text(json.dumps(out, indent=1))
    import shutil

    shutil.copy(log_a, REPO / "benchmarks" / "pretrain_scale_phase_a.csv")
    shutil.copy(log_b, REPO / "benchmarks" / "pretrain_scale_phase_b.csv")
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
