"""Embedding-corpus scaffolding: frequent-word selection + manifest writing.

Equivalents of the reference corpus-construction scripts:
- frequent_words.py:135-160 — top-N frequent words per language (N=50,
  min 5 chars, skip the top-20 stopwords)
- multi_language_embedding_data.py:29-44 — multilingual command selection
  (words with > 2200 extracted clips across languages)
- multi_language_embedding_data.py:96-184 — 10% validation split with a
  train/val overlap assertion, written as commands.txt / train_files.txt /
  val_files.txt (the manifest contract in data/manifests.py)
"""

from __future__ import annotations

import glob
import os
from collections import Counter
from pathlib import Path
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from ..data.manifests import write_lines


def select_frequent_words(
    counts: Counter,
    n_words: int = 50,
    min_char_len: int = 5,
    skip_first_n: int = 20,
) -> List[str]:
    """Top-N non-stopword frequent words (reference frequent_words.py:135-160):
    drop the top `skip_first_n` as stopwords, drop words shorter than
    `min_char_len`, take the next `n_words` by frequency."""
    non_stop = counts.copy()
    for w, _ in counts.most_common(skip_first_n):
        del non_stop[w]
    for w in [w for w in non_stop if len(w) < min_char_len]:
        del non_stop[w]
    return [w for w, _ in non_stop.most_common(n_words)]


def select_embedding_commands(
    frequent_words_dir,
    min_clips: int = 2200,
) -> Dict[str, List[Tuple[str, str]]]:
    """{lang: [(word, clips_dir)]} for words with > min_clips extracted wavs
    (reference multi_language_embedding_data.py:29-44). Duplicate words
    across languages are kept per-language here; dedup at manifest time."""
    frequent_words_dir = Path(frequent_words_dir)
    per_lang: Dict[str, List[Tuple[str, str]]] = {}
    for lang in sorted(os.listdir(frequent_words_dir)):
        clips = frequent_words_dir / lang / "clips"
        if not clips.is_dir():
            continue
        per_lang[lang] = []
        for word in sorted(os.listdir(clips)):
            wavs = glob.glob(str(clips / word / "*.wav"))
            if len(wavs) > min_clips:
                per_lang[lang].append((word, str(clips / word)))
    return per_lang


def make_embedding_manifests(
    word_dirs: Dict[str, str],
    dest_dir,
    val_fraction: float = 0.1,
    seed: int = 0,
    max_clips_per_word: Optional[int] = None,
) -> Dict[str, List[str]]:
    """Write commands.txt / train_files.txt / val_files.txt.

    word_dirs: {command: clips_dir}. Per word: shuffle, take
    `max_clips_per_word` (the reference caps at ~2200/word,
    multi_language_embedding_data.py:60-74), split off `val_fraction`.
    Asserts train/val disjointness (reference :182-184).
    """
    rng = np.random.default_rng(seed)
    dest_dir = Path(dest_dir)
    commands = sorted(word_dirs)
    train_files: List[str] = []
    val_files: List[str] = []
    for word in commands:
        wavs = sorted(glob.glob(os.path.join(word_dirs[word], "*.wav")))
        assert wavs, f"no clips for {word}"
        wavs = list(rng.permutation(wavs))
        if max_clips_per_word is not None:
            wavs = wavs[:max_clips_per_word]
        n_val = int(len(wavs) * val_fraction)
        val_files.extend(wavs[:n_val])
        train_files.extend(wavs[n_val:])

    overlap = set(train_files) & set(val_files)
    assert not overlap, f"train/val overlap: {sorted(overlap)[:5]}"

    write_lines(dest_dir / "commands.txt", commands)
    write_lines(dest_dir / "train_files.txt", train_files)
    write_lines(dest_dir / "val_files.txt", val_files)
    return {"commands": commands, "train_files": train_files,
            "val_files": val_files}
