"""Microset builder + per-speaker grouping/eval."""

import csv

import numpy as np
import pytest

from multilingual_kws_tpu.tools.microset import (
    generate_microset,
    read_swts_filter,
    write_microset_csv,
)
from multilingual_kws_tpu.analysis.per_speaker import group_by_speaker


def test_generate_microset(tmp_path):
    splits = tmp_path / "en_splits.csv"
    rows = [["SET", "LINK", "WORD", "VALID", "SPEAKER", "GENDER"]]
    for i in range(10):
        rows.append(["TRAIN", f"hello/c{i}.opus", "hello", "", "", ""])
    rows.append(["DEV", "hello/d0.opus", "hello", "", "", ""])
    rows.append(["TEST", "hello/t0.opus", "hello", "", "", ""])
    rows.append(["TRAIN", "other/x.opus", "other", "", "", ""])
    rows.append(["TRAIN", "hello/swts1.opus", "hello", "", "", ""])
    with open(splits, "w", newline="") as fh:
        csv.writer(fh).writerows(rows)
    (tmp_path / "swts.txt").write_text("clips/swts1.mp3\n")

    swts = read_swts_filter(tmp_path / "swts.txt")
    ms = generate_microset(["hello"], splits, swts, max_clips_per_kw=4)
    assert len(ms["train"]["hello"]) == 4  # capped
    assert ms["dev"]["hello"] == ["hello/d0.opus"]
    assert "other" not in ms["train"]
    assert all("swts1" not in c for c in ms["train"]["hello"])

    out_csv = tmp_path / "micro.csv"
    write_microset_csv(ms, out_csv)
    with open(out_csv) as fh:
        out_rows = list(csv.reader(fh))
    assert out_rows[0][0] == "SET"
    assert len(out_rows) == 1 + 4 + 1 + 1


def test_group_by_speaker():
    files = [
        "/d/kw/1234-100-0001.wav",
        "/d/kw/1234-101-0002.wav",
        "/d/kw/987-5-3.wav",
        "/d/kw/abc_nohash_0.wav",
        "/d/kw/abc_nohash_1.wav",
    ]
    g = group_by_speaker(files)
    assert len(g["1234"]) == 2
    assert len(g["987"]) == 1
    assert len(g["abc"]) == 2


@pytest.mark.slow
def test_per_speaker_eval(tmp_path):
    from multilingual_kws_tpu.analysis.per_speaker import per_speaker_eval
    from multilingual_kws_tpu.utils.wav import write_wav
    from helpers import keyword_clip, make_corpus, tiny_transfer_model

    corpus = make_corpus(tmp_path / "corpus", clips_per_word=4)
    # two "speakers" of alpha with distinct seeds in the filenames
    by_speaker = {}
    for spk, base_seed in [("s1", 3000), ("s2", 4000)]:
        files = []
        for i in range(8):
            p = tmp_path / "alpha" / f"{spk}_nohash_{i}.wav"
            write_wav(p, keyword_clip("alpha", seed=base_seed + i))
            files.append(str(p))
        by_speaker[spk] = files

    res = per_speaker_eval(
        "alpha", by_speaker, corpus["unknown_files"], corpus["bg_dir"],
        num_shots=4, min_clips=8, num_epochs=1, batch_size=8,
        primary_lr=1e-2, model=tiny_transfer_model(),
    )
    assert [r["speaker"] for r in res] == ["s1", "s2"]
    for r in res:
        assert r["num_held_out"] == 4 and r["num_cross"] == 8
        assert 0.0 <= r["same_speaker_accuracy"] <= 1.0
