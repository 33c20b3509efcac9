"""Corpus-construction tooling: audio ops, TextGrid parsing, word extraction,
frequent-word selection, manifests, corpus-based stream synthesis."""

import csv
from collections import Counter

import numpy as np
import pytest

from multilingual_kws_tpu.tools import word_extraction as wx
from multilingual_kws_tpu.tools.corpus import (
    make_embedding_manifests,
    select_frequent_words,
)
from multilingual_kws_tpu.tools.textgrid import read_textgrid, write_textgrid
from multilingual_kws_tpu.utils.audio_ops import (
    concat,
    duration_s,
    fade,
    pad,
    resample,
    trim,
)
from multilingual_kws_tpu.utils.wav import read_wav, write_wav

SR = 16000


# -- audio ops ---------------------------------------------------------------


def test_resample_preserves_tone():
    t48 = np.arange(48000) / 48000
    x48 = (0.5 * np.sin(2 * np.pi * 440 * t48)).astype(np.float32)
    y = resample(x48, 48000, 16000)
    assert y.shape == (16000,)
    # correlate against the ideal 16 kHz tone (ignore filter edges)
    t16 = np.arange(16000) / 16000
    ideal = 0.5 * np.sin(2 * np.pi * 440 * t16)
    mid = slice(400, -400)
    corr = np.corrcoef(y[mid], ideal[mid])[0, 1]
    assert corr > 0.999


def test_trim_fade_pad_concat():
    x = np.ones(SR, np.float32)
    tr = trim(x, SR, 0.25, 0.75)
    assert tr.shape == (8000,)
    fd = fade(x, SR, 0.025, 0.025)
    assert fd[0] == 0.0 and fd[-1] < 0.01 and fd[SR // 2] == 1.0
    pd = pad(x, SR, 0.1, 0.2)
    assert pd.shape == (SR + 1600 + 3200,)
    assert np.all(pd[:1600] == 0) and np.all(pd[-3200:] == 0)
    cc = concat([x, x[:100]])
    assert cc.shape == (SR + 100,)


def test_duration(tmp_path):
    write_wav(tmp_path / "d.wav", np.zeros(24000, np.float32))
    assert duration_s(tmp_path / "d.wav") == pytest.approx(1.5)


# -- textgrid ----------------------------------------------------------------


def test_textgrid_roundtrip(tmp_path):
    intervals = [("", 0.0, 0.42), ("hello", 0.42, 0.91), ("world", 0.91, 1.5)]
    p = tmp_path / "a.TextGrid"
    write_textgrid(p, intervals)
    got = read_textgrid(p)
    assert [(i.mark, i.minTime, i.maxTime) for i in got] == intervals


def test_textgrid_short_format(tmp_path):
    p = tmp_path / "short.TextGrid"
    p.write_text(
        'File type = "ooTextFile"\nObject class = "TextGrid"\n\n'
        "0\n2.5\n<exists>\n1\n"
        '"IntervalTier"\n"words"\n0\n2.5\n2\n'
        '0\n1.2\n"foo"\n1.2\n2.5\n"bar"\n'
    )
    got = read_textgrid(p)
    assert [(i.mark, i.minTime, i.maxTime) for i in got] == [
        ("foo", 0.0, 1.2),
        ("bar", 1.2, 2.5),
    ]


# -- word extraction ---------------------------------------------------------


@pytest.fixture()
def mini_cv(tmp_path):
    """A miniature Common Voice layout: validated.csv + alignments + clips."""
    lang = "xx"
    base = tmp_path / "align"
    clipdir = tmp_path / "clips"
    clipdir.mkdir()
    rows = [
        ("c0.wav", "", "hello world"),
        ("c1.wav", "", "world again today"),
        ("c2.wav", "", "nothing here"),
        ("c3.wav", "", "hello hello"),
    ]
    csvp = base / lang / "validated.csv"
    csvp.parent.mkdir(parents=True)
    with open(csvp, "w", newline="") as fh:
        w = csv.writer(fh)
        w.writerow(["path", "x", "sentence"])
        w.writerows(rows)
    # alignments: 2 s clips, each word 0.5 s
    for name, _, sent in rows:
        stem = name[:-4]
        words = sent.split()
        iv = [("", 0.0, 0.2)]
        t = 0.2
        for wd in words:
            iv.append((wd, t, t + 0.5))
            t += 0.5
        iv.append(("", t, 2.0))
        write_textgrid(base / lang / "alignments" / f"{stem}.TextGrid", iv)
        # matching audio clip (distinct tone per file)
        tt = np.arange(2 * SR) / SR
        write_wav(
            clipdir / name,
            (0.3 * np.sin(2 * np.pi * (300 + 100 * int(stem[1])) * tt)).astype(
                np.float32
            ),
        )
    return dict(lang=lang, base=base, clips=clipdir)


def test_wordcounts(mini_cv):
    counts = wx.wordcounts(mini_cv["base"] / mini_cv["lang"] / "validated.csv")
    assert counts["hello"] == 3 and counts["world"] == 2


def test_generate_filemap_and_timings(mini_cv):
    fm = wx.generate_filemap(mini_cv["lang"], mini_cv["base"])
    assert set(fm) == {"c0", "c1", "c2", "c3"}
    timings, notfound = wx.generate_wordtimings(
        {"hello", "world"}, fm, mini_cv["lang"], mini_cv["base"], num_workers=0
    )
    assert notfound == []
    assert len(timings["world"]) == 2
    # c3's transcript has "hello" twice: each token matches both aligned
    # intervals (reference parity, word_extraction.py:57-80 — duplicates are
    # rejected later by select_samples' unique-mp3 assertion)
    assert len(timings["hello"]) == 5
    for mp3name, s, e in timings["world"]:
        assert e - s == pytest.approx(0.5)


def test_random_non_target_sentences(mini_cv):
    rng = np.random.default_rng(0)
    sel = wx.random_non_target_sentences(
        1, {"hello", "world"}, mini_cv["lang"], mini_cv["base"], rng=rng
    )
    assert sel == ["c2"]
    with pytest.raises(ValueError):
        wx.random_non_target_sentences(
            3, {"hello", "world"}, mini_cv["lang"], mini_cv["base"], rng=rng
        )


def test_extract_one_second_windows():
    assert wx.extract_one_second(0.8, 0.1, 0.5) == (0, 0.8)
    s, e = wx.extract_one_second(2.0, 0.6, 1.0)
    assert (s, e) == (pytest.approx(0.3), pytest.approx(1.3))
    s, e = wx.extract_one_second(2.0, 1.8, 2.0)  # clamped at the end
    assert (s, e) == (pytest.approx(1.0), pytest.approx(2.0))
    s, e = wx.extract_one_second(2.0, 0.0, 0.1)  # clamped at the start
    assert (s, e) == (0, pytest.approx(1.0))


def test_extract_shot(mini_cv, tmp_path):
    dest = tmp_path / "shots"
    dest.mkdir()
    out = wx.extract_shot(
        mini_cv["clips"] / "c0.wav", 0.2, 0.7, dest, include_context=False
    )
    audio, sr = read_wav(out)
    assert sr == SR and audio.shape == (SR,)  # padded to exactly 1 s
    out2 = wx.extract_shot(
        mini_cv["clips"] / "c1.wav", 0.2, 0.7, dest, include_context=True
    )
    audio2, _ = read_wav(out2)
    assert audio2.shape == (SR,)  # 1 s context window
    with pytest.raises(ValueError):
        wx.extract_shot(
            mini_cv["clips"] / "c0.wav", 0.2, 0.7, dest, include_context=False
        )  # already exists


# -- corpus scaffolding --------------------------------------------------------


def test_select_frequent_words():
    counts = Counter()
    for i in range(30):
        counts[f"stop{i:02d}"] = 1000 - i  # top 20 are "stopwords"
    counts.update({"keyword": 500, "anotherone": 400, "tiny": 300, "word!": 200})
    sel = select_frequent_words(counts, n_words=3, min_char_len=5, skip_first_n=20)
    # "tiny" (4 chars) excluded; stop20..29 are 6 chars and rank above keyword
    assert len(sel) == 3
    assert "tiny" not in sel
    assert sel[0].startswith("stop")


def test_make_embedding_manifests(tmp_path):
    for word in ["aaa", "bbb"]:
        d = tmp_path / "clips" / word
        d.mkdir(parents=True)
        for i in range(20):
            write_wav(d / f"{i}.wav", np.zeros(1600, np.float32))
    res = make_embedding_manifests(
        {w: str(tmp_path / "clips" / w) for w in ["aaa", "bbb"]},
        tmp_path / "manifests",
        val_fraction=0.1,
        seed=0,
    )
    assert res["commands"] == ["aaa", "bbb"]
    assert len(res["val_files"]) == 4 and len(res["train_files"]) == 36
    assert (tmp_path / "manifests/commands.txt").read_text() == "aaa\nbbb\n"
    assert not set(res["train_files"]) & set(res["val_files"])


# -- corpus-based stream synthesis ---------------------------------------------


def test_generate_stream_and_labels(mini_cv, tmp_path):
    from multilingual_kws_tpu.tools.stream_sentences import (
        generate_stream_and_labels,
    )

    wav_data = [
        dict(is_target=True, clip="c0", start_s=0.2, end_s=0.7),
        dict(is_target=False, clip="c2"),
        dict(is_target=True, clip="c3", start_s=0.7, end_s=1.2),
    ]
    wav_path, labels_path = generate_stream_and_labels(
        tmp_path / "stream", "hello", wav_data, mini_cv["clips"],
        clip_suffix=".wav",
    )
    audio, sr = read_wav(wav_path)
    # 1 s target + 2 s sentence + 1 s target
    assert audio.shape[0] == 4 * SR
    lines = labels_path.read_text().splitlines()
    assert lines == ["hello, 0", "hello, 3000"]


def test_timing_csvs_roundtrip(tmp_path):
    from multilingual_kws_tpu.tools.corpus import read_timing_csv, write_timing_csvs

    timings = {
        "hello": [("c1", 0.5, 1.0), ("c1", 1.5, 2.0), ("c2", 0.2, 0.7)],
    }
    write_timing_csvs(timings, tmp_path / "timings")
    d = read_timing_csv(tmp_path / "timings" / "hello.csv")
    # first occurrence per clip id wins (reference duplicate-skip semantics)
    assert d == {"c1": (0.5, 1.0), "c2": (0.2, 0.7)}


def test_repoint_manifest(tmp_path):
    from multilingual_kws_tpu.tools.corpus import repoint_manifest

    old = tmp_path / "nocontext"
    new = tmp_path / "context"
    for root in (old, new):
        (root / "word").mkdir(parents=True)
        (root / "word" / "a.wav").write_bytes(b"")
    files = [str(old / "word" / "a.wav")]
    out = repoint_manifest(files, old, new)
    assert out == [str(new / "word" / "a.wav")]
    with pytest.raises(FileNotFoundError):
        repoint_manifest([str(old / "word" / "missing.wav")], old, new)


def test_nontarget_stream_has_no_labels(tmp_path):
    from helpers import keyword_clip
    from multilingual_kws_tpu.tools.stream_synth import (
        synthesize_nontarget_stream,
        write_stream,
    )

    spec = synthesize_nontarget_stream(
        [keyword_clip("charlie", seed=600 + i) for i in range(3)],
        num_distractors=4, seed=2, noise_rms=0.003,
    )
    assert spec.labels == []
    # 4 distractor clips + gaps + tail
    assert spec.waveform.shape[0] > 4 * SR
    wavp, labp = tmp_path / "nt.wav", tmp_path / "nt.txt"
    write_stream(spec, wavp, labp)
    assert labp.read_text() == ""
