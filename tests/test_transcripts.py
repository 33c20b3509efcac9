"""Transcript-driven real-data stream construction (tools/transcripts.py)
vs the reference Luganda data-prep semantics (luganda_multitarget_data.py,
luganda_nontarget.py, luganda.py:761)."""

import json

import numpy as np
import pytest

from multilingual_kws_tpu.tools import transcripts as tr
from multilingual_kws_tpu.tools.textgrid import write_textgrid
from multilingual_kws_tpu.utils.wav import read_wav, write_wav

SR = 16000


def _tone(freq, dur_s, seed=0):
    rng = np.random.default_rng(seed)
    t = np.arange(int(dur_s * SR)) / SR
    return np.clip(
        0.3 * np.sin(2 * np.pi * freq * t) + rng.normal(0, 0.01, t.shape), -1, 1
    ).astype(np.float32)


@pytest.fixture()
def corpus(tmp_path):
    """transcripts.csv + clips tree + alignments, Makerere-style layout."""
    clips = tmp_path / "clips"
    clips.mkdir()
    rows = [
        ("a.wav", "akawuka kiki kino"),  # keyword at t in [0.5, 1.0]
        ("b.wav", "ekintu kirala wano"),
        ("c.wav", "masiki eyo wano"),  # excluded variant, not a target
        ("d.wav", "akawuka era akawuka"),  # two occurrences
        ("e.wav", "tulina okwegendereza"),
    ]
    durs = {"a.wav": 2.0, "b.wav": 1.5, "c.wav": 1.2, "d.wav": 3.0, "e.wav": 1.8}
    for i, (name, _t) in enumerate(rows):
        write_wav(clips / name, _tone(300 + 100 * i, durs[name], seed=i))
    csv_path = tmp_path / "transcripts.csv"
    with open(csv_path, "w") as fh:
        fh.write("wav_filename,wav_filesize,transcript\n")
        for name, t in rows:
            fh.write(f"{name},0,{t}\n")

    # alignment layout: clips_dir/<id>/<id>.{wav,lab}; alignments/<id>/<id>.TextGrid
    adir = tmp_path / "alignments"
    cdir = tmp_path / "cs_clips"
    for cid, (name, text, ivs) in {
        "a": ("a.wav", "akawuka kiki kino", [("akawuka", 0.5, 1.0), ("kiki", 1.0, 1.4)]),
        "d": ("d.wav", "akawuka era akawuka", [("akawuka", 0.2, 0.7), ("era", 0.8, 1.1), ("akawuka", 1.9, 2.4)]),
        "b": ("b.wav", "ekintu kirala wano", [("ekintu", 0.1, 0.6)]),
    }.items():
        (cdir / cid).mkdir(parents=True)
        (adir / cid).mkdir(parents=True)
        audio, _ = read_wav(clips / name)
        write_wav(cdir / cid / f"{cid}.wav", audio)
        (cdir / cid / f"{cid}.lab").write_text(text)
        write_textgrid(adir / cid / f"{cid}.TextGrid", ivs)
    (adir / "unaligned.txt").write_text("")  # non-dir entry must be skipped
    return dict(csv=csv_path, clips=clips, alignments=adir, cs_clips=cdir)


def test_load_and_split(corpus):
    entries = tr.load_transcripts_csv(corpus["csv"], corpus["clips"])
    assert len(entries) == 5
    with_kw, without = tr.split_by_keywords(
        entries, {"akawuka"}, exclude={"masiki"}
    )
    assert [e.wav.split("/")[-1] for e in with_kw] == ["a.wav", "d.wav"]
    # c.wav is excluded from the non-target pool by the variant filter
    assert [e.wav.split("/")[-1] for e in without] == ["b.wav", "e.wav"]
    assert tr.keyword_counts(entries, {"akawuka"}) == {"akawuka": 3}


def test_timings_from_alignments(corpus):
    targets = tr.timings_from_alignments(
        corpus["alignments"], corpus["cs_clips"], {"akawuka"}
    )
    by_id = {t.wav.split("/")[-1]: t for t in targets}
    assert set(by_id) == {"a.wav", "d.wav"}
    assert by_id["d.wav"].occurences_s == [
        dict(keyword="akawuka", start_s=0.2, end_s=0.7),
        dict(keyword="akawuka", start_s=1.9, end_s=2.4),
    ]
    assert by_id["a.wav"].keywords == ["akawuka"]


def test_assemble_multitarget_stream(corpus, tmp_path):
    entries = tr.load_transcripts_csv(corpus["csv"], corpus["clips"])
    _, non_targets = tr.split_by_keywords(entries, {"akawuka"}, exclude={"masiki"})
    targets = tr.timings_from_alignments(
        corpus["alignments"], corpus["cs_clips"], {"akawuka"}
    )
    out = tmp_path / "eval"
    gt = tr.assemble_multitarget_stream(targets, non_targets, out, seed=3)

    # artifact contract
    for f in ("stream.wav", "groundtruth.json", "full_transcript.json",
              "groundtruth_labels.txt", "keyword_list.txt"):
        assert (out / f).exists(), f
    assert (out / "keyword_list.txt").read_text().strip() == "akawuka"

    # groundtruth times line up with where target clips landed in the stream
    audio, sr = read_wav(out / "stream.wav")
    total_dur = sum(e["duration_s"] for e in gt["stream_data"])
    assert abs(audio.shape[0] / sr - total_dur) < 1e-3
    # 2 targets picked -> a (1 occurrence) + d (2 occurrences) = 3 gt times
    assert len(gt["groundtruth_target_times_ms"]) == 3
    lines = (out / "groundtruth_labels.txt").read_text().strip().splitlines()
    assert len(lines) == 3 and all(l.startswith("akawuka,") for l in lines)
    # label file parses through the stats reader contract: "label, time_ms"
    times = [float(l.split(",")[1]) for l in lines]
    assert times == sorted(times) or len(set(times)) == len(times)

    # each gt time must fall inside a clip whose transcript has the keyword
    g = json.loads((out / "groundtruth.json").read_text())
    for t in g["groundtruth_target_times_ms"]:
        info = tr.transcript_by_offset(t["time_ms"], g)
        assert info is not None
        assert "akawuka" in info["entry"]["transcript"]
        assert not info["certain_false_positive"]
        assert "[::akawuka::]" in info["decorated"]


def test_transcript_by_offset_false_positive(corpus, tmp_path):
    entries = tr.load_transcripts_csv(corpus["csv"], corpus["clips"])
    _, non_targets = tr.split_by_keywords(entries, {"akawuka"}, exclude={"masiki"})
    out = tmp_path / "nt"
    gt = tr.assemble_nontarget_stream(non_targets, out, num_wavs=6, seed=0)
    assert gt["groundtruth_target_times_ms"] == []
    audio, sr = read_wav(out / "nontarget_stream.wav")
    assert abs(audio.shape[0] / sr - gt["total_duration_s"]) < 1e-3
    # any detection on this stream is a certain false positive
    info = tr.transcript_by_offset(500.0, gt)
    assert info["certain_false_positive"]
    # past-the-end query
    assert tr.transcript_by_offset(gt["total_duration_s"] * 1000 + 50, gt) is None


def test_case_study_prepare_real_data(corpus, tmp_path):
    """The example's real-data prep glue runs from a transcripts.csv +
    clips tree with no synthetic fallback (examples/case_study.py)."""
    import sys
    from types import SimpleNamespace

    sys.path.insert(0, "examples")
    try:
        from case_study import prepare_real_data
    finally:
        sys.path.pop(0)

    args = SimpleNamespace(
        transcripts_csv=str(corpus["csv"]),
        clips_root=str(corpus["clips"]),
        alignments=str(corpus["alignments"]),
        aligned_clips=str(corpus["cs_clips"]),
        keyword=["akawuka"],
        exclude_variants=["masiki"],
        max_shots=1,
    )
    work = tmp_path / "case"
    shots, wav, labels, times, duration_s, gt = prepare_real_data(args, work)
    assert len(shots) >= 1 and all(s.endswith(".wav") for s in shots)
    audio, sr = read_wav(wav)
    assert abs(audio.shape[0] / sr - duration_s) < 1e-3
    assert len(times) >= 1
    assert (work / "nontarget_eval" / "nontarget_stream.wav").exists()
