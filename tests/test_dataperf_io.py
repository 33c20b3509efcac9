"""DataPerf serialization + validation filter (analysis/dataperf_io.py) vs
the reference notebook semantics (dataperf_experiments.py:259-300,
dataperf_validation_filter.py:44-105)."""

import numpy as np
import pytest

from multilingual_kws_tpu.analysis import dataperf_io as dio


def _samples(n=6, dim=8, seed=0):
    rng = np.random.default_rng(seed)
    return [
        dio.Sample(
            sample_type="target" if i % 2 == 0 else "nontarget",
            sample_id=f"en/clips/common_voice_{i}.wav",
            vector=rng.normal(0, 1, dim).astype(np.float32),
        )
        for i in range(n)
    ]


def test_npz_roundtrip(tmp_path):
    samples = _samples()
    dio.save_npz(tmp_path / "train.npz", samples, key="train")
    back = dio.load_npz(tmp_path / "train.npz", key="train")
    assert [s.sample_id for s in back] == [s.sample_id for s in samples]
    assert [s.sample_type for s in back] == [s.sample_type for s in samples]
    for a, b in zip(samples, back):
        np.testing.assert_allclose(a.vector, b.vector)
    # reference-style filtering by column works on the raw npz too
    raw = np.load(tmp_path / "train.npz", allow_pickle=True)["train"]
    target_vecs = raw[raw[:, 0] == "target"][:, 2]
    assert len(target_vecs) == 3


def test_pb_roundtrip(tmp_path):
    samples = _samples(n=5, dim=192, seed=1)
    dio.save_pb(tmp_path / "train.pb", samples)
    back = dio.load_pb(tmp_path / "train.pb")
    assert [s.sample_id for s in back] == [s.sample_id for s in samples]
    assert [s.sample_type for s in back] == [s.sample_type for s in samples]
    for a, b in zip(samples, back):
        np.testing.assert_allclose(a.vector, b.vector, atol=0)
    by_type = dio.split_by_type(back)
    assert len(by_type["target"]) == 3 and len(by_type["nontarget"]) == 2


def test_pb_wire_format_matches_protobuf_library():
    """Our hand-rolled writer must parse with a real protobuf decoder (the
    dataperf submission harness uses protoc-generated classes)."""
    pytest.importorskip("google.protobuf")
    from google.protobuf.internal import decoder

    samples = _samples(n=2, dim=3, seed=2)
    import tempfile

    with tempfile.NamedTemporaryFile(suffix=".pb") as fh:
        dio.save_pb(fh.name, samples)
        buf = open(fh.name, "rb").read()
    # top-level: field 1, wire 2
    tag, pos = decoder._DecodeVarint(buf, 0)
    assert tag >> 3 == 1 and tag & 7 == 2
    ln, pos = decoder._DecodeVarint(buf, pos)
    body = buf[pos : pos + ln]
    # first sample: sample_type omitted (0 = target), then sample_id
    tag2, p2 = decoder._DecodeVarint(body, 0)
    assert tag2 >> 3 == 2 and tag2 & 7 == 2  # string field
    sl, p2 = decoder._DecodeVarint(body, p2)
    assert body[p2 : p2 + sl].decode() == samples[0].sample_id


def test_validation_filter():
    rng = np.random.default_rng(3)
    clips = [f"clip_{i}" for i in range(10)]
    eval_yaml = {"targets": {"episode": list(clips), "job": ["other"]}}
    ratings = {c: ("bad" if i in (2, 7) else "good") for i, c in enumerate(clips)}
    emb = {c: rng.normal(0, 1, 4).astype(np.float32) for c in clips}

    cleaned_yaml, cleaned_emb, report = dio.target_validation_filter(
        "episode", eval_yaml, ratings, emb
    )
    assert report["bad"] == 2 and report["good"] == 8
    assert cleaned_yaml["targets"]["episode"] == [
        c for i, c in enumerate(clips) if i not in (2, 7)
    ]
    assert set(cleaned_emb) == set(cleaned_yaml["targets"]["episode"])
    # untouched inputs + other targets preserved
    assert eval_yaml["targets"]["episode"] == clips
    assert cleaned_yaml["targets"]["job"] == ["other"]
    assert report["percent_good"] == 80.0


def test_validation_filter_consistency_asserts():
    eval_yaml = {"targets": {"t": ["a", "b"]}}
    with pytest.raises(AssertionError):
        dio.target_validation_filter(
            "t", eval_yaml, {"a": "good"}, {"a": np.zeros(2), "b": np.zeros(2)}
        )
    with pytest.raises(AssertionError):
        dio.target_validation_filter(
            "t", eval_yaml, {"a": "good", "b": "good"}, {"a": np.zeros(2)}
        )


def test_ratings_csv_roundtrip(tmp_path):
    p = tmp_path / "r.csv"
    p.write_text("clip_0,snr,good\nclip_1,snr,bad\nclip_2,bad\n")
    r = dio.read_ratings_csv(p)
    assert r == {"clip_0": "good", "clip_1": "bad", "clip_2": "bad"}


def test_resource_tiers_and_keyword_selection():
    from multilingual_kws_tpu.analysis.dataperf_io import (
        LOW_RESOURCE_LANGUAGES,
        MEDIUM_RESOURCE_LANGUAGES,
        keyword_counts,
        select_experiment_keywords,
    )

    assert "ro" in LOW_RESOURCE_LANGUAGES and "id" in MEDIUM_RESOURCE_LANGUAGES
    assert not set(LOW_RESOURCE_LANGUAGES) & set(MEDIUM_RESOURCE_LANGUAGES)
    assert all(len(c) == 2 for c in LOW_RESOURCE_LANGUAGES + MEDIUM_RESOURCE_LANGUAGES)

    clips = (
        [("karena", "validation")] * 181
        + [("sangat", "validation")] * 159
        + [("rare", "validation")] * 3
        + [("karena", "train")] * 50  # non-validation rows don't count
    )
    counts = keyword_counts(clips)
    assert counts == {"karena": 181, "sangat": 159, "rare": 3}
    assert select_experiment_keywords(counts, n=5, min_count=100) == [
        "karena", "sangat",
    ]
