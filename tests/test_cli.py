"""Public CLI acceptance: pretrain -> train -> inference chained in-process
on a tiny synthetic corpus — the full reference workflow through the same
entry points a user types (run.py parity, SURVEY.md section 2.5 artifacts).
"""

import json

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # heavy e2e: run with --slow

from multilingual_kws_tpu.api.cli import main as cli_main
from multilingual_kws_tpu.data.manifests import write_lines

from helpers import keyword_clip, make_corpus


@pytest.fixture(scope="module")
def workspace(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("cliws")
    corpus = make_corpus(tmp / "corpus", clips_per_word=10)
    return tmp, corpus


def test_cli_full_workflow(workspace):
    tmp, corpus = workspace

    # --- pretrain on bravo/charlie ------------------------------------------
    words = ["bravo", "charlie"]
    train_files = [f for w in words for f in corpus[w][:8]]
    val_files = [f for w in words for f in corpus[w][8:]]
    write_lines(tmp / "commands.txt", words)
    write_lines(tmp / "train_files.txt", train_files)
    write_lines(tmp / "val_files.txt", val_files)
    write_lines(tmp / "unknown.txt", corpus["unknown_files"])

    cli_main([
        "pretrain",
        "--commands", str(tmp / "commands.txt"),
        "--train-files", str(tmp / "train_files.txt"),
        "--val-files", str(tmp / "val_files.txt"),
        "--unknown-files", str(tmp / "unknown.txt"),
        "--background-noise", corpus["bg_dir"],
        "--output", str(tmp / "embedding"),
        "--num-epochs", "3", "--batch-size", "16", "--steps-per-epoch", "10",
        "--learning-rate", "0.003",
        "--silence-percentage", "10", "--unknown-percentage", "15",
        "--width-coefficient", "0.25", "--depth-coefficient", "0.1",
    ])
    meta = json.loads((tmp / "embedding" / "kws_metadata.json").read_text())
    assert meta["kind"] == "embedding"
    assert meta["width_coefficient"] == 0.25

    # --- few-shot train on alpha via the embedding --------------------------
    samples_dir = tmp / "samples"
    samples_dir.mkdir()
    for i, f in enumerate(corpus["alpha"][:5]):
        import shutil

        shutil.copy2(f, samples_dir / f"alpha_{i}.wav")

    # unknown_words dir with manifest (run.py:272-278 contract)
    unk_dir = tmp / "corpus" / "unknown"
    cli_main([
        "train",
        "--keyword", "alpha",
        "--samples-dir", str(samples_dir),
        "--embedding", str(tmp / "embedding"),
        "--unknown-words", str(unk_dir),
        "--background-noise", corpus["bg_dir"],
        "--output", str(tmp / "alpha_model"),
        "--num-epochs", "2", "--num-batches", "1", "--batch-size", "16",
        "--primary-learning-rate", "0.01",
    ])
    meta2 = json.loads((tmp / "alpha_model" / "kws_metadata.json").read_text())
    assert meta2["kind"] == "transfer" and meta2["target"] == "alpha"

    # --- streaming inference -------------------------------------------------
    from multilingual_kws_tpu.tools.stream_synth import synthesize_stream, write_stream

    spec = synthesize_stream(
        "alpha",
        [keyword_clip("alpha", seed=4000 + i) for i in range(3)],
        [keyword_clip("charlie", seed=5000 + i) for i in range(3)],
        num_targets=3, num_distractors=3, seed=11, noise_rms=0.003,
    )
    write_stream(spec, tmp / "stream.wav", tmp / "gt.txt")

    cli_main([
        "inference",
        "--keywords", "alpha",
        "--modelpaths", str(tmp / "alpha_model"),
        "--wav", str(tmp / "stream.wav"),
        "--groundtruth", str(tmp / "gt.txt"),
        "--detection-threshold", "0.6",
        "--write-detections", str(tmp / "detections.json"),
    ])
    with open(tmp / "detections.json") as fh:
        det = json.load(fh)
    # schema contract (run.py:143-152 / SURVEY 2.5)
    assert det["keywords"] == ["alpha"]
    assert det["min_threshold"] == 0.6
    for d in det["detections"]:
        assert set(d) >= {"keyword", "time_ms", "groundtruth"}
        assert d["groundtruth"] in {"tp", "fp", "fn", "ng"}
