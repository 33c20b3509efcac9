"""End-to-end case study: radio-stream-style KWS.

The reference's Luganda case study (luganda/luganda_train.py,
luganda_eval.py, luganda_multitarget_data.py) runs: transcript-driven data
prep -> few-shot fine-tunes over a sweep of shot counts -> streaming
evaluation on long-form audio -> TPR vs false-accepts/hour ROC with a
50 FA/h operating cutoff.

Two modes:

Synthetic (runs anywhere in a few minutes, no data needed):

  python examples/case_study.py --workdir /tmp/case_study

Real data (a transcribed corpus + forced alignments, the reference's
Makerere layout — see tools/transcripts.py):

  python examples/case_study.py --workdir /tmp/case_study_real \\
      --transcripts-csv /data/uliza-clips/transcripts.csv \\
      --clips-root /data/uliza-clips \\
      --alignments /data/alignment/cs288/alignments \\
      --aligned-clips /data/alignment/cs288/cs288_clips \\
      --keyword akawuka --exclude-variants masiki masks mask \\
      --base-model /path/to/embedding_checkpoint
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tests"))


def make_synthetic_corpus(workdir: Path):
    from helpers import keyword_clip, make_corpus  # test fixture generators
    from multilingual_kws_tpu.tools.stream_synth import synthesize_stream, write_stream

    corpus = make_corpus(workdir / "corpus", clips_per_word=12)
    spec = synthesize_stream(
        "alpha",
        [keyword_clip("alpha", seed=9000 + i) for i in range(5)],
        [keyword_clip("charlie", seed=9500 + i) for i in range(5)],
        num_targets=5, num_distractors=5, seed=21, noise_rms=0.003,
    )
    wav = workdir / "stream.wav"
    labels = workdir / "labels.txt"
    write_stream(spec, wav, labels)
    duration_s = spec.waveform.shape[0] / spec.sample_rate
    times = [t for _, t in spec.labels]
    return corpus, str(wav), str(labels), times, duration_s


def prepare_real_data(args, workdir: Path):
    """Transcript-driven prep (reference luganda_multitarget_data.py +
    luganda_nontarget.py): returns (train_shot_files, stream wav, labels
    file, gt times, duration_s, groundtruth dict)."""
    import json

    from multilingual_kws_tpu.tools import transcripts as tr
    from multilingual_kws_tpu.tools.word_extraction import extract_shot

    keywords = set(args.keyword)
    entries = tr.load_transcripts_csv(args.transcripts_csv, args.clips_root)
    _, non_targets = tr.split_by_keywords(
        entries, keywords, exclude=set(args.exclude_variants)
    )
    targets = tr.timings_from_alignments(
        args.alignments, args.aligned_clips, keywords
    )
    print(f"targets with alignments: {len(targets)}, "
          f"non-target clips: {len(non_targets)}")
    rng = np.random.default_rng(0)
    order = rng.permutation(len(targets))
    n_train = max(args.max_shots, len(targets) // 5)
    train_side = [targets[i] for i in order[:n_train]]
    eval_side = [targets[i] for i in order[n_train:]]

    shots_dir = workdir / "shots"
    shots_dir.mkdir(parents=True, exist_ok=True)
    shot_files = []
    for t in train_side:
        o = t.occurences_s[0]
        try:
            shot_files.append(
                str(extract_shot(t.wav, o["start_s"], o["end_s"], shots_dir,
                                 include_context=True))
            )
        except ValueError:
            continue

    eval_dir = workdir / "eval"
    gt = tr.assemble_multitarget_stream(eval_side, non_targets, eval_dir, seed=1)
    nt_dir = workdir / "nontarget_eval"
    tr.assemble_nontarget_stream(
        non_targets, nt_dir, num_wavs=min(len(non_targets) * 2, 160), seed=2
    )
    duration_s = sum(e["duration_s"] for e in gt["stream_data"])
    times = [g["time_ms"] for g in gt["groundtruth_target_times_ms"]]
    print(f"eval stream: {duration_s/60:.1f} min, "
          f"{len(times)} target occurrences; shots: {len(shot_files)}")
    (workdir / "groundtruth.json").write_text(json.dumps(gt))
    return (
        shot_files,
        str(eval_dir / "stream.wav"),
        str(eval_dir / "groundtruth_labels.txt"),
        times,
        duration_s,
        gt,
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", default="/tmp/kws_case_study")
    ap.add_argument("--shots", type=int, nargs="+", default=[3, 5])
    # real-data mode (tools/transcripts.py; reference Makerere layout)
    ap.add_argument("--transcripts-csv", default=None)
    ap.add_argument("--clips-root", default=None)
    ap.add_argument("--alignments", default=None)
    ap.add_argument("--aligned-clips", default=None)
    ap.add_argument("--keyword", nargs="+", default=["akawuka"])
    ap.add_argument("--exclude-variants", nargs="*", default=[])
    ap.add_argument("--base-model", default=None,
                    help="embedding checkpoint dir (required for real data)")
    ap.add_argument("--unknown-files", default=None,
                    help="unknown_files.txt manifest for real-data mode")
    args = ap.parse_args()
    args.max_shots = max(args.shots)
    workdir = Path(args.workdir)
    workdir.mkdir(parents=True, exist_ok=True)

    if args.transcripts_csv:
        return main_real(args, workdir)

    from helpers import tiny_embedding_model, tiny_transfer_model
    from multilingual_kws_tpu.analysis.batch_jobs import TLData, run_job
    from multilingual_kws_tpu.analysis.streaming_roc import (
        operating_point,
        streaming_roc,
    )
    from multilingual_kws_tpu.parallel import mesh as meshlib
    from multilingual_kws_tpu.stream.engine import StreamFlags, StreamTarget
    from multilingual_kws_tpu.train import checkpoints as ckpt
    from multilingual_kws_tpu.train.pretrain import PretrainConfig, pretrain

    print("== synthesizing corpus + stream ==")
    corpus, wav, labels, gt_times, duration_s = make_synthetic_corpus(workdir)

    print("== pretraining embedding (bravo/charlie) ==")
    words = ["bravo", "charlie"]
    state, _, hist, _ = pretrain(
        [f for w in words for f in corpus[w][:10]],
        [f for w in words for f in corpus[w][10:]],
        commands=words,
        background_data_dir=corpus["bg_dir"],
        unknown_files=corpus["unknown_files"],
        config=PretrainConfig(
            num_labels=4, batch_size=16, num_epochs=5, learning_rate=3e-3,
            silence_percentage=10, unknown_percentage=15, shuffle_seed=0,
            steps_per_epoch=12,
        ),
        mesh=meshlib.make_mesh(num_devices=1),
        verbose=0,
        model=tiny_embedding_model(num_labels=4),
    )
    print(f"pretrain val accuracy: {hist['val_accuracy'][-1]:.2f}")
    base = workdir / "embedding"
    ckpt.save_model(
        base, state.params, batch_stats=state.batch_stats,
        metadata={"kind": "embedding"},
    )

    print("== sweep: shots -> train -> stream ==")
    import pickle

    rocs = []
    for shots in args.shots:
        dest_pkl = workdir / f"result_{shots}shot.pkl"
        st = StreamTarget(
            target_lang="syn", target_word="alpha", model_path=None,
            stream_flags=[
                StreamFlags(
                    wav=wav, ground_truth=labels, target_keyword="alpha",
                    detection_thresholds=list(np.arange(0.3, 1.0, 0.05)),
                )
            ],
            destination_result_pkl=str(dest_pkl),
            destination_result_inferences=str(
                workdir / f"inferences_{shots}shot.npy"
            ),
        )
        job = TLData(
            train_files=corpus["alpha"][:shots],
            val_files=corpus["alpha"][shots:],
            n_batches=1, n_epochs=4, model_dest_dir=str(workdir / "models"),
            primary_lr=1e-2, backprop_into_embedding=False, embedding_lr=0,
            target="alpha", stream_targets=[st], batch_size=16,
        )
        status = run_job(
            job, corpus["unknown_files"], base, corpus["bg_dir"],
            model=tiny_transfer_model(),
        )
        print(f"{shots}-shot job: {status}")
        with open(dest_pkl, "rb") as fh:
            results = pickle.load(fh)
        roc = streaming_roc(results, "alpha", gt_times, duration_s)
        roc["keyword"] = f"alpha ({shots}-shot)"
        rocs.append(roc)
        op = operating_point(roc)
        print(f"  operating point (<=50 FA/h): {op}")

    try:
        from multilingual_kws_tpu.analysis.viz import plot_streaming_roc

        dest = workdir / "streaming_roc.png"
        plot_streaming_roc(rocs, dest=dest)
        print(f"wrote {dest}")
    except Exception as e:  # matplotlib optional
        print(f"(skipping plot: {e})")


def main_real(args, workdir: Path):
    """Real-data path: transcript prep -> few-shot sweep -> streaming ROC
    -> transcript-annotated detections (reference luganda_train.py sweep_run
    + luganda_eval.py + luganda.py:761)."""
    import pickle

    from multilingual_kws_tpu.analysis.batch_jobs import TLData, run_job
    from multilingual_kws_tpu.analysis.streaming_roc import (
        operating_point,
        streaming_roc,
    )
    from multilingual_kws_tpu.stream.engine import StreamFlags, StreamTarget
    from multilingual_kws_tpu.tools import transcripts as tr

    assert args.base_model, "--base-model (embedding checkpoint) is required"
    assert args.unknown_files, "--unknown-files manifest is required"
    keyword = args.keyword[0]

    shot_files, wav, labels, gt_times, duration_s, gt = prepare_real_data(
        args, workdir
    )
    unknown_root = Path(args.unknown_files).parent
    unknown = [
        str(unknown_root / line)
        for line in Path(args.unknown_files).read_text().splitlines()
        if line.strip()
    ]

    rocs = []
    for shots in args.shots:
        assert shots < len(shot_files), f"only {len(shot_files)} shots extracted"
        dest_pkl = workdir / f"result_{shots}shot.pkl"
        st = StreamTarget(
            target_lang="lu", target_word=keyword, model_path=None,
            stream_flags=[
                StreamFlags(
                    wav=wav, ground_truth=labels, target_keyword=keyword,
                    detection_thresholds=list(np.arange(0.3, 1.0, 0.05)),
                )
            ],
            destination_result_pkl=str(dest_pkl),
            destination_result_inferences=str(
                workdir / f"inferences_{shots}shot.npy"
            ),
        )
        job = TLData(
            train_files=shot_files[:shots],
            val_files=shot_files[shots:],
            n_batches=1, n_epochs=4,
            model_dest_dir=str(workdir / "models"),
            primary_lr=1e-3, backprop_into_embedding=False, embedding_lr=0,
            target=keyword, stream_targets=[st], batch_size=64,
        )
        status = run_job(job, unknown, Path(args.base_model), None)
        print(f"{shots}-shot job: {status}")
        with open(dest_pkl, "rb") as fh:
            results = pickle.load(fh)
        roc = streaming_roc(results, keyword, gt_times, duration_s)
        roc["keyword"] = f"{keyword} ({shots}-shot)"
        rocs.append(roc)
        print(f"  operating point (<=50 FA/h): {operating_point(roc)}")

        # transcript-annotated detections at the operating point
        # (reference luganda.py:761 transcript_by_offset)
        op = operating_point(roc)
        if op is not None:
            _, per_thresh = results[0]
            found = per_thresh[min(per_thresh, key=lambda t: abs(t - op["threshold"]))][0]
            print(f"  {len(found)} detections at threshold {op['threshold']:.2f}:")
            for _, t_ms in found[:10]:
                info = tr.transcript_by_offset(t_ms, gt)
                if info is None:
                    continue
                flag = " [CERTAIN FP]" if info["certain_false_positive"] else ""
                print(f"    {t_ms:>9.0f} ms{flag}  {info['decorated'][:80]}")

    try:
        from multilingual_kws_tpu.analysis.viz import plot_streaming_roc

        dest = workdir / "streaming_roc.png"
        plot_streaming_roc(rocs, dest=dest)
        print(f"wrote {dest}")
    except Exception as e:
        print(f"(skipping plot: {e})")


if __name__ == "__main__":
    main()
