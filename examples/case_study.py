"""End-to-end case study: radio-stream-style KWS on synthetic data.

The reference's Luganda case study (luganda/luganda_train.py,
luganda_eval.py) runs: few-shot fine-tunes over a sweep of shot counts ->
streaming evaluation on long-form audio -> TPR vs false-accepts/hour ROC
with a 50 FA/h operating cutoff. This example reproduces that workflow
end-to-end on a synthetic corpus so it runs anywhere in a few minutes:

  python examples/case_study.py --workdir /tmp/case_study

Swap make_synthetic_corpus() for your real clips + streams to use it on
actual data.
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", default="/tmp/kws_case_study")
    ap.add_argument("--shots", type=int, nargs="+", default=[3, 5])
    args = ap.parse_args()
    workdir = Path(args.workdir)
    workdir.mkdir(parents=True, exist_ok=True)

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


if __name__ == "__main__":
    main()
