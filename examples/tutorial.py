"""Tutorial: the 5-shot KWS workflow, end to end, on this framework's API.

Reproduces the reference's intro notebook path
(`multilingual_kws_intro_tutorial.ipynb`, the de-facto public-API
contract) step by step:

  1.  data layout: an MSWC-microset-style clips tree + GSC-style
      `_background_noise_` + an `unknown_files.txt` manifest (cells 5-9)
  2.  featurization: `file2spec`-equivalent 49x40 spectrograms (cell 13)
  3.  embedding extraction: load the base model, take the 192-d embedding
      (the reference's `dense_2` layer surgery — here a NAMED `embed()`
      method, cells 17-19)
  4.  2-D projection of embeddings colored by keyword (UMAP when
      installed, PCA otherwise; cells 21-26)
  5.  5-shot `transfer_learn` with the notebook's exact kwargs (cell 28)
  6.  test-set argmax accuracy on held-out target clips (cell 30) and the
      non-target accuracy estimate (cell 36)

Run on a synthetic microset (no downloads, a few minutes on CPU):

    python examples/tutorial.py --workdir /tmp/kws_tutorial

Point it at real data instead with --clips/--background/--unknown-manifest
and a real pretrained checkpoint with --base-model (e.g. the released
`multilingual_context_73_0.8011` converted via `import-tf`).
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tests"))


def make_synthetic_microset(workdir: Path):
    """MSWC-microset-style layout: <lang>/clips/<word>/*.wav + bg noise +
    unknown manifest (stands in for the tutorial's downloads, cell 5)."""
    from helpers import make_corpus

    corpus = make_corpus(workdir / "en" / "clips", clips_per_word=12)
    return corpus


def step_featurize(files, settings=None):
    """Cell 13: file2spec — one clip -> (49, 40) float32 features."""
    from multilingual_kws_tpu.data.dataset import file2spec
    from multilingual_kws_tpu.settings import standard_microspeech_model_settings

    settings = settings or standard_microspeech_model_settings(3)
    spec = file2spec(settings, files[0])
    print(f"file2spec: {files[0]} -> {spec.shape} "
          f"(range {spec.min():.2f}..{spec.max():.2f})")
    return settings


def step_embeddings(base_model_dir, clips_by_word, model=None):
    """Cells 17-19: 192-d embedding vectors from the base model.

    The reference truncates the Keras model at layer "dense_2"; here the
    embedding is a first-class named output: `model.embed(specs)`."""
    import jax

    from multilingual_kws_tpu.models.kws_model import make_embedding_model
    from multilingual_kws_tpu.train import checkpoints as ckpt
    from multilingual_kws_tpu.train.evaluate import featurize_files

    meta = ckpt.load_metadata(base_model_dir)
    base = ckpt.load_embedding_variables(base_model_dir)
    if model is None:
        model = make_embedding_model(num_labels=int(meta["num_labels"]))
    variables = {"params": base["params"], "batch_stats": base["batch_stats"]}
    embed = jax.jit(
        lambda specs: model.apply(variables, specs, train=False, method="embed")
    )

    words, vecs = [], []
    for word, files in clips_by_word.items():
        specs = featurize_files(files)[..., None]
        e = np.asarray(embed(specs))
        vecs.append(e)
        words.extend([word] * len(files))
    embeddings = np.concatenate(vecs)
    print(f"embeddings: {embeddings.shape} "
          f"({embeddings.shape[1]}-d, reference 'dense_2' output)")
    return embeddings, words


def step_projection(embeddings, words, dest):
    """Cells 21-26: 2-D projection colored by keyword (UMAP or PCA)."""
    mean = embeddings.mean(0)
    std = embeddings.std(0) + 1e-8
    scaled = (embeddings - mean) / std
    try:
        import umap

        proj = umap.UMAP().fit_transform(scaled)
        method = "UMAP"
    except Exception:
        # PCA fallback: top-2 principal directions
        u, s, vt = np.linalg.svd(scaled, full_matrices=False)
        proj = scaled @ vt[:2].T
        method = "PCA"
    print(f"projection: {method}, {proj.shape}")
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig, ax = plt.subplots(figsize=(8, 8))
        for w in sorted(set(words)):
            m = np.asarray([x == w for x in words])
            ax.scatter(proj[m, 0], proj[m, 1], label=w, s=12)
        ax.legend()
        ax.set_title(f"keyword embeddings ({method})")
        fig.savefig(dest, dpi=100)
        plt.close(fig)
        print(f"wrote {dest}")
    except Exception as e:
        print(f"(skipping plot: {e})")
    return proj


def step_transfer_learn(
    keyword, five_samples, dev_samples, unknown_files, background_noise,
    base_model_dir, model=None,
):
    """Cell 28: the exact transfer_learn call of the tutorial."""
    from multilingual_kws_tpu.settings import standard_microspeech_model_settings
    from multilingual_kws_tpu.train.finetune import transfer_learn

    model_settings = standard_microspeech_model_settings(3)
    result = transfer_learn(
        target=keyword,
        train_files=five_samples,
        val_files=dev_samples,
        unknown_files=unknown_files,
        num_epochs=4,
        num_batches=1,
        batch_size=64,
        primary_lr=0.001,
        backprop_into_embedding=False,
        embedding_lr=0,
        model_settings=model_settings,
        base_model_path=base_model_dir,
        unknown_percentage=50.0,
        bg_datadir=background_noise,
        model=model,
        seed=0,
        verbose=0,
    )
    print(f"transfer_learn: val_accuracy={result.details['val_accuracy']:.2f}")
    return result


def step_test_accuracy(result, test_samples, non_target_samples):
    """Cells 30 + 36: argmax accuracy on target and non-target clips.

    Class ids: 0 silence/background, 1 unknown, 2 target."""
    from multilingual_kws_tpu.train.evaluate import featurize_files

    predict = result.predict_fn()
    preds = np.argmax(predict(featurize_files(test_samples)[..., None]), axis=1)
    target_acc = float((preds == 2).mean())
    print(f"Test accuracy on testset: {target_acc:0.2f}")

    preds_nt = np.argmax(
        predict(featurize_files(non_target_samples)[..., None]), axis=1
    )
    nontarget_acc = float((preds_nt == 1).mean())
    print(f"Estimated accuracy on non-target samples: {nontarget_acc:0.2f}")
    return target_acc, nontarget_acc


def run_tutorial(workdir: Path, keyword: str = "alpha", shots: int = 5,
                 tiny: bool = False):
    """The full notebook path on a synthetic microset; returns a summary.

    tiny=True swaps in narrow models so the walkthrough (and its test)
    runs in seconds on a 1-core CPU."""
    from multilingual_kws_tpu.parallel import mesh as meshlib
    from multilingual_kws_tpu.train import checkpoints as ckpt
    from multilingual_kws_tpu.train.pretrain import PretrainConfig, pretrain

    workdir.mkdir(parents=True, exist_ok=True)
    corpus = make_synthetic_microset(workdir)
    words = ["bravo", "charlie"]

    emb_model = xfer_model = None
    if tiny:
        from helpers import tiny_embedding_model, tiny_transfer_model

        emb_model = tiny_embedding_model(num_labels=4)
        xfer_model = tiny_transfer_model()

    # stand-in for the released checkpoint download (cell 5): pretrain a
    # small embedding model on the OTHER words
    base_dir = workdir / "embedding_model"
    if not (base_dir / "kws_metadata.json").exists():
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
            model=emb_model,
        )
        ckpt.save_model(
            base_dir, state.params, batch_stats=state.batch_stats,
            metadata={"kind": "embedding", "num_labels": 4},
        )

    settings = step_featurize(corpus[keyword])
    embeddings, labels = step_embeddings(
        base_dir,
        {w: corpus[w][:8] for w in [keyword] + words},
        model=emb_model,
    )
    step_projection(embeddings, labels, workdir / "embeddings.png")

    five_samples = corpus[keyword][:shots]
    dev_samples = corpus[keyword][shots : shots + 4]
    test_samples = corpus[keyword][shots + 4 :]
    result = step_transfer_learn(
        keyword, five_samples, dev_samples, corpus["unknown_files"],
        corpus["bg_dir"], base_dir, model=xfer_model,
    )
    non_target = [f for w in words for f in corpus[w][-4:]]
    target_acc, nontarget_acc = step_test_accuracy(
        result, test_samples, non_target
    )
    return dict(
        val_accuracy=float(result.details["val_accuracy"]),
        test_accuracy=target_acc,
        nontarget_accuracy=nontarget_acc,
        embedding_dim=int(embeddings.shape[1]),
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", default="/tmp/kws_tutorial")
    ap.add_argument("--keyword", default="alpha")
    ap.add_argument("--shots", type=int, default=5)
    ap.add_argument("--tiny", action="store_true",
                    help="narrow models (fast CPU walkthrough)")
    args = ap.parse_args()
    summary = run_tutorial(
        Path(args.workdir), keyword=args.keyword, shots=args.shots,
        tiny=args.tiny,
    )
    print("summary:", summary)


if __name__ == "__main__":
    main()
