"""TF->Flax weight-import equivalence (SURVEY hard part #2).

Builds the exact reference Keras model shapes (train_monolingual_embedding.py
:81-100 / transfer_learning.py:38-53) with random init, imports the weights
via models/import_tf.py, and asserts Flax reproduces Keras outputs. Skipped
when TensorFlow is unavailable.
"""

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # heavy e2e: run with --slow

tf = pytest.importorskip("tensorflow")

import jax  # noqa: E402

from multilingual_kws_tpu.models.efficientnet import EfficientNetB0  # noqa: E402
from multilingual_kws_tpu.models.import_tf import (  # noqa: E402
    import_keras_kws_model,
)
from multilingual_kws_tpu.models.kws_model import (  # noqa: E402
    KWSEmbeddingModel,
    KWSTransferModel,
)


@pytest.fixture(scope="module", autouse=True)
def _tf_cpu():
    tf.config.set_visible_devices([], "GPU")


def build_keras_embedding(num_labels=11, seed=0):
    tf.keras.utils.set_random_seed(seed)
    inputs = tf.keras.Input((49, 40, 1))
    trunk = tf.keras.applications.EfficientNetB0(
        include_top=False, weights=None, input_tensor=inputs
    )
    x = tf.keras.layers.GlobalAveragePooling2D()(trunk.output)
    x = tf.keras.layers.Dense(1024, activation="relu")(x)
    x = tf.keras.layers.Dense(1024, activation="relu")(x)
    x = tf.keras.layers.Dense(
        192, activation="selu", kernel_initializer="lecun_normal"
    )(x)
    out = tf.keras.layers.Dense(num_labels)(x)
    return tf.keras.Model(inputs, out)


def to_flax(keras_model):
    imported = import_keras_kws_model(keras_model)
    trunk = EfficientNetB0(
        input_scale=imported["input_scale"], input_bias=imported["input_bias"]
    )
    if imported["kind"] == "embedding":
        module = KWSEmbeddingModel(num_labels=imported["num_outputs"], trunk=trunk)
    else:
        module = KWSTransferModel(trunk=trunk, num_categories=imported["num_outputs"])
    return module, imported


def test_embedding_model_import_matches_keras():
    keras_model = build_keras_embedding()
    module, imported = to_flax(keras_model)

    x = (
        np.random.default_rng(0)
        .normal(0, 8, (4, 49, 40, 1))
        .astype(np.float32)
        + 10.0
    )
    ref = keras_model(x, training=False).numpy()
    got = np.asarray(
        module.apply(
            {"params": imported["params"], "batch_stats": imported["batch_stats"]},
            x,
            train=False,
        )
    )
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, atol=2e-3, rtol=1e-3)


def test_transfer_model_import_matches_keras():
    keras_model = build_keras_embedding(num_labels=7, seed=1)
    # reference transfer surgery: truncate at the 192-selu layer, append
    # Dense 18 tanh -> Dense 3 softmax (transfer_learning.py:38-53)
    emb_out = keras_model.layers[-2].output
    x = tf.keras.layers.Dense(18, activation="tanh")(emb_out)
    out = tf.keras.layers.Dense(3, activation="softmax")(x)
    xfer = tf.keras.Model(keras_model.input, out)

    module, imported = to_flax(xfer)
    assert imported["kind"] == "transfer"

    x_in = (
        np.random.default_rng(1).normal(0, 8, (3, 49, 40, 1)).astype(np.float32)
        + 10.0
    )
    ref = xfer(x_in, training=False).numpy()
    got = np.asarray(
        module.apply(
            {"params": imported["params"], "batch_stats": imported["batch_stats"]},
            x_in,
            train=False,
        )
    )
    np.testing.assert_allclose(got, ref, atol=2e-3, rtol=1e-3)
    np.testing.assert_allclose(got.sum(-1), 1.0, atol=1e-5)


def test_imported_embedding_vector_matches_keras_dense2():
    """The 192-d embedding (reference layer "dense_2") must match, since
    few-shot transfer quality hinges on it (transfer_learning.py:41)."""
    keras_model = build_keras_embedding(num_labels=5, seed=2)
    emb_keras = tf.keras.Model(
        keras_model.input, keras_model.layers[-2].output
    )
    module, imported = to_flax(keras_model)

    x = (
        np.random.default_rng(2).normal(0, 8, (2, 49, 40, 1)).astype(np.float32)
        + 10.0
    )
    ref = emb_keras(x, training=False).numpy()
    _, got = module.apply(
        {"params": imported["params"], "batch_stats": imported["batch_stats"]},
        x,
        train=False,
        return_embedding=True,
    )
    got = np.asarray(got)
    assert got.shape == (2, 192)
    np.testing.assert_allclose(got, ref, atol=2e-3, rtol=1e-3)


# ---------------------------------------------------------------------------
# disk-artifact round trips (VERDICT round 1 item 3): the importer must work
# on saved files/directories, not just live Keras objects — including the TF
# SavedModel directory format the released reference checkpoint ships in
# (docker/Dockerfile:83-84), which Keras 3 cannot load_model.
# ---------------------------------------------------------------------------


def _assert_matches_keras(keras_model, module, params, batch_stats, seed=3):
    x = (
        np.random.default_rng(seed).normal(0, 8, (3, 49, 40, 1)).astype(np.float32)
        + 10.0
    )
    ref = keras_model(x, training=False).numpy()
    got = np.asarray(
        module.apply(
            {"params": params, "batch_stats": batch_stats}, x, train=False
        )
    )
    np.testing.assert_allclose(got, ref, atol=2e-3, rtol=1e-3)


@pytest.mark.parametrize("fmt", ["keras", "h5", "savedmodel"])
def test_disk_artifact_roundtrip(tmp_path, fmt):
    from multilingual_kws_tpu.models.import_tf import import_tf_checkpoint

    keras_model = build_keras_embedding(num_labels=6, seed=4)
    if fmt == "keras":
        path = tmp_path / "model.keras"
        keras_model.save(str(path))
    elif fmt == "h5":
        path = tmp_path / "model.h5"
        keras_model.save(str(path))
    else:  # TF SavedModel directory (released-checkpoint format)
        path = tmp_path / "savedmodel"
        keras_model.export(str(path))

    module, params, batch_stats, meta = import_tf_checkpoint(str(path))
    assert meta["kind"] == "embedding" and meta["num_outputs"] == 6
    _assert_matches_keras(keras_model, module, params, batch_stats)


def test_import_tf_cli_on_savedmodel_dir(tmp_path):
    """import-tf CLI: SavedModel dir -> orbax checkpoint -> few-shot
    fine-tune on top (the released-checkpoint workflow end to end)."""
    from multilingual_kws_tpu.api.cli import main as cli_main
    from multilingual_kws_tpu.train import checkpoints as ckpt
    from multilingual_kws_tpu.models.efficientnet import EfficientNetB0
    from multilingual_kws_tpu.models.kws_model import KWSEmbeddingModel

    keras_model = build_keras_embedding(num_labels=5, seed=5)
    sm = tmp_path / "released_model"
    keras_model.export(str(sm))
    dest = tmp_path / "converted"
    cli_main(["import-tf", str(sm), str(dest)])

    meta = ckpt.load_metadata(dest)
    assert meta["kind"] == "embedding"
    # full payload (incl. the 5-way classifier) reproduces the Keras logits
    payload, _ = ckpt.load_model(dest)
    module = KWSEmbeddingModel(
        num_labels=5,
        trunk=EfficientNetB0(
            input_scale=meta["input_scale"], input_bias=meta["input_bias"]
        ),
    )
    _assert_matches_keras(
        keras_model, module, payload["params"], payload["batch_stats"], seed=6
    )
    # and the fine-tune entry point consumes it: embedding view has no
    # classifier but keeps trunk BN stats
    base = ckpt.load_embedding_variables(dest)
    assert set(base["params"].keys()) == {"trunk", "embedding_head"}
    assert "trunk" in base["batch_stats"]


def test_legacy_savedmodel_probe(tmp_path):
    """The released checkpoint multilingual_context_73_0.8011 ships as a
    TF-2.x-era Keras SavedModel (docker/Dockerfile:83-86). Probe whether
    the INSTALLED TF stack can still produce that legacy format (VERDICT
    r2 item 8); if some future environment restores the capability
    (tf_keras present, or keras supporting legacy dir saves), round-trip
    it through our SavedModel importer so the gap closes automatically.
    """
    import importlib.util

    legacy_writers = []
    if importlib.util.find_spec("tf_keras") is not None:
        legacy_writers.append("tf_keras")
    # Keras 3 refuses model.save(<dir>) (only .keras/.h5); confirm rather
    # than assume, since this is the documented environmental limitation
    tf.keras.utils.set_random_seed(0)
    m = tf.keras.Sequential([tf.keras.layers.Dense(2, input_shape=(3,))])
    try:
        m.save(str(tmp_path / "legacy_dir"))
        legacy_writers.append("keras_dir_save")
    except ValueError:
        pass

    if not legacy_writers:
        # documented probe result: this environment cannot write the
        # legacy format (keras 3 without tf_keras); the closest possible
        # proxy (name-based SavedModel import via export(), tested above
        # in test_disk_artifact_roundtrip) stands in
        pytest.skip(
            "installed TF/Keras cannot write TF-2.x legacy Keras "
            "SavedModels (keras 3, no tf_keras) — documented in PARITY.md"
        )

    # a legacy writer exists: produce the artifact and import it for real
    from tests.test_import_tf import build_keras_embedding  # self import ok

    model = build_keras_embedding(num_labels=5)
    dest = tmp_path / "legacy_model"
    model.save(str(dest))
    from multilingual_kws_tpu.models.import_tf import (
        import_savedmodel_kws_model,
    )

    imported = import_savedmodel_kws_model(str(dest))
    assert imported["kind"] == "embedding"
