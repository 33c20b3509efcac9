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
