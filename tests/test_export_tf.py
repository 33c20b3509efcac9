"""Flax->Keras export equivalence (the reverse of test_import_tf).

Trains... no: randomly initializes our Flax models, exports via
models/export_tf.py into the reference's exact Keras architecture, and
asserts (a) Keras reproduces Flax inference outputs, (b) the round trip
export -> import returns the ORIGINAL trees exactly, and (c) a saved
`.keras` artifact is loadable and drop-in for the reference workflow that
truncates the base model at layer "dense_2"
(/root/reference/multilingual_kws/embedding/transfer_learning.py:36-43).
"""

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # heavy e2e: run with --slow

tf = pytest.importorskip("tensorflow")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from multilingual_kws_tpu.models.export_tf import (  # noqa: E402
    export_and_save,
    export_keras_kws_model,
)
from multilingual_kws_tpu.models.import_tf import (  # noqa: E402
    import_keras_kws_model,
    load_keras_model,
)
from multilingual_kws_tpu.models.kws_model import (  # noqa: E402
    make_embedding_model,
    make_transfer_model,
)


@pytest.fixture(scope="module", autouse=True)
def _tf_cpu():
    tf.config.set_visible_devices([], "GPU")


def _init(model):
    return model.init(
        jax.random.PRNGKey(3), jnp.zeros((1, 49, 40, 1), jnp.float32),
        train=False,
    )


def _tree_equal(a, b, path=""):
    if isinstance(a, dict):
        assert set(a) == set(b), (path, set(a), set(b))
        for k in a:
            _tree_equal(a[k], b[k], f"{path}/{k}")
    else:
        np.testing.assert_array_equal(
            np.asarray(a, np.float32), np.asarray(b, np.float32), err_msg=path
        )


def test_embedding_export_matches_flax_and_roundtrips():
    model = make_embedding_model(num_labels=11)
    variables = _init(model)
    keras_model = export_keras_kws_model(
        variables["params"], variables["batch_stats"]
    )

    x = np.random.default_rng(5).normal(0, 2, (4, 49, 40, 1)).astype(
        np.float32
    )
    got_keras = keras_model.predict(x, verbose=0)
    want = np.asarray(model.apply(variables, x, train=False))
    np.testing.assert_allclose(got_keras, want, rtol=2e-3, atol=2e-3)

    back = import_keras_kws_model(keras_model)
    assert back["kind"] == "embedding" and back["num_outputs"] == 11
    _tree_equal(back["params"], variables["params"])
    _tree_equal(back["batch_stats"], variables["batch_stats"])


def test_transfer_export_matches_flax_and_roundtrips():
    model = make_transfer_model(num_categories=3)
    variables = _init(model)
    keras_model = export_keras_kws_model(
        variables["params"], variables["batch_stats"]
    )
    x = np.random.default_rng(6).normal(0, 2, (3, 49, 40, 1)).astype(
        np.float32
    )
    got = keras_model.predict(x, verbose=0)
    want = np.asarray(model.apply(variables, x, train=False))
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)
    assert np.allclose(got.sum(-1), 1.0, atol=1e-5)  # softmax head

    back = import_keras_kws_model(keras_model)
    assert back["kind"] == "transfer" and back["num_outputs"] == 3
    _tree_equal(back["params"], variables["params"])


def test_saved_artifact_drops_into_reference_truncation_flow(tmp_path):
    """The reference loads a base model from disk and truncates at
    "dense_2" to get the 192-d embedding trunk — our exported .keras file
    must support exactly that."""
    model = make_embedding_model(num_labels=7)
    variables = _init(model)
    dest = str(tmp_path / "exported.keras")
    export_and_save(variables["params"], variables["batch_stats"], dest)

    loaded = load_keras_model(dest)
    # the reference's truncation flow (transfer_learning.py:36-43)
    embedding = tf.keras.models.Model(
        name="embedding_model",
        inputs=loaded.inputs,
        outputs=loaded.get_layer(name="dense_2").output,
    )
    x = np.random.default_rng(7).normal(0, 2, (2, 49, 40, 1)).astype(
        np.float32
    )
    emb_keras = embedding.predict(x, verbose=0)
    emb_flax = np.asarray(
        model.apply(variables, x, train=False, method=model.embed)
    )
    assert emb_keras.shape == (2, 192)
    np.testing.assert_allclose(emb_keras, emb_flax, rtol=2e-3, atol=2e-3)

    back = import_keras_kws_model(loaded)
    _tree_equal(back["params"], variables["params"])


def test_export_tf_cli_roundtrip(tmp_path):
    """orbax checkpoint -> `export-tf` CLI -> .keras -> import == original."""
    from multilingual_kws_tpu.api.cli import main
    from multilingual_kws_tpu.train.checkpoints import save_model

    model = make_embedding_model(num_labels=5)
    variables = _init(model)
    ckpt = tmp_path / "ckpt"
    save_model(
        ckpt, variables["params"], batch_stats=variables["batch_stats"],
        metadata={"kind": "embedding"},
    )
    dest = str(tmp_path / "exported.keras")
    main(["export-tf", str(ckpt), dest])

    back = import_keras_kws_model(load_keras_model(dest))
    _tree_equal(back["params"], variables["params"])
    _tree_equal(back["batch_stats"], variables["batch_stats"])
