"""Mesh / data-parallel training tests on the virtual 8-device CPU mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from multilingual_kws_tpu.parallel import mesh as meshlib


def test_eight_virtual_devices():
    assert jax.device_count() == 8


def test_make_mesh_axes():
    mesh = meshlib.make_mesh()
    assert mesh.axis_names == ("data", "model")
    assert mesh.devices.shape == (8, 1)
    mesh2 = meshlib.make_mesh(num_devices=4, model_parallelism=2)
    assert mesh2.devices.shape == (2, 2)


def test_shard_and_replicate():
    mesh = meshlib.make_mesh()
    batch = np.arange(16 * 4, dtype=np.float32).reshape(16, 4)
    sharded = meshlib.shard_batch(mesh, batch)
    assert sharded.sharding.spec == jax.sharding.PartitionSpec("data")
    np.testing.assert_array_equal(np.asarray(sharded), batch)

    tree = {"w": np.ones((3, 3), np.float32)}
    repl = meshlib.replicate(mesh, tree)
    assert repl["w"].sharding.spec == jax.sharding.PartitionSpec()


def test_pad_to_multiple():
    batch = np.arange(10, dtype=np.float32)[:, None]
    padded, real = meshlib.pad_to_multiple(batch, 8)
    assert padded.shape == (16, 1) and real == 10


@pytest.mark.slow
def test_data_parallel_step_matches_single_device():
    """Gradient math under the mesh == single-device math."""
    import optax

    from multilingual_kws_tpu.train.pretrain import build_pretrain_step

    from helpers import tiny_embedding_model

    model = tiny_embedding_model(num_labels=4)
    rng = jax.random.PRNGKey(0)
    dummy = jnp.zeros((1, 49, 40, 1), jnp.float32)
    variables = model.init(rng, dummy, train=False)

    specs = np.random.default_rng(0).normal(0, 1, (8, 49, 40, 1)).astype(np.float32)
    labels = np.arange(8, dtype=np.int32) % 4

    # single device
    mesh1 = meshlib.make_mesh(num_devices=1)
    init1, step1, eval1 = build_pretrain_step(model, optax.sgd(0.1), mesh1)
    with mesh1:
        s1 = init1(meshlib.replicate(mesh1, variables))
        s1, m1 = step1(
            s1,
            meshlib.shard_batch(mesh1, specs),
            meshlib.shard_batch(mesh1, labels),
            jax.random.PRNGKey(1),
        )

    # 8-way data parallel
    mesh8 = meshlib.make_mesh()
    init8, step8, eval8 = build_pretrain_step(model, optax.sgd(0.1), mesh8)
    with mesh8:
        s8 = init8(meshlib.replicate(mesh8, variables))
        s8, m8 = step8(
            s8,
            meshlib.shard_batch(mesh8, specs),
            meshlib.shard_batch(mesh8, labels),
            jax.random.PRNGKey(1),
        )

    assert float(m1["loss"]) == pytest.approx(float(m8["loss"]), rel=1e-5)
    l1 = jax.tree_util.tree_leaves(s1.params)
    l8 = jax.tree_util.tree_leaves(s8.params)
    for a, b in zip(l1, l8):
        # float32 reduction order differs between 1- and 8-device grads
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4, rtol=1e-3)


@pytest.mark.slow
def test_graft_dryrun_multichip():
    """The driver's multi-chip dry run must work on the virtual mesh."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


def test_sharded_predict_matches_single_device():
    """Window-axis sharding for streaming eval: same outputs, any batch."""
    import jax.numpy as jnp

    from helpers import tiny_transfer_model

    model = tiny_transfer_model()
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 49, 40, 1), jnp.float32), train=False
    )
    predict = jax.jit(lambda s: model.apply(variables, s, train=False))

    mesh = meshlib.make_mesh()
    sharded = meshlib.make_sharded_predict(predict, mesh)

    rng = np.random.default_rng(0)
    for n in (5, 8, 17):  # including non-multiples of 8 devices
        specs = rng.normal(0, 1, (n, 49, 40, 1)).astype(np.float32)
        a = np.asarray(predict(specs))
        b = sharded(specs)
        assert b.shape == a.shape
        np.testing.assert_allclose(a, b, atol=2e-5, rtol=1e-4)


def test_initialize_distributed_single_process_noop(monkeypatch):
    """Single-process contract: initialize_distributed must be a no-op (no
    jax.distributed.initialize call) unless a coordinator is configured or
    multiple processes exist (mesh.py)."""
    import multilingual_kws_tpu.parallel.mesh as meshlib

    calls = []
    monkeypatch.setattr(
        meshlib.jax.distributed, "initialize",
        lambda **kw: calls.append(kw),
    )
    monkeypatch.delenv("JAX_COORDINATOR_ADDRESS", raising=False)
    meshlib.initialize_distributed()
    assert calls == []

    # with a coordinator address configured it must delegate, passing kwargs
    monkeypatch.setenv("JAX_COORDINATOR_ADDRESS", "localhost:1234")
    meshlib.initialize_distributed(num_processes=2, process_id=0)
    assert calls == [dict(num_processes=2, process_id=0)]
