"""flat_adam (optax.flatten(adam)) must be bit-identical to tree adam.

The pretrain driver switched to flat_adam because the tree update's
~300 per-leaf tiny fused loops cost more than fwd+bwd on the TPU
(benchmarks/step_variant_decomposition.json: full step 12.7 -> 7.2 ms
bf16 at bs 512). The switch is only safe because flattening merely
concatenates the all-f32 leaves before the SAME IEEE elementwise update
math — this pins that equivalence on the update rule in isolation.

Deliberately NOT an end-to-end two-training-runs comparison: XLA:CPU
conv/matmul gradients are threaded-reduction nondeterministic at the
1-ulp level run-to-run (oneDNN), and adam amplifies 1-ulp gradient
noise to ~lr on near-zero-gradient elements within a few steps (same
effect documented on build_fused_resident_epoch). The optimizer update
itself has no cross-element reductions, so bitwise equality is the
correct, stable assertion exactly here.
"""

import numpy as np

import jax
import jax.numpy as jnp
import optax

from multilingual_kws_tpu.train.steps import adam, flat_adam

STEPS = 5
LR = 1e-3


def _param_tree():
    rng = np.random.default_rng(0)
    return {
        "conv": {"kernel": jnp.asarray(rng.normal(0, 0.1, (3, 3, 8, 16)),
                                       jnp.float32)},
        "bn": {"scale": jnp.ones((16,), jnp.float32),
               "bias": jnp.zeros((16,), jnp.float32)},
        "dense": {"kernel": jnp.asarray(rng.normal(0, 0.5, (16, 5)),
                                        jnp.float32),
                  "bias": jnp.asarray(rng.normal(0, 1e-6, (5,)),
                                      jnp.float32)},
    }


def _grad_tree(i):
    rng = np.random.default_rng(100 + i)
    # include near-zero gradients — the regime where adam's m/sqrt(v)
    # amplifies any elementwise mismatch to +-lr
    return {
        "conv": {"kernel": jnp.asarray(rng.normal(0, 1e-4, (3, 3, 8, 16)),
                                       jnp.float32)},
        "bn": {"scale": jnp.asarray(rng.normal(0, 1e-8, (16,)), jnp.float32),
               "bias": jnp.asarray(rng.normal(0, 10.0, (16,)), jnp.float32)},
        "dense": {"kernel": jnp.asarray(rng.normal(0, 1.0, (16, 5)),
                                        jnp.float32),
                  "bias": jnp.zeros((5,), jnp.float32)},
    }


def _run(tx):
    params = _param_tree()
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state, grads):
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state

    for i in range(STEPS):
        params, opt_state = step(params, opt_state, _grad_tree(i))
    return jax.device_get(params)


def test_flat_adam_update_bitwise_equals_tree_adam():
    tree_params = _run(adam(LR))
    flat_params = _run(flat_adam(LR))
    leaves_t, treedef_t = jax.tree_util.tree_flatten(tree_params)
    leaves_f, treedef_f = jax.tree_util.tree_flatten(flat_params)
    assert treedef_t == treedef_f
    for lt, lf in zip(leaves_t, leaves_f):
        np.testing.assert_array_equal(np.asarray(lt), np.asarray(lf))
    # and the updates moved the params (the test isn't vacuous)
    init_leaves = jax.tree_util.tree_leaves(_param_tree())
    assert any(
        not np.array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(leaves_t, init_leaves)
    )
