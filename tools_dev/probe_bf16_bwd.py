"""Why is the bf16 pretrain STEP slower than f32 when the bf16 forward is
1.45x faster? (benchmarks/extra_metrics.json: 14.25 vs 13.13 ms/step at
bs 512, while fwd-only bf16 is 455k vs f32 315k clips/s.)

Decomposes the step on the real chip with chained timing:
  fwd_train   — model.apply(train=True) incl. BN stat updates
  fwd_bwd     — value_and_grad of the training loss (no optimizer)
  full_step   — the shipped build_pretrain_step (fwd+bwd+adam+BN)
for dtype in {f32, bf16}. Writes benchmarks/bf16_bwd_decomposition.json.

Run: python tools_dev/probe_bf16_bwd.py
"""

import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

import numpy as np  # noqa: E402

BS = 512


def main():
    import jax
    import jax.numpy as jnp
    import optax

    from multilingual_kws_tpu.models.kws_model import make_embedding_model
    from multilingual_kws_tpu.parallel import mesh as meshlib
    from multilingual_kws_tpu.train.pretrain import build_pretrain_step
    from multilingual_kws_tpu.train.steps import adam

    from bench import _chained_time  # repo-root bench helpers

    mesh = meshlib.make_mesh()
    rng = np.random.default_rng(0)
    specs_np = rng.normal(0, 2, (BS, 49, 40, 1)).astype(np.float32)
    labels_np = rng.integers(0, 761, (BS,)).astype(np.int32)

    results = {}
    for name, dtype in (("f32", jnp.float32), ("bf16", jnp.bfloat16)):
        model = make_embedding_model(num_labels=761, dtype=dtype)
        variables = model.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 49, 40, 1), jnp.float32),
            train=False,
        )
        with mesh:
            vrep = meshlib.replicate(mesh, variables)
            sp = meshlib.shard_batch(mesh, specs_np)
            lb = meshlib.shard_batch(mesh, labels_np)

            # -- fwd in train mode (BN batch stats path, mutable) --------
            drop_key = jax.random.PRNGKey(2)

            @jax.jit
            def fwd_train(s, eps, model=model, v=vrep):
                out, _ = model.apply(
                    v, s + eps, train=True, mutable=["batch_stats"],
                    rngs={"dropout": drop_key},
                )
                return jnp.tanh(jnp.mean(out.astype(jnp.float32))) * 1e-30

            t = _chained_time(fwd_train, sp)
            results[f"{name}_fwd_train_ms"] = round(t * 1e3, 3)

            # -- fwd+bwd: value_and_grad of the CE loss -------------------
            params = vrep["params"]
            rest = {k: v for k, v in vrep.items() if k != "params"}

            def loss_fn(p, s, model=model, rest=rest):
                logits, _ = model.apply(
                    {"params": p, **rest}, s, train=True,
                    mutable=["batch_stats"],
                    rngs={"dropout": jax.random.PRNGKey(2)},
                )
                ls = optax.softmax_cross_entropy_with_integer_labels(
                    logits.astype(jnp.float32), lb
                )
                return ls.mean()

            @jax.jit
            def fwd_bwd(s, eps, params=params):
                loss, grads = jax.value_and_grad(loss_fn)(params, s + eps)
                leaf = jax.tree_util.tree_leaves(grads)[0]
                return (
                    jnp.tanh(loss + jnp.mean(leaf.astype(jnp.float32)))
                    * 1e-30
                )

            t = _chained_time(fwd_bwd, sp)
            results[f"{name}_fwd_bwd_ms"] = round(t * 1e3, 3)

            # -- full shipped step ---------------------------------------
            tx = adam(1e-3)
            init_fn, step_fn, _ = build_pretrain_step(model, tx, mesh)
            state = init_fn(vrep)
            key = jax.device_put(jax.random.PRNGKey(1))
            split_fn = jax.jit(lambda k: tuple(jax.random.split(k)))

            def run(steps, state=state, key=key):
                st, k = state, key
                for _ in range(steps):
                    k, sub = split_fn(k)
                    st, m = step_fn(st, sp, lb, sub)
                jax.block_until_ready(m["loss"])
                return st, k

            state, key = run(3)  # warm
            t0 = time.time()
            n = 150
            state, key = run(n)
            results[f"{name}_full_step_ms"] = round(
                (time.time() - t0) / n * 1e3, 3
            )
        print(name, {k: v for k, v in results.items() if k.startswith(name)},
              flush=True)

    results["bs"] = BS
    results["note"] = (
        "chained timing on one v5e via tunnel; fwd_bwd excludes adam; "
        "full_step is the shipped build_pretrain_step"
    )
    dest = REPO / "benchmarks" / "bf16_bwd_decomposition.json"
    dest.write_text(json.dumps(results, indent=1))
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
