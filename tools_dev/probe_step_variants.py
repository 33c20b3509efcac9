"""Where do the ~7-10 ms of non-fwd/bwd time in the pretrain step go?

benchmarks/bf16_bwd_decomposition.json measured fwd+bwd at 4.2-4.7 ms
(bs 512) but the full shipped step at 11.5-15.4 ms, and the scanned
epoch shows the same per-step cost with zero dispatch overhead — so the
update half (adam + apply_updates + state rebuild over ~300 param
leaves, each a separate tiny fused loop) is the suspect.

Times four step variants on the real chip, state-chained like
bench.measure_pretrain_step:
  shipped        — build_pretrain_step as-is (no donation, tree adam)
  donated        — same step with donate_argnums=0 (alias state buffers)
  flat_adam      — adam wrapped in optax.flatten (ONE fused vector op
                   for m/v/update math; bit-identical elementwise)
  donated_flat   — both

Tunnel drift between processes is larger than the effects being measured
(the same shipped step timed 7.2 / 11.5 / 14.25 ms in three separate
runs), so all variants are compiled up front and timed in ALTERNATING
reps within one process; medians decide.

Writes benchmarks/step_variant_decomposition.json.

Run: python tools_dev/probe_step_variants.py
"""

import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

import numpy as np  # noqa: E402

BS = 512
REPS = 5
TARGET_S = 1.5


def main():
    import jax
    import jax.numpy as jnp
    import optax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from multilingual_kws_tpu.models.kws_model import make_embedding_model
    from multilingual_kws_tpu.parallel import mesh as meshlib
    from multilingual_kws_tpu.train.pretrain import TrainState
    from multilingual_kws_tpu.train.steps import adam, sparse_ce_from_logits

    mesh = meshlib.make_mesh()
    rng = np.random.default_rng(0)
    specs_np = rng.normal(0, 2, (BS, 49, 40, 1)).astype(np.float32)
    labels_np = rng.integers(0, 761, (BS,)).astype(np.int32)

    def build(model, tx, donate):
        repl = NamedSharding(mesh, P())

        def loss_fn(params, batch_stats, specs, labels, dropout_key):
            logits, mutated = model.apply(
                {"params": params, "batch_stats": batch_stats},
                specs,
                train=True,
                mutable=["batch_stats"],
                rngs={"dropout": dropout_key},
            )
            loss = sparse_ce_from_logits(logits, labels).mean()
            acc = (jnp.argmax(logits, -1) == labels).mean()
            return loss, (acc, mutated["batch_stats"])

        def step_fn(state, specs, labels, dropout_key):
            (loss, (acc, new_stats)), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(state.params, state.batch_stats, specs, labels, dropout_key)
            updates, opt_state = tx.update(grads, state.opt_state, state.params)
            params = optax.apply_updates(state.params, updates)
            new_state = TrainState(params, opt_state, new_stats, state.step + 1)
            new_state = jax.lax.with_sharding_constraint(
                new_state, jax.tree_util.tree_map(lambda _: repl, new_state)
            )
            return new_state, {"loss": loss, "accuracy": acc}

        return jax.jit(step_fn, donate_argnums=(0,) if donate else ())

    results = {"bs": BS, "reps": REPS}
    for dname, dtype in (("bf16", jnp.bfloat16), ("f32", jnp.float32)):
        model = make_embedding_model(num_labels=761, dtype=dtype)
        init_jit = jax.jit(model.init, static_argnames=("train",))

        variants = {}
        with mesh:
            sp = meshlib.shard_batch(mesh, specs_np)
            lb = meshlib.shard_batch(mesh, labels_np)
            for vname, tx, donate in (
                ("shipped", adam(1e-3), False),
                ("donated", adam(1e-3), True),
                ("flat_adam", optax.flatten(adam(1e-3)), False),
                ("donated_flat", optax.flatten(adam(1e-3)), True),
            ):
                # fresh variables per variant: donated variants consume
                # their buffers, which must not alias another variant's
                variables = init_jit(
                    jax.random.PRNGKey(0),
                    jnp.zeros((1, 49, 40, 1), jnp.float32),
                    train=False,
                )
                state = TrainState(
                    params=meshlib.replicate(mesh, variables["params"]),
                    opt_state=tx.init(
                        meshlib.replicate(mesh, variables["params"])
                    ),
                    batch_stats=meshlib.replicate(
                        mesh, variables["batch_stats"]
                    ),
                    step=jnp.zeros((), jnp.int32),
                )
                variants[vname] = {
                    "step": build(model, tx, donate),
                    "state": state,
                    "key": jax.device_put(jax.random.PRNGKey(1)),
                    "times": [],
                }

            split_fn = jax.jit(lambda k: tuple(jax.random.split(k)))

            def run(v, steps):
                state, key = v["state"], v["key"]
                t0 = time.perf_counter()
                for _ in range(steps):
                    key, sub = split_fn(key)
                    state, _ = v["step"](state, sp, lb, sub)
                jax.block_until_ready(state.params)
                v["state"], v["key"] = state, key
                return (time.perf_counter() - t0) / steps

            for vname, v in variants.items():
                run(v, 3)  # compile + warm
                v["est"] = run(v, 4)
            for rep in range(REPS):
                for vname, v in variants.items():
                    n = max(12, int(TARGET_S / max(v["est"], 1e-4)))
                    v["times"].append(run(v, n))
                print(
                    f"{dname} rep {rep}: "
                    + " ".join(
                        f"{k}={v['times'][-1] * 1e3:.2f}ms"
                        for k, v in variants.items()
                    ),
                    flush=True,
                )
        for vname, v in variants.items():
            results[f"{dname}_{vname}_ms"] = {
                "median": round(float(np.median(v["times"])) * 1e3, 3),
                "reps_ms": [round(t * 1e3, 3) for t in v["times"]],
            }

    results["note"] = (
        "state-chained timing on one v5e via tunnel; variants compiled up "
        "front and timed in alternating reps within one process (tunnel "
        "drift between processes exceeds the effect size); shipped = "
        "build_pretrain_step semantics; flat_adam = optax.flatten(adam) "
        "(bit-identical elementwise); donated = donate_argnums=0"
    )
    out = REPO / "benchmarks" / "step_variant_decomposition.json"
    out.write_text(json.dumps(results, indent=1))
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
