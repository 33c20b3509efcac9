"""Decompose the fused-resident pretrain step: input pipeline vs train step.

After the flat-adam optimizer landed (step_variant_decomposition.json:
bf16 step 5.7-7 ms/step at bs 512 = ~80-90k clips/s), the e2e resident
numbers (~25-29k clips/s) sit at only ~30% of the step bound — but those
e2e numbers come from 12-step epochs (bench.measure_pretrain_e2e), where
one-time dispatch/upload overhead through the tunnel is ~40% of a 0.25 s
pass. Two confounds, one probe: time SCANNED programs at two lengths
(short vs long) so the fixed per-dispatch cost and the true device
per-step cost separate, for each pipeline slice:

  step_only   — scan of fwd+bwd+flat-adam on constant pre-featurized specs
  input_only  — scan of gather+augment+featurize (no model), result folded
                into a carried scalar so nothing is DCE'd
  augment_only— input_only minus the frontend (gather+augment, consume wav)
  full        — build_fused_resident_epoch (the shipped default path)

For each: ms/step_long (device steady state), and fixed_ms estimated from
(short_total - short_steps * per_step_long).

Writes benchmarks/fused_pipeline_decomposition.json.

Run (real chip, idle host): python tools_dev/probe_fused_pipeline_cost.py
"""

import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

import numpy as np  # noqa: E402

BS = 512
N_SHORT = 12
N_LONG = 96
REPS = 3


def main():
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from multilingual_kws_tpu.data.dataset import AudioDataset
    from multilingual_kws_tpu.models.kws_model import make_embedding_model
    from multilingual_kws_tpu.parallel import mesh as meshlib
    from multilingual_kws_tpu.settings import standard_microspeech_model_settings
    from multilingual_kws_tpu.train.pretrain import (
        TrainState,
        build_fused_resident_epoch,
    )
    from multilingual_kws_tpu.train.steps import flat_adam, sparse_ce_from_logits
    from multilingual_kws_tpu.utils.wav import write_wav

    tmp = Path("/tmp/fused_cost_corpus")
    words = [f"w{i:02d}" for i in range(16)]
    rng = np.random.default_rng(0)
    files, labels = [], []
    for wi, w in enumerate(words):
        d = tmp / "clips" / w
        d.mkdir(parents=True, exist_ok=True)
        for i in range(32):
            p = d / f"{i}.wav"
            if not p.exists():
                t = np.arange(16000) / 16000.0
                sig = 0.4 * np.sin(2 * np.pi * (300.0 + 45 * wi) * t)
                sig += rng.normal(0, 0.02, 16000)
                write_wav(p, np.clip(sig, -1, 1).astype(np.float32))
            files.append(str(p))
            labels.append(w)
    bg_dir = tmp / "_background_noise_"
    bg_dir.mkdir(exist_ok=True)
    for i in range(2):
        p = bg_dir / f"noise_{i}.wav"
        if not p.exists():
            write_wav(
                p,
                np.clip(rng.normal(0, 0.05, 3 * 16000), -1, 1).astype(
                    np.float32
                ),
            )

    settings = standard_microspeech_model_settings(len(words) + 1)
    mesh = meshlib.make_mesh()
    dataset = AudioDataset(
        model_settings=settings, commands=words,
        background_data_dir=bg_dir, unknown_files=[],
        silence_percentage=1.0, seed=0,
        input_sharding=meshlib.batch_sharding(mesh),
    )
    bank = dataset.build_resident_bank(files)
    model = make_embedding_model(num_labels=761, dtype=jnp.bfloat16)
    tx = flat_adam(1e-3)
    variables = jax.jit(model.init, static_argnames=("train",))(
        jax.random.PRNGKey(0), jnp.zeros((1, 49, 40, 1), jnp.float32),
        train=False,
    )

    repl = NamedSharding(mesh, P())
    epoch_in = NamedSharding(mesh, P(None, meshlib.DATA_AXIS))

    # host snapshot: the donated variants DELETE their state buffers, and
    # meshlib.replicate can return the same committed arrays for an
    # already-replicated tree — two states built from `variables` would
    # alias, and the first donation would invalidate the second state
    variables_np = jax.tree_util.tree_map(np.asarray, variables)

    def fresh_state():
        fresh = jax.tree_util.tree_map(
            lambda x: jax.device_put(x, repl), variables_np
        )
        params = fresh["params"]
        return TrainState(
            params=params,
            opt_state=tx.init(params),
            batch_stats=fresh["batch_stats"],
            step=jnp.zeros((), jnp.int32),
        )

    def host_indices(steps):
        idx_a, lbl_a, sil_a = [], [], []
        for idx, lbl, sil in dataset.host_train_indices(
            files, BS, steps, bank, labels=labels, single_target=False
        ):
            idx_a.append(idx)
            lbl_a.append(lbl)
            sil_a.append(sil)
        return jax.device_put(
            (
                np.asarray(idx_a, np.int32),
                np.asarray(lbl_a, np.int32),
                np.asarray(sil_a, bool),
            ),
            epoch_in,
        )

    # ---- program builders ------------------------------------------------
    fused_epoch = build_fused_resident_epoch(model, tx, mesh, dataset)

    def loss_fn(params, batch_stats, specs, lbl, sub):
        logits, mutated = model.apply(
            {"params": params, "batch_stats": batch_stats},
            specs, train=True, mutable=["batch_stats"],
            rngs={"dropout": sub},
        )
        loss = sparse_ce_from_logits(logits, lbl).mean()
        return loss, mutated["batch_stats"]

    import functools

    @functools.partial(jax.jit, donate_argnums=0, static_argnums=3)
    def step_only_epoch(state, specs, lbl, n, rkey):
        """Scan of the bare train step on CONSTANT specs (still a real
        fwd+bwd+adam per iteration; state chains through the scan)."""

        def body(carry, _):
            st, rk = carry
            rks = jax.random.split(rk)
            rk, sub = rks[0], rks[1]
            (loss, new_stats), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(st.params, st.batch_stats, specs, lbl, sub)
            updates, opt_state = tx.update(grads, st.opt_state, st.params)
            params = jax.tree_util.tree_map(
                lambda p, u: p + u, st.params, updates
            )
            nst = TrainState(params, opt_state, new_stats, st.step + 1)
            return (nst, rk), loss

        (state, _), losses = jax.lax.scan(
            body, (state, rkey), None, length=n
        )
        state = jax.lax.with_sharding_constraint(
            state, jax.tree_util.tree_map(lambda _: repl, state)
        )
        return state, losses

    @jax.jit
    def input_only_epoch(bank_arr, idx_all, sil_all, data_key):
        """Scan of gather+augment+featurize; fold specs into a scalar."""

        def body(carry, xs):
            acc, dkey = carry
            idx, sil = xs
            dks = jax.random.split(dkey)
            dkey, aug_key = dks[0], dks[1]
            specs = dataset._train_device_resident(aug_key, bank_arr, idx, sil)
            return (acc + jnp.tanh(jnp.mean(specs)) * 1e-30, dkey), None

        (acc, _), _ = jax.lax.scan(
            body, (jnp.zeros(()), data_key), (idx_all, sil_all)
        )
        return acc

    from multilingual_kws_tpu.data.dataset import _resident_gather
    from multilingual_kws_tpu.ops.augment import augment_waveforms

    @jax.jit
    def augment_only_epoch(bank_arr, idx_all, sil_all, data_key):
        """Scan of gather+augment (no frontend)."""

        def body(carry, xs):
            acc, dkey = carry
            idx, sil = xs
            dks = jax.random.split(dkey)
            dkey, aug_key = dks[0], dks[1]
            wav = _resident_gather(bank_arr, idx, sil)
            wav = wav.astype(jnp.float32) * (1.0 / 32768.0)
            k_aug, _k_spec = jax.random.split(aug_key)
            wav = augment_waveforms(
                k_aug, wav, sil, dataset.bg_data, dataset.bg_sizes,
                dataset.aug_params,
            )
            return (acc + jnp.tanh(jnp.mean(wav)) * 1e-30, dkey), None

        (acc, _), _ = jax.lax.scan(
            body, (jnp.zeros(()), data_key), (idx_all, sil_all)
        )
        return acc

    # ---- timing ------------------------------------------------------------
    rng2 = np.random.default_rng(1)
    specs_c = jax.device_put(
        rng2.normal(0, 2, (BS, 49, 40, 1)).astype(np.float32),
        meshlib.batch_sharding(mesh),
    )
    lbl_c = jax.device_put(
        rng2.integers(0, 761, (BS,)).astype(np.int32),
        meshlib.batch_sharding(mesh),
    )

    def time_variant(name, run, n):
        """run(n) -> a device value to block on. Returns seconds."""
        out = run(n)  # warm/compile at this length
        jax.block_until_ready(out)
        times = []
        for _ in range(REPS):
            t0 = time.perf_counter()
            out = run(n)
            jax.block_until_ready(out)
            times.append(time.perf_counter() - t0)
        med = float(np.median(times))
        print(f"{name} n={n}: {med*1e3:.1f} ms total, "
              f"{med/n*1e3:.2f} ms/step ({[round(t*1e3) for t in times]})",
              flush=True)
        return med

    results = {"bs": BS, "n_short": N_SHORT, "n_long": N_LONG, "reps": REPS}

    with mesh:
        # full fused (shipped default)
        state = fresh_state()

        def run_full(n):
            nonlocal state
            idx_d, lbl_d, sil_d = host_indices(n)
            state, _dk, _rk, m = fused_epoch(
                state, bank["bank"], idx_d, sil_d, lbl_d,
                dataset._next_key(), jax.random.PRNGKey(2),
            )
            return m["loss"]

        # step-only
        state2 = fresh_state()

        def run_step_only(n):
            nonlocal state2
            state2, losses = step_only_epoch(
                state2, specs_c, lbl_c, n, jax.random.PRNGKey(3)
            )
            return losses

        def run_input_only(n):
            idx_d, _lbl_d, sil_d = host_indices(n)
            return input_only_epoch(
                bank["bank"], idx_d, sil_d, dataset._next_key()
            )

        def run_augment_only(n):
            idx_d, _lbl_d, sil_d = host_indices(n)
            return augment_only_epoch(
                bank["bank"], idx_d, sil_d, dataset._next_key()
            )

        variants = {
            "full": run_full,
            "step_only": run_step_only,
            "input_only": run_input_only,
            "augment_only": run_augment_only,
        }
        for name, run in variants.items():
            long_s = time_variant(name, run, N_LONG)
            short_s = time_variant(name, run, N_SHORT)
            per_step = long_s / N_LONG
            fixed_ms = max(0.0, (short_s - per_step * N_SHORT) * 1e3)
            results[name] = {
                "ms_per_step_long": round(per_step * 1e3, 2),
                "clips_per_sec_long": round(BS / per_step, 0),
                "total_short_ms": round(short_s * 1e3, 1),
                "fixed_dispatch_ms_est": round(fixed_ms, 1),
            }

    results["note"] = (
        "scanned programs at two lengths on one v5e via tunnel; "
        "ms_per_step_long = long-scan steady state (dispatch amortized); "
        "fixed_dispatch_ms_est = short total minus per-step*12 (host index "
        "assembly + device_put + dispatch through the tunnel). full should "
        "~= step_only + input_only; input_only - augment_only ~= frontend."
    )
    dest = REPO / "benchmarks" / "fused_pipeline_decomposition.json"
    dest.write_text(json.dumps(results, indent=1))
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
