"""Decompose the Pallas-path input transform: where do 5.5 ms/step go?

fused_pipeline_decomposition.json showed input_only = 5.48 ms/step at
bs 512 (augment + frontend) but never isolated the Pallas augment KERNEL
from its XLA glue (fg gather, int32 convert, bg block-row gather, RNG
draws) — its `augment_only` variant timed the legacy XLA augment path.
This probe times each stage as a scanned program at two lengths (short /
long) so fixed dispatch cost separates from device steady state:

  draws       — RNG draws only (draw_augment_params)
  fg_gather   — resident-bank row gather + silence mask
  fg_int32    — fg_gather + astype(int32) (the kernel's input convert)
  bg_window   — draws + coarse block-row gather (gather_bg_window)
  kernel_iso  — the bare pallas kernel on prebuilt inputs (si chained)
  augment_full— full augment_quantize (gather + draws + bg + kernel)
  aug_frontend— augment_full + fused Pallas frontend
  input_full  — the shipped _augment_featurize (adds spec_augment)
  fold_floor  — one elementwise+reduce pass over (B,16000) f32 (the cost
                of the anti-DCE fold that every variant's timing includes)

Writes benchmarks/pallas_augment_decomposition.json.

Run (real chip, idle host): python tools_dev/probe_pallas_augment_cost.py
"""

import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

import numpy as np  # noqa: E402

BS = 512
T = 16000
N_BANK = 1024
N_SHORT = 12
N_LONG = 96
REPS = 3


def main():
    import jax
    import jax.numpy as jnp

    from multilingual_kws_tpu.data.dataset import (
        _augment_featurize,
        _resident_gather,
    )
    from multilingual_kws_tpu.ops.augment import (
        AugmentParams,
        pad_background_bank,
    )
    from multilingual_kws_tpu.ops.micro_exact import FrontendConfig
    from multilingual_kws_tpu.ops.micro_jax import MicroFrontendJax
    from multilingual_kws_tpu.ops.pallas_augment import (
        augment_kernel_call,
        augment_quantize,
        draw_augment_params,
        gather_bg_window,
        pack_scalar_rows,
    )

    rng = np.random.default_rng(0)
    frontend = MicroFrontendJax(FrontendConfig())
    params = AugmentParams()  # shipped defaults: 1600-sample shift, 80% mix
    max_shift = int(params.time_shift_samples)

    bank = jax.device_put(
        rng.integers(-8000, 8000, (N_BANK, T), dtype=np.int16)
    )
    bg_np = rng.normal(0, 0.05, (3, 4 * T)).astype(np.float32)
    bg_data = jax.device_put(pad_background_bank(bg_np, T))
    bg_sizes = jax.device_put(np.full((3,), 4 * T, np.int32))

    idx_all = jax.device_put(
        rng.integers(0, N_BANK, (N_LONG, BS)).astype(np.int32)
    )
    sil_all = jax.device_put(rng.random((N_LONG, BS)) < 0.1)
    key0 = jax.device_put(jax.random.PRNGKey(7))

    def fold(*xs):
        s = jnp.zeros(())
        for x in xs:
            s = s + jnp.sum(x.astype(jnp.float32))
        return jnp.tanh(s) * 1e-30

    # ---- scan bodies -------------------------------------------------------
    def body_draws(carry, xs):
        acc, dkey = carry
        dkey, k = jax.random.split(dkey)
        sh, idx, off, sv, vol = draw_augment_params(
            k, BS, T, bg_data.shape[0], bg_sizes, params
        )
        return (acc + fold(sh, idx, off, sv, vol), dkey), None

    def body_fg_gather(carry, xs):
        acc, dkey = carry
        idx, sil = xs
        wav = _resident_gather(bank, idx, sil)
        return (acc + fold(wav), dkey), None

    def body_fg_int32(carry, xs):
        acc, dkey = carry
        idx, sil = xs
        wav = _resident_gather(bank, idx, sil).astype(jnp.int32)
        return (acc + fold(wav), dkey), None

    def body_bg_window(carry, xs):
        acc, dkey = carry
        dkey, k = jax.random.split(dkey)
        sh, idx, off, sv, vol = draw_augment_params(
            k, BS, T, bg_data.shape[0], bg_sizes, params
        )
        bgw = gather_bg_window(bg_data, idx, off, T)
        return (acc + fold(bgw, sh, sv, vol), dkey), None

    def body_augment_full(carry, xs):
        acc, dkey = carry
        idx, sil = xs
        dkey, k = jax.random.split(dkey)
        wav = _resident_gather(bank, idx, sil)
        q = augment_quantize(k, wav, sil, bg_data, bg_sizes, params)
        return (acc + fold(q), dkey), None

    def body_aug_frontend(carry, xs):
        acc, dkey = carry
        idx, sil = xs
        dkey, k = jax.random.split(dkey)
        wav = _resident_gather(bank, idx, sil)
        q = augment_quantize(k, wav, sil, bg_data, bg_sizes, params)
        specs = frontend.features_from_int16(q)
        return (acc + fold(specs), dkey), None

    def body_input_full(carry, xs):
        acc, dkey = carry
        idx, sil = xs
        dkey, k = jax.random.split(dkey)
        wav = _resident_gather(bank, idx, sil)
        specs = _augment_featurize(
            frontend, params, k, wav, sil, bg_data, bg_sizes
        )
        return (acc + fold(specs), dkey), None

    # kernel isolation: constant big inputs, data-dependence chained through
    # the tiny si rows so XLA cannot hoist the pallas_call out of the scan
    k_pre = jax.random.PRNGKey(3)
    sh0, idx0, off0, sv0, vol0 = jax.jit(
        lambda k: draw_augment_params(k, BS, T, bg_data.shape[0], bg_sizes,
                                      params)
    )(k_pre)
    bgw0 = jax.jit(lambda i, o: gather_bg_window(bg_data, i, o, T))(idx0, off0)
    si0, sf0 = jax.jit(
        lambda *a: pack_scalar_rows(*a, max_shift=max_shift)
    )(sh0, off0, sv0, vol0, sil_all[0])
    fg0 = jax.jit(lambda i, s: _resident_gather(bank, i, s).astype(jnp.int32))(
        idx0, sil_all[0]
    )
    fg0, bgw0, si0, sf0 = jax.block_until_ready((fg0, bgw0, si0, sf0))

    def body_kernel_iso(carry, xs):
        acc, dkey = carry
        si = si0 + (acc * 1e-30).astype(jnp.int32)  # ~0, defeats hoisting
        q = augment_kernel_call(fg0, bgw0, si, sf0, max_shift=max_shift)
        return (acc + fold(q), dkey), None

    wav_c = jax.device_put(rng.normal(0, 0.1, (BS, T)).astype(np.float32))

    def body_fold_floor(carry, xs):
        acc, dkey = carry
        x = wav_c * (1.0 + acc * 1e-30)
        return (acc + jnp.tanh(jnp.sum(x)) * 1e-30, dkey), None

    bodies = {
        "draws": (body_draws, False),
        "fg_gather": (body_fg_gather, True),
        "fg_int32": (body_fg_int32, True),
        "bg_window": (body_bg_window, False),
        "kernel_iso": (body_kernel_iso, False),
        "augment_full": (body_augment_full, True),
        "aug_frontend": (body_aug_frontend, True),
        "input_full": (body_input_full, True),
        "fold_floor": (body_fold_floor, False),
    }

    import functools

    @functools.partial(jax.jit, static_argnames=("name", "n"))
    def run_epoch(name, n, key):
        body, needs_xs = bodies[name]
        xs = (idx_all[:n], sil_all[:n]) if needs_xs else None
        (acc, _), _ = jax.lax.scan(
            body, (jnp.zeros(()), key), xs, length=n
        )
        return acc

    def time_variant(name, n):
        out = run_epoch(name, n, key0)  # compile
        jax.block_until_ready(out)
        times = []
        for _ in range(REPS):
            t0 = time.perf_counter()
            out = run_epoch(name, n, key0)
            jax.block_until_ready(out)
            times.append(time.perf_counter() - t0)
        med = float(np.median(times))
        print(
            f"{name} n={n}: {med*1e3:.1f} ms total, {med/n*1e3:.3f} ms/step"
            f" ({[round(x*1e3) for x in times]})",
            flush=True,
        )
        return med

    results = {"bs": BS, "n_short": N_SHORT, "n_long": N_LONG, "reps": REPS}
    per_step = {}
    for name in bodies:
        long_s = time_variant(name, N_LONG)
        short_s = time_variant(name, N_SHORT)
        ps = long_s / N_LONG
        per_step[name] = ps
        results[name] = {
            "ms_per_step_long": round(ps * 1e3, 3),
            "total_short_ms": round(short_s * 1e3, 1),
            "fixed_dispatch_ms_est": round(
                max(0.0, (short_s - ps * N_SHORT) * 1e3), 1
            ),
        }

    f = per_step
    results["deltas_ms"] = {
        "fg_int32_convert": round((f["fg_int32"] - f["fg_gather"]) * 1e3, 3),
        "bg_gather": round((f["bg_window"] - f["draws"]) * 1e3, 3),
        "kernel_plus_fold": round(f["kernel_iso"] * 1e3, 3),
        "kernel_minus_fold": round(
            (f["kernel_iso"] - f["fold_floor"]) * 1e3, 3
        ),
        "frontend": round((f["aug_frontend"] - f["augment_full"]) * 1e3, 3),
        "spec_augment": round(
            (f["input_full"] - f["aug_frontend"]) * 1e3, 3
        ),
        "glue_unexplained": round(
            (
                f["augment_full"]
                - f["fg_gather"]
                - (f["fg_int32"] - f["fg_gather"])
                - (f["bg_window"] - f["draws"])
                - f["draws"]
                - (f["kernel_iso"] - f["fold_floor"])
            )
            * 1e3,
            3,
        ),
    }
    results["note"] = (
        "scanned programs at two lengths on one v5e via tunnel; every "
        "variant's per-step time includes one anti-DCE fold pass over its "
        "stage output (fold_floor prices a (512,16000) f32 "
        "elementwise+reduce pass); deltas between cumulative variants "
        "carry that +-fold_floor uncertainty"
    )
    dest = REPO / "benchmarks" / "pallas_augment_decomposition.json"
    dest.write_text(json.dumps(results, indent=1))
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
