"""Benchmark: clips/sec through micro-frontend + EfficientNetB0 embedding on
one TPU chip, vs the TF-CPU reference pipeline (BASELINE.json config #2 /
north star ">=10x clips/sec over the TF-CPU reference").

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "clips/sec", "vs_baseline": N}

The reference baseline (TF-CPU: per-clip to_micro_spectrogram + Keras
EfficientNetB0 predict) is measured once if TensorFlow is available and
cached in benchmarks/ref_baseline.json; otherwise the cached value ships
with the repo.
"""

import json
import os
import sys
import time
import zlib
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent
sys.path.insert(0, str(REPO))

BASELINE_CACHE = REPO / "benchmarks" / "ref_baseline.json"
BATCH = 2048


def _chained_time(step, audio, target_s: float = 2.0) -> float:
    """Per-iteration seconds of `step(audio, eps) -> eps` via a feedback
    chain: each dispatch's input depends on the previous output through a
    numerically-negligible device scalar, so no layer of the remote-tunnel
    stack can coalesce/memoize repeated identical executions, and the
    measured wall is genuine device work (round-3 finding: pipelined
    submission of the SAME buffer both under-amortized first-dispatch
    latency and, at small shapes, returned sub-ms cache-hit nonsense —
    tools_dev/bf16_probe.py, docs/PERFORMANCE.md methodology note)."""
    import jax
    import jax.numpy as jnp

    eps = step(audio, jnp.zeros((), jnp.float32))  # compile
    eps.block_until_ready()

    def run(iters):
        e = jnp.zeros((), jnp.float32)
        t0 = time.perf_counter()
        for _ in range(iters):
            e = step(audio, e)
        e.block_until_ready()
        return (time.perf_counter() - t0) / iters

    est = run(4)
    iters = max(12, int(target_s / max(est, 1e-5)))
    return run(iters)


def measure_ours(return_detail: bool = False):
    """Composed frontend+model clips/sec on one chip, chained (cache-proof)
    timing; measures BOTH model compute dtypes and reports the faster
    (frontend is integer and bit-exact either way; f32 params + bf16
    compute is the shipped mixed-precision config, train/pretrain.py)."""
    import jax
    import jax.numpy as jnp
    from multilingual_kws_tpu.models.kws_model import make_embedding_model
    from multilingual_kws_tpu.ops.micro_exact import FrontendConfig
    from multilingual_kws_tpu.ops.micro_jax import MicroFrontendJax

    frontend = MicroFrontendJax(FrontendConfig())
    rng_np = np.random.default_rng(0)
    audio = jax.device_put(
        rng_np.normal(0, 0.1, (BATCH, 16000)).astype(np.float32).clip(-1, 1)
    )
    rng = jax.random.PRNGKey(0)
    detail = {}
    for name, dtype in (("float32", jnp.float32), ("bfloat16", jnp.bfloat16)):
        model = make_embedding_model(num_labels=761, dtype=dtype)
        variables = model.init(
            rng, jnp.zeros((1, 49, 40, 1), jnp.float32), train=False
        )

        @jax.jit
        def step(a, eps, model=model, variables=variables):
            specs = frontend._features_impl(a + eps)[..., None]
            out = model.apply(variables, specs, train=False)
            return jnp.tanh(jnp.mean(out.astype(jnp.float32))) * 1e-30

        detail[name] = BATCH / _chained_time(step, audio)
    best = max(detail, key=detail.get)
    if return_detail:
        return detail[best], best, detail
    return detail[best], best


def measure_reference(n: int = 64) -> float:
    """TF-CPU reference path: to_micro_spectrogram per clip (the reference's
    per-file featurization, transfer_learning.py:189-198) + batched Keras
    EfficientNetB0+head predict."""
    import tensorflow as tf
    from tensorflow.lite.experimental.microfrontend.python.ops import (
        audio_microfrontend_op as frontend_op,
    )

    tf.config.set_visible_devices([], "GPU")

    inputs = tf.keras.Input((49, 40, 1))
    trunk = tf.keras.applications.EfficientNetB0(
        include_top=False, weights=None, input_tensor=inputs
    )
    x = tf.keras.layers.GlobalAveragePooling2D()(trunk.output)
    x = tf.keras.layers.Dense(1024, activation="relu")(x)
    x = tf.keras.layers.Dense(1024, activation="relu")(x)
    x = tf.keras.layers.Dense(192, activation="selu")(x)
    out = tf.keras.layers.Dense(761)(x)
    model = tf.keras.Model(inputs, out)

    rng = np.random.default_rng(0)
    # n=64 default: small sample, extrapolates linearly (n=16 for spot checks)
    audio = rng.normal(0, 0.1, (n, 16000)).astype(np.float32).clip(-1, 1)

    def featurize(clip):
        int16 = tf.cast(tf.multiply(tf.constant(clip), 32768), tf.int16)
        return frontend_op.audio_microfrontend(
            int16, sample_rate=16000, window_size=30, window_step=20,
            num_channels=40, out_scale=1, out_type=tf.float32,
        ) * (10.0 / 256.0)

    # warmup
    specs = np.stack([featurize(audio[0]).numpy() for _ in range(2)])
    model.predict(specs[..., None], verbose=0)

    t0 = time.perf_counter()
    specs = np.stack([featurize(c).numpy() for c in audio])
    model.predict(specs[..., None], batch_size=64, verbose=0)
    dt = time.perf_counter() - t0
    return len(audio) / dt


def preflight_bit_exact_on_chip(n: int = 256) -> bool:
    """Verify the MOSAIC-COMPILED TPU frontend (the exact path the headline
    times) is bit-identical to the golden-pinned numpy frontend
    (ops/micro_exact.py) in THIS run — a Mosaic/lowering regression must
    fail the benchmark loudly, not ship inside a green number (VERDICT r2
    item 3; interpret-mode CPU coverage lives in tests/test_pallas_frontend).
    """
    import jax

    from multilingual_kws_tpu.ops.micro_exact import (
        FrontendConfig,
        to_micro_spectrogram_exact,
    )
    from multilingual_kws_tpu.ops.micro_jax import MicroFrontendJax

    frontend = MicroFrontendJax(FrontendConfig())
    rng = np.random.default_rng(20260817)
    # mixed content: noise, tones, near-clipping bursts — exercise the AGC /
    # log ranges, not just small-signal behavior
    audio = rng.normal(0, 0.1, (n, 16000)).astype(np.float32)
    t = np.arange(16000) / 16000.0
    audio[::4] += 0.6 * np.sin(2 * np.pi * 800 * t).astype(np.float32)
    audio[1::7] *= 8.0
    audio = audio.clip(-1, 1)
    got = np.asarray(frontend.features(jax.device_put(audio)))
    want = np.stack([to_micro_spectrogram_exact(a) for a in audio])
    ok = got.shape == want.shape and np.array_equal(got, want)
    # the OTHER Mosaic route too: long clips take window_fft_energy + the
    # device suffix (the streaming engine's featurization), not the single
    # fused kernel — a regression there must also fail the benchmark
    audio_long = audio[:4, :8000].repeat(5, axis=1)  # 2.5 s, mixed content
    got_l = np.asarray(frontend.features(jax.device_put(audio_long)))
    want_l = np.stack([to_micro_spectrogram_exact(a) for a in audio_long])
    ok = ok and got_l.shape == want_l.shape and np.array_equal(got_l, want_l)
    # the Mosaic-compiled AUGMENT kernel too (ADVICE r4): it feeds ALL TPU
    # training data (data/dataset._augment_featurize routes through it when
    # frontend.use_pallas) but its parity was only asserted in interpret
    # mode on CPU — a silent mis-lowering would corrupt every training
    # batch while throughput benchmarks stayed green. Assert the XLA-path
    # bound (movement bit-identical; mix arithmetic <=1 int16 step on
    # <1e-4 of samples) against the REAL compiled kernel.
    import jax.numpy as jnp

    from multilingual_kws_tpu.ops.augment import (
        AugmentParams,
        augment_waveforms,
        pad_background_bank,
    )
    from multilingual_kws_tpu.ops.pallas_augment import augment_quantize

    b_aug = 64
    fg16 = (
        (rng.normal(0, 0.15, (b_aug, 16000)) * 32768).clip(-32768, 32767)
    ).astype(np.int16)
    is_sil = np.zeros(b_aug, bool)
    is_sil[::9] = True
    fg16[is_sil] = 0
    sizes = np.array([61234, 17000, 16001], np.int32)
    bank = np.zeros((3, int(sizes.max())), np.float32)
    for i, sz in enumerate(sizes):
        bank[i, :sz] = rng.normal(0, 0.1, sz).astype(np.float32)
    bank = pad_background_bank(bank, 16000)
    params = AugmentParams()
    key = jax.random.PRNGKey(20260819)
    got_a = np.asarray(
        augment_quantize(
            key, jax.device_put(fg16), jnp.asarray(is_sil),
            jnp.asarray(bank), jnp.asarray(sizes), params,
        )
    )
    want_wav = augment_waveforms(
        key, jnp.asarray(fg16, jnp.float32) / 32768.0, jnp.asarray(is_sil),
        jnp.asarray(bank), jnp.asarray(sizes), params,
    )
    want_a = np.asarray(
        jnp.clip(jnp.trunc(want_wav * 32768.0), -32768.0, 32767.0).astype(
            jnp.int32
        )
    )
    aug_ok = (
        got_a.shape == want_a.shape
        and np.abs(got_a - want_a).max() <= 1
        and (got_a != want_a).mean() < 1e-4
    )
    if not aug_ok:
        nbad = (
            int((got_a != want_a).sum()) if got_a.shape == want_a.shape else -1
        )
        print(
            f"# AUGMENT-KERNEL PREFLIGHT FAILED: {nbad} samples beyond the "
            f"1-step/<1e-4 bound (backend={jax.default_backend()})",
            file=sys.stderr,
        )
    ok = ok and aug_ok
    if not ok:
        bad = int((got != want).sum()) if got.shape == want.shape else -1
        print(
            f"# BIT-EXACTNESS PREFLIGHT FAILED: {bad} mismatched feature "
            f"cells out of {want.size} (backend={jax.default_backend()})",
            file=sys.stderr,
        )
    return ok


def get_baseline() -> dict:
    """Cached TF-CPU baseline with a freshness guard: when the cache is
    older than a day, spot-check it with a small re-measurement; if the
    spot-check disagrees by >20%, re-measure fully and rewrite the cache —
    so the headline vs_baseline multiplier can't silently go stale
    (VERDICT r2 item 10). Returns {clips_per_sec, age_days, provenance}.
    """
    stale_after_s = 24 * 3600
    cached = None
    if BASELINE_CACHE.exists():
        with open(BASELINE_CACHE) as fh:
            cached = json.load(fh)
        age_s = time.time() - BASELINE_CACHE.stat().st_mtime
        if age_s <= stale_after_s:
            return {
                "clips_per_sec": cached["clips_per_sec"],
                "age_days": round(age_s / 86400, 2),
                "provenance": "cache (fresh)",
            }
    try:
        if cached is not None:
            spot = measure_reference(n=16)
            if abs(spot - cached["clips_per_sec"]) <= 0.2 * cached["clips_per_sec"]:
                # cache confirmed: refresh its mtime so the next run skips
                # the spot check, and record the confirmation
                cached["spot_checked"] = {
                    "clips_per_sec": round(spot, 2), "at": time.time()
                }
                BASELINE_CACHE.write_text(json.dumps(cached))
                return {
                    "clips_per_sec": cached["clips_per_sec"],
                    "age_days": 0.0,
                    "provenance": f"cache (spot-checked: {spot:.1f} within 20%)",
                }
            print(
                f"# stale baseline: cached {cached['clips_per_sec']:.1f} vs "
                f"spot {spot:.1f} clips/s — re-measuring",
                file=sys.stderr,
            )
        val = measure_reference()
        BASELINE_CACHE.parent.mkdir(parents=True, exist_ok=True)
        BASELINE_CACHE.write_text(
            json.dumps(
                {"clips_per_sec": val, "config": "TF-CPU frontend+EfficientNetB0"}
            )
        )
        return {
            "clips_per_sec": val,
            "age_days": 0.0,
            "provenance": "measured this run",
        }
    except Exception as e:
        print(f"# reference baseline unavailable ({e})", file=sys.stderr)
        if cached is not None:
            age_s = time.time() - BASELINE_CACHE.stat().st_mtime
            return {
                "clips_per_sec": cached["clips_per_sec"],
                "age_days": round(age_s / 86400, 2),
                "provenance": "cache (stale, spot-check unavailable)",
            }
        return {
            "clips_per_sec": float("nan"),
            "age_days": None,
            "provenance": "unavailable",
        }


def _tone_clip(freq: float, seed: int, sr: int = 16000) -> np.ndarray:
    rng = np.random.default_rng(seed)
    t = np.arange(sr) / sr
    env = np.exp(-(((t - 0.5) / 0.18) ** 2))
    x = 0.4 * env * np.sin(2 * np.pi * freq * (1 + 0.01 * rng.normal()) * t)
    return np.clip(x + rng.normal(0, 0.01, sr), -1, 1).astype(np.float32)


def measure_fewshot_wallclock(tmp) -> dict:
    """BASELINE config #1: 5-shot fine-tune + eval wall-clock (reference
    defaults: 4 epochs x 1 batch x bs 64, LR 1e-3, unknown% 50)."""
    from pathlib import Path

    from multilingual_kws_tpu.train.evaluate import evaluate_files_single_target
    from multilingual_kws_tpu.train.finetune import transfer_learn
    from multilingual_kws_tpu.utils.wav import write_wav

    tmp = Path(tmp)
    paths = {}
    for w, freq in (("target", 440.0), ("other", 1200.0)):
        files = []
        for i in range(12):
            p = tmp / w / f"{i}.wav"
            p.parent.mkdir(parents=True, exist_ok=True)
            # zlib.crc32: deterministic across processes (hash() is
            # per-process randomized for strings -> noisy bench corpus)
            write_wav(p, _tone_clip(freq, seed=zlib.crc32(f"{w}/{i}".encode())))
            files.append(str(p))
        paths[w] = files
    bg_dir = tmp / "_background_noise_"
    bg_dir.mkdir(exist_ok=True)
    rng = np.random.default_rng(0)
    for i in range(2):
        write_wav(
            bg_dir / f"noise_{i}.wav",
            np.clip(rng.normal(0, 0.05, 3 * 16000), -1, 1).astype(np.float32),
        )

    def run(seed):
        t0 = time.perf_counter()
        res = transfer_learn(
            target="target",
            train_files=paths["target"][:5],
            val_files=paths["target"][5:],
            unknown_files=paths["other"],
            num_epochs=4,
            num_batches=1,
            batch_size=64,
            primary_lr=1e-3,
            bg_datadir=str(bg_dir),
            seed=seed,
            verbose=0,
        )
        evaluate_files_single_target(paths["target"][5:], 2, res.predict_fn())
        return time.perf_counter() - t0

    cold = run(0)  # includes jit compilation
    warm = run(1)  # steady-state (e.g. batch jobs over many keywords)
    return {
        "metric": "5-shot fine-tune + eval wall-clock (config 1; 4x1x64, LR 1e-3)",
        "cold_s": round(cold, 2),
        "warm_s": round(warm, 2),
        "unit": "seconds",
    }


def measure_realtime_latency() -> dict:
    """Online serving: per-feed() latency of stream/realtime.RealtimeDetector
    (ring buffer -> featurize -> transfer-model softmax -> detector) at
    several chunk sizes — the latency/throughput tradeoff a live caller
    sees. On THIS rig every feed pays the remote-tunnel round trip
    (~tens of ms); a locally-attached chip replaces that with ~0.1 ms PCIe
    RTT, so the chunked rows are the rig-portable signal."""
    import jax
    import jax.numpy as jnp

    from multilingual_kws_tpu.models.kws_model import make_transfer_model
    from multilingual_kws_tpu.ops.micro_exact import FrontendConfig
    from multilingual_kws_tpu.ops.micro_jax import MicroFrontendJax
    from multilingual_kws_tpu.stream.realtime import RealtimeDetector

    model = make_transfer_model(num_categories=3)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 49, 40, 1), jnp.float32),
        train=False,
    )
    predict = jax.jit(
        lambda s: jax.nn.softmax(model.apply(variables, s, train=False), -1)
    )
    frontend = MicroFrontendJax(FrontendConfig())
    rng = np.random.default_rng(0)
    out = {
        "metric": "online RealtimeDetector feed() latency (featurize + "
        "transfer model + detector, one v5e via tunnel)",
        "unit": "ms per feed (median / p90)",
    }
    for chunk_ms in (20, 100, 500):
        det = RealtimeDetector(
            "kw", lambda s: np.asarray(predict(s)), frontend=frontend
        )
        chunk = rng.normal(0, 0.1, 16 * chunk_ms).astype(np.float32)
        det.feed(rng.normal(0, 0.1, 16000).astype(np.float32))  # fill+compile
        det.feed(chunk)
        times = []
        for _ in range(max(10, 2000 // chunk_ms)):
            t0 = time.perf_counter()
            det.feed(chunk)
            times.append((time.perf_counter() - t0) * 1e3)
        times = np.sort(np.asarray(times))
        out[f"chunk_{chunk_ms}ms"] = [
            round(float(np.median(times)), 2),
            round(float(times[int(0.9 * (len(times) - 1))]), 2),
            f"{chunk_ms / np.median(times):.1f}x real-time",
        ]
    return out


def measure_streaming_rtf(tmp) -> dict:
    """BASELINE config #5: streaming detection over ~10 min of audio with a
    19-point threshold sweep; reports the real-time factor."""
    from pathlib import Path

    import jax

    from multilingual_kws_tpu.models.kws_model import make_transfer_model
    from multilingual_kws_tpu.stream.engine import (
        StreamFlags,
        calculate_streaming_accuracy,
    )
    from multilingual_kws_tpu.tools.stream_synth import (
        synthesize_stream,
        write_stream,
    )

    tmp = Path(tmp)
    targets = [_tone_clip(440.0, seed=s) for s in range(6)]
    distractors = [_tone_clip(900.0 + 80 * s, seed=100 + s) for s in range(8)]
    spec = synthesize_stream(
        "target", targets, distractors, num_targets=120, num_distractors=280,
        gap_ms_range=(200, 900), noise_rms=0.003, seed=7,
    )
    wav = tmp / "stream.wav"
    labels = tmp / "labels.txt"
    write_stream(spec, wav, labels)
    audio_s = spec.waveform.shape[0] / spec.sample_rate

    import jax.numpy as jnp

    model = make_transfer_model(num_categories=3)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 49, 40, 1)), train=False
    )
    predict = jax.jit(
        lambda s: jax.nn.softmax(model.apply(variables, s, train=False), axis=-1)
    )
    thresholds = [round(0.05 * i, 2) for i in range(1, 20)]
    flags = StreamFlags(
        wav=str(wav), ground_truth=str(labels), target_keyword="target",
        detection_thresholds=thresholds,
    )
    # warm: compile featurization + model at the bench batch shape
    calculate_streaming_accuracy(predict, [flags], verbose=False)
    # timed pass on FRESH audio of the same length: repeating the identical
    # wav would re-upload the same bytes and re-run the same (executable,
    # args) — both hit tunnel caches and flatter the number (the round-3
    # artifact's 216x was partly this; see CLAUDE.md "repeated identical
    # executions"). A tiny dither keeps shapes (no recompile) but defeats
    # content/replay caching.
    rng = np.random.default_rng(11)
    from multilingual_kws_tpu.utils.wav import write_wav

    # median of 3 fresh-dithered passes: single samples through the tunnel
    # swing +-50% (same protocol reason as the resident e2e medians)
    walls = []
    for rep in range(3):
        dithered = np.clip(
            spec.waveform + rng.uniform(-2e-5, 2e-5, spec.waveform.shape)
            .astype(np.float32),
            -1.0, 1.0,
        )
        wav2 = tmp / f"stream_timed_{rep}.wav"
        write_wav(wav2, dithered)
        flags2 = StreamFlags(
            wav=str(wav2), ground_truth=str(labels),
            target_keyword="target", detection_thresholds=thresholds,
        )
        t0 = time.perf_counter()
        calculate_streaming_accuracy(predict, [flags2], verbose=False)
        walls.append(time.perf_counter() - t0)
    dt = float(np.median(walls))
    return {
        "metric": "streaming KWS over long-form audio, 19-threshold sweep (config 5)",
        "audio_seconds": round(audio_s, 1),
        "wall_seconds": round(dt, 2),
        "wall_seconds_reps": [round(w, 2) for w in walls],
        "real_time_factor": round(audio_s / dt, 1),
        "unit": "x real-time",
    }


def measure_pretrain_step() -> dict:
    """The pure train-step compute bound: fwd+bwd+adam+BN at bs 512 on
    pre-featurized specs, no input pipeline, timed as a lax.scan over the
    step with the state carried — the shipped regime (scan_epoch default)
    and the only timing the tunnel can't flatter: a per-dispatch chained
    loop of the same executable measured 1.57 ms/step bf16 on a day the
    scanned steady state measured 5.4 ms (the round-3 replay-cache
    pathology, CLAUDE.md), so per-dispatch numbers are not used here.
    Medians of 3 reps of a 96-step scan."""
    import functools

    import jax
    import jax.numpy as jnp

    from multilingual_kws_tpu.models.kws_model import make_embedding_model
    from multilingual_kws_tpu.parallel import mesh as meshlib
    from multilingual_kws_tpu.train.pretrain import TrainState
    from multilingual_kws_tpu.train.steps import (
        flat_adam as adam,
        sparse_ce_from_logits,
    )
    from jax.sharding import NamedSharding, PartitionSpec as P

    mesh = meshlib.make_mesh()
    repl = NamedSharding(mesh, P())
    BS, N_SCAN, REPS = 512, 96, 3
    rng = np.random.default_rng(0)
    specs = rng.normal(0, 2, (BS, 49, 40, 1)).astype(np.float32)
    labels = rng.integers(0, 761, (BS,)).astype(np.int32)
    out = {
        "metric": "761-way EfficientNetB0 pretrain step "
        "(bs 512, fwd+bwd+adam+BN, scanned state-carried steady state)",
        "unit": "ms/step",
    }
    for name, dtype in (("f32", jnp.float32), ("bf16", jnp.bfloat16)):
        model = make_embedding_model(num_labels=761, dtype=dtype)
        tx = adam(1e-3)
        variables = model.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 49, 40, 1), jnp.float32),
            train=False,
        )

        def loss_fn(params, batch_stats, sp, lb, sub):
            logits, mutated = model.apply(
                {"params": params, "batch_stats": batch_stats},
                sp, train=True, mutable=["batch_stats"],
                rngs={"dropout": sub},
            )
            return (
                sparse_ce_from_logits(logits, lb).mean(),
                mutated["batch_stats"],
            )

        @functools.partial(jax.jit, donate_argnums=0, static_argnums=3)
        def scan_steps(state, sp, lb, n, rkey):
            def body(carry, _):
                st, rk = carry
                rks = jax.random.split(rk)
                rk, sub = rks[0], rks[1]
                (loss, new_stats), grads = jax.value_and_grad(
                    loss_fn, has_aux=True
                )(st.params, st.batch_stats, sp, lb, sub)
                updates, opt_state = tx.update(
                    grads, st.opt_state, st.params
                )
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

        variables_np = jax.tree_util.tree_map(np.asarray, variables)

        def fresh_state():
            fresh = jax.tree_util.tree_map(
                lambda x: jax.device_put(x, repl), variables_np
            )
            params = fresh["params"]
            return TrainState(
                params=params, opt_state=tx.init(params),
                batch_stats=fresh["batch_stats"],
                step=jnp.zeros((), jnp.int32),
            )

        with mesh:
            sp = meshlib.shard_batch(mesh, specs)
            lb = meshlib.shard_batch(mesh, labels)
            times = []
            state = fresh_state()
            state, losses = scan_steps(
                state, sp, lb, N_SCAN, jax.random.PRNGKey(1)
            )  # compile + warm at the timed length
            jax.block_until_ready(losses)
            for rep in range(REPS):
                t0 = time.perf_counter()
                state, losses = scan_steps(
                    state, sp, lb, N_SCAN, jax.random.PRNGKey(2 + rep)
                )
                jax.block_until_ready(losses)
                times.append((time.perf_counter() - t0) / N_SCAN)
        sec = float(np.median(times))
        out[f"{name}_ms_per_step"] = round(sec * 1e3, 2)
        out[f"{name}_clips_per_sec"] = round(BS / sec, 0)
    return out


def measure_pretrain_e2e(tmp, compute_bound: float = 30935) -> dict:
    """End-to-end 761-way pretraining throughput at bs 512 INCLUDING the
    host input pipeline (wav loads + batch assembly + augment dispatch),
    sync vs prefetch (data/pipeline.py) — vs the 16.6 ms/step pure-compute
    bound. The VERDICT-r1 target: e2e >= 80% of the compute bound."""
    from pathlib import Path

    import jax

    from multilingual_kws_tpu.data.dataset import AudioDataset
    from multilingual_kws_tpu.models.kws_model import make_embedding_model
    from multilingual_kws_tpu.parallel import mesh as meshlib
    from multilingual_kws_tpu.settings import standard_microspeech_model_settings
    from multilingual_kws_tpu.train.pretrain import build_pretrain_step
    from multilingual_kws_tpu.train.steps import flat_adam as adam
    from multilingual_kws_tpu.utils.wav import write_wav

    tmp = Path(tmp)
    words = [f"w{i:02d}" for i in range(16)]
    files, labels = [], []
    for wi, w in enumerate(words):
        d = tmp / "clips" / w
        d.mkdir(parents=True, exist_ok=True)
        for i in range(32):
            p = d / f"{i}.wav"
            write_wav(p, _tone_clip(300.0 + 45 * wi, seed=wi * 100 + i))
            files.append(str(p))
            labels.append(w)
    bg_dir = tmp / "_background_noise_"
    bg_dir.mkdir(exist_ok=True)
    rng = np.random.default_rng(1)
    for i in range(2):
        write_wav(
            bg_dir / f"noise_{i}.wav",
            np.clip(rng.normal(0, 0.05, 3 * 16000), -1, 1).astype(np.float32),
        )

    settings = standard_microspeech_model_settings(len(words) + 1)
    mesh = meshlib.make_mesh()
    dataset = AudioDataset(
        model_settings=settings, commands=words,
        background_data_dir=bg_dir, unknown_files=[],
        silence_percentage=1.0, seed=0,
        input_sharding=meshlib.batch_sharding(mesh),
    )
    import jax.numpy as jnp

    model = make_embedding_model(num_labels=761)
    model_bf16 = make_embedding_model(num_labels=761, dtype=jnp.bfloat16)
    tx = adam(1e-3)
    init_fn, step_fn, _ = build_pretrain_step(model, tx, mesh)

    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 49, 40, 1), jnp.float32), train=False
    )
    # sync/prefetch stream ~1.3k clips/s — 12 steps is already ~5 s of wall.
    # Resident modes run 20-90k clips/s: at 12 steps the one-time host
    # index assembly + device_put + dispatch through the tunnel was ~40% of
    # a 0.25 s pass (benchmarks/fused_pipeline_decomposition.json), so they
    # time 48-step epochs (~1 s) — the steady state a real multi-hundred-
    # step epoch actually runs at.
    BS, STEPS, RESIDENT_STEPS = 512, 12, 48
    key = jax.device_put(jax.random.PRNGKey(1))
    split_fn = jax.jit(lambda k: tuple(jax.random.split(k)))

    from multilingual_kws_tpu.train.pretrain import (
        build_fused_resident_epoch,
        build_fused_resident_step,
    )

    bank = dataset.build_resident_bank(files)
    fused_f32 = build_fused_resident_step(model, tx, mesh, dataset)
    fused_bf16 = build_fused_resident_step(model_bf16, tx, mesh, dataset)
    fused_epoch_bf16 = build_fused_resident_epoch(model_bf16, tx, mesh, dataset)
    from jax.sharding import NamedSharding, PartitionSpec as P

    epoch_sharding = NamedSharding(mesh, P(None, meshlib.DATA_AXIS))

    def run_epoch(mode):
        nonlocal key
        fused = fused_bf16 if mode == "resident_fused_bf16" else fused_f32

        def batches(steps):
            if mode == "resident":
                return dataset.train_batches_resident(
                    files, batch_size=BS, num_steps=steps, labels=labels,
                    single_target=False, bank=bank,
                )
            return dataset.train_batches(
                files, batch_size=BS, num_steps=steps, labels=labels,
                single_target=False, prefetch=2 if mode == "prefetch" else 0,
            )

        def run_steps(steps):
            nonlocal key, state
            if mode == "resident_scanned_bf16":
                import jax.numpy as jnp

                idx_a, lbl_a, sil_a = [], [], []
                for idx, lbl, sil in dataset.host_train_indices(
                    files, BS, steps, bank, labels=labels,
                    single_target=False,
                ):
                    idx_a.append(idx)
                    lbl_a.append(lbl)
                    sil_a.append(sil)
                idx_d, lbl_d, sil_d = jax.device_put(
                    (
                        np.asarray(idx_a, np.int32),
                        np.asarray(lbl_a, np.int32),
                        np.asarray(sil_a, bool),
                    ),
                    epoch_sharding,
                )
                key, sub = split_fn(key)
                state, _dk, _rk, _m = fused_epoch_bf16(
                    state, bank["bank"], idx_d, sil_d, lbl_d,
                    dataset._next_key(), sub,
                )
            elif mode.startswith("resident_fused"):
                for idx, lbl, sil in dataset.host_train_indices(
                    files, BS, steps, bank, labels=labels,
                    single_target=False,
                ):
                    idx, lbl, sil = dataset._put_batch((idx, lbl, sil))
                    key, sub = split_fn(key)
                    state, _ = fused(
                        state, bank["bank"], idx, sil, lbl,
                        dataset._next_key(), sub,
                    )
            else:
                for specs, lbl in batches(steps):
                    key, sub = split_fn(key)
                    state, _ = step_fn(state, specs, lbl, sub)

        steps = STEPS if mode in ("sync", "prefetch") else RESIDENT_STEPS
        with mesh:
            state = init_fn(meshlib.replicate(mesh, variables))
            # warmup: compile augment+frontend and train step, fill wav cache
            # scanned mode compiles per scan length: warm with the SAME
            # length as the timed pass so timing excludes compilation
            run_steps(steps if mode == "resident_scanned_bf16" else 3)
            jax.block_until_ready(state.params)
            t0 = time.perf_counter()
            run_steps(steps)
            jax.block_until_ready(state.params)
            return BS * steps / (time.perf_counter() - t0)

    sync = run_epoch("sync")
    pref = run_epoch("prefetch")
    # resident modes: tunnel load swings single samples +-30%
    # (docs/PERFORMANCE.md §2), so run 3 ALTERNATING reps per mode and
    # report medians — the same settled-A/B protocol as prefetch_ab.json
    resident_modes = [
        "resident", "resident_fused", "resident_fused_bf16",
        "resident_scanned_bf16",
    ]
    reps: dict = {m: [] for m in resident_modes}
    for _rep in range(3):
        for m in resident_modes:
            reps[m].append(run_epoch(m))
    med = {m: float(np.median(v)) for m, v in reps.items()}
    # compute_bound: bf16 clips/s of the pure train step (caller passes the
    # live measurement from measure_pretrain_step; default = round-1 value)
    return {
        "metric": "761-way pretrain END-TO-END incl. input pipeline (bs 512)",
        "stream_sync_clips_per_sec": round(sync, 0),
        "stream_prefetch2_clips_per_sec": round(pref, 0),
        "hbm_resident_clips_per_sec": round(med["resident"], 0),
        "hbm_resident_fused_clips_per_sec": round(med["resident_fused"], 0),
        "hbm_resident_fused_bf16_clips_per_sec": round(
            med["resident_fused_bf16"], 0
        ),
        "hbm_resident_scanned_bf16_clips_per_sec": round(
            med["resident_scanned_bf16"], 0
        ),
        "resident_reps_clips_per_sec": {
            m: [round(v, 0) for v in reps[m]] for m in resident_modes
        },
        # per-mode timed step counts: resident modes time longer epochs
        # than the streaming modes (different fixed-dispatch amortization
        # regimes) — recorded so artifact diffs across rounds are
        # self-describing (ADVICE r4)
        "steps_timed": {
            "stream_sync": STEPS,
            "stream_prefetch2": STEPS,
            **{m: RESIDENT_STEPS for m in resident_modes},
        },
        "unit": "clips/sec",
        "pct_of_train_step_bound": round(
            100 * med["resident_scanned_bf16"] / compute_bound, 1
        ),
        "note": (
            "resident numbers are MEDIANS of 3 alternating reps over "
            "48-step epochs (steady state; per-epoch dispatch amortized "
            "as in a real multi-hundred-step epoch — see "
            "benchmarks/fused_pipeline_decomposition.json); sync/prefetch "
            "are SINGLE samples and tunnel load swings them +-30%; the "
            "settled A/B is benchmarks/prefetch_ab.json (5 alternating "
            "reps: medians sync 1087 vs prefetch2 1398)"
        ),
    }


def measure_decomposition() -> list:
    """Frontend-vs-model cost split and MFU, chained (cache-proof) timing."""
    import jax
    import jax.numpy as jnp

    from multilingual_kws_tpu.models.kws_model import make_embedding_model
    from multilingual_kws_tpu.ops.micro_exact import FrontendConfig
    from multilingual_kws_tpu.ops.micro_jax import MicroFrontendJax

    frontend = MicroFrontendJax(FrontendConfig())
    rng_np = np.random.default_rng(0)
    audio = jax.device_put(
        rng_np.normal(0, 0.1, (BATCH, 16000)).astype(np.float32).clip(-1, 1)
    )
    specs = jax.device_put(
        rng_np.normal(0, 2.0, (BATCH, 49, 40, 1)).astype(np.float32)
    )

    @jax.jit
    def fe_step(a, eps):
        feats = frontend._features_impl(a + eps)
        return jnp.tanh(jnp.mean(feats)) * 1e-30

    fe_clips = BATCH / _chained_time(fe_step, audio)

    model_times = {}
    flops_per_clip = 0.0
    for name, dtype in (("f32", jnp.float32), ("bf16", jnp.bfloat16)):
        model = make_embedding_model(num_labels=761, dtype=dtype)
        variables = model.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 49, 40, 1), jnp.float32),
            train=False,
        )

        @jax.jit
        def m_step(s, eps, model=model, variables=variables):
            out = model.apply(variables, s + eps, train=False)
            return jnp.tanh(jnp.mean(out.astype(jnp.float32))) * 1e-30

        model_times[name] = BATCH / _chained_time(m_step, specs)
        if name == "f32":
            cost = (
                jax.jit(lambda s: model.apply(variables, s, train=False))
                .lower(specs)
                .compile()
                .cost_analysis()
            )
            flops_per_clip = float(cost.get("flops", 0.0)) / BATCH

    peak_f32, peak_bf16 = 4.9e13, 1.97e14  # TPU v5e
    return [
        {
            "metric": "frontend only (bit-exact, fused Pallas), chained bs 2048",
            "value": round(fe_clips, 0), "unit": "clips/sec",
        },
        {
            "metric": "EfficientNetB0 761-way forward only, f32, chained bs 2048",
            "value": round(model_times["f32"], 0), "unit": "clips/sec",
            "flops_per_clip": round(flops_per_clip / 1e6, 1),
            "mfu_vs_f32_peak": round(
                model_times["f32"] * flops_per_clip / peak_f32, 4
            ),
        },
        {
            "metric": "EfficientNetB0 761-way forward only, bf16, chained bs 2048",
            "value": round(model_times["bf16"], 0), "unit": "clips/sec",
            "mfu_vs_bf16_peak": round(
                model_times["bf16"] * flops_per_clip / peak_bf16, 4
            ),
        },
    ]


def run_extra() -> None:
    """Regenerate benchmarks/extra_metrics.json (configs 1, 5, decomposition,
    bf16 variant, MFU). Slow (~5 min incl. compiles); run manually."""
    import datetime
    import tempfile

    print("# extra: on-chip bit-exactness preflight...", file=sys.stderr, flush=True)
    bit_exact = preflight_bit_exact_on_chip()
    if not bit_exact:
        raise SystemExit("on-chip frontend is NOT bit-exact vs ops/micro_exact")
    print("# extra: measuring pipeline...", file=sys.stderr, flush=True)
    ours, dtype_used, detail = measure_ours(return_detail=True)
    base = get_baseline()
    bval = base["clips_per_sec"]
    metrics = [
        {
            "metric": "frontend+EfficientNetB0 embed throughput, chained (bs 2048, bit-exact frontend)",
            "value": round(ours, 0), "unit": "clips/sec",
            "model_compute_dtype": dtype_used,
            "f32_clips_per_sec": round(detail["float32"], 0),
            "bf16_clips_per_sec": round(detail["bfloat16"], 0),
            "vs_tf_cpu_baseline": round(ours / bval, 0) if bval == bval else None,
            "bit_exact_on_chip": bool(bit_exact),
            "baseline_provenance": base["provenance"],
        }
    ]
    print("# extra: decomposition...", file=sys.stderr, flush=True)
    metrics += measure_decomposition()
    with tempfile.TemporaryDirectory(prefix="bench_extra_") as tmp:
        print("# extra: 5-shot wall-clock...", file=sys.stderr, flush=True)
        metrics.append(measure_fewshot_wallclock(tmp))
        print("# extra: streaming RTF...", file=sys.stderr, flush=True)
        metrics.append(measure_streaming_rtf(tmp))
    print("# extra: realtime feed latency...", file=sys.stderr, flush=True)
    metrics.append(measure_realtime_latency())
    print("# extra: pretrain step bound...", file=sys.stderr, flush=True)
    step_metric = measure_pretrain_step()
    metrics.append(step_metric)
    with tempfile.TemporaryDirectory(prefix="bench_pretrain_") as tmp:
        print("# extra: pretrain e2e...", file=sys.stderr, flush=True)
        metrics.append(
            measure_pretrain_e2e(
                tmp, compute_bound=step_metric["bf16_clips_per_sec"]
            )
        )
    metrics.append(
        {
            "metric": "exact-frontend history (bs 2048 full pipeline)",
            "round1_float_emulation_offgrid": 68533,
            "round2_int_unfused": 53021,
            "round2_int_fused_fft_kernel": 61759,
            "round2_single_kernel_frontend": 81008,
            "round3_chained_timing_fix": round(ours, 0),
            "unit": "clips/sec",
            "note": (
                "round-2+ paths are bit-exact vs the reference op; round 1 "
                "was not. Rounds 1-2 used pipelined-submission timing which "
                "under-amortized dispatch latency; round 3 switched to "
                "chained (cache-proof) timing and auto-picks the model "
                "compute dtype — see docs/PERFORMANCE.md methodology note"
            ),
        }
    )
    out = {
        "measured": f"{datetime.date.today()}, one TPU v5e chip via tunnel",
        "metrics": metrics,
        "baseline": (
            "TF-CPU reference pipeline (per-clip microfrontend op + Keras "
            "EfficientNetB0 predict): 23.8 clips/sec (benchmarks/ref_baseline.json)"
        ),
    }
    path = REPO / "benchmarks" / "extra_metrics.json"
    path.write_text(json.dumps(out, indent=1))
    print(json.dumps(out, indent=1))


def main():
    from multilingual_kws_tpu.utils.compilation_cache import (
        enable_compilation_cache,
    )

    enable_compilation_cache()
    if "--extra" in sys.argv:
        run_extra()
        return
    # preflight BEFORE timing: the headline claims "bit-exact frontend" —
    # prove it on the Mosaic-compiled path in this very run
    bit_exact = preflight_bit_exact_on_chip()
    if not bit_exact:
        print(
            json.dumps(
                {
                    "metric": "frontend+EfficientNetB0 embed throughput (bs 2048)",
                    "value": 0.0,
                    "unit": "clips/sec",
                    "vs_baseline": 0.0,
                    "bit_exact_on_chip": False,
                    "error": "on-chip frontend is NOT bit-exact vs ops/micro_exact",
                }
            )
        )
        sys.exit(1)
    ours, dtype_used, detail = measure_ours(return_detail=True)
    base = get_baseline()
    bval = base["clips_per_sec"]
    vs = ours / bval if bval == bval else None
    print(
        json.dumps(
            {
                "metric": "frontend+EfficientNetB0 embed throughput (bs 2048)",
                "value": round(ours, 1),
                "unit": "clips/sec",
                "vs_baseline": round(vs, 2) if vs is not None else None,
                "bit_exact_on_chip": bool(bit_exact),
                "model_compute_dtype": dtype_used,
                "f32_clips_per_sec": round(detail["float32"], 1),
                "bf16_clips_per_sec": round(detail["bfloat16"], 1),
                "baseline_clips_per_sec": round(bval, 2) if bval == bval else None,
                "baseline_age_days": base["age_days"],
                "baseline_provenance": base["provenance"],
            }
        )
    )


if __name__ == "__main__":
    main()
