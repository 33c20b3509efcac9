"""bf16-vs-f32 inference decomposition on the real TPU (VERDICT r2 item 4).

Round-2 reported full-B0 761-way forward at bs 2048 FASTER in f32 (191k
clips/s) than bf16 (174k). Those were pipelined-submission timings of the
SAME input buffer; the tunnel memoizes repeated identical executions, so
sub-ms results can be cache hits, not compute (observed in this probe's
first version: "full B0 in 0.198 ms" = 10M clips/s, nonsense).

This version forces real, sequential device work by CHAINING: each
iteration's input depends on the previous output through a tiny
non-DCE-able scalar, so nothing can be memoized and executions serialize
on device. Reported ms = genuine per-forward device time (plus one
pipeline fill).

Usage: python tools_dev/bf16_probe.py [batch]
Writes benchmarks/bf16_probe.json.
"""

import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

import jax
import jax.numpy as jnp
import numpy as np

from multilingual_kws_tpu.models.efficientnet import (
    DEFAULT_BLOCKS,
    EfficientNet,
)
from multilingual_kws_tpu.models.kws_model import make_embedding_model
from multilingual_kws_tpu.utils.compilation_cache import enable_compilation_cache

BATCH = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
TARGET_S = 2.0  # measure until at least this much wall-clock of chained work


def chained_time(model, variables, specs):
    """Per-forward seconds via a feedback chain (cache-proof)."""

    @jax.jit
    def step(s, eps):
        out = model.apply(variables, s + eps, train=False)
        # data-dependent, numerically negligible feedback; not DCE-able
        return jnp.tanh(jnp.mean(out.astype(jnp.float32))) * 1e-30

    eps = jnp.zeros((), jnp.float32)
    eps = step(specs, eps)  # compile
    eps.block_until_ready()

    def run(iters):
        e = jnp.zeros((), jnp.float32)
        t0 = time.perf_counter()
        for _ in range(iters):
            e = step(specs, e)
        e.block_until_ready()
        return (time.perf_counter() - t0) / iters

    est = run(4)
    iters = max(8, int(TARGET_S / max(est, 1e-5)))
    return run(iters), iters


def cast_pytree(tree, dtype):
    return jax.tree.map(
        lambda x: x.astype(dtype)
        if isinstance(x, jax.Array) and x.dtype == jnp.float32
        else x,
        tree,
    )


def build(model, specs, bf16):
    variables = model.init(jax.random.PRNGKey(0), specs[:1], train=False)
    if bf16:
        variables = cast_pytree(variables, jnp.bfloat16)
    return variables


def main():
    enable_compilation_cache()
    rng = np.random.default_rng(0)
    specs = jax.device_put(
        rng.normal(0, 2, (BATCH, 49, 40, 1)).astype(np.float32)
    )
    report = {"batch": BATCH, "method": "chained (cache-proof)", "stages": []}

    for k in range(1, len(DEFAULT_BLOCKS) + 1):
        model_f = EfficientNet(blocks=tuple(DEFAULT_BLOCKS[:k]), dtype=jnp.float32)
        model_b = EfficientNet(blocks=tuple(DEFAULT_BLOCKS[:k]), dtype=jnp.bfloat16)
        tf32, i1 = chained_time(model_f, build(model_f, specs, False), specs)
        tbf, i2 = chained_time(model_b, build(model_b, specs, True), specs)
        row = {
            "prefix_blocks": k,
            "f32_ms": round(tf32 * 1e3, 3),
            "bf16_ms": round(tbf * 1e3, 3),
            "bf16_over_f32": round(tbf / tf32, 3),
            "iters": [i1, i2],
        }
        report["stages"].append(row)
        print(row, flush=True)

    for dtype, name in ((jnp.float32, "f32"), (jnp.bfloat16, "bf16")):
        model = make_embedding_model(num_labels=761, dtype=dtype)
        t, iters = chained_time(
            model, build(model, specs, name == "bf16"), specs
        )
        report[f"full_{name}_ms"] = round(t * 1e3, 3)
        report[f"full_{name}_clips_per_s"] = round(BATCH / t, 0)
        print(name, "full:", report[f"full_{name}_ms"], "ms",
              report[f"full_{name}_clips_per_s"], "clips/s", flush=True)

    # layout experiment: frequency axis padded 40 -> 64 (timing only)
    specs64 = jax.device_put(
        rng.normal(0, 2, (BATCH, 49, 64, 1)).astype(np.float32)
    )
    for dtype, name in ((jnp.float32, "f32"), (jnp.bfloat16, "bf16")):
        model = make_embedding_model(num_labels=761, dtype=dtype)
        t, _ = chained_time(
            model, build(model, specs64, name == "bf16"), specs64
        )
        report[f"freqpad64_{name}_ms"] = round(t * 1e3, 3)
        print(name, "freqpad64:", report[f"freqpad64_{name}_ms"], "ms", flush=True)

    # cross-check the HEADLINE methodology: chained frontend+model composed
    # pipeline vs bench.py's pipelined-submission 81k clips/s
    from multilingual_kws_tpu.ops.micro_exact import FrontendConfig
    from multilingual_kws_tpu.ops.micro_jax import MicroFrontendJax

    frontend = MicroFrontendJax(FrontendConfig())
    model = make_embedding_model(num_labels=761)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 49, 40, 1), jnp.float32),
        train=False,
    )
    audio = jax.device_put(
        rng.normal(0, 0.1, (BATCH, 16000)).astype(np.float32).clip(-1, 1)
    )

    @jax.jit
    def composed_step(a, eps):
        s = frontend._features_impl(a + eps)[..., None]
        out = model.apply(variables, s, train=False)
        return jnp.tanh(jnp.mean(out)) * 1e-30

    eps = composed_step(audio, jnp.zeros((), jnp.float32))
    eps.block_until_ready()
    t0 = time.perf_counter()
    e = jnp.zeros((), jnp.float32)
    iters = 24
    for _ in range(iters):
        e = composed_step(audio, e)
    e.block_until_ready()
    t = (time.perf_counter() - t0) / iters
    report["composed_chained_ms"] = round(t * 1e3, 3)
    report["composed_chained_clips_per_s"] = round(BATCH / t, 0)
    print("composed chained:", report["composed_chained_clips_per_s"],
          "clips/s", flush=True)

    dest = REPO / "benchmarks" / "bf16_probe.json"
    dest.write_text(json.dumps(report, indent=1))
    print(json.dumps(report))


if __name__ == "__main__":
    main()
