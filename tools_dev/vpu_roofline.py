"""Price the fused frontend kernel against a MEASURED VPU roofline.

VERDICT r3 item 7: "4.13 us/clip — within 15% or 3x of the VPU ceiling?"
Datasheet arithmetic can't answer this honestly (public v5e docs don't
price i32 multiply, cross-lane rolls, or select throughput), so this
probe measures the achievable rates empirically and prices the kernel's
exact op census against them:

 1. RATES (real chip): synthetic Pallas kernels on the kernel's own tile
    shapes run K-deep dependency chains of one op class each — i32 alu
    (add/xor), i32 multiply, compare+select, cross-lane roll, and the
    bf16 (R,256)@(256,256) permutation matmul. Two chain depths (K=8/32)
    difference away fixed overhead. Rates are reported in VREG-ops/s
    ((8,128) register operations) so they transfer across lane widths.
 2. CENSUS (CPU trace): jax.make_jaxpr over the kernel's actual section
    functions (_window_shift_perm, _fft_energy_math[rot],
    _filterbank_sqrt_in_kernel, _pcan_section, _log_section — the same
    code the Mosaic kernel runs), recursively expanding nested jits,
    counting vreg-ops per primitive class at in-kernel shapes
    (8-clip tile: frames (400,480), FFT (392,256), features (49,8,40)).
 3. BOUND: per-section lower-bound us/clip = sum(class vreg-ops / class
    rate), compared with the measured section split
    (benchmarks/fft_cost_decomposition.json).

Writes benchmarks/vpu_roofline.json. Run on the TPU host, quiet machine:
    python tools_dev/vpu_roofline.py
CPU-only census (no rates): python tools_dev/vpu_roofline.py --census
"""

import functools
import json
import math
import sys
from collections import Counter
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

import jax
import jax.numpy as jnp
import numpy as np

DEST = REPO / "benchmarks" / "vpu_roofline.json"

ROWS = 392 * 64  # grid of 64 tiles of the kernel's own (392, 256) block
TILE = 392


def vregs(shape) -> int:
    """(8,128) vector registers touched by one full-width op on `shape`."""
    if len(shape) == 0:
        return 0  # scalar
    lanes = shape[-1]
    rows = int(np.prod(shape[:-1])) if len(shape) > 1 else 1
    return max(1, math.ceil(rows / 8)) * max(1, math.ceil(lanes / 128))


# ---------------------------------------------------------------- rates
def _rate_kernel(body, k):
    """Pallas kernel: x_ref -> out_ref after k dependent passes of body.
    k=0 is the pure-copy control (isolates HBM traffic + dispatch)."""
    import jax.experimental.pallas as pl

    def kernel(x_ref, y_ref, o_ref):
        x = x_ref[:]
        y = y_ref[:]
        if k:
            x = jax.lax.fori_loop(
                0, k, lambda _, x: body(x, y), x, unroll=1
            )
        o_ref[:] = x

    @jax.jit
    def run(x, y):
        grid = x.shape[0] // TILE
        return pl.pallas_call(
            kernel,
            grid=(grid,),
            in_specs=[
                pl.BlockSpec((TILE, x.shape[1]), lambda i: (i, 0)),
                pl.BlockSpec((TILE, x.shape[1]), lambda i: (i, 0)),
            ],
            out_specs=pl.BlockSpec((TILE, x.shape[1]), lambda i: (i, 0)),
            out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        )(x, y)

    return run


def _dot_rate_kernel(k):
    """k dependent bf16 (TILE,256)@(256,256) matmul passes."""
    import jax.experimental.pallas as pl

    def kernel(x_ref, w_ref, o_ref):
        x = x_ref[:]
        w = w_ref[:]

        def step(_, x):
            return jnp.dot(
                x.astype(jnp.bfloat16), w,
                preferred_element_type=jnp.float32,
            )  # w entries in {0, 0.5}: values stay bounded

        acc = x.astype(jnp.float32)
        if k:
            acc = jax.lax.fori_loop(0, k, step, acc, unroll=1)
        o_ref[:] = acc

    @jax.jit
    def run(x, w):
        grid = x.shape[0] // TILE
        return pl.pallas_call(
            kernel,
            grid=(grid,),
            in_specs=[
                pl.BlockSpec((TILE, 256), lambda i: (i, 0)),
                pl.BlockSpec((256, 256), lambda i: (0, 0)),
            ],
            out_specs=pl.BlockSpec((TILE, 256), lambda i: (i, 0)),
            out_shape=jax.ShapeDtypeStruct((x.shape[0], 256), jnp.float32),
        )(x, w)

    return run


def measure_rates():
    from bench import _chained_time  # the ONE timing helper
    from jax.experimental.pallas import tpu as pltpu

    ops = {
        # 1 vector op per chain step
        "alu": lambda x, y: (x + y) ^ y,  # 2 ops; divide by 2 below
        "mul": lambda x, y: x * y,
        # and+eq (2 alu) + select; select rate derived after
        "cmpsel": lambda x, y: jnp.where((x & 1) == 0, y, x),
        "roll": lambda x, y: pltpu.roll(x, 1, 1),
    }
    per_step_raw = {"alu": 2, "mul": 1, "cmpsel": 3, "roll": 1}

    rng = np.random.default_rng(0)
    x = jax.device_put(
        rng.integers(-(2**14), 2**14, (ROWS, 256)).astype(np.int32)
    )
    y = jax.device_put(
        rng.integers(1, 2**10, (ROWS, 256)).astype(np.int32)
    )
    vr_pass = vregs((ROWS, 256))  # vregs per full-array single op

    def time_k(build, k, a, b):
        run = build(k)

        @jax.jit
        def step(a, eps):
            out = run(a + eps.astype(a.dtype), b)
            return jnp.tanh(
                jnp.sum(out[::4096, ::64].astype(jnp.float32)) * 1e-20
            ) * 1e-30

        return _chained_time(step, a)

    # deep chains vs a k=0 copy control: the chain must dwarf the HBM
    # traffic (26M elems in+out ~ 0.2 GB/call) or the K-delta drowns in
    # dispatch/bandwidth noise (first attempt with K=8/32 measured
    # NEGATIVE alu time)
    K = 512
    rates = {}
    t_copy = time_k(lambda k: _rate_kernel(ops["alu"], 0), 0, x, y)
    print(f"copy control: {t_copy * 1e6:.0f} us", flush=True)
    for name, body in ops.items():
        tk = time_k(lambda k: _rate_kernel(body, k), K, x, y)
        per_pass = (tk - t_copy) / K  # seconds per chain step, full array
        per_op = per_pass / per_step_raw[name]
        rates[name] = {
            "vreg_ops_per_sec": vr_pass / per_op,
            "raw_step_us_full_array": per_pass * 1e6,
        }
        print(f"rate {name}: {vr_pass / per_op / 1e9:.2f} G vreg-ops/s "
              f"(chain {tk * 1e3:.2f} ms vs copy {t_copy * 1e3:.2f} ms)",
              flush=True)

    # per-shift roll rates: the FFT stages' rolls are by j*m and
    # (j-4)*m mod 256 with m in {1,4,16,64} — lane rotations aligned to
    # vreg boundaries (128) or sublane-ish strides may lower much cheaper
    # than the worst-case shift of 1, so price each class separately
    for sh in (1, 4, 16, 64, 128):
        body = (lambda s: lambda x, y: pltpu.roll(x, s, 1))(sh)
        tk = time_k(lambda k: _rate_kernel(body, k), K, x, y)
        per_op = (tk - t_copy) / K
        rates[f"roll_s{sh}"] = {
            "vreg_ops_per_sec": vr_pass / per_op,
        }
        print(f"rate roll shift={sh}: {vr_pass / per_op / 1e9:.2f} "
              f"G vreg-ops/s", flush=True)

    # derived pure-select rate: cmpsel = and + eq (alu) + select
    t_alu = 1.0 / rates["alu"]["vreg_ops_per_sec"]
    t_cmpsel_step = per_step_raw["cmpsel"] / rates["cmpsel"]["vreg_ops_per_sec"]
    t_sel = max(t_cmpsel_step - 2 * t_alu, t_alu * 0.25)
    rates["select"] = {"vreg_ops_per_sec": 1.0 / t_sel, "derived": True}
    print(f"rate select (derived): {1.0 / t_sel / 1e9:.2f} G vreg-ops/s",
          flush=True)

    # bf16 (TILE,256)@(256,256) matmul: passes/s
    w = jax.device_put(
        (rng.integers(0, 2, (256, 256)) * 0.5).astype(np.float32)
    ).astype(jnp.bfloat16)
    KD = 64
    t0d = time_k(_dot_rate_kernel, 0, x, w)
    tkd = time_k(_dot_rate_kernel, KD, x, w)
    per_pass = (tkd - t0d) / KD
    # report as output elements/s for the (R,256)@(256,256) shape
    rates["dot_256x256_bf16"] = {
        "out_elems_per_sec": ROWS * 256 / per_pass,
        "passes_per_sec_full_array": 1.0 / per_pass,
        "us_per_tile_pass": per_pass / (ROWS / TILE) * 1e6,
    }
    print(
        f"rate dot: {per_pass / (ROWS / TILE) * 1e6:.3f} us per "
        f"(392,256)@(256,256) bf16 pass", flush=True,
    )
    return rates


# --------------------------------------------------------------- census
ALU_PRIMS = {
    "add", "sub", "and", "or", "xor", "neg", "not", "shift_left",
    "shift_right_arithmetic", "shift_right_logical", "eq", "ne", "ge",
    "gt", "le", "lt", "min", "max", "convert_element_type", "abs",
    "clamp", "sign", "rem", "floor", "concatenate", "pad", "rev",
    "reduce_max", "reduce_sum", "reduce_min", "reduce_and", "reduce_or",
    "select", "is_finite", "integer_pow",
}
FREE_PRIMS = {"broadcast_in_dim", "iota", "slice", "reshape", "squeeze",
              "transpose", "copy", "stop_gradient", "convert_element_type?"}


def census(fn, *args):
    """Recursive vreg-op census by primitive class."""
    jaxpr = jax.make_jaxpr(fn)(*args)
    out = Counter()

    def walk(jx):
        for eqn in jx.eqns:
            sub = None
            for v in eqn.params.values():
                if hasattr(v, "jaxpr"):
                    sub = v.jaxpr if hasattr(v.jaxpr, "eqns") else v
            if eqn.primitive.name in ("jit", "closed_call", "custom_jvp_call",
                                      "custom_vjp_call", "pjit"):
                inner = eqn.params.get("jaxpr")
                if inner is not None:
                    walk(inner.jaxpr if hasattr(inner, "jaxpr") else inner)
                continue
            if eqn.primitive.name in ("scan", "while", "cond"):
                raise RuntimeError(f"control flow in census: {eqn.primitive}")
            aval = eqn.outvars[0].aval
            shape = getattr(aval, "shape", ())
            vr = vregs(shape)
            name = eqn.primitive.name
            if name == "dot_general":
                out["dot_out_elems"] += int(np.prod(shape))
                out["dot_calls"] += 1
            elif name == "mul":
                out["mul"] += vr
            elif name == "select_n":
                out["select"] += vr
            elif name in ("roll", "tpu_roll") or "roll" in name:
                out["roll"] += vr
            elif name in FREE_PRIMS:
                out["free"] += vr
            elif name in ALU_PRIMS:
                out["alu"] += vr
            else:
                out[f"other:{name}"] += vr
            if sub is not None and eqn.primitive.name not in (
                "jit", "closed_call", "pjit"
            ):
                pass
        return out

    walk(jaxpr.jaxpr)
    return out


def run_census():
    """Census each kernel section at in-kernel 8-clip tile shapes."""
    from multilingual_kws_tpu.ops import pallas_fft as pf
    from multilingual_kws_tpu.ops.micro_exact import (
        FrontendConfig, LOG_SEGMENTS_LOG2, LOG_SCALE_LOG2,
    )
    from multilingual_kws_tpu.ops.micro_jax import WINDOW_BITS, MicroFrontendJax

    fe = MicroFrontendJax(FrontendConfig())
    nf, cb, C = 49, 8, 40
    R = (nf + 1) * cb  # 400 frame rows incl. framing garbage row
    tw = jnp.asarray(pf._pack_twiddles())

    sections = {}

    win = jnp.asarray(fe.window_coeffs)  # (1?, 480) int
    pr = jnp.asarray(fe._fft_pr)
    pi = jnp.asarray(fe._fft_pi)
    frames = jnp.zeros((R, 480), jnp.int32)
    sections["window_shift_perm"] = census(
        lambda w, a, b, f: pf._window_shift_perm(w, a, b, f, WINDOW_BITS),
        win, pr, pi, frames,
    )

    fr = jnp.zeros((R, 256), jnp.int32)
    sections["fft_energy_rot"] = census(
        lambda t, a, b: pf._fft_energy_math(t, a, b, variant="rot"),
        tw, fr, fr,
    )

    cfg = fe.config if hasattr(fe, "config") else FrontendConfig()
    fbh = jnp.zeros((257, C), jnp.float32)
    fbl = jnp.zeros((257, C), jnp.float32)
    energy = jnp.zeros((R, 256), jnp.uint32)
    e256 = jnp.zeros((R, 1), jnp.uint32)
    shift = jnp.zeros((R, 1), jnp.int32)
    sections["filterbank_sqrt"] = census(
        lambda h, l, e, e2, s: pf._filterbank_sqrt_in_kernel(h, l, e, e2, s),
        fbh, fbl, energy, e256, shift,
    )

    # PCAN + log at the feature slab shape (nf, cb, C), with the REAL
    # static LUTs the fused kernel receives (micro_jax builds them)
    est = jnp.zeros((nf, cb, C), jnp.uint32)
    outv = jnp.zeros((nf, cb, C), jnp.uint32)
    sections["pcan"] = census(
        lambda e, o: pf._pcan_section(
            e, o, wdf_rows=fe._wdf_rows_static, lut012=fe._lut012_static,
            snr_shift=cfg.pcan_gain_shift
            if hasattr(cfg, "pcan_gain_shift") else 6,
        ),
        est, outv,
    )

    sections["log"] = census(
        lambda o: pf._log_section(
            o, correction_bits=3, scale_shift=6,
            log_pairs=fe._log_pairs_static,
        ),
        outv,
    )
    return sections


def price(sections, rates):
    """Lower-bound us/clip per section from census x measured rates."""
    out = {}
    for name, c in sections.items():
        t = 0.0
        detail = {}
        for k, v in c.items():
            if k in ("dot_calls", "free") or k.startswith("other:"):
                continue
            if k == "dot_out_elems":
                # price each dot via the measured per-tile-pass cost,
                # scaled by output rows (256-lane outputs assumed)
                passes = v / (TILE * 256)
                dt = passes * rates["dot_256x256_bf16"][
                    "us_per_tile_pass"] * 1e-6
            else:
                rate = rates.get(k, rates["alu"])["vreg_ops_per_sec"]
                dt = v / rate
            t += dt
            detail[k] = round(dt * 1e6, 3)
        others = {k: v for k, v in c.items() if k.startswith("other:")}
        out[name] = {
            "lower_bound_us_per_tile": round(t * 1e6, 3),
            "lower_bound_us_per_clip": round(t * 1e6 / 8, 4),
            "per_class_us_per_tile": detail,
            "census_vreg_ops": {k: int(v) for k, v in c.items()},
            **({"unpriced": others} if others else {}),
        }
    return out


def main():
    census_only = "--census" in sys.argv
    if census_only:
        jax.config.update("jax_platforms", "cpu")
        try:
            import jax._src.xla_bridge as xb
            xb._backend_factories.pop("axon", None)
        except Exception:
            pass
    sections = run_census()
    for n, c in sections.items():
        print(n, dict(c), flush=True)
    if census_only:
        return
    assert jax.default_backend() == "tpu", jax.default_backend()
    rates = measure_rates()
    priced = price(sections, rates)
    decomp = json.loads(
        (REPO / "benchmarks" / "fft_cost_decomposition.json").read_text()
    )["results"]
    measured = {
        "fft_energy_rot": decomp["B_fft_energy_only_us_per_clip"],
        "window_shift_perm": round(
            decomp["A_window_fft_energy_us_per_clip"]
            - decomp["B_fft_energy_only_us_per_clip"], 3,
        ),
        "pcan": round(
            decomp["E_no_log_us_per_clip"] - decomp["D_no_pcan_no_log_us_per_clip"], 3
        ),
        "log": round(
            decomp["C_full_us_per_clip"] - decomp["E_no_log_us_per_clip"], 3
        ),
        # D-A also contains the NR recurrence + framing roll, which the
        # census can't trace (scratch-ref fori_loop) — the census bound
        # covers the filterbank+sqrt part only, so this is a loose pair
        "filterbank_sqrt": round(
            decomp["D_no_pcan_no_log_us_per_clip"]
            - decomp["A_window_fft_energy_us_per_clip"], 3,
        ),
    }
    for name, m in measured.items():
        if name in priced:
            lb = priced[name]["lower_bound_us_per_clip"]
            priced[name]["measured_us_per_clip"] = m
            priced[name]["census_time_over_measured"] = (
                round(lb / m, 2) if m > 0 else None
            )

    # HARD FLOOR for the FFT section: only its un-eliminable,
    # data-dependent ops — the 42 lane rolls (by their REAL shift mix)
    # and the twiddle/sround multiplies. Everything else in the census
    # (iota-derived masks, constant selects, broadcast twiddle rows) is
    # fair game for Mosaic's folding, which is exactly why the naive
    # census prices ABOVE the measured time.
    # Shift mix per (400,256) tile (2 planes x 3 j per stage, see
    # _stage_rot): m=1 -> {1,2,3,253,254,255}x2; m=4 -> x4-aligned x12;
    # m=16 -> x16-aligned x12; m=64 -> {64,192}x4 + {128}x2.
    vr = vregs((400, 256))
    roll_floor_s = (
        12 * vr / rates["roll_s1"]["vreg_ops_per_sec"]
        + 12 * vr / rates["roll_s4"]["vreg_ops_per_sec"]
        + 12 * vr / rates["roll_s16"]["vreg_ops_per_sec"]
        + 4 * vr / rates["roll_s64"]["vreg_ops_per_sec"]
        + 2 * vr / rates["roll_s128"]["vreg_ops_per_sec"]
    )
    mul_floor_s = (
        sections["fft_energy_rot"]["mul"]
        / rates["mul"]["vreg_ops_per_sec"]
    )
    fft_floor = {
        "rolls_us_per_clip": round(roll_floor_s * 1e6 / 8, 3),
        "muls_us_per_clip": round(mul_floor_s * 1e6 / 8, 3),
        "floor_us_per_clip": round((roll_floor_s + mul_floor_s) * 1e6 / 8, 3),
        "measured_us_per_clip": measured["fft_energy_rot"],
        "measured_over_floor": round(
            measured["fft_energy_rot"]
            / ((roll_floor_s + mul_floor_s) * 1e6 / 8), 2,
        ),
        "note": (
            "floor = un-eliminable data-dependent ops only (42 lane rolls "
            "at their real shift mix + twiddle/sround multiplies at "
            "measured serial-chain rates); adds/selects/masks excluded as "
            "Mosaic-foldable"
        ),
    }
    out = {
        "what": (
            "fused frontend priced against MEASURED VPU rates: synthetic "
            "Pallas op-chain kernels on the kernel's own (392,256) tile "
            "give achievable per-op-class rates; jaxpr census of the "
            "kernel's section functions gives the nominal op mixes. "
            "census_time_over_measured > 1 means the compiled kernel "
            "EXECUTES FASTER than its nominal op count priced at those "
            "rates — Mosaic folds constant-mask selects / hoists "
            "invariants — so the census is an overcount, not a bound; "
            "fft_hard_floor prices only the un-eliminable ops. "
            "measured_us_per_clip from fft_cost_decomposition.json "
            "(same chip, chained timing)"
        ),
        "fft_hard_floor": fft_floor,
        "rates": {
            k: {kk: (round(vv, 3) if isinstance(vv, float) else vv)
                for kk, vv in v.items()}
            for k, v in rates.items()
        },
        "sections": priced,
        "platform": jax.devices()[0].platform,
    }
    DEST.write_text(json.dumps(out, indent=1))
    print(json.dumps(out["sections"], indent=1))


if __name__ == "__main__":
    main()
