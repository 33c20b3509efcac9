"""Pallas NR-scan kernel: interpret-mode parity with the lax.scan path."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from multilingual_kws_tpu.ops.micro_exact import (
    NOISE_REDUCTION_BITS,
    FrontendConfig,
)
from multilingual_kws_tpu.ops.micro_jax import MicroFrontendJax
from multilingual_kws_tpu.ops.pallas_frontend import noise_estimate_scan


def test_kernel_matches_lax_scan_interpret():
    fe = MicroFrontendJax(FrontendConfig(), use_pallas=False)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(0, 1e6, (49, 6, 40)).astype(np.float32))
    sm = fe.smoothing
    nrb = float(1 << NOISE_REDUCTION_BITS)
    om = nrb - sm
    sb = float(1 << fe.config.smoothing_bits)

    got = np.asarray(noise_estimate_scan(x, sm, om, sb, nrb, interpret=True))

    def step(est, sig):
        est = jnp.floor((sig * sb * sm + est * om) / nrb)
        return est, est

    _, want = jax.lax.scan(step, jnp.zeros(x.shape[1:], x.dtype), x)
    np.testing.assert_array_equal(got, np.asarray(want))


def test_kernel_pads_odd_batches():
    fe = MicroFrontendJax(FrontendConfig(), use_pallas=False)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.uniform(0, 1e4, (10, 3, 40)).astype(np.float32))
    sm = fe.smoothing
    nrb = float(1 << NOISE_REDUCTION_BITS)
    got = noise_estimate_scan(
        x, sm, nrb - sm, float(1 << 10), nrb, interpret=True
    )
    assert got.shape == (10, 3, 40)


def test_u32_kernel_matches_exact_pipeline_interpret():
    """The uint32 kernel (TPU exact path) must reproduce the host frontend's
    noise-estimate sequence bit-for-bit (interpret mode on CPU)."""
    from multilingual_kws_tpu.ops import micro_int as mi
    from multilingual_kws_tpu.ops.pallas_frontend import noise_estimate_scan_u32

    fe = MicroFrontendJax(FrontendConfig(), use_pallas=False)
    rng = np.random.default_rng(2)
    sig = rng.integers(0, 2**24, (49, 5, 40)).astype(np.uint32)
    x = jnp.asarray(sig)

    got = np.asarray(
        noise_estimate_scan_u32(x, fe.sm_u, fe.om_u, 10, interpret=True)
    )

    def step(est, s):
        est = mi.nr_estimate_step(est, s, fe.sm_u, fe.om_u, 10)
        return est, est

    _, want = jax.lax.scan(step, jnp.zeros(x.shape[1:], jnp.uint32), x)
    np.testing.assert_array_equal(got, np.asarray(want))


def test_u32_frontend_features_with_pallas_interpret(monkeypatch):
    """Full exact frontend with the Pallas path forced (interpret mode):
    features must equal the non-Pallas exact features bit-for-bit. Covers
    both the fused window+FFT+energy kernel and the u32 NR kernel."""
    import multilingual_kws_tpu.ops.pallas_fft as pfft
    import multilingual_kws_tpu.ops.pallas_frontend as pf

    orig = pf.noise_estimate_scan_u32

    def interp(x, sm, om, smoothing_bits=10, interpret=False):
        return orig(x, sm, om, smoothing_bits, interpret=True)

    monkeypatch.setattr(pf, "noise_estimate_scan_u32", interp)

    orig_wfe = pfft.window_fft_energy

    def interp_wfe(frames, win, pr, pi, window_bits=12, interpret=False):
        return orig_wfe(frames, win, pr, pi, window_bits, interpret=True)

    monkeypatch.setattr(pfft, "window_fft_energy", interp_wfe)

    orig_cff = pfft.clip_frontend_features

    def interp_cff(*args, **kwargs):
        kwargs["interpret"] = True
        return orig_cff(*args, **kwargs)

    monkeypatch.setattr(pfft, "clip_frontend_features", interp_cff)
    rng = np.random.default_rng(3)
    batch = np.clip(rng.normal(0, 0.3, (2, 16000)), -1, 1).astype(np.float32)
    fe_pallas = MicroFrontendJax(FrontendConfig(), use_pallas=True)
    fe_scan = MicroFrontendJax(FrontendConfig(), use_pallas=False)
    got = np.asarray(fe_pallas.features(batch))
    want = np.asarray(fe_scan.features(batch))
    np.testing.assert_array_equal(got, want)


@pytest.mark.slow  # re-tiered r5: fast suite back under ~4 min (CLAUDE.md)
# 36 s interpret-mode full kernel; test_kernel_matches_lax_scan_interpret
# and test_u32_kernel_matches_exact_pipeline_interpret stay fast
def test_clip_frontend_full_kernel_bit_exact_interpret():
    """The fully-fused single-kernel frontend (framing->window->FFT->
    filterbank->Sqrt64->NR->PCAN->log in one Pallas pass,
    pallas_fft.clip_frontend_features) must equal the composed exact path
    bit-for-bit — odd batch (not a clip-tile multiple) and a non-1s clip
    length included."""
    import jax.numpy as jnp

    import multilingual_kws_tpu.ops.micro_int as mi
    from multilingual_kws_tpu.ops.micro_exact import MicroFrontend
    from multilingual_kws_tpu.ops.pallas_fft import clip_frontend_features

    fe = MicroFrontendJax(FrontendConfig(), use_pallas=False)
    host = MicroFrontend(FrontendConfig())
    t = fe.t
    kw = dict(
        window_bits=12, window_size=t.window_size, window_step=t.window_step,
        smoothing_bits=t.smoothing_bits, msr=int(t.min_signal_remaining),
        enable_pcan=bool(t.enable_pcan), snr_shift=int(t.snr_shift),
        wdf_rows=fe._wdf_rows_static, lut012=fe._lut012_static,
        enable_log=bool(t.enable_log), correction_bits=int(t.correction_bits),
        scale_shift=int(t.scale_shift), log_pairs=fe._log_pairs_static,
        interpret=True,
    )
    rng = np.random.default_rng(11)
    for b, samples in ((3, 16000),):  # odd clip lengths: slow variant below
        audio = (
            np.clip(rng.normal(0, 0.25, (b, samples)), -1, 1) * 32767
        ).round().astype(np.int16)
        want = np.asarray(
            fe._suffix(fe.base_frames(jnp.asarray(audio)))
        )
        got = np.asarray(
            clip_frontend_features(
                jnp.asarray(audio, jnp.int32), fe.window_coeffs,
                fe._fft_pr, fe._fft_pi, fe.fb_whi_f32, fe.fb_wlo_f32,
                fe.sm_u, fe.om_u, **kw,
            )
        )
        np.testing.assert_array_equal(got, want)


@pytest.mark.slow
def test_clip_frontend_full_kernel_odd_length_interpret():
    """Padding/garbage-row slicing for non-1s clip lengths (separate from
    the fast test: each interpret-mode trace of the ~1500-op kernel costs
    ~15 s on this host)."""
    import jax.numpy as jnp

    from multilingual_kws_tpu.ops.pallas_fft import clip_frontend_features

    fe = MicroFrontendJax(FrontendConfig(), use_pallas=False)
    t = fe.t
    rng = np.random.default_rng(12)
    audio = (
        np.clip(rng.normal(0, 0.25, (2, 9000)), -1, 1) * 32767
    ).round().astype(np.int16)
    want = np.asarray(fe._suffix(fe.base_frames(jnp.asarray(audio))))
    got = np.asarray(
        clip_frontend_features(
            jnp.asarray(audio, jnp.int32), fe.window_coeffs,
            fe._fft_pr, fe._fft_pi, fe.fb_whi_f32, fe.fb_wlo_f32,
            fe.sm_u, fe.om_u,
            window_bits=12, window_size=t.window_size,
            window_step=t.window_step, smoothing_bits=t.smoothing_bits,
            msr=int(t.min_signal_remaining),
            enable_pcan=bool(t.enable_pcan), snr_shift=int(t.snr_shift),
            wdf_rows=fe._wdf_rows_static, lut012=fe._lut012_static,
            enable_log=bool(t.enable_log),
            correction_bits=int(t.correction_bits),
            scale_shift=int(t.scale_shift), log_pairs=fe._log_pairs_static,
            clips_per_tile=2, interpret=True,
        )
    )
    np.testing.assert_array_equal(got, want)


@pytest.mark.slow  # re-tiered r5: fast suite back under ~4 min (CLAUDE.md)
# 18 s interpret-mode variant sweep; per-stage fast tests remain
def test_fft_stage_variants_bit_identical_interpret():
    """The three radix-4 stage formulations (ref / rot / mxu,
    pallas_fft._stage_*) must agree element-for-element — the default is
    chosen by measured speed (benchmarks/fft_variants.json), so all three
    must stay correct."""
    from multilingual_kws_tpu.ops.pallas_fft import kiss_fft_energy

    rng = np.random.default_rng(7)
    xr = jnp.asarray(rng.integers(-32768, 32768, (16, 256)), jnp.int32)
    xi = jnp.asarray(rng.integers(-32768, 32768, (16, 256)), jnp.int32)
    outs = {
        v: np.asarray(
            kiss_fft_energy(xr, xi, interpret=True, fft_variant=v)
        )
        for v in ("ref", "rot", "mxu")
    }
    np.testing.assert_array_equal(outs["ref"], outs["rot"])
    np.testing.assert_array_equal(outs["ref"], outs["mxu"])


def test_sqrt64_bisection_exact_stress():
    """sqrt64_exact's bisection against a float64 oracle over the full
    operating range, incl. exact squares and off-by-one neighbours (the
    adversarial cases for a floor sqrt with round-up bump)."""
    from multilingual_kws_tpu.ops.micro_int import sqrt64_exact

    rng = np.random.default_rng(3)
    xs = np.floor(2.0 ** rng.uniform(0, 50, 20000)).astype(np.uint64)
    roots = rng.integers(0, 1 << 25, 10000).astype(np.uint64)
    sq = roots * roots
    xs = np.concatenate(
        [xs, sq, sq + 1, np.maximum(sq, 1) - 1,
         np.array([0, 1, 2, 3, (1 << 50) - 1], np.uint64)]
    )
    hi = jnp.asarray((xs >> 32).astype(np.uint32))
    lo = jnp.asarray((xs & 0xFFFFFFFF).astype(np.uint32))
    got = np.asarray(jax.jit(sqrt64_exact)(hi, lo))

    t = np.floor(np.sqrt(xs.astype(np.float64))).astype(np.uint64)
    t = np.where(t * t > xs, t - 1, t)
    t = np.where((t + 1) ** 2 <= xs, t + 1, t)
    rem = xs - t * t
    cap = np.where(xs >> 32 == 0, 0xFFFF, 0xFFFFFFFF).astype(np.uint64)
    want = (t + ((rem > t) & (t != cap))).astype(np.uint32)
    np.testing.assert_array_equal(got, want)
