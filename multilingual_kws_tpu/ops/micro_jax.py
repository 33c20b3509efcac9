"""TPU device implementation of the micro audio frontend (JAX/XLA).

On-device re-expression of the fixed-point pipeline in ops/micro_exact.py:

- framing + quantized-Hann windowing + per-frame input_shift in exact int32
- the fixed-point kiss FFT ported bit-exactly to vectorized int32 ops
  (VPU-friendly elementwise butterflies; the reference op's quantization
  noise floor on near-silent bins is load-bearing for feature parity, which
  rules out a float FFT)
- mel filterbank, Sqrt64, noise-reduction, PCAN and log scaling in TRUE
  uint32 arithmetic (ops/micro_int.py), emulating the C code's uint64
  intermediates with 16-bit limb splits; the small LUTs ride the MXU as
  exact one-hot-matmul selects

mode="exact" is **bit-exact** against the host frontend (and hence against
the golden features captured from the real TFLite op): every bin lands on
the reference uint16 grid — asserted with == in tests/test_frontend_jax.py.
(Round 1 emulated the integer stages on integer-valued float32, which lost
exactness above 2^24; that path survives only as mode="fast"'s suffix.)

Streaming: the reference rebuilds a 49x40 spectrogram per 20 ms hop
(batch_streaming_analysis.py:99-116 — one op dispatch per window, its main
throughput bottleneck). Here the stateless stages are computed ONCE per hop
over the whole stream and shared by all overlapping windows (hop == frame
stride == 320 samples), so only the cheap NR/PCAN suffix runs per window:
~49x less FFT/filterbank work.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .micro_exact import (
    FILTERBANK_BITS,
    LOG_COEFF,
    LOG_SCALE_LOG2,
    LOG_SEGMENTS_LOG2,
    NOISE_REDUCTION_BITS,
    PCAN_OUTPUT_BITS,
    PCAN_SNR_BITS,
    WINDOW_BITS,
    FrontendConfig,
    MicroFrontend,
    _LOG_LUT,
)
from . import micro_int as mi


class _KissFftrJax:
    """Bit-exact int32 port of the fixed-point kiss_fftr(512) for JAX.

    Four radix-4 stages over the 256-point complex substate plus the real
    post-stage, vectorized over arbitrary leading dims. All intermediates fit
    int32 (kiss fixed-point was designed for 32-bit accumulators: the
    C_MUL difference maxes at 2147352578 < 2^31-1).
    """

    STAGES = ((64, 1), (16, 4), (4, 16), (1, 64))

    def __init__(self):
        n = 256
        idx = np.arange(n)
        phase = -2.0 * np.pi * idx / n
        tw_r = np.floor(0.5 + 32767 * np.cos(phase)).astype(np.int32)
        tw_i = np.floor(0.5 + 32767 * np.sin(phase)).astype(np.int32)
        k = np.arange(n // 2)
        sphase = -np.pi * ((k + 1.0) / n + 0.5)
        self.stw_r = jnp.asarray(np.floor(0.5 + 32767 * np.cos(sphase)).astype(np.int32))
        self.stw_i = jnp.asarray(np.floor(0.5 + 32767 * np.sin(sphase)).astype(np.int32))
        perm = np.zeros(n, dtype=np.int32)
        for i in range(n):
            v, r = i, 0
            for _ in range(4):
                r = (r << 2) | (v & 3)
                v >>= 2
            perm[i] = r
        self.perm = jnp.asarray(perm)
        # per-stage twiddles, gathered host-side
        self.stage_tw = []
        for fstride, m in self.STAGES:
            kk = np.arange(m)
            self.stage_tw.append(
                tuple(
                    jnp.asarray(t)
                    for t in (
                        tw_r[kk * fstride], tw_i[kk * fstride],
                        tw_r[2 * kk * fstride], tw_i[2 * kk * fstride],
                        tw_r[3 * kk * fstride], tw_i[3 * kk * fstride],
                    )
                )
            )

    @staticmethod
    def _sround(x):
        return (x + (1 << 14)) >> 15

    def _bfly4(self, fr, fi, tw, m):
        tw1r, tw1i, tw2r, tw2i, tw3r, tw3i = tw
        sr = self._sround

        def fixdiv4(r, i):
            return sr(r * 8191), sr(i * 8191)

        x0r, x0i = fixdiv4(fr[..., 0 * m:1 * m], fi[..., 0 * m:1 * m])
        x1r, x1i = fixdiv4(fr[..., 1 * m:2 * m], fi[..., 1 * m:2 * m])
        x2r, x2i = fixdiv4(fr[..., 2 * m:3 * m], fi[..., 2 * m:3 * m])
        x3r, x3i = fixdiv4(fr[..., 3 * m:4 * m], fi[..., 3 * m:4 * m])

        s0r = sr(x1r * tw1r - x1i * tw1i)
        s0i = sr(x1r * tw1i + x1i * tw1r)
        s1r = sr(x2r * tw2r - x2i * tw2i)
        s1i = sr(x2r * tw2i + x2i * tw2r)
        s2r = sr(x3r * tw3r - x3i * tw3i)
        s2i = sr(x3r * tw3i + x3i * tw3r)

        s5r = x0r - s1r
        s5i = x0i - s1i
        x0r = x0r + s1r
        x0i = x0i + s1i
        s3r = s0r + s2r
        s3i = s0i + s2i
        s4r = s0r - s2r
        s4i = s0i - s2i

        o0r = x0r + s3r
        o0i = x0i + s3i
        o2r = x0r - s3r
        o2i = x0i - s3i
        o1r = s5r + s4i
        o1i = s5i - s4r
        o3r = s5r - s4i
        o3i = s5i + s4r
        return (
            jnp.concatenate([o0r, o1r, o2r, o3r], axis=-1),
            jnp.concatenate([o0i, o1i, o2i, o3i], axis=-1),
        )

    def __call__(self, frames_i32):
        """(..., 512) int32 (int16-range) -> (out_r, out_i): (..., 257) int32."""
        sr = self._sround
        xr = frames_i32[..., 0::2]
        xi = frames_i32[..., 1::2]
        fr = jnp.take(xr, self.perm, axis=-1)
        fi = jnp.take(xi, self.perm, axis=-1)
        lead = fr.shape[:-1]
        for (fstride, m), tw in zip(self.STAGES, self.stage_tw):
            groups = 256 // (4 * m)
            fr = fr.reshape(*lead, groups, 4 * m)
            fi = fi.reshape(*lead, groups, 4 * m)
            fr, fi = self._bfly4(fr, fi, tw, m)
            fr = fr.reshape(*lead, 256)
            fi = fi.reshape(*lead, 256)

        def fixdiv2(r, i):
            return sr(r * 16383), sr(i * 16383)

        tdc_r, tdc_i = fixdiv2(fr[..., 0], fi[..., 0])
        k = np.arange(1, 129)
        fpk_r, fpk_i = fixdiv2(fr[..., k], fi[..., k])
        fpnk_r, fpnk_i = fixdiv2(fr[..., 256 - k], -fi[..., 256 - k])
        f1k_r = fpk_r + fpnk_r
        f1k_i = fpk_i + fpnk_i
        f2k_r = fpk_r - fpnk_r
        f2k_i = fpk_i - fpnk_i
        twr = self.stw_r[k - 1]
        twi = self.stw_i[k - 1]
        tw_r = sr(f2k_r * twr - f2k_i * twi)
        tw_i = sr(f2k_r * twi + f2k_i * twr)

        out_r = jnp.zeros((*lead, 257), jnp.int32)
        out_i = jnp.zeros((*lead, 257), jnp.int32)
        out_r = out_r.at[..., 0].set(tdc_r + tdc_i)
        out_r = out_r.at[..., 256].set(tdc_r - tdc_i)
        out_r = out_r.at[..., k].set((f1k_r + tw_r) >> 1)
        out_i = out_i.at[..., k].set((f1k_i + tw_i) >> 1)
        out_r = out_r.at[..., 256 - k].set((f1k_r - tw_r) >> 1)
        out_i = out_i.at[..., 256 - k].set((tw_i - f1k_i) >> 1)
        return out_r, out_i


@dataclass(frozen=True)
class _Tables:
    window_coeffs: np.ndarray  # (win,) int32
    fb_matrix: np.ndarray  # (bins, channels) f32 — quantized weights
    pcan_lut: Optional[np.ndarray]  # (~126,) gain LUT (int values)
    even_smoothing: int
    odd_smoothing: int
    min_signal_remaining: int
    smoothing_bits: int
    snr_shift: int
    correction_bits: int
    scale_shift: int
    enable_pcan: bool
    enable_log: bool
    pcan_offset: float
    pcan_strength: float
    gain_bits: int
    window_size: int
    window_step: int
    num_channels: int


def _build_tables(config: FrontendConfig) -> _Tables:
    host = MicroFrontend(config)
    win = host.window_size
    nfft = host.fft_size
    bins = host.spectrum_size

    # combined filterbank matrix: channel c = unweights(band c) + weights(band c+1)
    fb = host.fb
    nch = config.num_channels
    mat = np.zeros((bins, nch), dtype=np.float64)
    for c in range(nch):
        s0, w0 = fb.band_starts[c], fb.band_widths[c]
        mat[s0 : s0 + w0, c] += fb.unweights[c]
        s1, w1 = fb.band_starts[c + 1], fb.band_widths[c + 1]
        mat[s1 : s1 + w1, c] += fb.weights[c + 1]

    return _Tables(
        window_coeffs=host.window_coeffs.astype(np.int32),
        fb_matrix=mat.astype(np.float32),
        pcan_lut=(
            host.pcan_lut.astype(np.float32) if config.enable_pcan else None
        ),
        even_smoothing=host.even_smoothing,
        odd_smoothing=host.odd_smoothing,
        min_signal_remaining=host.min_signal_remaining,
        smoothing_bits=config.smoothing_bits,
        snr_shift=host.snr_shift,
        correction_bits=host.correction_bits,
        scale_shift=config.scale_shift,
        enable_pcan=config.enable_pcan,
        enable_log=config.enable_log,
        pcan_offset=config.pcan_offset,
        pcan_strength=config.pcan_strength,
        gain_bits=config.gain_bits,
        window_size=win,
        window_step=host.window_step,
        num_channels=nch,
    )


class MicroFrontendJax:
    """Jittable batched micro frontend.

    ``features(audio)`` : (..., samples) float in [-1, 1] -> (..., F, C)
    float32 features on the reference 10/256 scale (matching
    to_micro_spectrogram, reference input_data.py:19-35).
    """

    def __init__(
        self,
        config: FrontendConfig = FrontendConfig(),
        quantize: bool = True,
        dtype=jnp.float32,
        use_pallas: Optional[bool] = None,
        mode: str = "exact",
        fft_variant: Optional[str] = None,
    ):
        """mode="exact": int32 kiss FFT path, >=99.9% of bins on the
        reference op's grid (default — required for parity with reference
        checkpoints/evals). mode="fast": float rFFT path — the fixed-point
        FFT emulation is the frontend's dominant TPU cost, and the float DFT
        equals the kiss output / 512 up to quantization noise (energy scale
        1/512^2, calibrated); features land within ~1-2 grid steps except on
        near-silent bins. Use for training/augmentation throughput.
        """
        assert mode in ("exact", "fast"), mode
        self.mode = mode
        self.config = config
        self.quantize = quantize
        self.dtype = dtype
        # Pallas NR-scan kernel: TPU only (CPU/tests take the identical
        # lax.scan path; interpret-mode pallas would be needlessly slow)
        self.use_pallas = (
            jax.default_backend() == "tpu" if use_pallas is None else use_pallas
        )
        # radix-4 stage formulation inside the Pallas kernels ("ref" |
        # "rot" | "mxu" — all bit-identical; see pallas_fft._stage_*)
        from .pallas_fft import DEFAULT_FFT_VARIANT

        self.fft_variant = fft_variant or DEFAULT_FFT_VARIANT
        self.kiss = _KissFftrJax()
        t = _build_tables(config)
        self.t = t
        self.window_coeffs = jnp.asarray(t.window_coeffs)
        self.fb_matrix = jnp.asarray(t.fb_matrix)
        ch = np.arange(t.num_channels)
        self.smoothing = jnp.asarray(
            np.where(ch % 2 == 0, t.even_smoothing, t.odd_smoothing).astype(
                np.float32
            )
        )
        # integer (bit-exact) tables for mode="exact" — see ops/micro_int.py
        host = MicroFrontend(config)
        fbi = mi.build_filterbank_int(host.fb, config.num_channels)
        self.fb_idx = jnp.asarray(fbi.idx)
        self.fb_wgt_u = jnp.asarray(fbi.wgt.astype(np.uint32))
        w_hi, w_lo = mi.build_filterbank_limb_matrices(fbi, host.spectrum_size)
        self.fb_whi_f32 = jnp.asarray(w_hi)
        self.fb_wlo_f32 = jnp.asarray(w_lo)
        # input permutation matrices for the fused Pallas frontend kernel:
        # even/odd complex-substate split + base-4 digit reversal as exact
        # f32 one-hot matmuls (ops/pallas_fft.py)
        from .pallas_fft import build_perm_matrices

        pr, pi = build_perm_matrices(t.window_size)
        self._fft_pr = jnp.asarray(pr)
        self._fft_pi = jnp.asarray(pi)
        self.sm_u = jnp.asarray(
            np.where(ch % 2 == 0, t.even_smoothing, t.odd_smoothing).astype(
                np.uint32
            )
        )
        self.om_u = jnp.asarray(
            ((1 << NOISE_REDUCTION_BITS) - np.asarray(self.sm_u)).astype(np.uint32)
        )
        self.msr_u = jnp.uint32(t.min_signal_remaining)
        if config.enable_pcan:
            wdf_rows, lut012 = mi.build_wdf_tables(host.pcan_lut)
            self.wdf_rows_f32 = jnp.asarray(wdf_rows.astype(np.float32))
            self.lut012_i32 = jnp.asarray(lut012)
            # static immediates for the fully-fused Pallas kernel's
            # where-chain LUT selects (ops/pallas_fft.clip_frontend_features)
            self._wdf_rows_static = tuple(map(tuple, wdf_rows.tolist()))
            self._lut012_static = tuple(lut012.tolist())
        else:
            self._wdf_rows_static = ()
            self._lut012_static = ()
        self.log_pairs_f32 = jnp.asarray(mi._LOG_PAIRS_F32)
        self._log_pairs_static = tuple(
            map(tuple, mi._LOG_PAIRS_F32.astype(np.int64).tolist())
        )
        # jitted entry points (shape-polymorphic via retrace per shape)
        self._features_jit = jax.jit(self._features_impl)
        self._features_i16_jit = jax.jit(self._features_from_int16_impl)
        self._stream_jit = jax.jit(
            self._stream_impl, static_argnames=("num_windows",)
        )

    # -- stateless stages ----------------------------------------------------

    def _frame_indices(self, num_samples: int) -> np.ndarray:
        t = self.t
        if num_samples < t.window_size:
            return np.zeros((0, t.window_size), np.int32)
        nf = 1 + (num_samples - t.window_size) // t.window_step
        return (
            np.arange(nf)[:, None] * t.window_step + np.arange(t.window_size)
        ).astype(np.int32)

    def base_frames(self, audio_int16: jnp.ndarray) -> jnp.ndarray:
        """(..., samples) int -> (..., F, C) sqrt-filterbank signal values.

        The stateless prefix of the pipeline: framing, exact int32 windowing,
        per-frame input_shift, int32 kiss FFT, then (mode="exact") the exact
        uint32 filterbank accumulate + Sqrt64 — returns uint32 — or
        (mode="fast") a float MXU-matmul filterbank — returns float32.
        """
        if self.mode == "fast":
            return self._base_frames_fast(audio_int16)
        t = self.t
        if self.use_pallas:
            # Fully fused Pallas frontend kernel (ops/pallas_fft.py):
            # windowing, input_shift, input permutation, all four FFT
            # stages and the bin energies run on one VMEM-resident tile.
            # Framing itself is gather-free: reshape to step-sized rows and
            # concatenate adjacent rows (window <= 2*step).
            from .pallas_fft import window_fft_energy

            audio = audio_int16.astype(jnp.int32)
            lead = audio.shape[:-1]
            T = audio.shape[-1]
            win, step = t.window_size, t.window_step
            assert win <= 2 * step, (win, step)
            nf = 1 + (T - win) // step if T >= win else 0
            if nf == 0:
                return jnp.zeros((*lead, 0, t.num_channels), jnp.uint32)
            pad_to = (nf + 1) * step
            if pad_to > T:
                audio = jnp.pad(
                    audio, [(0, 0)] * len(lead) + [(0, pad_to - T)]
                )
            else:
                audio = audio[..., :pad_to]
            a3 = audio.reshape(*lead, nf + 1, step)
            frames = jnp.concatenate(
                [a3[..., :nf, :], a3[..., 1 : nf + 1, :]], axis=-1
            )[..., :win]
            energy_flat, shift_flat = window_fft_energy(
                frames.reshape(-1, win),
                self.window_coeffs,
                self._fft_pr,
                self._fft_pi,
                window_bits=WINDOW_BITS,
                fft_variant=self.fft_variant,
            )
            energy_u = energy_flat.reshape(*lead, nf, 257)
            shift = shift_flat.reshape(*lead, nf).astype(jnp.int32)
        else:
            idx = self._frame_indices(audio_int16.shape[-1])
            frames = jnp.take(
                audio_int16.astype(jnp.int32), jnp.asarray(idx), axis=-1
            )
            # exact integer windowing: (x * w) >> 12 (arithmetic shift); the
            # result always fits int16 (|x| <= 32767, w <= 4096)
            windowed = (frames * self.window_coeffs) >> WINDOW_BITS
            # per-frame input_shift normalization (frontend.c), then the
            # bit-exact int32 kiss FFT
            max_abs = jnp.abs(windowed).max(axis=-1).astype(jnp.uint32)
            shift = jnp.clip(15 - mi.msb32(max_abs).astype(jnp.int32), 0, 15)
            scaled = windowed << shift[..., None]
            pad = t.window_size
            fft_in = jnp.concatenate(
                [scaled, jnp.zeros((*scaled.shape[:-1], 512 - pad), jnp.int32)],
                axis=-1,
            )
            fr, fi = self.kiss(fft_in)
            # uint32 energy with C wrap semantics (int16 design range)
            fr_u = fr.astype(jnp.uint32)
            fi_u = fi.astype(jnp.uint32)
            energy_u = fr_u * fr_u + fi_u * fi_u
        # exact 64-bit filterbank accumulate as six f32 limb matmuls (MXU;
        # ~4x the gather variant's throughput on TPU), then exact Sqrt64
        h, l = mi.filterbank_accumulate_mxu(
            energy_u, self.fb_whi_f32, self.fb_wlo_f32
        )
        return mi.sqrt64_exact(h, l) >> shift[..., None].astype(jnp.uint32)

    def _base_frames_fast(self, audio_int16: jnp.ndarray) -> jnp.ndarray:
        """Float rFFT stateless prefix (mode="fast"): same windowing on the
        quantized Hann coefficients, float DFT (== kiss output / 512 up to
        quantization), MXU filterbank matmul, float sqrt. No per-frame
        input_shift needed — the exact path's shift cancels through
        (<<shift ... >>shift) in real arithmetic."""
        t = self.t
        idx = self._frame_indices(audio_int16.shape[-1])
        frames = jnp.take(
            audio_int16.astype(jnp.float32), jnp.asarray(idx), axis=-1
        )
        window = self.window_coeffs.astype(jnp.float32) / float(1 << WINDOW_BITS)
        windowed = frames * window
        pad = [(0, 0)] * (windowed.ndim - 1) + [(0, 512 - t.window_size)]
        X = jnp.fft.rfft(jnp.pad(windowed, pad), axis=-1)
        energy = (jnp.real(X) ** 2 + jnp.imag(X) ** 2) * np.float32(1.0 / 512.0**2)
        fbank = jnp.matmul(
            energy.astype(jnp.float32), self.fb_matrix,
            preferred_element_type=jnp.float32,
        )
        return jnp.sqrt(jnp.maximum(fbank, 0.0))

    # -- stateful suffix -----------------------------------------------------

    def nr_pcan_log_int(self, signal_u32: jnp.ndarray) -> jnp.ndarray:
        """(..., F, C) uint32 sqrt-filterbank -> (..., F, C) uint32 features.

        Bit-exact uint32 stateful suffix (mode="exact"): the noise-estimate
        recurrence runs as a lax.scan (CPU) or a Pallas kernel holding the
        whole frame loop in VMEM (TPU); subtraction, PCAN gain and log then
        run vectorized over all frames (ops/micro_int.py semantics notes).
        """
        t = self.t
        x = jnp.moveaxis(signal_u32, -2, 0)  # (F, ..., C)
        if self.use_pallas:
            from .pallas_frontend import noise_estimate_scan_u32

            x3 = x.reshape(x.shape[0], -1, x.shape[-1])
            est_seq = noise_estimate_scan_u32(
                x3, self.sm_u, self.om_u, t.smoothing_bits
            ).reshape(x.shape)
        else:

            def step(est, sig):
                est = mi.nr_estimate_step(
                    est, sig, self.sm_u, self.om_u, t.smoothing_bits
                )
                return est, est

            est0 = jnp.zeros(x.shape[1:], jnp.uint32)
            _, est_seq = jax.lax.scan(step, est0, x)

        nr = mi.nr_subtract(x, est_seq, self.msr_u, t.smoothing_bits)
        if t.enable_pcan:
            gain = mi.wide_dynamic_function(
                est_seq, self.wdf_rows_f32, self.lut012_i32
            )
            out = mi.pcan_gain(nr, gain, t.snr_shift)
        else:
            out = nr
        if t.enable_log:
            out = mi.log_scale_int(
                out, t.correction_bits, t.scale_shift, self.log_pairs_f32
            )
        else:
            out = jnp.minimum(out, jnp.uint32(0xFFFF))
        return jnp.moveaxis(out, 0, -2)

    def nr_pcan_log(self, fbank: jnp.ndarray) -> jnp.ndarray:
        """(..., F, C) sqrt-filterbank -> (..., F, C) final feature values.

        Float (integer-valued f32) suffix used by mode="fast" — exact below
        2^24, approximate above; mode="exact" takes nr_pcan_log_int.

        Only the noise-estimate recurrence is sequential; the scan carries
        just est_t (one multiply-add + floor per frame) and emits the
        estimate sequence, then subtraction, PCAN gain (wide-dynamic
        function) and log run VECTORIZED over all frames at once — the LUT
        gathers happen once on the full (F, B, C) tensor instead of once
        per scan step (was the dominant TPU cost, ~55 ms -> few ms at
        bs 256).
        """
        t = self.t
        sb = float(1 << t.smoothing_bits)
        nrb = float(1 << NOISE_REDUCTION_BITS)
        sm = self.smoothing
        om = nrb - sm

        # WDF table indexed by interval (<=32 distinct rows): gathers over
        # the full (F, B, C) tensor are scalar-slow on TPU, so the lookup is
        # a one-hot matmul onto the MXU instead.
        if t.enable_pcan:
            np_lut = np.asarray(t.pcan_lut, np.float32)
            rows = []
            for interval in range(1, 33):
                base_i = min(max(4 * interval - 6, 0), len(np_lut) - 3)
                rows.append([np_lut[base_i], np_lut[base_i + 1], np_lut[base_i + 2]])
            wdf_table = jnp.asarray(np.asarray(rows, np.float32))  # (32, 3)
            lut012 = jnp.asarray(np_lut[:3])

        def wide_dynamic_function(x):
            """Exact emulation of the integer gain LUT interpolation
            (pcan_gain_control.c WideDynamicFunction) on integer-valued f32."""
            xs = jnp.maximum(x, 1.0)
            interval = jnp.floor(jnp.log2(xs)) + 1.0  # MostSignificantBit32
            # frac: the 10 bits below the leading bit -> x scaled to [1024,2048)
            scaled = xs * jnp.exp2(11.0 - interval)
            scaled = jnp.floor(scaled)  # exact for interval<=11; floor-div above
            frac = scaled - 1024.0
            onehot = jax.nn.one_hot(
                interval.astype(jnp.int32) - 1, 32, dtype=jnp.float32
            )
            l0, l1, l2 = jnp.moveaxis(
                jnp.matmul(onehot, wdf_table, preferred_element_type=jnp.float32),
                -1, 0,
            )
            r = jnp.floor(l2 * frac / 32.0)
            r = r + l1 * 32.0
            r = r * frac
            r = jnp.floor((r + 16384.0) / 32768.0)
            r = r + l0
            small = x <= 2.0
            lut_small = jnp.where(
                x < 1.0, lut012[0], jnp.where(x < 2.0, lut012[1], lut012[2])
            )
            return jnp.where(small, lut_small, r)

        # Noise-estimate recurrence est_t = floor((up_t*sm + est_{t-1}*om)/2^14)
        # — the only sequential piece. On TPU it runs as a Pallas kernel
        # (the whole 49-step loop inside one VMEM-resident kernel; a
        # lax.scan here was pure loop-dispatch latency, ~37 ms at bs 256).
        # CPU/tests use the identical-semantics lax.scan.
        x = jnp.moveaxis(fbank, -2, 0)
        if self.use_pallas:
            from .pallas_frontend import noise_estimate_scan

            est_seq = noise_estimate_scan(x, sm, om, sb, nrb)
        else:
            def step(est, sig):
                est = jnp.floor((sig * sb * sm + est * om) / nrb)
                return est, est

            est0 = jnp.zeros(x.shape[1:], dtype=x.dtype)
            _, est_seq = jax.lax.scan(step, est0, x)

        # everything below is pointwise in (sig_t, est_t): full-tensor ops
        up = x * sb
        subtracted = jnp.floor(jnp.maximum(up - est_seq, 0.0) / sb)
        floor_ = jnp.floor(x * t.min_signal_remaining / nrb)
        nr = jnp.maximum(subtracted, floor_)
        if t.enable_pcan:
            gain = wide_dynamic_function(est_seq)
            snr = jnp.floor(nr * gain / float(1 << t.snr_shift))
            big = snr >= float(2 << PCAN_SNR_BITS)
            small_val = jnp.floor(
                snr * snr / float(1 << (2 + 2 * PCAN_SNR_BITS - PCAN_OUTPUT_BITS))
            )
            big_val = jnp.floor(
                snr / float(1 << (PCAN_SNR_BITS - PCAN_OUTPUT_BITS))
            ) - float(1 << PCAN_OUTPUT_BITS)
            ys = jnp.where(big, big_val, small_val)
        else:
            ys = nr
        out = jnp.moveaxis(ys, 0, -2)

        if t.enable_log:
            # exact emulation of log_scale.c Log() on integer-valued f32;
            # the segment-LUT lookup is a one-hot matmul (MXU) — a gather
            # over the full tensor was the dominant TPU cost here.
            n_seg = 1 << LOG_SEGMENTS_LOG2
            lut_np = _LOG_LUT.astype(np.float32)
            log_pairs = jnp.asarray(
                np.stack([lut_np[: n_seg + 1], lut_np[1 : n_seg + 2]], axis=1)
            )  # (129, 2)
            v = out * float(1 << t.correction_bits)
            vs = jnp.maximum(v, 1.0)
            integer = jnp.floor(jnp.log2(vs))
            frac0 = vs - jnp.exp2(integer)
            frac = jnp.where(
                integer < LOG_SCALE_LOG2,
                frac0 * jnp.exp2(LOG_SCALE_LOG2 - integer),
                jnp.floor(frac0 / jnp.exp2(integer - LOG_SCALE_LOG2)),
            )
            seg_unit = float(1 << (LOG_SCALE_LOG2 - LOG_SEGMENTS_LOG2))  # 512
            base_seg = jnp.floor(frac / seg_unit)
            onehot = jax.nn.one_hot(
                base_seg.astype(jnp.int32), n_seg + 1, dtype=jnp.float32
            )
            c0, c1 = jnp.moveaxis(
                jnp.matmul(onehot, log_pairs, preferred_element_type=jnp.float32),
                -1, 0,
            )
            rel = jnp.floor((c1 - c0) * (frac - seg_unit * base_seg) / 65536.0)
            fraction = frac + c0 + rel
            log2v = integer * 65536.0 + fraction
            rnd = 32768.0
            loge = jnp.floor((float(LOG_COEFF) * log2v + rnd) / 65536.0)
            logged = jnp.floor(
                (loge * float(1 << t.scale_shift) + rnd) / 65536.0
            )
            out = jnp.where(v > 0, logged, 0.0)
            out = jnp.minimum(out, 65535.0)
        else:
            out = jnp.minimum(out, 65535.0)
        if self.quantize:
            out = jnp.round(out)
        return out

    # -- public entry points ---------------------------------------------------

    def _suffix(self, base: jnp.ndarray) -> jnp.ndarray:
        if self.mode == "exact":
            return self.nr_pcan_log_int(base)
        return self.nr_pcan_log(base)

    def _features_from_int16_impl(self, audio_int16: jnp.ndarray) -> jnp.ndarray:
        raw = self._raw_features_int(audio_int16)
        return raw.astype(jnp.float32) * np.float32(10.0 / 256.0)

    def _raw_features_int(self, audio_int16: jnp.ndarray) -> jnp.ndarray:
        """(..., samples) -> (..., F, C) integer-valued features (pre-scale).

        On TPU in exact mode, clip-scale audio takes the fully-fused Pallas
        kernel (ops/pallas_fft.clip_frontend_features): the ENTIRE frontend
        — framing, windowing, FFT, filterbank, Sqrt64, noise reduction,
        PCAN, log — in one VMEM pass, bit-exact. Other shapes/modes
        compose base_frames + the suffix."""
        t = self.t
        samples = audio_int16.shape[-1]
        rows_per_clip = (
            2 + (samples - t.window_size) // t.window_step
            if samples >= t.window_size
            else 0
        )
        # Pallas gate: the tile must fit scoped VMEM (pallas_fft.MAX_TILE_ROWS,
        # ~2 s clips with the 8-aligned tile_clips); longer audio composes
        # base_frames + the suffix instead (the same path streaming uses,
        # equally bit-exact).
        from .pallas_fft import MAX_TILE_ROWS, clip_frontend_features, tile_clips

        if (
            self.use_pallas
            and self.mode == "exact"
            and t.window_size <= 2 * t.window_step
            and 0 < rows_per_clip
            and rows_per_clip * tile_clips(rows_per_clip) <= MAX_TILE_ROWS
        ):
            lead = audio_int16.shape[:-1]
            flat = audio_int16.reshape(-1, samples).astype(jnp.int32)
            raw = clip_frontend_features(
                flat,
                self.window_coeffs, self._fft_pr, self._fft_pi,
                self.fb_whi_f32, self.fb_wlo_f32, self.sm_u, self.om_u,
                window_bits=WINDOW_BITS,
                window_size=t.window_size,
                window_step=t.window_step,
                smoothing_bits=t.smoothing_bits,
                msr=int(t.min_signal_remaining),
                enable_pcan=bool(t.enable_pcan),
                snr_shift=int(t.snr_shift),
                wdf_rows=self._wdf_rows_static,
                lut012=self._lut012_static,
                enable_log=bool(t.enable_log),
                correction_bits=int(t.correction_bits),
                scale_shift=int(t.scale_shift),
                log_pairs=self._log_pairs_static,
                fft_variant=self.fft_variant,
            )
            return raw.reshape(*lead, *raw.shape[1:])
        return self._suffix(self.base_frames(audio_int16))

    def features_from_int16(self, audio_int16: jnp.ndarray) -> jnp.ndarray:
        """(..., samples) int16/int32 -> (..., F, C) f32, reference 10/256 scale."""
        return self._features_i16_jit(audio_int16)

    def _features_impl(self, audio_float: jnp.ndarray) -> jnp.ndarray:
        i16 = jnp.clip(
            jnp.trunc(audio_float * 32768.0), -32768.0, 32767.0
        ).astype(jnp.int32)
        return self.features_from_int16(i16)

    def features(self, audio_float: jnp.ndarray) -> jnp.ndarray:
        """(..., samples) float waveform in [-1, 1] -> (..., F, C) features.

        Matches to_micro_spectrogram: saturating float->int16 cast then
        frontend, scaled by 10/256. Jit-compiled (cached per input shape).
        """
        return self._features_jit(audio_float)

    def stream_features(self, audio_int16: jnp.ndarray, num_windows: int) -> jnp.ndarray:
        """Long audio (samples,) -> (num_windows, F, C) per-window features.

        Stateless stages computed once for the whole stream; per-window
        NR/PCAN state restarts at each window start exactly like the
        reference's independent to_micro_spectrogram calls
        (batch_streaming_analysis.py:108-116). Jit-compiled.
        """
        return self._stream_jit(audio_int16, num_windows=num_windows)

    def _stream_impl(self, audio_int16: jnp.ndarray, num_windows: int) -> jnp.ndarray:
        t = self.t
        # frames per 1 s clip (desired_samples = sample_rate for 1000 ms)
        clip_frames = 1 + (self.config.sample_rate - t.window_size) // t.window_step
        base = self.base_frames(audio_int16)  # (T, C)
        idx = np.arange(num_windows)[:, None] + np.arange(clip_frames)[None, :]
        windows = base[jnp.asarray(idx.astype(np.int32))]  # (W, F, C)
        raw = self._suffix(windows)
        return raw.astype(jnp.float32) * np.float32(10.0 / 256.0)


@functools.lru_cache(maxsize=4)
def default_frontend(quantize: bool = True) -> MicroFrontendJax:
    return MicroFrontendJax(FrontendConfig(), quantize=quantize)


@functools.lru_cache(maxsize=4)
def cached_stream_frontend(sample_rate: int = 16000) -> MicroFrontendJax:
    """Process-cached frontend for streaming callers. The jitted stream
    program is cached PER INSTANCE (self._stream_jit); constructing a fresh
    MicroFrontendJax per stream re-traces the whole multi-thousand-window
    program and re-fetches its executable through the tunnel — measured
    ~9 s of the old 10 s config-5 wall (benchmarks/
    stream_cost_decomposition.json). Reusing one instance keeps repeat
    streams of the same shape at device speed."""
    return MicroFrontendJax(FrontendConfig(sample_rate=sample_rate))
