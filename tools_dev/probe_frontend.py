"""Dev probe: compare micro_exact against the real TFLite microfrontend op,
stage by stage, to drive the implementation to bit-exactness.

Run: python tools_dev/probe_frontend.py
"""
import numpy as np
import sys

sys.path.insert(0, ".")

from multilingual_kws_tpu.ops.micro_exact import MicroFrontend, FrontendConfig

import tensorflow as tf
from tensorflow.lite.experimental.microfrontend.python.ops import (
    audio_microfrontend_op as frontend_op,
)


def tf_frontend(audio_i16, **kw):
    out = frontend_op.audio_microfrontend(
        tf.constant(audio_i16),
        sample_rate=16000,
        window_size=30,
        window_step=20,
        num_channels=40,
        out_scale=1,
        out_type=tf.float32,
        **kw,
    )
    return out.numpy()


def mk_audio(kind, n=16000, seed=0):
    rng = np.random.default_rng(seed)
    t = np.arange(n) / 16000.0
    if kind == "zeros":
        x = np.zeros(n)
    elif kind == "sine":
        x = 0.5 * np.sin(2 * np.pi * 440 * t)
    elif kind == "loud_sine":
        x = 0.999 * np.sin(2 * np.pi * 1000 * t)
    elif kind == "noise":
        x = rng.normal(0, 0.1, n)
    elif kind == "quiet_noise":
        x = rng.normal(0, 0.001, n)
    elif kind == "chirp":
        x = 0.3 * np.sin(2 * np.pi * (200 + 3000 * t) * t)
    elif kind == "impulses":
        x = np.zeros(n)
        x[::1000] = 0.9
    elif kind == "mix":
        x = 0.2 * np.sin(2 * np.pi * 300 * t) + rng.normal(0, 0.05, n)
    x = np.clip(x, -1.0, 1.0)
    return (x * 32768.0).astype(np.int64).astype(np.int16)


def compare(name, mine, ref):
    mine = mine.astype(np.float64)
    ref = ref.astype(np.float64)
    if mine.shape != ref.shape:
        print(f"  {name}: SHAPE MISMATCH {mine.shape} vs {ref.shape}")
        return False
    diff = np.abs(mine - ref)
    n_bad = (diff > 0).sum()
    if n_bad == 0:
        print(f"  {name}: EXACT ({ref.shape})")
        return True
    print(
        f"  {name}: {n_bad}/{ref.size} differ, maxdiff={diff.max()}, "
        f"first bad idx={np.argwhere(diff > 0)[0]}"
    )
    bad = np.argwhere(diff > 0)[0]
    print(f"    mine={mine[tuple(bad)]}, ref={ref[tuple(bad)]}")
    return False


KINDS = ["zeros", "sine", "loud_sine", "noise", "quiet_noise", "chirp", "impulses", "mix"]

for kind in KINDS:
    audio = mk_audio(kind)
    print(f"== {kind} ==")

    # stage A: window+fft+filterbank+sqrt (NR disabled via min_signal_remaining=1)
    ref_a = tf_frontend(
        audio, enable_pcan=False, enable_log=False, min_signal_remaining=1.0
    )
    fe_a = MicroFrontend(
        FrontendConfig(enable_pcan=False, enable_log=False, min_signal_remaining=1.0)
    )
    compare("A fbank", fe_a(audio), ref_a)

    # stage B: + noise reduction
    ref_b = tf_frontend(audio, enable_pcan=False, enable_log=False)
    fe_b = MicroFrontend(FrontendConfig(enable_pcan=False, enable_log=False))
    compare("B nr   ", fe_b(audio), ref_b)

    # stage C: + pcan
    ref_c = tf_frontend(audio, enable_log=False)
    fe_c = MicroFrontend(FrontendConfig(enable_log=False))
    compare("C pcan ", fe_c(audio), ref_c)

    # stage D: full
    ref_d = tf_frontend(audio)
    fe_d = MicroFrontend(FrontendConfig())
    compare("D full ", fe_d(audio), ref_d)
