"""Difficulty probe for the hard multi-word corpus: train OUR pretrain
driver (full B0) on CPU and print the val-accuracy trajectory. Used to tune
fixture difficulty so parity accuracies land off 0 and 1 (VERDICT r2 items
1-2); not part of the test suite."""
import sys, os
sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tests")
import os

flags = os.environ.get("XLA_FLAGS", "")
if "collective_call_terminate_timeout" not in flags:
    # 8 virtual CPU devices on 1 core: raise XLA's 40 s collective
    # rendezvous abort deadline (a starved thread kills the process)
    os.environ["XLA_FLAGS"] = (
        flags
        + " --xla_cpu_collective_call_terminate_timeout_seconds=600"
        + " --xla_cpu_collective_call_warn_stuck_timeout_seconds=120"
    ).strip()

import jax
jax.config.update("jax_platforms", "cpu")
try:
    import jax._src.xla_bridge as _xb
    _xb._backend_factories.pop("axon", None)
except Exception:
    pass
jax.config.update("jax_num_cpu_devices", 8)

from pathlib import Path
import numpy as np
from helpers import make_multiword_corpus
from multilingual_kws_tpu.train.pretrain import PretrainConfig, pretrain

root = Path(sys.argv[1]) if len(sys.argv) > 1 else Path("/tmp/hardcorpus")
epochs = int(sys.argv[2]) if len(sys.argv) > 2 else 8
noise = float(sys.argv[3]) if len(sys.argv) > 3 else 0.012
clips = int(sys.argv[4]) if len(sys.argv) > 4 else 40

corpus = make_multiword_corpus(root, clips_per_word=clips, noise=noise)
cfg = PretrainConfig(
    num_labels=len(corpus["words"]) + 1,  # + silence
    batch_size=32,
    num_epochs=epochs,
    silence_percentage=10.0,
    unknown_percentage=0.0,
    shuffle_seed=0,
)
state, model, history, ds = pretrain(
    corpus["train_files"], corpus["val_files"], corpus["words"],
    corpus["bg_dir"], config=cfg, verbose=1,
)
print("val_accuracy trajectory:", [round(v, 3) for v in history["val_accuracy"]])
