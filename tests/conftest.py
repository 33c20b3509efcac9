"""Test config: force JAX onto a virtual 8-device CPU mesh.

Multi-device sharding tests run on CPU via the standard fake-backend trick
(8 virtual host devices); the real TPU path is exercised by bench.py /
__graft_entry__.py.

NOTE: the ambient environment registers an experimental TPU-tunnel PJRT
plugin ("axon") from sitecustomize at interpreter start, which (a) bakes
JAX_PLATFORMS=axon into jax's config before this file runs, and (b) blocks
for minutes on tunnel claim if initialized. So we must use
jax.config.update (not os.environ) AND deregister the plugin factory.
"""

import os
import sys
from pathlib import Path

import jax

# 8 virtual devices share ONE physical core here: a starved worker thread
# can miss XLA:CPU's default 40 s collective rendezvous deadline, which
# hard-aborts the process (observed under load, round 3). Raise it well
# past any plausible scheduling stall. Must be set before backend init.
_flags = os.environ.get("XLA_FLAGS", "")
if "collective_call_terminate_timeout" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags
        + " --xla_cpu_collective_call_terminate_timeout_seconds=600"
        + " --xla_cpu_collective_call_warn_stuck_timeout_seconds=120"
    ).strip()

jax.config.update("jax_platforms", "cpu")
# NOTE: deliberately no persistent compilation cache here — XLA:CPU AOT
# artifacts are machine-feature-pinned and reloading them across differing
# feature detection triggers "could lead to SIGILL" loads (observed locally).
try:
    jax.config.update("jax_num_cpu_devices", 8)
except Exception:
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()

try:  # drop the tunnel-backed TPU plugin so it can never be initialized
    import jax._src.xla_bridge as _xb

    _xb._backend_factories.pop("axon", None)
except Exception:
    pass

REPO_ROOT = Path(__file__).resolve().parents[1]
if str(REPO_ROOT) not in sys.path:
    sys.path.insert(0, str(REPO_ROOT))


# ---------------------------------------------------------------------------
# slow-test gating: `pytest -q` stays fast (<2 min on the 1-core host) by
# deselecting @pytest.mark.slow tests; run the full suite with `--slow`.
# ---------------------------------------------------------------------------
import pytest  # noqa: E402


def pytest_addoption(parser):
    parser.addoption(
        "--slow",
        action="store_true",
        default=False,
        help="also run tests marked slow (full suite, ~20 min on 1 core)",
    )


def pytest_collection_modifyitems(config, items):
    if config.getoption("--slow"):
        return
    skip_slow = pytest.mark.skip(reason="slow: run with --slow")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip_slow)
