"""Test config: force JAX onto a virtual 8-device CPU mesh.

Multi-device sharding tests run on CPU via
--xla_force_host_platform_device_count (the standard fake-backend trick);
the real TPU path is exercised by bench.py / __graft_entry__.py.
"""

import os
import sys
from pathlib import Path

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

REPO_ROOT = Path(__file__).resolve().parents[1]
if str(REPO_ROOT) not in sys.path:
    sys.path.insert(0, str(REPO_ROOT))
