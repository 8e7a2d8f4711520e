"""Test config: force a deterministic 8-device CPU mesh for JAX-based tests.

Must run before any jax import (pytest loads conftest first). Device-kernel
correctness is asserted against the host oracles on CPU; the real-TPU path is
exercised by bench.py and __graft_entry__.py.
"""

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
