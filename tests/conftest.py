"""Test config: force a deterministic 8-device CPU backend for all tests.

The axon TPU plugin ignores the JAX_PLATFORMS environment variable, so we
additionally set the config key after importing jax (before any backend
use). Device-kernel correctness is asserted against the host oracles on
CPU; the real-TPU path is exercised by bench.py and __graft_entry__.py.
"""

import os
import sys

os.environ.setdefault("JAX_PLATFORM_NAME", "cpu")
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
