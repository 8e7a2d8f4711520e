"""Process-wide JAX configuration for raisin-tpu device kernels.

Enables the persistent compilation cache so the scan-state-machine kernels
(whose TPU compiles take tens of seconds) compile once per machine, not once
per process. Imported for effect by every module in raisin_tpu.ops.
"""

from __future__ import annotations

import os

import jax

_CACHE_DIR = os.environ.get(
    "RAISIN_TPU_JAX_CACHE", os.path.expanduser("~/.cache/raisin_tpu/jax")
)

_initialized = False


def ensure() -> None:
    global _initialized
    if _initialized:
        return
    os.makedirs(_CACHE_DIR, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    # The axon TPU plugin ignores the JAX_PLATFORMS environment variable;
    # the config key still wins, so expose a reliable platform override.
    forced = os.environ.get("RAISIN_TPU_PLATFORM")
    if forced:
        jax.config.update("jax_platforms", forced)
    _initialized = True


ensure()
