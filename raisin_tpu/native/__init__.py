"""Native (C) host runtime: fast sequential paths sharing the exact formats.

Built from ``raisin_tpu/native/src`` with g++ at first use; registered into
the engine registry under the ``native`` backend tag via :func:`register`.
"""


def register() -> None:
    """Register native backends (called by engine.registry on import)."""
    # C fast paths are registered as they land.
    return None
