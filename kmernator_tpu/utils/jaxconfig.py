"""JAX runtime configuration helpers.

`enable_compilation_cache()` turns on the persistent compilation cache —
through the remote-compile TPU transport a cold jit can take minutes, and
the cache makes every later process start in milliseconds.  Called by the
device-path apps and bench before their first jit.
"""
from __future__ import annotations

import os

_done = False


def enable_compilation_cache(path: str = None):
    global _done
    if _done:
        return
    _done = True
    import jax
    if path is None:
        path = os.environ.get(
            "KMERNATOR_TPU_JAX_CACHE",
            os.path.join(os.path.expanduser("~"), ".cache", "kmernator_tpu", "jax"))
    os.makedirs(path, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
    except Exception:
        pass
