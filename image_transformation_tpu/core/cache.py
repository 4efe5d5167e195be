"""Persistent XLA compilation cache setup.

The compose programs compile once per (canvas, pad) geometry; on TPU a cold
compile is 20-100s. Enabling JAX's persistent cache makes every CLI/bench
invocation after the first start hot.
"""

from __future__ import annotations

import os


def enable_compile_cache(path: str | None = None) -> None:
    """Idempotently point JAX at a persistent compilation cache dir."""
    import jax

    cache_dir = path or os.environ.get(
        "JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.cache/jax_itpu")
    )
    os.makedirs(cache_dir, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        # Persist EVERY compile: on tunneled dev hosts each tiny eager-op
        # compile costs ~0.5 s through the remote compile helper, and a
        # fresh process re-pays dozens of them (measured: the contact-sheet
        # step alone took 178-404 s cold vs seconds warm). Disk entries are
        # a few KB each; lookups are local.
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass
