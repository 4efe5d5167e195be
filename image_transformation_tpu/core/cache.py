"""Persistent XLA compilation cache setup.

The compose programs compile once per (canvas, pad) geometry; on TPU a cold
compile is 20-100s. Enabling JAX's persistent cache makes every CLI/bench
invocation after the first start hot.
"""

from __future__ import annotations

import os


_PRUNE_MARKER = ".last_prune"


def honor_platform_env() -> None:
    """Re-assert ``JAX_PLATFORMS`` from the environment on the live config.

    This image's sitecustomize imports jax and pins the hardware platform
    before user code runs, so a subprocess launched with
    ``JAX_PLATFORMS=cpu`` in its env would still initialize the hardware
    backend on first op — and hang if the remote device server is
    unreachable/wedged. Updating the live config before the first backend
    use makes the env var mean what it says (same trick as the pytest
    conftest).
    """
    want = os.environ.get("JAX_PLATFORMS")
    if want:
        import jax

        try:
            jax.config.update("jax_platforms", want)
        except Exception as e:
            # Failing here means the backend is already initialized and the
            # env var can no longer take effect — the exact situation this
            # function exists to prevent. Say so instead of hanging mutely.
            import sys

            print(
                f"[itpu] WARNING: could not apply JAX_PLATFORMS={want!r} "
                f"to the live config ({e}); the pre-initialized backend "
                "stays active",
                file=sys.stderr,
            )


def enable_compile_cache(path: str | None = None) -> None:
    """Idempotently point JAX at a persistent compilation cache dir."""
    import jax

    honor_platform_env()
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
        # a few KB each; lookups are local. The zero thresholds mean the
        # dir grows with every new shape, so prune_cache_dir keeps it
        # bounded (daily, oldest entries first).
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass
    prune_cache_dir(cache_dir)


def prune_cache_dir(
    cache_dir: str,
    max_bytes: int | None = None,
    min_interval_s: float = 86400.0,
    force: bool = False,
) -> int:
    """Bound the persistent cache's disk footprint.

    Deletes oldest-mtime entries until the directory fits ``max_bytes``
    (default 4 GiB; override with ITPU_COMPILE_CACHE_MAX_BYTES). Runs at
    most once per ``min_interval_s`` (marker file) so steady-state startups
    don't pay a directory scan. Returns the number of files removed.
    """
    import time

    if max_bytes is None:
        max_bytes = int(
            os.environ.get("ITPU_COMPILE_CACHE_MAX_BYTES", 4 << 30)
        )
    marker = os.path.join(cache_dir, _PRUNE_MARKER)
    now = time.time()
    if not force:
        try:
            if now - os.path.getmtime(marker) < min_interval_s:
                return 0
        except OSError:
            pass
    entries = []
    total = 0
    try:
        with os.scandir(cache_dir) as it:
            for e in it:
                if e.name == _PRUNE_MARKER or not e.is_file():
                    continue
                st = e.stat()
                entries.append((st.st_mtime, st.st_size, e.path))
                total += st.st_size
    except OSError:
        return 0
    removed = 0
    if total > max_bytes:
        entries.sort()  # oldest first
        for _, size, p in entries:
            if total <= max_bytes:
                break
            try:
                os.remove(p)
                total -= size
                removed += 1
            except OSError:
                pass
    try:
        with open(marker, "w", encoding="utf-8") as f:
            f.write(str(now))
    except OSError:
        pass
    return removed
