"""Persistent XLA compilation cache for every CLI entry point.

The reference pays no compile cost (eager torch); our jitted step functions
compile once per (program, shape) — minutes for the flagship step.  On a
pod, relaunches, preemption-resumes, and serving restarts should not re-pay
that, so ``config.compile_cache_dir=<dir>`` points JAX's persistent
compilation cache at a shared directory before the first trace.

**Opt-in, not default.**  The cache lives in the PJRT *client*: local
backends (CPU, directly-attached TPU) serialize compiled executables to
disk, but proxy/tunneled backends (e.g. an IFRT proxy to a remote chip —
this dev box) stall on the cache probe (measured 44 s vs 1.35 s for the
same tiny jit) and persist nothing.  The CPU-platform test suite enables it
in conftest.py and measurably benefits; the production CLI leaves it to the
deployment to turn on where the backend supports it.

Safe properties when enabled:

* the cache key includes the XLA program, compiler flags, and backend, so a
  stale entry can't be served to a different computation or chip type;
* writes are best-effort — an unwritable directory degrades to a warning
  from JAX, never an error;
* only compilations slower than ``min_compile_time_secs`` are written, so
  the cache holds the handful of big step functions, not thousands of
  one-liner jits.
"""

from __future__ import annotations

import os

_enabled: str | None = None


def enable_compile_cache(directory: str) -> str | None:
    """Point JAX's persistent compilation cache at ``directory``.

    Idempotent; expands ``~``; creates the directory.  Returns the resolved
    path, or ``None`` when ``directory`` is empty (caching disabled).  Must
    run before the first jit compilation to benefit that compilation, but is
    safe to call at any time.
    """
    global _enabled
    if not directory:
        return None
    path = os.path.abspath(os.path.expanduser(directory))
    if _enabled == path:
        return path
    os.makedirs(path, exist_ok=True)

    import jax

    jax.config.update("jax_compilation_cache_dir", path)
    # Cache every compilation that took >1 s; skip the sub-second ones
    # (metric folds, tiny reshapes) whose disk round-trip costs more than
    # recompiling.
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    _enabled = path
    return path
