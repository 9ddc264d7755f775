"""Tracing / profiling / numerical-guard utilities.

The reference has no tracing or profiling at all — only tqdm bars
(reference model/trainer.py:62,191) — and no numerical guards beyond a
swallow-and-continue try/except (model/trainer.py:162-164).  TPU-native
equivalents (SURVEY.md §5):

* ``trace`` — context manager around ``jax.profiler`` writing a TensorBoard-
  loadable trace (op/fusion timeline, HBM usage);
* ``annotate`` — ``jax.named_scope`` wrapper so model blocks are labelled in
  traces;
* ``nan_guard`` — context manager enabling ``jax_debug_nans`` (XLA traps the
  first NaN-producing op instead of training silently diverging);
* ``check_finite`` — host-side assertion on a metrics dict, the train-loop
  guard that replaces the reference's swallow-everything except.
"""

from __future__ import annotations

import contextlib
from typing import Iterator, Mapping

import jax
import numpy as np


@contextlib.contextmanager
def trace(log_dir: str) -> Iterator[None]:
    """Profile everything inside the block: ``with trace('/tmp/prof'): step()``."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """``jax.named_scope`` alias — label a model block for the profiler."""
    return jax.named_scope(name)


@contextlib.contextmanager
def nan_guard() -> Iterator[None]:
    """Trap the first NaN inside jit (debug runs; ~2× slower)."""
    prev = jax.config.jax_debug_nans
    jax.config.update("jax_debug_nans", True)
    try:
        yield
    finally:
        jax.config.update("jax_debug_nans", prev)


class NonFiniteLossError(RuntimeError):
    pass


def check_finite(metrics: Mapping[str, object], step: int | None = None) -> None:
    """Raise with the offending keys if any metric is NaN/inf.

    The train loop calls this instead of silently skipping bad batches
    (the reference's behaviour, model/trainer.py:162-164, hides divergence).
    """
    bad = [k for k, v in metrics.items() if not np.isfinite(float(v))]
    if bad:
        at = f" at step {step}" if step is not None else ""
        raise NonFiniteLossError(f"non-finite metrics{at}: {bad}")


def device_memory_stats() -> dict:
    """Per-device HBM stats where the backend exposes them."""
    out = {}
    for d in jax.devices():
        try:
            out[str(d)] = d.memory_stats()
        except Exception:
            out[str(d)] = None
    return out
