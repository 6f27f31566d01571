"""Profiling helpers (the observability hooks the reference lacks; SURVEY §5).

- :func:`trace` — capture a jax.profiler trace (viewable in TensorBoard /
  Perfetto) around a code block; stage boundaries inside the model are
  annotated with ``jax.named_scope`` in models/network.py.
- :func:`timed` — wall-clock a block with a forced device sync (on platforms
  where ``block_until_ready`` is unreliable, sync happens via a scalar fetch).
"""

from __future__ import annotations

import contextlib
import time
from typing import Iterator, Optional

import numpy as np

__all__ = ["trace", "timed", "sync"]


def sync(tree) -> None:
    """Force completion of a pytree of jax arrays (value-fetch based).

    Device streams execute in dispatch order, so fetching one element of the
    last-dispatched leaf completes everything before it; used on platforms
    where ``block_until_ready`` does not actually block.
    """
    import jax

    leaves = [l for l in jax.tree.leaves(tree) if hasattr(l, "ravel")]
    if leaves:
        np.asarray(leaves[-1].ravel()[0])


@contextlib.contextmanager
def trace(log_dir: str) -> Iterator[None]:
    """Capture a jax.profiler trace into ``log_dir``."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def timed(label: str, result: Optional[dict] = None) -> Iterator[None]:
    t0 = time.perf_counter()
    try:
        yield
    finally:
        dt = time.perf_counter() - t0
        if result is not None:
            result[label] = dt
        else:
            print(f"[timed] {label}: {dt * 1e3:.2f} ms")
