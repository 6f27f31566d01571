"""Opt-in SPMD routing for the Pallas kernels.

A ``custom_partitioning`` wrapper is required for a Pallas kernel to run
per-shard under a sharded jit (otherwise GSPMD all-gathers the operands and
runs it replicated) — but it is brutally expensive to compile: every wrapper
instance compiles its body through a separate compiler round trip with no
deduplication across call sites (measured on the v5e remote-compile path: 24
chained attention calls compile in 4 s plain vs 516 s wrapped). Single-device
jit needs no partitioning rule at all, so the wrappers are OPT-IN: the
parallel inference / sharded-training paths enable :class:`spmd_kernels`
while tracing, everything else gets the plain (fast-compiling) kernels.
"""

from __future__ import annotations

__all__ = ["spmd_kernels", "spmd_enabled"]

_ENABLED = False


class spmd_kernels:
    """Context manager: route Pallas kernels (flash attention, window dots)
    through their SPMD-partitioned wrappers while tracing a sharded jit."""

    def __init__(self, enabled: bool = True):
        self.enabled = enabled
        self._prev = None

    def __enter__(self):
        global _ENABLED
        self._prev = _ENABLED
        _ENABLED = self.enabled
        return self

    def __exit__(self, *exc):
        global _ENABLED
        _ENABLED = self._prev
        return False


def spmd_enabled() -> bool:
    return _ENABLED
