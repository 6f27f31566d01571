"""TPU hardware capability probes shared by the Pallas kernels.

The kernels in this package size their VMEM working sets for the chip they
actually run on. v5e/v5p/v6 cores carry ~128 MiB of VMEM (probed on this
project's v5e: a 100 MiB scratch compiles and runs); v4 has ~32 MiB and
v2/v3 ~16 MiB. Hardcoding the v5e number would make the single-pass
attention selection and the window-dots kernel fail to compile on older
generations, so eligibility checks and ``vmem_limit_bytes`` go through
here.
"""

from __future__ import annotations

import functools

__all__ = ["device_kind", "vmem_capacity_bytes", "vmem_budget_bytes"]

_MIB = 1024 * 1024


@functools.lru_cache(maxsize=1)
def device_kind() -> str:
    """Lowercased ``device_kind`` of the default backend's first device
    (e.g. ``"tpu v5 lite0"``); empty string when no device is reachable."""
    try:
        import jax

        return str(jax.devices()[0].device_kind).lower()
    except Exception:
        return ""


@functools.lru_cache(maxsize=1)
def vmem_capacity_bytes() -> int:
    """Per-core VMEM capacity of the current backend.

    Non-TPU backends (CPU interpret-mode tests) report the v5e capacity so
    kernel-eligibility decisions match the TPU they are standing in for.
    """
    kind = device_kind()
    if "tpu" not in kind:
        return 128 * _MIB
    if any(tag in kind for tag in ("v5 lite", "v5e", "v5p", "v5litepod", "v6")):
        return 128 * _MIB
    if "v4" in kind:
        return 32 * _MIB
    return 16 * _MIB


def vmem_budget_bytes(fraction: float = 0.5) -> int:
    """Capacity scaled down for Mosaic's own double-buffering/spill headroom."""
    return int(vmem_capacity_bytes() * fraction)
