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

__all__ = ["device_kind", "vmem_capacity_bytes", "vmem_budget_bytes"]

_MIB = 1024 * 1024


_cached_kind: str | None = None


def device_kind() -> str:
    """Lowercased ``device_kind`` of the default backend's first device
    (e.g. ``"tpu v5 lite0"``); empty string when no device is reachable.
    Only successful probes are cached — a transiently unreachable backend
    must not pin the fallback guess for the process lifetime."""
    global _cached_kind
    if _cached_kind is not None:
        return _cached_kind
    try:
        import jax

        kind = str(jax.devices()[0].device_kind).lower()
    except Exception:
        return ""
    _cached_kind = kind
    return kind


def vmem_capacity_bytes() -> int:
    """Per-core VMEM capacity of the current backend.

    Non-TPU backends (CPU interpret-mode tests) report the v5e capacity so
    kernel-eligibility decisions match the TPU they are standing in for.
    """
    kind = device_kind()
    if "tpu" not in kind:
        return 128 * _MIB
    # Small-VMEM generations are a CLOSED list: only v2/v3/v4 ever shipped
    # with less than ~128 MiB. An unrecognized kind (a future generation, or
    # a spelling these tags miss) must fall through to the large default —
    # a pessimistic 16 MiB guess would silently disqualify the Pallas
    # attention/window kernels and regress throughput several-fold with no
    # error anywhere (round-3 review finding).
    if "v4" in kind:
        return 32 * _MIB
    if "v2" in kind or "v3" in kind:
        return 16 * _MIB
    return 128 * _MIB


def vmem_budget_bytes(fraction: float = 0.5) -> int:
    """Capacity scaled down for Mosaic's own double-buffering/spill headroom."""
    return int(vmem_capacity_bytes() * fraction)
