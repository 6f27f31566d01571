"""Hardware-capability probe: the VMEM capacity table that gates Pallas
kernel eligibility (ops/tpu_caps.py).

The small-VMEM generations are a CLOSED list (v2/v3 ~16 MiB, v4 ~32 MiB);
everything else — v5e/v5p/v6, future generations, unrecognized spellings —
must resolve to the large capacity. Round-3 review finding: the previous
catch-all returned 16 MiB, which would silently disqualify the attention and
window-dots kernels (several-fold throughput regression, no error) on any
device_kind string the tag list didn't anticipate.
"""

import pytest

import ufm_tpu.ops.tpu_caps as caps

_MIB = 1024 * 1024


@pytest.mark.parametrize(
    "kind,capacity_mib",
    [
        ("tpu v5 lite0", 128),
        ("tpu v5e", 128),
        ("tpu v5p", 128),
        ("tpu v6 lite", 128),
        ("tpu v4", 32),
        ("tpu v3", 16),
        ("tpu v2", 16),
        # unrecognized TPU kinds fall through LARGE, never to the 16 MiB guess
        ("tpu v5", 128),
        ("tpu v7x", 128),
        ("tpu7x", 128),
        # non-TPU backends (CPU interpret-mode tests) stand in for the v5e
        ("cpu", 128),
        ("", 128),
    ],
)
def test_capacity_table(monkeypatch, kind, capacity_mib):
    monkeypatch.setattr(caps, "device_kind", lambda: kind)
    assert caps.vmem_capacity_bytes() == capacity_mib * _MIB


def test_budget_scales_capacity(monkeypatch):
    monkeypatch.setattr(caps, "device_kind", lambda: "tpu v4")
    assert caps.vmem_budget_bytes(0.5) == 16 * _MIB


def test_failed_probe_not_cached(monkeypatch):
    """A transiently unreachable backend ('' kind) must not pin the fallback
    for the process lifetime — only successful probes are cached."""
    monkeypatch.setattr(caps, "_cached_kind", None)

    import jax

    real_devices = jax.devices
    calls = {"n": 0}

    def fake_devices():
        calls["n"] += 1
        if calls["n"] == 1:
            raise RuntimeError("backend unreachable")
        return real_devices()

    monkeypatch.setattr(jax, "devices", fake_devices)
    assert caps.device_kind() == ""  # failure: empty, NOT cached
    assert caps._cached_kind is None
    kind = caps.device_kind()  # second probe succeeds and caches
    assert kind == real_devices()[0].device_kind.lower()
    assert caps._cached_kind == kind
