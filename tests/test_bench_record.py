"""Pin the canonical one-line bench record (the driver's parse contract).

Round 3's canonical record became unparseable because bench.py's single
stdout line outgrew the driver's bounded tail capture (VERDICT r3 weak #1).
bench.py now prints exactly one compact JSON line built by
``bench.build_compact`` and writes the full nested record to
bench_full.json; these tests pin the compact line's required keys and a
hard size ceiling so the regression cannot recur silently.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import build_compact  # noqa: E402

REQUIRED_KEYS = [
    # the driver's headline contract (BASELINE.md targets)
    "metric",
    "value",
    "unit",
    "vs_baseline",
    "p50_latency_ms_batch1",
    "p50_latency_ms_batch1_onchip",
    # one scalar per sub-benchmark
    "refine_pairs_per_sec",
    "train_step_ms_onchip",
    "serving_pairs_per_sec_device_staged",
    "serving_refine_pairs_per_sec_device_staged",
    "tiled_1080p_wall_s",
    "tpu_anchor_ok",
    "export_max_flow_delta_px",
    # BASELINE.md bars adjudicated in-record (VERDICT r4 next #5)
    "meets_targets",
    # provenance
    "git_rev",
    "device",
    "full_record",
]

# the driver keeps ~2000 chars of tail; the one line must fit with margin
MAX_LINE_CHARS = 1200


def _full_record():
    """A representative full nested record (shape of bench_full.json)."""
    return {
        "metric": "image_pairs_per_sec_per_chip_560x420",
        "value": 31.668,
        "unit": "pairs/s",
        "vs_baseline": 894.74,
        "p50_latency_ms_batch1": 54.21,
        "p50_latency_ms_batch1_onchip": 28.43,
        "ms_per_batch_onchip": 126.3,
        "batch": 4,
        "slow_episode_retries": 0,
        "git_rev": "0123abc",
        "device": "TPU v5 lite0",
        "refine": {"refine_pairs_per_sec": 21.9, "stages_ms_onchip": {"backbone": 126.4}},
        "train": {"step_ms_onchip": 359.0, "complete": True},
        "serving": {
            "pairs_per_sec_sustained_device_staged": 26.68,
            "pairs_per_sec_sustained_refine_staged": 19.31,
        },
        "tiled_1080p": {"wall_s_median": 5.817, "tiles": 20},
        "tpu_anchor": {"ok": True, "max_delta": 0.0, "atol": 1e-4},
        "export": {"base": {"fp32": {"max_flow_delta_px_vs_live": 0.061}}},
        "meets_targets": {
            "throughput_vs_torch_cpu": {"target": ">=10x", "measured_x": 894.7, "pass": True},
            "p50_latency_560x420": {"target_ms": 50.0, "measured_onchip_ms": 28.43, "pass": True},
            "flow_parity_vs_reference_semantics": {"target_px": 0.1, "measured_px": 0.061, "pass": True},
        },
    }


def test_compact_has_required_keys_and_values():
    compact = build_compact(_full_record())
    for key in REQUIRED_KEYS:
        assert key in compact, f"canonical record lost required key {key!r}"
    assert compact["value"] == 31.668
    assert compact["vs_baseline"] == 894.74
    assert compact["p50_latency_ms_batch1_onchip"] == 28.43
    assert compact["refine_pairs_per_sec"] == 21.9
    assert compact["train_step_ms_onchip"] == 359.0
    assert compact["serving_refine_pairs_per_sec_device_staged"] == 19.31
    assert compact["tpu_anchor_ok"] is True
    assert compact["export_max_flow_delta_px"] == 0.061
    assert compact["full_record"] == "bench_full.json"


def test_compact_serializes_to_one_bounded_line():
    line = json.dumps(build_compact(_full_record()))
    assert "\n" not in line
    assert len(line) <= MAX_LINE_CHARS, (
        f"canonical line grew to {len(line)} chars — the driver tail-captures "
        "stdout; keep nested records in bench_full.json, not on this line"
    )
    # and it round-trips
    parsed = json.loads(line)
    assert parsed["metric"] == "image_pairs_per_sec_per_chip_560x420"


def test_compact_suppresses_stale_subrecords_and_survives_missing_ones():
    rec = _full_record()
    rec["train"]["stale"] = True
    del rec["serving"]
    del rec["export"]
    rec["tpu_anchor"] = {"ok": None, "error": "anchor skipped"}
    compact = build_compact(rec)
    assert compact["train_step_ms_onchip"] is None
    assert compact["serving_pairs_per_sec_device_staged"] is None
    assert compact["export_max_flow_delta_px"] is None
    assert compact["tpu_anchor_ok"] is None
    # headline fields unaffected
    assert compact["value"] == 31.668


def test_compact_suppresses_rev_stale_subrecords():
    """A sub-record measured before the last runtime-code commit must not be
    republished as current (VERDICT r4 weak #1 / next #2)."""
    rec = _full_record()
    rec["refine"]["stale_rev"] = True
    rec["tiled_1080p"]["stale_rev"] = True
    rec["export"]["stale_rev"] = True
    compact = build_compact(rec)
    assert compact["refine_pairs_per_sec"] is None
    assert compact["tiled_1080p_wall_s"] is None
    assert compact["export_max_flow_delta_px"] is None
    # fresh sub-records unaffected
    assert compact["train_step_ms_onchip"] == 359.0


def test_compact_carries_target_adjudication():
    compact = build_compact(_full_record())
    assert compact["meets_targets"] == {
        "throughput_vs_torch_cpu": True,
        "p50_latency_560x420": True,
        "flow_parity_vs_reference_semantics": True,
    }


def test_rev_freshness_against_real_history():
    """rev_is_fresh: fresh at HEAD, stale for unknown revs and for revs that
    predate the last runtime-code commit (uses the repo's actual history)."""
    import subprocess

    from bench_record import HERE, code_rev, git_rev, rev_is_fresh, stamp_freshness

    assert rev_is_fresh(git_rev()), "a record measured at HEAD must be fresh"
    assert not rev_is_fresh("unknown")
    assert not rev_is_fresh("")

    # the parent of the last code commit predates it -> stale
    parent = subprocess.run(
        ["git", "-C", HERE, "rev-parse", "--short", f"{code_rev()}^"],
        capture_output=True, text=True, timeout=10,
    ).stdout.strip()
    if parent:
        assert not rev_is_fresh(parent)
        stamped = stamp_freshness({"git_rev": parent, "x": 1}, "bench_x.py")
        assert stamped["stale_rev"] is True
        assert "bench_x.py" in stamped["stale_reason_rev"]

    fresh = stamp_freshness({"git_rev": git_rev(), "x": 1}, "bench_x.py")
    assert "stale_rev" not in fresh
