"""Shared provenance plumbing for the bench_* record files.

Every bench script stamps its JSON record with the git revision and a UTC
timestamp and writes it incrementally (to survive kills — see bench.py's
stale-record handling). One implementation here instead of a per-script
copy.
"""

import json
import os
import subprocess
import time

HERE = os.path.dirname(os.path.abspath(__file__))


def git_rev() -> str:
    try:
        return (
            subprocess.run(
                ["git", "-C", HERE, "rev-parse", "--short", "HEAD"],
                capture_output=True, text=True, timeout=10,
            ).stdout.strip() or "unknown"
        )
    except Exception:
        return "unknown"


# Paths whose commits invalidate cached sub-benchmark records. Docs/record
# commits (VERDICT, BENCH_*.json, the driver's end-of-round snapshot) do not.
CODE_PATHS = ("ufm_tpu", "native")


def code_rev() -> str:
    """Short rev of the last commit that touched runtime code (CODE_PATHS)."""
    try:
        return (
            subprocess.run(
                ["git", "-C", HERE, "log", "-1", "--format=%h", "--", *CODE_PATHS],
                capture_output=True, text=True, timeout=10,
            ).stdout.strip() or "unknown"
        )
    except Exception:
        return "unknown"


def rev_is_fresh(record_rev: str) -> bool:
    """True iff no runtime-code commit landed after ``record_rev``.

    A cached sub-record measured at rev R is still valid when every commit
    after R touched only docs/records — i.e. the last code commit is an
    ancestor of (or equal to) R. Strict HEAD equality would be wrong here:
    the driver's end-of-round snapshot commit always advances HEAD past the
    rev the sub-benches ran at (VERDICT r4 weak #1 / next #2).
    """
    if not record_rev or record_rev == "unknown":
        return False
    last_code = code_rev()
    if last_code == "unknown":
        return False
    try:
        return (
            subprocess.run(
                ["git", "-C", HERE, "merge-base", "--is-ancestor", last_code, record_rev],
                capture_output=True, timeout=10,
            ).returncode == 0
        )
    except Exception:
        return False


def stamp_freshness(rec: dict, name: str) -> dict:
    """Mark a cached sub-record stale when runtime code changed since it ran."""
    if isinstance(rec, dict) and not rev_is_fresh(rec.get("git_rev", "")):
        rec["stale_rev"] = True
        rec["stale_reason_rev"] = (
            f"measured at rev {rec.get('git_rev')!r} but runtime code changed since "
            f"(last code commit {code_rev()}); rerun {name}"
        )
    return rec


def load_rec(path: str) -> dict:
    if os.path.exists(path):
        with open(path) as f:
            return json.load(f)
    return {}


def save_rec(path: str, rec: dict) -> None:
    rec["git_rev"] = git_rev()
    rec["measured_at"] = time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime())
    with open(path, "w") as f:
        json.dump(rec, f, indent=1)
