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
