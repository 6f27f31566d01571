"""TPU-side numerics anchor (VERDICT r3 #4).

The CPU golden suite (tests/test_golden.py) cannot see a Mosaic or XLA-TPU
update that moves only the TPU path. This script generates (``--update``)
and checks the committed TPU goldens (``tests/golden/*_tpu.npz``): the same
seeded tiny-topology forwards as the CPU goldens, computed on the real chip
with the production pallas kernels. ``bench.py`` runs the check every round
and folds the result into the canonical bench record, so TPU-only drift
fails the driver-captured record, not just an interactive run.

Usage (on a TPU host):
    python tpu_anchor.py            # check against committed goldens
    python tpu_anchor.py --update   # regenerate after an INTENTIONAL change
"""

from __future__ import annotations

import argparse
import json
import sys

ATOL = 1e-4  # same program, same backend class: drift here means the
# compiler changed the math (round-3 scale reference: the bf16
# selection-matmul default moved refined flow by up to 2.5e-2)


def main() -> int:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--update", action="store_true")
    parser.add_argument("--atol", type=float, default=ATOL)
    args = parser.parse_args()

    from bench import enable_compile_cache

    enable_compile_cache()

    import jax

    from ufm_tpu.utils.anchor import check_against_goldens, write_goldens

    backend = jax.default_backend()
    if backend != "tpu" and not {"axon"} & {d.platform for d in jax.devices()}:
        print(f"WARNING: running on backend {backend!r}, not a TPU", file=sys.stderr)

    if args.update:
        write_goldens("_tpu")
        print("wrote TPU anchor goldens (tests/golden/*_tpu.npz) — commit them")
        return 0

    try:
        deltas = check_against_goldens("_tpu", atol=args.atol)
    except AssertionError as e:
        print(json.dumps({"tpu_anchor_ok": False, "error": str(e)}))
        return 1
    print(
        json.dumps(
            {
                "tpu_anchor_ok": True,
                "max_delta": max(deltas.values()),
                "atol": args.atol,
                "per_key_max": {k: v for k, v in sorted(deltas.items(), key=lambda kv: -kv[1])[:3]},
            }
        )
    )
    return 0


if __name__ == "__main__":
    main()
