"""Generate synthetic example image pairs for demos and smoke tests.

Thin wrapper around :mod:`ufm_tpu.utils.example_pairs` (kept here so
`python examples/make_example_pairs.py` works as documented and existing
imports of ``examples.make_example_pairs`` keep resolving).
"""

from __future__ import annotations

import os
import sys

try:
    from ufm_tpu.utils.example_pairs import (  # noqa: F401  (re-exports)
        PAIR_NAMES,
        generate_pairs,
        synthetic_pair,
    )
except ModuleNotFoundError:  # `python examples/make_example_pairs.py` from a checkout
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from ufm_tpu.utils.example_pairs import (  # noqa: F401
        PAIR_NAMES,
        generate_pairs,
        synthetic_pair,
    )


def main(out_dir: str | None = None) -> None:
    out_dir = out_dir or os.path.join(os.path.dirname(os.path.abspath(__file__)), "image_pairs")
    generate_pairs(out_dir)
    print(f"wrote {len(PAIR_NAMES)} synthetic pairs to {out_dir}")


if __name__ == "__main__":
    main()
