"""Evaluation harness: EPE / outlier metrics over image-pair datasets.

The reference defers all benchmarking code to a future release
(README.md:24-25); this module provides the TPU framework's evaluation layer:

- per-pair and aggregate metrics: EPE (mean/median), Sintel-style accuracy
  thresholds (<1px, <3px, <5px), KITTI-style Fl outlier rate, covisibility
  precision/recall at 0.5;
- dataset walkers for directory layouts with .flo / KITTI png / .npy ground
  truth (ufm_tpu.utils.flow_io), including the bundled synthetic pairs
  (examples/make_example_pairs.py) which carry analytic ground truth.
"""

from __future__ import annotations

import glob
import json
import os
from typing import Dict, Iterable, Optional, Tuple

import numpy as np

__all__ = ["flow_metrics", "covisibility_metrics", "evaluate_pairs", "find_pairs"]


def flow_metrics(
    pred: np.ndarray, gt: np.ndarray, valid: Optional[np.ndarray] = None
) -> Dict[str, float]:
    """pred/gt: (H, W, 2); valid: (H, W) bool. Standard flow metrics."""
    err = np.linalg.norm(pred - gt, axis=-1)
    mag = np.linalg.norm(gt, axis=-1)
    if valid is not None:
        err = err[valid]
        mag = mag[valid]
    if err.size == 0:
        return {"epe": float("nan")}
    # KITTI Fl: error > 3px AND > 5% of GT magnitude
    fl = (err > 3.0) & (err > 0.05 * np.maximum(mag, 1e-6))
    return {
        "epe": float(err.mean()),
        "epe_median": float(np.median(err)),
        "acc_1px": float((err < 1.0).mean()),
        "acc_3px": float((err < 3.0).mean()),
        "acc_5px": float((err < 5.0).mean()),
        "fl_outlier": float(fl.mean()),
    }


def covisibility_metrics(pred_mask: np.ndarray, gt_mask: np.ndarray, threshold: float = 0.5) -> Dict[str, float]:
    p = pred_mask > threshold
    g = gt_mask > threshold
    tp = float((p & g).sum())
    return {
        "covis_precision": tp / max(float(p.sum()), 1.0),
        "covis_recall": tp / max(float(g.sum()), 1.0),
        "covis_iou": tp / max(float((p | g).sum()), 1.0),
    }


def find_pairs(directory: str) -> Iterable[Tuple[str, str, str]]:
    """Yield (img0, img1, gt) triples for supported layouts:
    ``name_0.png / name_1.png / name_flow.npy`` (synthetic), ``name.flo``,
    or KITTI ``name_10.png / name_11.png / flow_occ/name_10.png``."""
    for img0 in sorted(glob.glob(os.path.join(directory, "*_0.png"))):
        stem = img0[: -len("_0.png")]
        img1 = stem + "_1.png"
        if not os.path.exists(img1):
            continue
        for gt in (stem + "_flow.npy", stem + ".flo", stem + "_flow.png"):
            if os.path.exists(gt):
                yield img0, img1, gt
                break


def _load_gt(path: str) -> Tuple[np.ndarray, Optional[np.ndarray]]:
    if path.endswith(".npy"):
        return np.load(path), None
    if path.endswith(".flo"):
        from ufm_tpu.utils.flow_io import read_flo

        return read_flo(path), None
    from ufm_tpu.utils.flow_io import read_kitti_flow

    return read_kitti_flow(path)


def evaluate_pairs(model, directory: str, tiled: bool = False, out_json: Optional[str] = None) -> Dict[str, float]:
    """Run the model over all pairs in ``directory`` and aggregate metrics."""
    import cv2

    rows = []
    for img0_path, img1_path, gt_path in find_pairs(directory):
        img0 = cv2.cvtColor(cv2.imread(img0_path), cv2.COLOR_BGR2RGB)
        img1 = cv2.cvtColor(cv2.imread(img1_path), cv2.COLOR_BGR2RGB)
        gt_flow, gt_valid = _load_gt(gt_path)

        if tiled:
            from ufm_tpu.models.tiled import predict_correspondences_tiled

            flow, _ = predict_correspondences_tiled(model, img0, img1)
        else:
            result = model.predict_correspondences_batched(source_image=img0, target_image=img1)
            flow = np.asarray(result.flow.flow_output[0]).transpose(1, 2, 0)

        m = flow_metrics(flow, gt_flow, gt_valid)
        m["pair"] = os.path.basename(img0_path)
        rows.append(m)

    agg: Dict[str, float] = {}
    if rows:
        keys = [k for k in rows[0] if k != "pair"]
        agg = {k: float(np.mean([r[k] for r in rows])) for k in keys}
        agg["num_pairs"] = len(rows)
    if out_json:
        with open(out_json, "w") as f:
            json.dump({"aggregate": agg, "per_pair": rows}, f, indent=2)
    return agg
