"""Tiled high-resolution inference benchmark (1080p, coarse-to-fine).

Two modes:

``timing`` (default) — measures the TPU-native high-res extension
(models/tiled.py — the capability BASELINE.json's "tiled inference >=1024px"
config asks for; the reference only downscales,
/root/reference/uniflowmatch/models/base.py:236) end to end with the
flagship base model on a REAL 1080px photo pair (the reference's bundled
``bike`` pair, reference gradio_demo.py:163-172) when the snapshot is
mounted, else a synthetic 1920x1080 pair. Wall-clock includes host<->device
transfer through this environment's session tunnel, which varies by
multiples between windows (BENCH_NOTES.md) — the record carries both the
wall number and the on-chip-equivalent forward cost.

``accuracy`` — the number that justifies (or bounds) the tiled path's extra
compute (VERDICT r3 #7): coarse-only vs tiled EPE on a real-photo pair with
EXACT analytic ground truth (a reference photo warped by a known smooth
field, utils/example_pairs.py::warped_pair_from_image), using a TRAINED
model (bench_convergence.py --save-checkpoint; a random-init model would
make the comparison meaningless).

Writes bench_tiled.json; run: python bench_tiled.py [timing|accuracy ...]
"""

import argparse
import json
import os
import time

import numpy as np

from bench_record import load_rec, save_rec

HERE = os.path.dirname(os.path.abspath(__file__))
OUT = os.path.join(HERE, "bench_tiled.json")


def _load_rec():
    return load_rec(OUT)


def _save_rec(rec):
    save_rec(OUT, rec)


def _timing_inputs():
    """Real bike pair (1080x1080 / 607x1080) when the reference snapshot is
    mounted; synthetic 1920x1080 otherwise."""
    from ufm_tpu.utils.example_pairs import load_pair, reference_pair_dir

    d = reference_pair_dir()
    if d is not None:
        src, tgt, _ = load_pair(d, "bike")
        return src, tgt, "reference bike pair (real 1080px photos)"
    h, w = 1080, 1920
    rng = np.random.default_rng(0)
    yy, xx = np.mgrid[0:h, 0:w]
    base = 127 + 80 * np.sin(xx / 97.0) + 40 * np.cos(yy / 61.0) + rng.integers(0, 32, (h, w))
    src = np.clip(np.stack([base, base * 0.9, base * 1.1], axis=-1), 0, 255).astype(np.uint8)
    tgt = np.roll(src, (7, 13), axis=(0, 1))
    return src, tgt, "synthetic 1920x1080 (reference snapshot not mounted)"


def bench_timing():
    import jax

    from ufm_tpu.models import UniFlowMatchConfidence, ufm_base_config
    from ufm_tpu.models.tiled import _tile_starts, predict_correspondences_tiled

    src, tgt, input_desc = _timing_inputs()
    sh, sw = src.shape[:2]

    model = UniFlowMatchConfidence.from_config(ufm_base_config())
    max_batch = 4  # reuses the b4-compiled pipeline

    t0 = time.perf_counter()
    flow, covis = predict_correspondences_tiled(model, src, tgt, max_batch=max_batch)
    warm_s = time.perf_counter() - t0
    assert flow.shape == (sh, sw, 2) and covis.shape == (sh, sw)
    assert np.isfinite(flow).all() and np.isfinite(covis).all()

    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        predict_correspondences_tiled(model, src, tgt, max_batch=max_batch)
        times.append(time.perf_counter() - t0)
    wall_s = float(np.median(times))

    tile_w, tile_h = model.inference_resolution[0]
    n_tiles = len(_tile_starts(sh, tile_h, 0.33)) * len(_tile_starts(sw, tile_w, 0.33))

    rec = _load_rec()
    rec.update(
        {
            "resolution": f"{sw}x{sh}",
            "input": input_desc,
            "tiles": n_tiles,
            "tile_batch": max_batch,
            "forward_pairs_total": n_tiles + 1,  # + the coarse pass
            "wall_s_median": round(wall_s, 3),
            "megapixels_per_sec_wall": round(sh * sw / 1e6 / wall_s, 3),
            "compile_plus_first_s": round(warm_s, 1),
            "flow_finite": True,
            "covis_mean": round(float(covis.mean()), 4),
            "note": (
                "wall includes session-tunnel image/flow transfer (varies by multiples "
                "between windows); on-chip-equivalent forward cost = forward_pairs_total "
                "/ the measured b4 forward rate (BENCH_NOTES.md headline)"
            ),
            "device": str(jax.devices()[0].device_kind),
        }
    )
    _save_rec(rec)
    print(json.dumps({k: v for k, v in rec.items() if k != "accuracy"}), flush=True)


def bench_accuracy(checkpoint: str, photos, max_disp: float = 24.0, gate_px=None):
    """Coarse-vs-tiled accuracy per photo (VERDICT r4 #3: >=3 reference
    photos, per-photo EPE and acc@3px, so one lucky frame can't carry the
    claim). Held-out-ness: the accuracy warp seed (3) is never trained on,
    and fire_academy is a held-out PHOTO (bench_convergence.py trains on
    bike/building/cook warps, seeds 0-2)."""
    import jax

    from ufm_tpu.eval import flow_metrics
    from ufm_tpu.models import UniFlowMatchConfidence
    from ufm_tpu.models import tiled as tiled_mod
    from ufm_tpu.models.tiled import predict_correspondences_tiled
    from ufm_tpu.utils.example_pairs import (
        load_pair,
        reference_pair_dir,
        warped_pair_from_image,
    )

    d = reference_pair_dir()
    assert d is not None, "accuracy mode needs the reference snapshot's real photos"
    if isinstance(photos, str):
        photos = [photos]

    model = UniFlowMatchConfidence.from_pretrained(checkpoint)
    w, h = model.inference_resolution[0]

    per_photo = {}
    for photo in photos:
        photo_img, _, _ = load_pair(d, photo)
        img0, img1, gt_flow, _ = warped_pair_from_image(photo_img, seed=3, max_disp=max_disp)

        # coarse-only: the reference's strategy — downscale to the trained
        # grid, predict, unmap back (all detail above the grid is gone)
        res = model.predict_correspondences_batched(source_image=img0, target_image=img1)
        coarse_flow = np.asarray(res.flow.flow_output[0]).transpose(1, 2, 0)
        coarse = flow_metrics(coarse_flow, gt_flow)

        t0 = time.perf_counter()
        tiled_flow, _ = predict_correspondences_tiled(
            model, img0, img1, max_batch=16, coarse_gate_px=gate_px
        )
        tiled_s = time.perf_counter() - t0
        tiled = flow_metrics(tiled_flow, gt_flow)

        per_photo[photo] = {
            "resolution": f"{img0.shape[1]}x{img0.shape[0]}",
            "coarse_epe": round(coarse["epe"], 3),
            "tiled_epe": round(tiled["epe"], 3),
            "coarse_acc_3px": round(coarse["acc_3px"], 4),
            "tiled_acc_3px": round(tiled["acc_3px"], 4),
            "epe_improvement_x": round(coarse["epe"] / max(tiled["epe"], 1e-9), 2),
            "tiled_wall_s": round(tiled_s, 1),
            "tile_stats": dict(tiled_mod.last_tile_stats),
        }
        print(f"{photo}: {json.dumps(per_photo[photo])}", flush=True)

    wins = sum(
        1
        for p in per_photo.values()
        if p["tiled_epe"] < p["coarse_epe"] and p["tiled_acc_3px"] > p["coarse_acc_3px"]
    )
    rec = _load_rec()
    rec["accuracy"] = {
        "input": f"reference photos warped by analytic field (max_disp {max_disp}, held-out seed 3)",
        "model": f"trained tiny checkpoint ({checkpoint}), native {w}x{h}",
        "per_photo": per_photo,
        "tiled_strictly_better_on": f"{wins}/{len(per_photo)} photos (both EPE and acc@3px)",
        "backend": jax.default_backend(),
        "note": (
            "trained model required: bench_convergence.py --save-checkpoint; "
            "exact GT from warping a real photo (zero-egress: released weights "
            "unavailable, so absolute EPE reflects the small trained model, "
            "the tiled-vs-coarse DELTA is the measurement)"
        ),
    }
    _save_rec(rec)
    print(json.dumps(rec["accuracy"]), flush=True)


def main():
    from bench import enable_compile_cache

    enable_compile_cache()
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("mode", nargs="?", default="timing", choices=("timing", "accuracy"))
    parser.add_argument("--checkpoint", help="trained checkpoint dir (accuracy mode)")
    parser.add_argument(
        "--photo",
        default="building,bike,cook,fire_academy",
        help="comma-separated reference photos (accuracy mode); fire_academy is held out of training",
    )
    parser.add_argument("--gate-px", type=float, default=None, help="robust-fusion gate override (accuracy mode)")
    args = parser.parse_args()
    if args.mode == "accuracy":
        assert args.checkpoint, "accuracy mode requires --checkpoint (see bench_convergence.py)"
        bench_accuracy(args.checkpoint, args.photo.split(","), gate_px=args.gate_px)
    else:
        bench_timing()


if __name__ == "__main__":
    main()
