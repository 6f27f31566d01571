"""Training convergence proof: train on real (synthetic-GT) pairs, show EPE
falls, then close the full loop — save → reload → predict → eval.

Rounds 1-3 proved the training subsystem *executes* (a flagship step runs on
the TPU, gradients match plain vs remat, the sharded step runs on an
8-device mesh). This script proves it *learns*: a small model overfits a
handful of synthetic pairs with analytic ground-truth flow
(ufm_tpu/utils/example_pairs.py), the per-step EPE drops by an order of
magnitude, and the trained checkpoint — reloaded through the production
``save_pretrained``/``from_pretrained`` path — beats the random-init model
through the public predict API on both a trained and a held-out pair.

The reference has no trainer to compare against (inference-only release;
its surviving training API is `get_parameter_groups`, reference
uniflowmatch/models/ufm.py:455-471); the pass/fail bars here are absolute:

  * train-resolution EPE at the end < 1/4 of the first logged EPE,
  * full-res predict EPE (trained pair) < 1/2 of the random-init model's.

Writes bench_convergence.json with provenance. Runs on whatever backend JAX
has (TPU through the session tunnel; CPU works for the tiny config too).
"""

from __future__ import annotations

import argparse
import json
import os
import tempfile
import time

import numpy as np


from bench_record import git_rev as _git_rev


def _predict_epe(model, img0: np.ndarray, img1: np.ndarray, gt_flow: np.ndarray) -> float:
    out = model.predict_correspondences_batched(source_image=img0, target_image=img1)
    flow = np.asarray(out.flow.flow_output[0]).transpose(1, 2, 0)
    return float(np.linalg.norm(flow - gt_flow, axis=-1).mean())


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--steps", type=int, default=int(os.environ.get("UFM_CONV_STEPS", 400)))
    parser.add_argument("--batch", type=int, default=2)
    parser.add_argument("--pairs", type=int, default=6, help="training pairs (seeds 0..n-1)")
    parser.add_argument("--lr", type=float, default=1e-3)
    parser.add_argument("--width", type=int, default=112, help="train width (patch-14 multiple)")
    parser.add_argument("--height", type=int, default=84, help="train height (patch-14 multiple)")
    parser.add_argument("--log-every", type=int, default=20)
    parser.add_argument(
        "--output",
        default=None,
        help="Record path; defaults to bench_convergence.json "
        "(bench_convergence_real.json with --real-photos on)",
    )
    parser.add_argument(
        "--save-checkpoint",
        default=None,
        help="Persist the trained checkpoint here (e.g. for the tiled-accuracy "
        "bench, which needs a model that actually estimates flow)",
    )
    parser.add_argument(
        "--real-photos",
        choices=("on", "off"),
        default="off",
        help="Mix in warped REAL photos from the reference snapshot: full views "
        "(coarse/downscale statistics) plus native-resolution crops (tile "
        "statistics — what predict_correspondences_tiled feeds the model). "
        "Off by default: the canonical convergence record is the overfit-6-"
        "synthetic-pairs proof whose pass bars are calibrated for that task; "
        "'on' is for producing the tiled-accuracy checkpoint "
        "(bench_tiled.py accuracy) — use more steps and a lower lr, e.g. "
        "--steps 3000 --lr 5e-4 — and writes bench_convergence_real.json "
        "unless --output is given (the canonical record is never clobbered).",
    )
    args = parser.parse_args()
    if args.output is None:
        args.output = (
            "bench_convergence_real.json" if args.real_photos == "on" else "bench_convergence.json"
        )

    import jax

    from ufm_tpu.data import FlowPairDataset, train_batches
    from ufm_tpu.models import UniFlowMatchConfidence, ufm_tiny_config
    from ufm_tpu.training import fit
    from ufm_tpu.utils.example_pairs import generate_pairs, synthetic_pair

    t_start = time.time()
    tmp = tempfile.mkdtemp(prefix="ufm_convergence_")
    data_dir = os.path.join(tmp, "pairs")
    os.makedirs(data_dir)
    import cv2

    for i in range(args.pairs):
        img0, img1, flow, _ = synthetic_pair(seed=i)
        cv2.imwrite(os.path.join(data_dir, f"pair{i}_0.png"), cv2.cvtColor(img0, cv2.COLOR_RGB2BGR))
        cv2.imwrite(os.path.join(data_dir, f"pair{i}_1.png"), cv2.cvtColor(img1, cv2.COLOR_RGB2BGR))
        np.save(os.path.join(data_dir, f"pair{i}_flow.npy"), flow)
    held0, held1, held_flow, _ = synthetic_pair(seed=1000)  # never trained on
    train0, train1, train_flow, _ = synthetic_pair(seed=0)

    # Real-photo warp pairs: natural-image statistics with exact analytic GT
    # (the reference's bundled photos have no GT flow; warping them is the
    # only way to train/score on real content in a zero-egress environment).
    # Two views of each photo enter the set: the FULL frame (train_batches
    # downscales it to the training grid — the statistics the coarse pass
    # sees) and native-resolution (tile, median-offset window) crops with
    # residual GT — exactly what predict_correspondences_tiled feeds the
    # model (models/tiled.py:90-100).
    from ufm_tpu.utils.example_pairs import (
        load_pair,
        reference_pair_dir,
        warped_pair_from_image,
    )

    ref_dir = reference_pair_dir()
    use_real = args.real_photos == "on"
    held_real = None
    if use_real:
        assert ref_dir is not None, "--real-photos on: reference snapshot not mounted"
        crop_rng = np.random.default_rng(7)
        n_real = 0
        for name in ("bike", "building", "cook"):  # fire_academy/scene held out
            photo, _, _ = load_pair(ref_dir, name)
            for warp_seed in (0, 1, 2):
                i0, i1, fl, _ = warped_pair_from_image(photo, seed=warp_seed)
                stem = os.path.join(data_dir, f"real_{name}_w{warp_seed}")
                cv2.imwrite(f"{stem}_full_0.png", cv2.cvtColor(i0, cv2.COLOR_RGB2BGR))
                cv2.imwrite(f"{stem}_full_1.png", cv2.cvtColor(i1, cv2.COLOR_RGB2BGR))
                np.save(f"{stem}_full_flow.npy", fl)
                n_real += 1
                # Crops mimic the tiled inference distribution exactly
                # (models/tiled.py:90-100): the target window is offset by
                # the (rounded) median flow over the source tile, so the
                # model learns the small RESIDUAL flows it will actually see
                # — not raw max_disp-sized displacements inside a tile-sized
                # frame, which it cannot resolve and which tiled never asks
                # for.
                for k in range(6):
                    y = int(crop_rng.integers(0, i0.shape[0] - args.height + 1))
                    x = int(crop_rng.integers(0, i0.shape[1] - args.width + 1))
                    sl = np.s_[y : y + args.height, x : x + args.width]
                    med = np.median(fl[sl].reshape(-1, 2), axis=0)
                    wy = int(round(np.clip(y + med[1], 0, i1.shape[0] - args.height)))
                    wx = int(round(np.clip(x + med[0], 0, i1.shape[1] - args.width)))
                    win = np.s_[wy : wy + args.height, wx : wx + args.width]
                    residual = fl[sl] - np.array([wx - x, wy - y], dtype=np.float32)
                    cv2.imwrite(f"{stem}_c{k}_0.png", cv2.cvtColor(i0[sl], cv2.COLOR_RGB2BGR))
                    cv2.imwrite(f"{stem}_c{k}_1.png", cv2.cvtColor(i1[win], cv2.COLOR_RGB2BGR))
                    np.save(f"{stem}_c{k}_flow.npy", residual.astype(np.float32))
                    n_real += 1
        # held-out REAL photo + held-out warp seed: never trained on
        held_photo, _, _ = load_pair(ref_dir, "fire_academy")
        held_real = warped_pair_from_image(held_photo, seed=5)
        print(f"real-photo training pairs: {n_real} (3 photos x 3 warps x (full + 6 crops))")

    cfg = ufm_tiny_config(inference_resolution=(args.width, args.height))
    model = UniFlowMatchConfidence.from_config(cfg)
    norm_type = model.data_norm_type

    print(f"random-init predict EPE (full 540x720 res, {jax.default_backend()} backend):")
    epe_init_trained = _predict_epe(model, train0, train1, train_flow)
    epe_init_held = _predict_epe(model, held0, held1, held_flow)
    print(f"  trained pair {epe_init_trained:.3f} px, held-out {epe_init_held:.3f} px")
    epe_init_real = (
        _predict_epe(model, held_real[0], held_real[1], held_real[2]) if held_real else None
    )

    dataset = FlowPairDataset(data_dir)
    batches = train_batches(
        dataset,
        args.batch,
        (args.height, args.width),
        data_norm_type=norm_type,
        seed=0,
        epochs=None,
    )

    history: list[dict] = []
    out = fit(
        model.net,
        model.params,
        batches,
        num_steps=args.steps,
        learning_rate=args.lr,
        warmup_steps=min(40, args.steps // 10),
        log_every=args.log_every,
        on_metrics=lambda step, m: history.append({"step": step, **m}),
    )
    model.params = out["params"]

    # full loop: save through the production checkpoint path and reload
    ckpt_dir = args.save_checkpoint or os.path.join(tmp, "trained_ckpt")
    model.save_pretrained(ckpt_dir)
    reloaded = UniFlowMatchConfidence.from_pretrained(ckpt_dir)

    epe_trained = _predict_epe(reloaded, train0, train1, train_flow)
    epe_held = _predict_epe(reloaded, held0, held1, held_flow)
    print(f"trained predict EPE: trained pair {epe_trained:.3f} px, held-out {epe_held:.3f} px")
    epe_real = None
    if held_real:
        epe_real = _predict_epe(reloaded, held_real[0], held_real[1], held_real[2])
        print(
            f"held-out REAL photo (fire_academy, unseen warp): "
            f"{epe_init_real:.3f} -> {epe_real:.3f} px"
        )

    epe_first = history[0]["epe"] if history else float("nan")
    epe_last = (
        float(np.mean([h["epe"] for h in history[-3:]])) if len(history) >= 3 else float("nan")
    )
    converged = bool(epe_last < 0.25 * epe_first)
    improved = bool(epe_trained < 0.5 * epe_init_trained)

    record = {
        "metric": "training_convergence",
        "backend": jax.default_backend(),
        "device_kind": str(jax.devices()[0].device_kind),
        "git_rev": _git_rev(),
        "date": time.strftime("%Y-%m-%d"),
        "config": {
            "model": "tiny confidence-variant",
            "train_resolution_wh": [args.width, args.height],
            "steps": args.steps,
            "batch": args.batch,
            "pairs": args.pairs,
            "lr": args.lr,
        },
        "train_epe_first_log": epe_first,
        "train_epe_last": epe_last,
        "history": history,
        "real_photos_trained": use_real,
        "predict_epe_full_res": {
            "random_init_trained_pair": epe_init_trained,
            "random_init_held_out": epe_init_held,
            "trained_trained_pair": epe_trained,
            "trained_held_out": epe_held,
            "random_init_held_out_real_photo": epe_init_real,
            "trained_held_out_real_photo": epe_real,
        },
        "converged": converged,
        "predict_improved": improved,
        "elapsed_s": round(time.time() - t_start, 1),
    }
    with open(args.output, "w") as f:
        json.dump(record, f, indent=1)
    print(json.dumps({k: v for k, v in record.items() if k != "history"}, indent=1))
    print(f"PASS={converged and improved} (converged={converged}, predict_improved={improved})")


if __name__ == "__main__":
    main()
