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
import subprocess
import tempfile
import time

import numpy as np


def _git_rev() -> str:
    try:
        return (
            subprocess.run(
                ["git", "rev-parse", "--short", "HEAD"],
                cwd=os.path.dirname(os.path.abspath(__file__)),
                capture_output=True,
                text=True,
            ).stdout.strip()
            or "unknown"
        )
    except Exception:
        return "unknown"


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
    parser.add_argument("--output", default="bench_convergence.json")
    parser.add_argument(
        "--save-checkpoint",
        default=None,
        help="Persist the trained checkpoint here (e.g. for the tiled-accuracy "
        "bench, which needs a model that actually estimates flow)",
    )
    args = parser.parse_args()

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

    cfg = ufm_tiny_config(inference_resolution=(args.width, args.height))
    model = UniFlowMatchConfidence.from_config(cfg)
    norm_type = model.data_norm_type

    print(f"random-init predict EPE (full 540x720 res, {jax.default_backend()} backend):")
    epe_init_trained = _predict_epe(model, train0, train1, train_flow)
    epe_init_held = _predict_epe(model, held0, held1, held_flow)
    print(f"  trained pair {epe_init_trained:.3f} px, held-out {epe_init_held:.3f} px")

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
        "predict_epe_full_res": {
            "random_init_trained_pair": epe_init_trained,
            "random_init_held_out": epe_init_held,
            "trained_trained_pair": epe_trained,
            "trained_held_out": epe_held,
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
