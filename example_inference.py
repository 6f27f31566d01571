"""Scripted example: run UFM-TPU on an image pair and plot a 2x3 panel.

Mirrors the reference example (example_inference.py:45-90): source, target,
warped target, flow coloring, thresholded covisibility, covisibility heatmap
— saved to ``ufm_output.png`` (the reference's golden-image check target,
README.md:71-78).
"""

from __future__ import annotations

import argparse
import os


def main() -> None:
    parser = argparse.ArgumentParser(description="UFM-TPU example inference")
    parser.add_argument("--source", default=None, help="source image (default: bundled synthetic pair)")
    parser.add_argument("--target", default=None)
    parser.add_argument("--model", choices=["base", "refine"], default="base")
    parser.add_argument("--checkpoint", default=None, help="local checkpoint directory")
    parser.add_argument("--random-init", action="store_true", help="random weights (pipeline smoke test)")
    parser.add_argument("--output", default="ufm_output.png")
    args = parser.parse_args()

    import cv2
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    import numpy as np

    from ufm_tpu.cli import _load_model
    from ufm_tpu.utils.viz import flow_to_color, warp_image_with_flow

    if args.source is None:
        pair_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), "examples", "image_pairs")
        if not os.path.exists(os.path.join(pair_dir, "noise_scene_0.png")):
            from examples.make_example_pairs import main as make_pairs

            make_pairs()
        args.source = os.path.join(pair_dir, "noise_scene_0.png")
        args.target = os.path.join(pair_dir, "noise_scene_1.png")

    source_image = cv2.cvtColor(cv2.imread(args.source), cv2.COLOR_BGR2RGB)
    target_image = cv2.cvtColor(cv2.imread(args.target), cv2.COLOR_BGR2RGB)

    model = _load_model(args.model, args.checkpoint, args.random_init)

    result = model.predict_correspondences_batched(source_image=source_image, target_image=target_image)
    flow_output = np.asarray(result.flow.flow_output[0])
    covisibility = np.asarray(result.covisibility.mask[0])

    fig, axs = plt.subplots(2, 3, figsize=(15, 8))
    axs[0, 0].imshow(source_image)
    axs[0, 0].set_title("Source Image")
    axs[0, 1].imshow(target_image)
    axs[0, 1].set_title("Target Image")

    warped = warp_image_with_flow(source_image, None, target_image, flow_output.transpose(1, 2, 0))
    warped = covisibility[..., None] * warped + (1 - covisibility[..., None]) * 255 * np.ones_like(warped)
    axs[0, 2].imshow(warped / 255.0)
    axs[0, 2].set_title("Warped Image")

    axs[1, 0].imshow(flow_to_color(flow_output.transpose(1, 2, 0)))
    axs[1, 0].set_title("Flow Output (valid at covisible region)")
    axs[1, 1].imshow(covisibility > 0.5, cmap="gray", vmin=0, vmax=1)
    axs[1, 1].set_title("Covisibility Mask (thresholded at 0.5)")
    heat = axs[1, 2].imshow(covisibility, cmap="gray", vmin=0, vmax=1)
    axs[1, 2].set_title("Covisibility Mask")
    plt.colorbar(heat, ax=axs[1, 2])

    plt.tight_layout()
    plt.savefig(args.output)
    print(f"Saved {args.output}")


if __name__ == "__main__":
    main()
