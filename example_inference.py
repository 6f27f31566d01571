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
    flow_hwc = np.asarray(result.flow.flow_output[0]).transpose(1, 2, 0)
    covisibility = np.asarray(result.covisibility.mask[0])

    warped = warp_image_with_flow(source_image, None, target_image, flow_hwc)
    warped = np.where(covisibility[..., None] > 0, covisibility[..., None] * warped + (1 - covisibility[..., None]) * 255, 255)

    panels = [
        ("Source Image", source_image, {}),
        ("Target Image", target_image, {}),
        ("Warped Image", warped / 255.0, {}),
        ("Flow Output (valid at covisible region)", flow_to_color(flow_hwc), {}),
        ("Covisibility Mask (thresholded at 0.5)", covisibility > 0.5, dict(cmap="gray", vmin=0, vmax=1)),
        ("Covisibility Mask", covisibility, dict(cmap="gray", vmin=0, vmax=1)),
    ]

    fig, axs = plt.subplots(2, 3, figsize=(15, 8))
    for ax, (title, image, kwargs) in zip(axs.flat, panels):
        shown = ax.imshow(image, **kwargs)
        ax.set_title(title)
        ax.set_axis_off()
        if title == "Covisibility Mask":
            plt.colorbar(shown, ax=ax)

    fig.tight_layout()
    fig.savefig(args.output)
    print(f"Saved {args.output}")


if __name__ == "__main__":
    main()
