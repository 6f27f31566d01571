#!/usr/bin/env python3
"""Command-line interface for the TPU-native UFM framework.

Mirrors the reference CLI surface (uniflowmatch/cli.py:12-47): subcommands
``demo`` (gradio UI), ``infer`` (image pair -> flow/covisibility/warp PNGs),
``test`` (installation smoke check), with the same output filenames
(cli.py:127-148).
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path


def main() -> None:
    parser = argparse.ArgumentParser(
        description="UFM-TPU: Unified Dense Correspondence with Flow (TPU-native)", prog="ufm"
    )
    subparsers = parser.add_subparsers(dest="command", help="Available commands")

    demo_parser = subparsers.add_parser("demo", help="Launch interactive Gradio demo")
    demo_parser.add_argument("--port", type=int, default=7860, help="Port to run demo on (default: 7860)")
    demo_parser.add_argument("--share", action="store_true", help="Create public sharing link")
    demo_parser.add_argument("--model", choices=["base", "refine"], default="base")
    demo_parser.add_argument("--checkpoint", help="Local checkpoint directory (native or HF layout)")

    infer_parser = subparsers.add_parser("infer", help="Run inference on image pairs")
    infer_parser.add_argument("source", help="Source image path")
    infer_parser.add_argument("target", help="Target image path")
    infer_parser.add_argument("--output", "-o", help="Output directory (default: current directory)")
    infer_parser.add_argument("--model", choices=["base", "refine"], default="base")
    infer_parser.add_argument("--checkpoint", help="Local checkpoint directory (native or HF layout)")
    infer_parser.add_argument(
        "--random-init",
        action="store_true",
        help="Run with randomly initialized weights (pipeline smoke test; zero-egress environments)",
    )

    subparsers.add_parser("test", help="Test installation")

    args = parser.parse_args()

    if args.command == "demo":
        launch_demo(args)
    elif args.command == "infer":
        run_inference(args)
    elif args.command == "test":
        test_installation()
    else:
        parser.print_help()


_HUB_REPOS = {"base": "infinity1096/UFM-Base", "refine": "infinity1096/UFM-Refine"}


def _load_model(variant: str, checkpoint: str | None, random_init: bool = False):
    from ufm_tpu.models import (
        UniFlowMatchClassificationRefinement,
        UniFlowMatchConfidence,
        ufm_base_config,
        ufm_refine_config,
    )

    cls = UniFlowMatchClassificationRefinement if variant == "refine" else UniFlowMatchConfidence
    if checkpoint:
        return cls.from_pretrained(checkpoint)
    if random_init:
        cfg = ufm_refine_config() if variant == "refine" else ufm_base_config()
        return cls.from_config(cfg)
    return cls.from_pretrained(_HUB_REPOS[variant])


def run_inference(args) -> None:
    try:
        import cv2
        import numpy as np

        from ufm_tpu.utils.viz import flow_to_color, warp_image_with_flow

        source_img = cv2.imread(args.source)
        target_img = cv2.imread(args.target)
        if source_img is None or target_img is None:
            print("Error: Could not load one or both images")
            sys.exit(1)

        source_rgb = cv2.cvtColor(source_img, cv2.COLOR_BGR2RGB)
        target_rgb = cv2.cvtColor(target_img, cv2.COLOR_BGR2RGB)

        model = _load_model(args.model, args.checkpoint, args.random_init)
        print("Running inference...")

        result = model.predict_correspondences_batched(source_image=source_rgb, target_image=target_rgb)
        flow = np.asarray(result.flow.flow_output[0])
        covisibility = np.asarray(result.covisibility.mask[0])

        output_dir = Path(args.output) if args.output else Path.cwd()
        output_dir.mkdir(exist_ok=True)

        flow_vis_img = flow_to_color(flow.transpose(1, 2, 0))
        cv2.imwrite(str(output_dir / "flow_visualization.png"), cv2.cvtColor(flow_vis_img, cv2.COLOR_RGB2BGR))
        cv2.imwrite(str(output_dir / "covisibility_mask.png"), (covisibility * 255).astype(np.uint8))

        warped = warp_image_with_flow(source_rgb, None, target_rgb, flow.transpose(1, 2, 0))
        warped = covisibility[..., None] * warped + (1 - covisibility[..., None]) * 255 * np.ones_like(warped)
        cv2.imwrite(str(output_dir / "warped_source.png"), cv2.cvtColor(warped.astype(np.uint8), cv2.COLOR_RGB2BGR))

        print(f"Results saved to: {output_dir}")
        print("- flow_visualization.png")
        print("- covisibility_mask.png")
        print("- warped_source.png")
    except ImportError as e:
        print(f"Error importing dependencies: {e}")
        sys.exit(1)
    except Exception as e:
        print(f"Error during inference: {e}")
        sys.exit(1)


def launch_demo(args) -> None:
    try:
        from ufm_tpu.demo import create_demo, initialize_model

        print(f"Launching UFM demo with {args.model} model...")
        print(f"Demo will be available at: http://localhost:{args.port}")

        if not initialize_model(use_refinement=args.model == "refine", checkpoint=args.checkpoint):
            print("Error: Failed to load model. Check installation and checkpoint availability.")
            sys.exit(1)

        demo = create_demo()
        demo.launch(share=args.share, server_port=args.port, server_name="127.0.0.1", show_error=True)
    except ImportError as e:
        print(f"Error importing demo dependencies: {e}")
        print("The demo requires gradio: pip install gradio")
        sys.exit(1)
    except Exception as e:
        print(f"Error launching demo: {e}")
        sys.exit(1)


def test_installation() -> None:
    print("Testing UFM-TPU installation...")
    try:
        import jax

        print(f"+ JAX {jax.__version__}")
        import flax

        print(f"+ Flax {flax.__version__}")
        import numpy

        print(f"+ NumPy {numpy.__version__}")
        try:
            import cv2

            print(f"+ OpenCV {cv2.__version__}")
        except ImportError:
            print("! OpenCV not available (CLI image IO disabled)")

        from ufm_tpu.models import UniFlowMatchConfidence  # noqa: F401

        print("+ UFM-TPU model imports")

        devices = jax.devices()
        backend = jax.default_backend()
        if backend == "tpu":
            print(f"+ TPU available: {devices}")
        else:
            print(f"! No TPU detected; running on {backend} ({len(devices)} devices)")

        try:
            from huggingface_hub import hf_hub_download  # noqa: F401

            print("+ HuggingFace Hub importable (network may still be unavailable)")
        except Exception:
            print("! HuggingFace Hub not importable (model downloading disabled)")

        print("\nInstallation test completed successfully!")
        print("Run 'ufm demo' to launch the interactive demo")
    except ImportError as e:
        print(f"x Import error: {e}")
        sys.exit(1)
    except Exception as e:
        print(f"x Unexpected error: {e}")
        sys.exit(1)


if __name__ == "__main__":
    main()
