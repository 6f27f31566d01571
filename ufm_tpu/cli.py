#!/usr/bin/env python3
"""``ufm`` console entry point for the TPU-native framework.

The subcommand surface is a compatibility contract with the reference release
(uniflowmatch/cli.py:12-47): ``demo`` serves the gradio UI, ``infer`` writes
``flow_visualization.png`` / ``covisibility_mask.png`` / ``warped_source.png``
for an image pair (cli.py:127-148), and ``test`` is an environment smoke
check. Everything behind those flags is this project's own plumbing.
"""

from __future__ import annotations

import argparse
import os
import sys
from pathlib import Path

# Honor JAX_PLATFORMS even when a sitecustomize pins an accelerator plugin at
# interpreter start (env alone cannot override an already-applied config;
# jax.config.update before backend init can). Keeps `JAX_PLATFORMS=cpu ufm test`
# hermetic instead of opening a device tunnel.
_platforms = os.environ.get("JAX_PLATFORMS")
if _platforms:
    import jax

    try:
        jax.config.update("jax_platforms", _platforms)
    except Exception:  # noqa: BLE001 — backend already initialized; leave as-is
        pass

HUB_REPOS = {"base": "infinity1096/UFM-Base", "refine": "infinity1096/UFM-Refine"}
OUTPUT_FILES = ("flow_visualization.png", "covisibility_mask.png", "warped_source.png")


def _fail(msg: str) -> None:
    print(msg)
    sys.exit(1)


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(
        prog="ufm", description="UFM-TPU: Unified Dense Correspondence with Flow (TPU-native)"
    )
    sub = parser.add_subparsers(dest="command", help="Available commands")

    demo = sub.add_parser("demo", help="Launch interactive Gradio demo")
    demo.add_argument("--port", type=int, default=7860, help="Port to run demo on (default: 7860)")
    demo.add_argument("--share", action="store_true", help="Create public sharing link")
    demo.add_argument("--model", choices=sorted(HUB_REPOS), default="base")
    demo.add_argument("--checkpoint", help="Local checkpoint directory (native or HF layout)")

    infer = sub.add_parser("infer", help="Run inference on image pairs")
    infer.add_argument("source", help="Source image path")
    infer.add_argument("target", help="Target image path")
    infer.add_argument("--output", "-o", help="Output directory (default: current directory)")
    infer.add_argument("--model", choices=sorted(HUB_REPOS), default="base")
    infer.add_argument("--checkpoint", help="Local checkpoint directory (native or HF layout)")
    infer.add_argument(
        "--random-init",
        action="store_true",
        help="Run with randomly initialized weights (pipeline smoke test; zero-egress environments)",
    )
    infer.add_argument(
        "--artifact",
        help="Serve from a compiled .ufmx artifact (ufm export) instead of a live model — "
        "no flax/checkpoint machinery, AOT programs only",
    )

    ev = sub.add_parser("eval", help="Evaluate on a directory of pairs with ground-truth flow")
    ev.add_argument("directory", help="Directory of name_0.png/name_1.png + name_flow.npy|.flo|_flow.png")
    ev.add_argument("--model", choices=sorted(HUB_REPOS), default="base")
    ev.add_argument("--checkpoint", help="Local checkpoint directory (native or HF layout)")
    ev.add_argument(
        "--random-init",
        action="store_true",
        help="Run with randomly initialized weights (harness smoke test; zero-egress environments)",
    )
    ev.add_argument("--tiled", action="store_true", help="Coarse-to-fine tiled high-res inference")
    ev.add_argument("--output", "-o", help="Write aggregate + per-pair metrics JSON here")

    exp = sub.add_parser(
        "export", help="Export a compiled AOT serving artifact (.ufmx, jax.export/StableHLO)"
    )
    exp.add_argument("output", help="Artifact path (suggested suffix: .ufmx)")
    exp.add_argument("--model", choices=sorted(HUB_REPOS), default="base")
    exp.add_argument("--checkpoint", help="Local checkpoint directory (native or HF layout)")
    exp.add_argument("--batch", type=int, default=1, help="Fixed batch size of the exported program")
    exp.add_argument(
        "--params-dtype",
        choices=("bfloat16", "float16"),
        default=None,
        help="Store weights in half precision (halves artifact size and load "
        "time; cast back on load; ≤0.1 px parity cost — docs/SERVING.md)",
    )
    exp.add_argument(
        "--random-init",
        action="store_true",
        help="Export randomly initialized weights (artifact smoke test; zero-egress environments)",
    )

    srv = sub.add_parser(
        "serve", help="Run the HTTP serving daemon (live model or compiled .ufmx artifact)"
    )
    srv.add_argument("--host", default="127.0.0.1")
    srv.add_argument("--port", type=int, default=8000)
    srv.add_argument("--model", choices=sorted(HUB_REPOS), default="base")
    srv.add_argument("--checkpoint", help="Local checkpoint directory (native or HF layout)")
    srv.add_argument(
        "--artifact",
        help="Serve from a compiled .ufmx artifact (ufm export) — the production layout; "
        "no flax/checkpoint machinery in the serving process",
    )
    srv.add_argument(
        "--random-init",
        action="store_true",
        help="Serve randomly initialized weights (daemon smoke test; zero-egress environments)",
    )
    srv.add_argument(
        "--max-batch",
        type=int,
        default=4,
        help="Continuous-batching lane width (short batches are padded to this, "
        "so the device sees one static shape; 1 disables coalescing)",
    )
    srv.add_argument(
        "--max-delay-ms", type=float, default=3.0, help="Batching window before dispatch"
    )

    sub.add_parser("test", help="Test installation")
    return parser


def main() -> None:
    parser = build_parser()
    args = parser.parse_args()
    handler = {
        "demo": launch_demo,
        "infer": run_inference,
        "eval": run_eval,
        "export": run_export,
        "serve": run_serve,
        "test": lambda _: test_installation(),
    }.get(args.command)
    if handler is None:
        parser.print_help()
        return
    handler(args)


def _load_model(variant: str, checkpoint: str | None, random_init: bool = False, artifact: str | None = None):
    if artifact:
        from ufm_tpu.runtime import load_artifact_model

        return load_artifact_model(artifact)

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
    return cls.from_pretrained(HUB_REPOS[variant])


def _read_rgb(path: str):
    import cv2

    bgr = cv2.imread(path)
    return None if bgr is None else cv2.cvtColor(bgr, cv2.COLOR_BGR2RGB)


def _write_rgb(path: Path, rgb) -> None:
    import cv2

    cv2.imwrite(str(path), cv2.cvtColor(rgb, cv2.COLOR_RGB2BGR))


def run_inference(args) -> None:
    try:
        import numpy as np

        from ufm_tpu.utils.viz import flow_to_color, warp_image_with_flow
    except ImportError as e:
        _fail(f"Error importing dependencies: {e}")

    source_rgb = _read_rgb(args.source)
    target_rgb = _read_rgb(args.target)
    if source_rgb is None or target_rgb is None:
        _fail(f"Error: could not read {args.source if source_rgb is None else args.target}")

    try:
        model = _load_model(args.model, args.checkpoint, args.random_init, getattr(args, "artifact", None))
        print("Running inference...")
        result = model.predict_correspondences_batched(source_image=source_rgb, target_image=target_rgb)
    except Exception as e:
        _fail(f"Error during inference: {e}")

    flow_hwc = np.asarray(result.flow.flow_output[0]).transpose(1, 2, 0)
    covis = np.asarray(result.covisibility.mask[0])

    out_dir = Path(args.output) if args.output else Path.cwd()
    out_dir.mkdir(exist_ok=True)

    # Backward-warp the target into the source frame, whiting out non-covisible
    # pixels so occlusions read as "no correspondence" in the panel.
    warped = warp_image_with_flow(source_rgb, None, target_rgb, flow_hwc).astype(np.float32)
    alpha = covis[..., None]
    composite = (alpha * warped + (1.0 - alpha) * 255.0).astype(np.uint8)

    _write_rgb(out_dir / OUTPUT_FILES[0], flow_to_color(flow_hwc))
    _write_rgb(out_dir / OUTPUT_FILES[1], np.repeat((covis * 255).astype(np.uint8)[..., None], 3, axis=-1))
    _write_rgb(out_dir / OUTPUT_FILES[2], composite)

    print(f"Wrote {len(OUTPUT_FILES)} files to {out_dir}:")
    for name in OUTPUT_FILES:
        print(f"  {name}")


def run_eval(args) -> None:
    from ufm_tpu.eval import evaluate_pairs, find_pairs

    if not Path(args.directory).is_dir():
        _fail(f"Error: not a directory: {args.directory}")
    if not any(True for _ in find_pairs(args.directory, require_gt=False)):
        _fail(
            f"Error: no evaluable pairs in {args.directory} "
            "(expected name_0.png/name_1.png, optionally with "
            "name_flow.npy, name.flo or name_flow.png ground truth)"
        )

    try:
        model = _load_model(args.model, args.checkpoint, args.random_init)
    except Exception as e:
        _fail(f"Error loading model: {e}")
    # GT-less pairs (e.g. the reference's bundled real photos) are scored by
    # forward-backward cycle consistency instead of being skipped
    agg = evaluate_pairs(
        model, args.directory, tiled=args.tiled, out_json=args.output, require_gt=False
    )
    for k in (
        "epe", "epe_median", "acc_1px", "acc_3px", "acc_5px", "fl_outlier",
        "cycle_epe", "cycle_epe_median", "cycle_acc_1px", "cycle_acc_3px",
        "cycle_coverage", "covis_mean",
    ):
        if k in agg:
            print(f"{k}: {agg[k]:.4f}")
    print(f"pairs: {int(agg.get('num_pairs', 0))} (all flows finite: {agg.get('all_flows_finite')})")
    if args.output:
        print(f"Wrote metrics to {args.output}")


def run_export(args) -> None:
    try:
        model = _load_model(args.model, args.checkpoint, args.random_init)
    except Exception as e:
        _fail(f"Error loading model: {e}")
    from ufm_tpu.runtime import export_model

    try:
        manifest = export_model(
            model, args.output, batch=args.batch, params_dtype=args.params_dtype
        )
    except Exception as e:
        _fail(f"Error exporting model: {e}")
    size_mb = Path(args.output).stat().st_size / 1e6
    programs = "backbone+tail (staged)" if manifest["staged"] else "forward"
    dtype_note = f", params {manifest['params_dtype']}" if manifest.get("params_dtype") else ""
    print(
        f"Exported {manifest['model_class']} ({programs}, batch {manifest['batch']}, "
        f"{manifest['resolution_wh'][0]}x{manifest['resolution_wh'][1]}, "
        f"platforms {','.join(manifest['platforms'])}{dtype_note}) -> {args.output} ({size_mb:.1f} MB)"
    )


def run_serve(args) -> None:
    try:
        model = _load_model(args.model, args.checkpoint, args.random_init, args.artifact)
    except Exception as e:
        _fail(f"Error loading model: {e}")
    from ufm_tpu.runtime.server import UFMServer

    source = args.artifact or args.checkpoint or ("random-init" if args.random_init else HUB_REPOS[args.model])
    max_batch = args.max_batch
    if args.artifact:
        # .ufmx programs are fixed-shape: every lane batch is padded to
        # max_batch, so a lane width other than the exported batch would make
        # EVERY /v1/predict call fail at request time. Pin it at startup.
        artifact_batch = int(getattr(getattr(model, "exported", None), "batch", max_batch))
        if max_batch != artifact_batch:
            print(
                f"note: artifact was exported at fixed batch {artifact_batch}; "
                f"using --max-batch {artifact_batch} (requested {max_batch})"
            )
            max_batch = artifact_batch
    server = UFMServer(
        model,
        host=args.host,
        port=args.port,
        max_batch=max_batch,
        max_delay_ms=args.max_delay_ms,
    )
    print(f"Serving {type(model).__name__} ({source}) at http://{args.host}:{args.port}")
    print("  GET /healthz | GET /stats | POST /v1/predict (npz or JSON, see runtime/server.py)")
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        server.close()


def launch_demo(args) -> None:
    try:
        from ufm_tpu.demo import create_demo, initialize_model
    except ImportError as e:
        _fail(f"The demo requires gradio ({e}); pip install gradio")

    print(f"Serving the {args.model} model at http://localhost:{args.port}")
    if not initialize_model(use_refinement=args.model == "refine", checkpoint=args.checkpoint):
        _fail("Error: model failed to load — check installation and checkpoint availability.")
    try:
        create_demo().launch(share=args.share, server_port=args.port, server_name="127.0.0.1", show_error=True)
    except Exception as e:
        _fail(f"Error launching demo: {e}")


def test_installation() -> None:
    print("Testing UFM-TPU installation...")
    failures = []

    def probe(label, fn, required=True):
        try:
            detail = fn()
            print(f"+ {label}" + (f" {detail}" if detail else ""))
        except Exception as e:  # noqa: BLE001 — a smoke check reports, never raises
            mark = "x" if required else "!"
            print(f"{mark} {label}: {e}")
            if required:
                failures.append(label)

    probe("JAX", lambda: __import__("jax").__version__)
    probe("Flax", lambda: __import__("flax").__version__)
    probe("NumPy", lambda: __import__("numpy").__version__)
    probe("OpenCV (CLI image IO)", lambda: __import__("cv2").__version__, required=False)

    def _import_models():
        from ufm_tpu.models import UniFlowMatchConfidence  # noqa: F401

    probe("UFM-TPU model imports", _import_models)

    def _devices():
        import jax

        backend = jax.default_backend()
        n = len(jax.devices())
        return f"backend={backend} devices={n}" + ("" if backend == "tpu" else " (no TPU detected)")

    probe("Accelerator", _devices, required=False)
    probe(
        "HuggingFace Hub importable (network may still be unavailable)",
        lambda: __import__("huggingface_hub") and "",
        required=False,
    )

    if failures:
        _fail(f"\nInstallation test FAILED: {', '.join(failures)}")
    print("\nInstallation test completed successfully!")
    print("Run 'ufm demo' to launch the interactive demo")


if __name__ == "__main__":
    main()
