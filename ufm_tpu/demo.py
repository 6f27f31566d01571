"""Gradio demo for UFM-TPU.

Mirrors the reference demo surface (gradio_demo.py:23-194): a global model
singleton with lazy reload on variant switch, ``initialize_model`` /
``create_demo`` entry points, three outputs (flow coloring, covisibility
heatmap, covisibility-gated warp), and auto-processing on upload.

Requires ``gradio`` (not bundled in minimal environments; the CLI reports a
friendly error if missing).
"""

from __future__ import annotations

from typing import Optional

import numpy as np

model = None
_model_is_refinement: Optional[bool] = None
_model_checkpoint: Optional[str] = None

_HUB_REPOS = {False: "infinity1096/UFM-Base", True: "infinity1096/UFM-Refine"}


def initialize_model(use_refinement: bool = False, checkpoint: Optional[str] = None) -> bool:
    """Load (or reload) the global model singleton; returns success."""
    global model, _model_is_refinement, _model_checkpoint
    if model is not None and _model_is_refinement == use_refinement and _model_checkpoint == checkpoint:
        return True
    try:
        from ufm_tpu.models import (
            UniFlowMatchClassificationRefinement,
            UniFlowMatchConfidence,
        )

        cls = UniFlowMatchClassificationRefinement if use_refinement else UniFlowMatchConfidence
        model = cls.from_pretrained(checkpoint or _HUB_REPOS[use_refinement])
        _model_is_refinement = use_refinement
        _model_checkpoint = checkpoint
        print(f"Loaded {'refinement' if use_refinement else 'base'} model")
        return True
    except Exception as e:
        print(f"Failed to load model: {e}")
        model = None
        return False


def process_images(source_image, target_image, use_refinement: bool = False):
    """numpy RGB pair -> (flow color, covisibility heatmap, gated warp)."""
    from ufm_tpu.utils.viz import flow_to_color, warp_image_with_flow

    if source_image is None or target_image is None:
        return None, None, None
    if not initialize_model(use_refinement=use_refinement, checkpoint=_model_checkpoint):
        raise RuntimeError("model failed to load")

    src = np.asarray(source_image)
    tgt = np.asarray(target_image)

    result = model.predict_correspondences_batched(source_image=src, target_image=tgt)
    flow = np.asarray(result.flow.flow_output[0]).transpose(1, 2, 0)
    covis = np.asarray(result.covisibility.mask[0])

    flow_img = flow_to_color(flow)

    import matplotlib.cm as cm

    covis_img = (cm.viridis(np.clip(covis, 0, 1))[..., :3] * 255).astype(np.uint8)

    warped = warp_image_with_flow(src, None, tgt, flow)
    warped = covis[..., None] * warped + (1 - covis[..., None]) * 255
    warped_img = warped.astype(np.uint8)

    return flow_img, covis_img, warped_img


def create_demo():
    import gradio as gr

    with gr.Blocks(title="UFM-TPU: Unified Flow & Matching") as demo:
        gr.Markdown("# UFM-TPU: dense correspondences on TPU")
        gr.Markdown("Upload a source/target image pair; outputs are computed automatically.")

        with gr.Row():
            source = gr.Image(label="Source Image", type="numpy")
            target = gr.Image(label="Target Image", type="numpy")
        use_refinement = gr.Checkbox(label="Use refinement model", value=False)
        with gr.Row():
            flow_out = gr.Image(label="Flow (colorwheel)")
            covis_out = gr.Image(label="Covisibility")
            warp_out = gr.Image(label="Warped target (covisibility-gated)")

        inputs = [source, target, use_refinement]
        outputs = [flow_out, covis_out, warp_out]
        source.upload(process_images, inputs, outputs)
        target.upload(process_images, inputs, outputs)
        use_refinement.change(process_images, inputs, outputs)

        example_pairs = _bundled_example_pairs()
        if example_pairs:
            gr.Examples(examples=example_pairs, inputs=[source, target])

    return demo


def _bundled_example_pairs():
    import glob
    import os

    pairs = []
    # the reference's five real photo pairs lead the examples when the
    # read-only snapshot is mounted (same set as reference
    # gradio_demo.py:163-172); the generated synthetic pairs follow
    try:
        from ufm_tpu.utils.example_pairs import ensure_bundled_pairs, reference_pair_dir

        dirs = [d for d in (reference_pair_dir(), ensure_bundled_pairs()) if d]
    except Exception:  # demo examples are optional — an unwritable dir just means none
        return []
    for pair_dir in dirs:
        for img0 in sorted(glob.glob(os.path.join(pair_dir, "*_0.png"))):
            img1 = img0[: -len("_0.png")] + "_1.png"
            if os.path.exists(img1):
                pairs.append([img0, img1])
    return pairs


def main() -> None:
    initialize_model()
    create_demo().launch()


if __name__ == "__main__":
    main()
