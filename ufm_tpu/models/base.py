"""Model base: output interfaces + the batched prediction pipeline.

TPU-native re-creation of ``uniflowmatch/models/base.py``: the output
dataclasses (reference base.py:11-72) and ``UniFlowMatchModelsBase`` with
``predict_correspondences_batched`` (reference base.py:85-334).

Public arrays follow the reference's BCHW convention (flow (B, 2, H, W),
masks (B, H, W)); everything inside the jitted pipeline is channel-last.

TPU-first pipeline design: input resolution selection happens host-side over
the *static* set of trained resolutions (AutomaticShapeSelection,
closest-aspect); for each (input shape, model resolution) pair one jitted
function — normalize → antialias resize → forward → unmap — is compiled and
cached. uint8→float conversion, both normalization paths (reference
base.py:187-231), the forward pass, and the unmap all fuse into a single XLA
program, so one host→device transfer of the raw images is the only copy.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Optional, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from ufm_tpu.nn.encoders.image_normalizations import IMAGE_NORMALIZATION_DICT
from ufm_tpu.utils.flow_resizing import (
    AutomaticShapeSelection,
    ResizeToFixedManipulation,
    unmap_predicted_channels,
    unmap_predicted_flow,
)

__all__ = [
    "UFMFlowFieldOutput",
    "UFMMaskFieldOutput",
    "UFMClassificationRefinementOutput",
    "UFMOutputInterface",
    "UniFlowMatchModelsBase",
]


@dataclasses.dataclass
class UFMFlowFieldOutput:
    """Flow field prediction (reference base.py:11-20). BCHW."""

    flow_output: jnp.ndarray
    flow_covariance: Optional[jnp.ndarray] = None
    flow_covariance_inv: Optional[jnp.ndarray] = None
    flow_covariance_log_det: Optional[jnp.ndarray] = None


@dataclasses.dataclass
class UFMMaskFieldOutput:
    """Mask prediction (reference base.py:23-30). (B, H, W)."""

    mask: jnp.ndarray
    logits: Optional[jnp.ndarray] = None


@dataclasses.dataclass
class UFMClassificationRefinementOutput:
    """Refinement internals (reference base.py:33-57)."""

    regression_flow_output: jnp.ndarray  # (B, 2, H, W)
    residual: jnp.ndarray  # (B, 2, H, W)
    log_softmax: jnp.ndarray  # (B, H, W, P, P)
    feature_map_0: jnp.ndarray
    feature_map_1: jnp.ndarray


@dataclasses.dataclass
class UFMOutputInterface:
    """Top-level output (reference base.py:60-72)."""

    flow: Optional[UFMFlowFieldOutput] = None
    classification_refinement: Optional[UFMClassificationRefinementOutput] = None
    covisibility: Optional[UFMMaskFieldOutput] = None
    keypoint_confidence: Optional[jnp.ndarray] = None


def _to_bchw_numpyish(image) -> Tuple[np.ndarray, bool]:
    """Accept BCHW/BHWC/CHW/HWC, return (BCHW array, was_batched)."""
    arr = np.asarray(image)
    assert arr.ndim in (3, 4), f"image must have 3 or 4 dims, got {arr.ndim}"
    batched = arr.ndim == 4
    if not batched:
        arr = arr[None]
    if arr.shape[1] == 3:
        pass
    elif arr.shape[-1] == 3:
        arr = np.moveaxis(arr, -1, 1)
    else:
        raise ValueError("images must have 3 channels in either BCHW or BHWC format")
    return arr, batched


class UniFlowMatchModelsBase:
    """Prediction API shared by all model variants.

    Subclasses provide ``forward_raw(scaled_bhwc_pair) -> dict`` (the jittable
    network apply, channel-last) and ``data_norm_type``.
    """

    def __init__(self, inference_resolution: Optional[Union[List[Tuple[int, int]], Tuple[int, int]]] = None):
        if inference_resolution is None:
            inference_resolution = [(560, 420)]
        if isinstance(inference_resolution[0], int):
            inference_resolution = [tuple(inference_resolution)]
        # (W, H) tuples, mirroring the reference convention (base.py:86-100)
        self.inference_resolution = [tuple(r) for r in inference_resolution]
        self.image_scaler = AutomaticShapeSelection(
            *[ResizeToFixedManipulation((r[1], r[0])) for r in self.inference_resolution],
            strategy="closest_aspect",
        )
        self._pipeline_cache: Dict[Any, Any] = {}

    # ``image_scaler`` is settable public API (crop/composite chains replace
    # it); the pipeline cache must never serve a pipeline compiled for a
    # previous scaler. ``id()`` of the scaler is unsafe as a cache key — a
    # garbage-collected predecessor's id can be reused — so assignment bumps a
    # monotonic generation token that the cache key carries instead.
    @property
    def image_scaler(self):
        return self._image_scaler

    @image_scaler.setter
    def image_scaler(self, value) -> None:
        self._image_scaler = value
        self._scaler_generation = getattr(self, "_scaler_generation", -1) + 1

    # ---- subclass interface -------------------------------------------------
    @property
    def data_norm_type(self) -> str:
        raise NotImplementedError

    def network_apply(self, img1_bhwc: jnp.ndarray, img2_bhwc: jnp.ndarray) -> Dict[str, jnp.ndarray]:
        """Run the network on normalized channel-last inputs; returns the raw
        output dict (see models/ufm.py)."""
        raise NotImplementedError

    # ---- public API ---------------------------------------------------------
    def predict_correspondences_batched(
        self,
        source_image,
        target_image,
        data_norm_type: Optional[str] = None,
    ) -> UFMOutputInterface:
        """Predict dense correspondences between source and target images.

        Accepts numpy/jax arrays shaped BCHW/BHWC/CHW/HWC, dtype uint8 or
        float32 (float inputs must state their ``data_norm_type``; reference
        base.py:187-213). Returns flow (B, 2, H, W) in source-image pixel
        space plus covisibility (B, H, W).
        """
        src, batched = _to_bchw_numpyish(source_image)
        tgt, _ = _to_bchw_numpyish(target_image)

        if src.dtype == np.float32:
            assert data_norm_type is not None, "data_norm_type must be provided for float32 images"
            assert data_norm_type in IMAGE_NORMALIZATION_DICT, (
                f"data_norm_type must be one of {list(IMAGE_NORMALIZATION_DICT)}"
            )
        elif src.dtype == np.uint8:
            data_norm_type = None
        else:
            raise ValueError("images must be uint8 or float32")

        pipeline, regions = self._build_pipeline(
            src.shape, tgt.shape, str(src.dtype), data_norm_type
        )
        raw = pipeline(self._params_for_apply(), jnp.asarray(src), jnp.asarray(tgt))

        result = UFMOutputInterface()
        result.flow = UFMFlowFieldOutput(flow_output=raw["flow"])
        if "flow_covariance" in raw:
            result.flow.flow_covariance = raw["flow_covariance"]
        if "covisibility" in raw:
            result.covisibility = UFMMaskFieldOutput(mask=raw["covisibility"], logits=None)
        if "keypoint_confidence" in raw:
            result.keypoint_confidence = raw["keypoint_confidence"]
        return result

    # ---- pipeline construction ---------------------------------------------
    def _params_for_apply(self):
        raise NotImplementedError

    def _network_fn(self):
        """Return f(params, img1_bhwc, img2_bhwc) -> raw output dict."""
        raise NotImplementedError

    def _use_staged_inference(self) -> bool:
        """When true the pipeline runs as backbone + refine_tail dispatches
        (refine variant; see models/network.py UFMNet.backbone)."""
        return False

    def _network_backbone_fn(self):
        raise NotImplementedError

    def _network_tail_fn(self):
        raise NotImplementedError

    def _build_pipeline(self, src_shape, tgt_shape, dtype_str, data_norm_type):
        key = (
            tuple(src_shape),
            tuple(tgt_shape),
            dtype_str,
            data_norm_type,
            self._scaler_generation,
            self._use_staged_inference(),
        )
        if key in self._pipeline_cache:
            return self._pipeline_cache[key]

        h0, w0 = src_shape[2], src_shape[3]
        h1, w1 = tgt_shape[2], tgt_shape[3]
        (th0, tw0, th1, tw1), manipulation = self.image_scaler.select(h0, w0, h1, w1)
        assert manipulation is not None, f"no manipulation accepts inputs {(h0, w0)}/{(h1, w1)}"
        assert (th0, tw0) == (th1, tw1), "both views share the model resolution"

        from ufm_tpu.utils.flow_resizing import _identity_regions

        def _run_manipulation(src_bhwc, tgt_bhwc):
            """The selected manipulation, exactly as the reference runs it
            (base.py:255-266): image ops trace into the pipeline, region
            bookkeeping happens host-side on static shapes."""
            return manipulation(
                src_bhwc,
                tgt_bhwc,
                _identity_regions(h0, w0),
                _identity_regions(h1, w1),
                _identity_regions(h0, w0),
                _identity_regions(h1, w1),
            )

        # extract the static region vectors without any device compute
        region_cell = {}

        def _probe(a, b):
            out = _run_manipulation(a, b)
            region_cell["regions"] = out[2:]
            return out[0]

        b0, b1 = src_shape[0], tgt_shape[0]
        jax.eval_shape(
            _probe,
            jax.ShapeDtypeStruct((b0, h0, w0, 3), jnp.float32),
            jax.ShapeDtypeStruct((b1, h1, w1, 3), jnp.float32),
        )
        src_region_source, tgt_region_source, src_region_repr, tgt_region_repr = region_cell["regions"]

        required = self.data_norm_type
        req = IMAGE_NORMALIZATION_DICT[required]
        req_mean = jnp.asarray(req.mean)
        req_std = jnp.asarray(req.std)
        if data_norm_type is not None and data_norm_type != required:
            prev = IMAGE_NORMALIZATION_DICT[data_norm_type]
            prev_mean = jnp.asarray(prev.mean)
            prev_std = jnp.asarray(prev.std)
        else:
            prev_mean = prev_std = None

        def preprocess(src_bchw, tgt_bchw):
            # layout + dtype + normalization (fused; reference base.py:187-231)
            src = jnp.transpose(src_bchw, (0, 2, 3, 1))
            tgt = jnp.transpose(tgt_bchw, (0, 2, 3, 1))
            if dtype_str == "uint8":
                src = (src.astype(jnp.float32) / 255.0 - req_mean) / req_std
                tgt = (tgt.astype(jnp.float32) / 255.0 - req_mean) / req_std
            elif prev_mean is not None:
                src = src * (prev_std / req_std) + (prev_mean - req_mean) / req_std
                tgt = tgt * (prev_std / req_std) + (prev_mean - req_mean) / req_std

            # run the selected manipulation to the model grid (reference
            # base.py:255-266) — resize chains, crops, composites all flow
            # through here with exact region bookkeeping
            return _run_manipulation(src, tgt)[:2]

        def postprocess(raw):
            out: Dict[str, jnp.ndarray] = {}
            flow_unmapped, _ = unmap_predicted_flow(
                raw["flow"],
                src_region_repr,
                tgt_region_repr,
                src_region_source,
                tgt_region_source,
                (h0, w0),
                (h1, w1),
            )
            out["flow"] = jnp.transpose(flow_unmapped, (0, 3, 1, 2))

            if "flow_cov" in raw:
                cov_unmapped, _ = unmap_predicted_channels(
                    raw["flow_cov"], src_region_repr, src_region_source, (h0, w0)
                )
                w_ratio, h_ratio = w0 / tw0, h0 / th0
                scale = jnp.asarray([w_ratio**2, h_ratio**2, w_ratio * h_ratio], dtype=jnp.float32)
                out["flow_covariance"] = jnp.transpose(cov_unmapped * scale, (0, 3, 1, 2))

            if "covis_mask" in raw:
                covis_unmapped, _ = unmap_predicted_channels(
                    raw["covis_mask"][..., None], src_region_repr, src_region_source, (h0, w0)
                )
                out["covisibility"] = covis_unmapped[..., 0]

            if "keypoint_confidence" in raw:
                conf_unmapped, _ = unmap_predicted_channels(
                    raw["keypoint_confidence"][..., None], src_region_repr, src_region_source, (h0, w0)
                )
                out["keypoint_confidence"] = conf_unmapped[..., 0]

            return out

        if self._use_staged_inference():
            # Refine variant on TPU: run as TWO compiled programs —
            # normalize→resize→backbone, then refine_tail→unmap. The
            # monolithic refine graph is large enough to strain compilers and
            # schedules measurably worse than its stages (BENCH_NOTES.md);
            # intermediates stay device-resident between the dispatches.
            backbone_fn = self._network_backbone_fn()
            tail_fn = self._network_tail_fn()

            @jax.jit
            def stage1(params, src_bchw, tgt_bchw):
                src_s, tgt_s = preprocess(src_bchw, tgt_bchw)
                return src_s, tgt_s, backbone_fn(params, src_s, tgt_s)

            @jax.jit
            def stage2(params, src_s, tgt_s, back):
                tail = tail_fn(params, src_s, tgt_s, back["flow"], back["cls_in_0"], back["cls_in_1"])
                raw = {k: v for k, v in back.items() if k not in ("cls_in_0", "cls_in_1")}
                raw.update(tail)
                return postprocess(raw)

            def pipeline(params, src_bchw, tgt_bchw):
                src_s, tgt_s, back = stage1(params, src_bchw, tgt_bchw)
                return stage2(params, src_s, tgt_s, back)

            jitted = pipeline
        else:
            network_fn = self._network_fn()

            @jax.jit
            def jitted(params, src_bchw, tgt_bchw):
                src_s, tgt_s = preprocess(src_bchw, tgt_bchw)
                return postprocess(network_fn(params, src_s, tgt_s))

        entry = (jitted, (src_region_source, tgt_region_source, src_region_repr, tgt_region_repr))
        self._pipeline_cache[key] = entry
        return entry
