"""The UFM network (flax): encode → info-share → heads → refinement.

This is the jittable core behind all three model variants
(reference uniflowmatch/models/ufm.py: ``UniFlowMatch`` :120-471,
``UniFlowMatchConfidence`` :474-707, ``UniFlowMatchClassificationRefinement``
:710-1238) — one module whose config switches the uncertainty head and the
classification-refinement stage on/off, exactly like the reference class
hierarchy does.

Dataflow (mirrors the reference forward, ufm.py:356-433/562-662/843-1009):
  1. both views are concatenated into one 2B batch for a single encoder pass
     (ufm.py:291-315), in bf16;
  2. the last encoder level of both views goes through the two-view
     global-attention info-sharing transformer, which returns the final map
     plus two intermediate taps per view (ufm.py:390-394);
  3. a 4-level pyramid [encoder_last, tap0, tap1, final] per view feeds the
     DPT heads in fp32 ("the prediction need precision", ufm.py:413-414);
  4. (confidence) a second DPT head on the stop-gradient pyramid predicts
     covariance / keypoint confidence / covisibility (ufm.py:617-660);
  5. (refinement) patch-MLP classification features + optional UNet fine
     features drive the fused neighborhood-attention refinement
     (ufm.py:949-1008) — here a single fused op with no P²-neighborhood
     materialization (see ufm_tpu/ops/refinement.py).

All tensors channel-last. Outputs are a flat dict of arrays (jit-friendly);
the wrapper in models/ufm.py converts to the reference dataclasses.
"""

from __future__ import annotations

from typing import Any, Dict, List, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ufm_tpu.models.config import UFMArchConfig
from ufm_tpu.nn.encoders import (
    _BENIGN_CONFIG_KEYS,
    ViTEncoderInput,
    feature_returner_encoder_factory,
)
from ufm_tpu.nn.info_sharing import INFO_SHARING_CLASSES, MultiViewTransformerInput
from ufm_tpu.nn.prediction_heads import (
    AdaptorMap,
    ConfidenceAdaptor,
    Covariance2DAdaptor,
    DPTFeature,
    DPTRegressionProcessor,
    FlowAdaptor,
    FlowWithConfidenceAdaptor,
    MaskAdaptor,
    MLPFeature,
    MoGeConvFeature,
    PredictionHeadInput,
    PredictionHeadLayeredInput,
)
from ufm_tpu.nn.unet import UNet
from ufm_tpu.ops.refinement import fused_refinement_attention

__all__ = ["UFMNet", "CLASSNAME_TO_ADAPTOR_CLASS", "interleave", "is_symmetrized"]


def _monolithic_barrier_enabled() -> bool:
    """UFM_REFINE_BARRIER=0 disables the backbone→tail optimization barrier
    in the monolithic refine graph (A/B knob; see __call__)."""
    import os

    return os.environ.get("UFM_REFINE_BARRIER", "1") != "0"

# Mirrors reference ufm.py:37-43.
CLASSNAME_TO_ADAPTOR_CLASS = {
    "FlowWithConfidenceAdaptor": FlowWithConfidenceAdaptor,
    "FlowAdaptor": FlowAdaptor,
    "MaskAdaptor": MaskAdaptor,
    "Covariance2DAdaptor": Covariance2DAdaptor,
    "ConfidenceAdaptor": ConfidenceAdaptor,
}


def is_symmetrized(gt1: Dict[str, Any], gt2: Dict[str, Any]) -> bool:
    """Detect (a,b),(b,a)-interleaved batches by instance ids
    (reference ufm.py:46-66)."""
    x = gt1["instance"]
    y = gt2["instance"]
    if len(x) == len(y) and len(x) == 1:
        return False
    ok = True
    for i in range(0, len(x), 2):
        ok = ok and (x[i] == y[i + 1]) and (x[i + 1] == y[i])
    return ok


def interleave(t1: jnp.ndarray, t2: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Re-expand per-pair features to the interleaved layout
    (reference ufm.py:69-82)."""
    r1 = jnp.stack([t1, t2], axis=1).reshape(-1, *t1.shape[1:])
    r2 = jnp.stack([t2, t1], axis=1).reshape(-1, *t1.shape[1:])
    return r1, r2


# Bookkeeping / weight-loading keys a UniCeption-style config may carry that
# genuinely don't affect the built architecture are dropped silently; the
# allowlist is imported from the encoder factory (single source of truth —
# a key tolerated by one config path but rejected by the other would make
# the same config.json load or fail depending on which module saw it).


def _filter_kwargs(cls, kwargs: Dict[str, Any]) -> Dict[str, Any]:
    # `name`/`parent` are flax module-tree plumbing, never config surface
    known = set(cls.__dataclass_fields__) - {"name", "parent"}
    unknown = set(kwargs) - known - _BENIGN_CONFIG_KEYS
    if unknown:
        # The HF config.json is the single source of architecture truth
        # (reference ufm.py:120, SURVEY.md §3.5): an unknown load-bearing key
        # (norm eps, attention variant, alternate mlp_ratio spelling) silently
        # dropped would build a wrong network that still loads the checkpoint.
        # Hard-fail, exactly like the encoder factory does.
        raise ValueError(
            f"{cls.__name__} config carries load-bearing options this implementation "
            f"does not support: {sorted(unknown)}. Refusing to build a silently-wrong "
            f"architecture; supported fields: {sorted(known)}."
        )
    return {k: v for k, v in kwargs.items() if k in known}


def _build_adaptor_map(adaptors_kwargs: Dict[str, Any]) -> AdaptorMap:
    adaptors = []
    for name, spec in adaptors_kwargs.items():
        cls = CLASSNAME_TO_ADAPTOR_CLASS[spec["class"]]
        adaptors.append(cls(name=name, **spec.get("kwargs", {})))
    return AdaptorMap(*adaptors)


class _DPTHead(nn.Module):
    """DPTFeature + DPTRegressionProcessor pipeline (reference head1 layout,
    ufm.py:262-264)."""

    feature_kwargs: Dict[str, Any]
    processor_kwargs: Dict[str, Any]

    @nn.compact
    def __call__(self, inp: PredictionHeadLayeredInput):
        fused = DPTFeature(name="feature", **_filter_kwargs(DPTFeature, self.feature_kwargs))(inp)
        return DPTRegressionProcessor(
            name="processor", **_filter_kwargs(DPTRegressionProcessor, self.processor_kwargs)
        )(fused, inp.target_output_shape)


class UFMNet(nn.Module):
    cfg: UFMArchConfig

    def setup(self):
        c = self.cfg
        dt = jnp.dtype(c.compute_dtype)
        assert c.info_sharing_and_head_structure == "dual+single", "Only dual+single is supported"
        assert c.head_type != "linear", "Linear head is not supported"

        tr = getattr(c, "train_remat", False)
        policy = {"remat_policy": p} if (p := getattr(c, "train_remat_policy", None)) else {}
        remat_enc = {"remat": True, **policy} if tr in (True, "all", "encoder") else {}
        remat_info = {"remat": True, **policy} if tr in (True, "all") else {}
        self.encoder = feature_returner_encoder_factory(
            c.encoder_str, dtype=dt, **{**c.encoder_kwargs, **remat_enc}
        )
        self.info_sharing = INFO_SHARING_CLASSES[c.info_sharing_str][1](
            dtype=dt,
            **{
                **_filter_kwargs(INFO_SHARING_CLASSES[c.info_sharing_str][1], c.info_sharing_kwargs),
                **remat_info,
            },
        )

        self.head1 = self._make_head(c.head_type, c.feature_head_kwargs, name="head1")
        self._head1_adaptors = _build_adaptor_map(c.adaptors_kwargs)

        if c.has_uncertainty_head:
            assert c.uncertainty_head_type == "dpt", "Only DPT is supported for the uncertainty head"
            self.uncertainty_head = self._make_head("dpt", c.uncertainty_head_kwargs, name="uncertainty_head")
            self._uncertainty_adaptors = _build_adaptor_map(c.uncertainty_adaptors_kwargs)

        if c.has_classification_head:
            assert c.classification_head_type == "patch_mlp", "Only patch_mlp classification head is supported"
            self.classification_head = MLPFeature(
                name="classification_head", **_filter_kwargs(MLPFeature, c.classification_head_kwargs)
            )
            p = c.refinement_range
            self.classification_bias = self.param("classification_bias", nn.initializers.zeros, (p * p,))
            if c.use_unet_feature:
                # the reference runs the UNet OUTSIDE the heads' fp32 autocast
                # block (ufm.py:915-917 vs :921), i.e. in the ambient bf16
                # autocast — so it gets the backbone compute dtype here
                self.unet_feature = UNet(
                    name="unet_feature", **{"dtype": dt, **_filter_kwargs(UNet, c.unet_kwargs)}
                )
                out_c = self.classification_head.output_dim
                self.conv1 = nn.Conv(2 * out_c, (1, 1), name="conv1")
                self.conv2 = nn.Conv(out_c, (1, 1), name="conv2")

    def _make_head(self, head_type: str, feature_head_kwargs: Dict[str, Any], name: str):
        if head_type == "dpt":
            return _DPTHead(
                feature_kwargs=feature_head_kwargs.get("dpt_feature", {}),
                processor_kwargs=feature_head_kwargs.get("dpt_processor", {}),
                name=name,
            )
        if head_type == "moge_conv":
            return MoGeConvFeature(name=name, **_filter_kwargs(MoGeConvFeature, feature_head_kwargs))
        raise ValueError(f"Head type {head_type} not supported.")

    # ---- encoding -----------------------------------------------------------
    def _encode_image_pairs(self, img1: jnp.ndarray, img2: jnp.ndarray):
        """One encoder pass over the concatenated 2B batch (ufm.py:291-315)."""
        assert img1.shape[1:3] == img2.shape[1:3], "Unequal image sizes are not supported"
        stacked = jnp.concatenate([img1, img2], axis=0)
        outputs = self.encoder(ViTEncoderInput(image=stacked, data_norm_type=self.cfg.encoder_kwargs.get("data_norm_type", "dinov2")))
        b = img1.shape[0]
        feat1 = [o.features[:b] for o in outputs]
        feat2 = [o.features[b:] for o in outputs]
        return feat1, feat2

    def _encode_symmetrized(self, img1, img2, symmetrized: bool):
        """Symmetric-pair dedup: encode each unique pair once, then mirror
        (ufm.py:321-354). ``symmetrized`` is static under jit."""
        if symmetrized:
            f1_half, f2_half = self._encode_image_pairs(img1[::2], img2[::2])
            feat1, feat2 = [], []
            for a, b_ in zip(f1_half, f2_half):
                a2, b2 = interleave(a, b_)
                feat1.append(a2)
                feat2.append(b2)
            return feat1, feat2
        return self._encode_image_pairs(img1, img2)

    # ---- forward ------------------------------------------------------------
    def __call__(self, img1: jnp.ndarray, img2: jnp.ndarray, symmetrized: bool = False) -> Dict[str, jnp.ndarray]:
        """img1/img2: (B, H, W, 3) normalized. Returns a flat output dict."""
        out = self.backbone(img1, img2, symmetrized)
        if self.cfg.has_classification_head:
            if _monolithic_barrier_enabled():
                # Scheduling barrier at the backbone→tail seam. The staged
                # two-dispatch pipeline (models/base.py) runs these halves
                # ~2.5× faster than the single fused graph (BENCH_NOTES.md:
                # stage sum ~160 ms vs fused ~395 ms/b2); the barrier stops
                # XLA from interleaving tail fusions into the backbone
                # schedule inside the monolithic graph, recovering staged-
                # like behavior for callers that need one dispatch (e.g.
                # training the refine variant end-to-end).
                out = jax.lax.optimization_barrier(out)
            out.update(
                self.refine_tail(img1, img2, out["flow"], out.pop("cls_in_0"), out.pop("cls_in_1"))
            )
        return out

    def backbone(self, img1: jnp.ndarray, img2: jnp.ndarray, symmetrized: bool = False) -> Dict[str, jnp.ndarray]:
        """Encoder → info-sharing → DPT heads: everything up to (but not
        including) the classification-refinement stage. ``out["flow"]`` is the
        regression flow; refine configs additionally get the two
        classification-feature inputs (``cls_in_0/1``) for ``refine_tail``.

        Exposed as its own method (usable via ``apply(..., method="backbone")``)
        so the refine variant can run as TWO smaller jitted dispatches — the
        monolithic refine graph is large enough to strain compilers, and the
        split measurably schedules better (see BENCH_NOTES.md).
        """
        c = self.cfg
        shape1 = (img1.shape[1], img1.shape[2])

        # jax.named_scope annotations surface the stage boundaries in
        # jax.profiler traces and HLO metadata (the tracing hook the
        # reference lacks entirely; SURVEY.md §5).
        with jax.named_scope("encoder"):
            feat1_list, feat2_list = self._encode_symmetrized(img1, img2, symmetrized)

        with jax.named_scope("info_sharing"):
            final, intermediates = self.info_sharing(
                MultiViewTransformerInput(features=[feat1_list[-1], feat2_list[-1]])
            )

        def pyramid(view: int) -> List[jnp.ndarray]:
            enc_last = feat1_list[-1] if view == 0 else feat2_list[-1]
            return [
                enc_last.astype(jnp.float32),
                intermediates[0].features[view].astype(jnp.float32),
                intermediates[1].features[view].astype(jnp.float32),
                final.features[view].astype(jnp.float32),
            ]

        pyr1 = pyramid(0)
        out: Dict[str, jnp.ndarray] = {}

        with jax.named_scope("head1"):
            head1_out = self._head1_adaptors(
                self.head1(PredictionHeadLayeredInput(list_features=pyr1, target_output_shape=shape1))
            )

        flow = head1_out["flow"].value  # (B, H, W, 2)

        if "flow_cov" in head1_out:
            out["flow_cov"] = head1_out["flow_cov"].covariance
            out["flow_cov_inv"] = head1_out["flow_cov"].inv_covariance
            out["flow_cov_log_det"] = head1_out["flow_cov"].log_det
        if "non_occluded_mask" in head1_out:
            out["covis_mask"] = head1_out["non_occluded_mask"].mask
            out["covis_logits"] = head1_out["non_occluded_mask"].logits

        if c.has_uncertainty_head:
            pyr_unc = [jax.lax.stop_gradient(f) for f in pyr1] if c.detach_uncertainty_head else pyr1
            with jax.named_scope("uncertainty_head"):
                unc_out = self._uncertainty_adaptors(
                    self.uncertainty_head(
                        PredictionHeadLayeredInput(list_features=pyr_unc, target_output_shape=shape1)
                    )
                )
            if "flow_cov" in unc_out:
                out["flow_cov"] = unc_out["flow_cov"].covariance
                out["flow_cov_inv"] = unc_out["flow_cov"].inv_covariance
                out["flow_cov_log_det"] = unc_out["flow_cov"].log_det
            if "keypoint_confidence" in unc_out:
                out["keypoint_confidence"] = unc_out["keypoint_confidence"].value[..., 0]
            if "non_occluded_mask" in unc_out:
                out["covis_mask"] = unc_out["non_occluded_mask"].mask
                out["covis_logits"] = unc_out["non_occluded_mask"].logits

        if c.has_classification_head:
            # low-level + globally-shared features per view (ufm.py:949-965)
            out["cls_in_0"] = jnp.concatenate([feat1_list[0].astype(jnp.float32), pyr1[-1]], axis=-1)
            out["cls_in_1"] = jnp.concatenate(
                [feat2_list[0].astype(jnp.float32), final.features[1].astype(jnp.float32)], axis=-1
            )

        out["flow"] = flow
        return out

    def refine_tail(
        self,
        img1: jnp.ndarray,
        img2: jnp.ndarray,
        flow: jnp.ndarray,
        cls_in_0: jnp.ndarray,
        cls_in_1: jnp.ndarray,
    ) -> Dict[str, jnp.ndarray]:
        """Classification-refinement stage (ufm.py:949-1008): patch-MLP
        classification features (+ optional UNet fine features) → fused
        neighborhood attention → flow residual. ``flow`` is the regression
        flow from ``backbone``."""
        c = self.cfg
        out: Dict[str, jnp.ndarray] = {}

        stacked = jnp.concatenate([cls_in_0, cls_in_1], axis=0)
        cls_features = self.classification_head(PredictionHeadInput(last_feature=stacked)).decoded_channels

        if c.use_unet_feature:
            unet_feat = self.unet_feature(jnp.concatenate([img1, img2], axis=0)).astype(jnp.float32)
            if c.feature_combine_method == "conv":
                combined = jnp.concatenate([cls_features, unet_feat], axis=-1)
                combined = nn.relu(self.conv1(combined))
                cls_features = self.conv2(combined)
            elif c.feature_combine_method == "modulate":
                cls_features = self.conv2(cls_features * jnp.tanh(unet_feat))
            else:
                raise ValueError(f"unknown feature_combine_method: {c.feature_combine_method}")

        b = img1.shape[0]
        cls_feat_0, cls_feat_1 = cls_features[:b], cls_features[b:]

        with jax.named_scope("refinement"):
            residual, log_softmax = fused_refinement_attention(
                cls_feat_0,
                cls_feat_1,
                flow,
                self.classification_bias,
                c.temperature,
                c.refinement_range,
                impl=getattr(c, "refinement_impl", "auto"),
                precision=getattr(c, "refinement_matmul_precision", "default"),
            )
        out["regression_flow"] = flow
        out["flow"] = flow + residual
        out["refinement_residual"] = residual
        out["refinement_log_softmax"] = log_softmax
        out["refinement_feature_map_0"] = cls_feat_0
        out["refinement_feature_map_1"] = cls_feat_1
        return out
