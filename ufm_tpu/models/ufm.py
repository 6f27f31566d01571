"""UFM model family — public API matching the reference classes.

``UniFlowMatch`` / ``UniFlowMatchConfidence`` /
``UniFlowMatchClassificationRefinement`` mirror the constructor signatures,
``forward(view1, view2)`` contract, ``predict_correspondences_batched``,
``from_pretrained`` / ``from_pretrained_ckpt`` and ``get_parameter_groups``
of the reference (uniflowmatch/models/ufm.py:120-241, 356-433, 455-471,
474-707, 710-1238), so a user of the reference can switch imports and keep
their code.

Implementation: each wrapper owns a :class:`ufm_tpu.models.network.UFMNet`
flax module plus its parameter pytree, and compiles per-shape jitted apply
functions on demand. Public tensors are BCHW like the reference; everything
inside jit is channel-last.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Optional, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from ufm_tpu.models.base import (
    UFMClassificationRefinementOutput,
    UFMFlowFieldOutput,
    UFMMaskFieldOutput,
    UFMOutputInterface,
    UniFlowMatchModelsBase,
)
from ufm_tpu.models.config import UFMArchConfig
from ufm_tpu.models.network import UFMNet, is_symmetrized

__all__ = [
    "UniFlowMatch",
    "UniFlowMatchConfidence",
    "UniFlowMatchClassificationRefinement",
]


class UniFlowMatch(UniFlowMatchModelsBase):
    """Base model: flow (+ optional covisibility from head1 adaptors)."""

    def __init__(
        self,
        # Encoder configurations
        encoder_str: str = "dinov2_large",
        encoder_kwargs: Optional[Dict[str, Any]] = None,
        # Info sharing & output head structure
        info_sharing_and_head_structure: str = "dual+single",
        info_sharing_str: str = "global_attention",
        info_sharing_kwargs: Optional[Dict[str, Any]] = None,
        # Skip-connections (accepted for config compatibility; unused, like
        # the reference which stores but never consumes them, ufm.py:182-184)
        encoder_skip_connection: Optional[List[int]] = None,
        info_sharing_skip_connection: Optional[List[int]] = None,
        # Prediction heads & adaptors
        head_type: str = "dpt",
        feature_head_kwargs: Optional[Dict[str, Any]] = None,
        adaptors_kwargs: Optional[Dict[str, Any]] = None,
        # Pretrained weights
        pretrained_checkpoint_path: Optional[str] = None,
        # Inference settings
        inference_resolution: Optional[Union[Tuple[int, int], List[Tuple[int, int]]]] = (560, 420),
        # TPU-specific extras
        compute_dtype: str = "bfloat16",
        **extra_config,
    ):
        UniFlowMatchModelsBase.__init__(self, inference_resolution=inference_resolution)

        self.config = UFMArchConfig(
            encoder_str=encoder_str,
            encoder_kwargs=dict(encoder_kwargs or {}),
            info_sharing_and_head_structure=info_sharing_and_head_structure,
            info_sharing_str=info_sharing_str,
            info_sharing_kwargs=dict(info_sharing_kwargs or {}),
            head_type=head_type,
            feature_head_kwargs=dict(feature_head_kwargs or {}),
            adaptors_kwargs=dict(adaptors_kwargs or {}),
            inference_resolution=self.inference_resolution,
            compute_dtype=compute_dtype,
            **{
                k: v
                for k, v in extra_config.items()
                if k in {f.name for f in dataclasses.fields(UFMArchConfig)}
            },
        )
        self.encoder_skip_connection = encoder_skip_connection
        self.info_sharing_skip_connection = info_sharing_skip_connection

        self.net = UFMNet(self.config)
        self.params: Optional[Dict[str, Any]] = None
        self._apply_cache: Dict[Any, Any] = {}

        if pretrained_checkpoint_path is not None:
            from ufm_tpu.checkpoint import load_torch_checkpoint_into

            load_torch_checkpoint_into(self, pretrained_checkpoint_path)

    # ---- config/constructor plumbing ---------------------------------------
    @classmethod
    def from_config(cls, config: Union[UFMArchConfig, Dict[str, Any]], seed: int = 0) -> "UniFlowMatch":
        if isinstance(config, UFMArchConfig):
            config = config.to_dict()
        model = cls(**config)
        model.init_params(seed=seed)
        return model

    @classmethod
    def from_pretrained(cls, pretrained_model_name_or_path: str, **kwargs) -> "UniFlowMatch":
        """Load from a local directory (config.json + weights) or, when
        network access exists, a HuggingFace Hub repo (reference contract:
        ufm.py:120 via PyTorchModelHubMixin)."""
        from ufm_tpu.checkpoint import load_pretrained

        return load_pretrained(cls, pretrained_model_name_or_path, **kwargs)

    @classmethod
    def from_pretrained_ckpt(cls, pretrained_model_name_or_path: str, strict: bool = True, **kw) -> "UniFlowMatch":
        """Load from a torch training checkpoint with embedded ``model_args``
        (reference ufm.py:219-241)."""
        from ufm_tpu.checkpoint import load_pretrained_ckpt

        return load_pretrained_ckpt(cls, pretrained_model_name_or_path, strict=strict, **kw)

    def save_pretrained(self, save_directory: str) -> None:
        from ufm_tpu.checkpoint import save_pretrained

        save_pretrained(self, save_directory)

    # ---- parameters ---------------------------------------------------------
    def init_params(self, seed: int = 0, batch_size: int = 1) -> None:
        w, h = self.inference_resolution[0]
        img = jnp.zeros((batch_size, h, w, 3), dtype=jnp.float32)
        # jit the init: one dispatch instead of thousands of eager ops
        variables = jax.jit(self.net.init)(jax.random.PRNGKey(seed), img, img)
        self.params = variables["params"]

    def _params_for_apply(self):
        assert self.params is not None, (
            "model parameters are not initialized — call init_params(), "
            "from_pretrained(), or from_config() first"
        )
        return self.params

    @property
    def data_norm_type(self) -> str:
        return self.config.encoder_kwargs.get("data_norm_type", "dinov2")

    def get_parameter_groups(self) -> Dict[str, Any]:
        """Per-submodule parameter subtrees for per-group optimizer LRs
        (reference ufm.py:455-471)."""
        params = self._params_for_apply()
        groups = {
            "encoder": params["encoder"],
            "info_sharing": params["info_sharing"],
            "output_head": params["head1"],
        }
        if "uncertainty_head" in params:
            groups["uncertainty_head"] = params["uncertainty_head"]
        if "classification_head" in params:
            groups["classification_head"] = params["classification_head"]
        if "unet_feature" in params:
            unet_group = {"unet_feature": params["unet_feature"]}
            for k in ("conv1", "conv2", "classification_bias"):
                if k in params:
                    unet_group[k] = params[k]
            groups["unet_feature"] = unet_group
        elif "classification_bias" in params:
            groups["classification_head"] = {
                "classification_head": params["classification_head"],
                "classification_bias": params["classification_bias"],
            }
        return groups

    # ---- forward ------------------------------------------------------------
    def _network_fn(self):
        net = self.net

        def fn(params, img1, img2):
            return net.apply({"params": params}, img1, img2)

        return fn

    def _use_staged_inference(self) -> bool:
        """Refine variant runs inference as two compiled programs (backbone +
        refine_tail) by default — the monolithic graph strains compilers and
        schedules worse (BENCH_NOTES.md). ``UFM_STAGED_REFINE=0`` forces the
        single-program path."""
        import os

        if not self.config.has_classification_head:
            return False
        env = os.environ.get("UFM_STAGED_REFINE")
        return env != "0" if env is not None else True

    def _network_backbone_fn(self):
        net = self.net

        def fn(params, img1, img2):
            return net.apply({"params": params}, img1, img2, method="backbone")

        return fn

    def _network_tail_fn(self):
        net = self.net

        def fn(params, img1, img2, flow, cls_in_0, cls_in_1):
            return net.apply({"params": params}, img1, img2, flow, cls_in_0, cls_in_1, method="refine_tail")

        return fn

    def _jitted_apply(self, shape, symmetrized: bool):
        key = (tuple(shape), symmetrized, self._use_staged_inference())
        if key not in self._apply_cache:
            net = self.net
            if self._use_staged_inference():
                backbone = jax.jit(
                    lambda params, i1, i2: net.apply(
                        {"params": params}, i1, i2, symmetrized, method="backbone"
                    )
                )
                tail = jax.jit(
                    lambda params, i1, i2, fl, c0, c1: net.apply(
                        {"params": params}, i1, i2, fl, c0, c1, method="refine_tail"
                    )
                )

                def staged(params, i1, i2):
                    back = backbone(params, i1, i2)
                    t = tail(params, i1, i2, back["flow"], back["cls_in_0"], back["cls_in_1"])
                    raw = {k: v for k, v in back.items() if k not in ("cls_in_0", "cls_in_1")}
                    raw.update(t)
                    return raw

                self._apply_cache[key] = staged
            else:
                self._apply_cache[key] = jax.jit(
                    lambda params, i1, i2: net.apply({"params": params}, i1, i2, symmetrized=symmetrized)
                )
        return self._apply_cache[key]

    def __call__(self, view1: Dict[str, Any], view2: Dict[str, Any]) -> UFMOutputInterface:
        return self.forward(view1, view2)

    def forward(self, view1: Dict[str, Any], view2: Dict[str, Any]) -> UFMOutputInterface:
        """Reference forward contract (ufm.py:356-433): views are dicts with
        ``img`` (B, C, H, W) normalized, optional ``instance`` ids and
        ``symmetrized`` flag. Returns :class:`UFMOutputInterface` in BCHW."""
        img1 = jnp.transpose(jnp.asarray(view1["img"]), (0, 2, 3, 1))
        img2 = jnp.transpose(jnp.asarray(view2["img"]), (0, 2, 3, 1))
        symmetrized = bool(view1.get("symmetrized", False))

        raw = self._jitted_apply(img1.shape, symmetrized)(self._params_for_apply(), img1, img2)
        return self._raw_to_interface(raw)

    def _raw_to_interface(self, raw: Dict[str, jnp.ndarray]) -> UFMOutputInterface:
        result = UFMOutputInterface()
        result.flow = UFMFlowFieldOutput(flow_output=jnp.transpose(raw["flow"], (0, 3, 1, 2)))
        if "flow_cov" in raw:
            result.flow.flow_covariance = jnp.transpose(raw["flow_cov"], (0, 3, 1, 2))
            result.flow.flow_covariance_inv = jnp.transpose(raw["flow_cov_inv"], (0, 3, 1, 2))
            result.flow.flow_covariance_log_det = raw["flow_cov_log_det"]
        if "covis_mask" in raw:
            result.covisibility = UFMMaskFieldOutput(mask=raw["covis_mask"], logits=raw["covis_logits"])
        if "keypoint_confidence" in raw:
            result.keypoint_confidence = raw["keypoint_confidence"]
        if "refinement_residual" in raw:
            result.classification_refinement = UFMClassificationRefinementOutput(
                regression_flow_output=jnp.transpose(raw["regression_flow"], (0, 3, 1, 2)),
                residual=jnp.transpose(raw["refinement_residual"], (0, 3, 1, 2)),
                log_softmax=raw["refinement_log_softmax"],
                feature_map_0=jnp.transpose(raw["refinement_feature_map_0"], (0, 3, 1, 2)),
                feature_map_1=jnp.transpose(raw["refinement_feature_map_1"], (0, 3, 1, 2)),
            )
        return result


class UniFlowMatchConfidence(UniFlowMatch):
    """UFM-Base variant: adds the uncertainty head (covariance, keypoint
    confidence, covisibility) — reference ufm.py:474-707."""

    def __init__(
        self,
        encoder_str: str = "dinov2_large",
        encoder_kwargs: Optional[Dict[str, Any]] = None,
        info_sharing_and_head_structure: str = "dual+single",
        info_sharing_str: str = "global_attention",
        info_sharing_kwargs: Optional[Dict[str, Any]] = None,
        head_type: str = "dpt",
        feature_head_kwargs: Optional[Dict[str, Any]] = None,
        adaptors_kwargs: Optional[Dict[str, Any]] = None,
        detach_uncertainty_head: bool = True,
        uncertainty_head_type: str = "dpt",
        uncertainty_head_kwargs: Optional[Dict[str, Any]] = None,
        uncertainty_adaptors_kwargs: Optional[Dict[str, Any]] = None,
        pretrained_backbone_checkpoint_path: Optional[str] = None,
        pretrained_checkpoint_path: Optional[str] = None,
        inference_resolution: Optional[Union[Tuple[int, int], List[Tuple[int, int]]]] = (560, 420),
        **extra_config,
    ):
        assert pretrained_checkpoint_path is None, "Pretrained weights are not supported for now"
        for k in ("has_uncertainty_head", "has_classification_head"):
            extra_config.pop(k, None)
        super().__init__(
            encoder_str=encoder_str,
            encoder_kwargs=encoder_kwargs,
            info_sharing_and_head_structure=info_sharing_and_head_structure,
            info_sharing_str=info_sharing_str,
            info_sharing_kwargs=info_sharing_kwargs,
            head_type=head_type,
            feature_head_kwargs=feature_head_kwargs,
            adaptors_kwargs=adaptors_kwargs,
            pretrained_checkpoint_path=pretrained_backbone_checkpoint_path,
            inference_resolution=inference_resolution,
            has_uncertainty_head=True,
            detach_uncertainty_head=detach_uncertainty_head,
            uncertainty_head_type=uncertainty_head_type,
            uncertainty_head_kwargs=dict(uncertainty_head_kwargs or {}),
            uncertainty_adaptors_kwargs=dict(uncertainty_adaptors_kwargs or {}),
            **extra_config,
        )


class UniFlowMatchClassificationRefinement(UniFlowMatch):
    """UFM-Refine variant: adds classification-based local refinement
    (reference ufm.py:710-1238)."""

    def __init__(
        self,
        encoder_str: str = "dinov2_large",
        encoder_kwargs: Optional[Dict[str, Any]] = None,
        info_sharing_and_head_structure: str = "dual+single",
        info_sharing_str: str = "global_attention",
        info_sharing_kwargs: Optional[Dict[str, Any]] = None,
        head_type: str = "dpt",
        feature_head_kwargs: Optional[Dict[str, Any]] = None,
        adaptors_kwargs: Optional[Dict[str, Any]] = None,
        detach_uncertainty_head: bool = True,
        uncertainty_head_type: str = "dpt",
        uncertainty_head_kwargs: Optional[Dict[str, Any]] = None,
        uncertainty_adaptors_kwargs: Optional[Dict[str, Any]] = None,
        temperature: float = 4,
        use_unet_feature: bool = False,
        classification_head_type: str = "patch_mlp",
        classification_head_kwargs: Optional[Dict[str, Any]] = None,
        feature_combine_method: str = "conv",
        refinement_range: int = 5,
        pretrained_backbone_checkpoint_path: Optional[str] = None,
        pretrained_checkpoint_path: Optional[str] = None,
        inference_resolution: Optional[Union[Tuple[int, int], List[Tuple[int, int]]]] = (560, 420),
        **extra_config,
    ):
        assert pretrained_checkpoint_path is None, "Pretrained weights are not supported for now"
        for k in ("has_uncertainty_head", "has_classification_head"):
            extra_config.pop(k, None)
        has_uncertainty = bool(uncertainty_head_kwargs)
        super().__init__(
            encoder_str=encoder_str,
            encoder_kwargs=encoder_kwargs,
            info_sharing_and_head_structure=info_sharing_and_head_structure,
            info_sharing_str=info_sharing_str,
            info_sharing_kwargs=info_sharing_kwargs,
            head_type=head_type,
            feature_head_kwargs=feature_head_kwargs,
            adaptors_kwargs=adaptors_kwargs,
            pretrained_checkpoint_path=pretrained_backbone_checkpoint_path,
            inference_resolution=inference_resolution,
            has_uncertainty_head=has_uncertainty,
            detach_uncertainty_head=detach_uncertainty_head,
            uncertainty_head_type=uncertainty_head_type,
            uncertainty_head_kwargs=dict(uncertainty_head_kwargs or {}),
            uncertainty_adaptors_kwargs=dict(uncertainty_adaptors_kwargs or {}),
            has_classification_head=True,
            classification_head_type=classification_head_type,
            classification_head_kwargs=dict(classification_head_kwargs or {}),
            temperature=temperature,
            use_unet_feature=use_unet_feature,
            feature_combine_method=feature_combine_method,
            refinement_range=refinement_range,
            **extra_config,
        )


def _golden_image_main(argv: Optional[List[str]] = None) -> str:
    """Golden-image check: ``python -m ufm_tpu.models.ufm``.

    Re-creates the reference's bundled eyeball test (reference
    uniflowmatch/models/ufm.py:1241-1313; README.md:71-78 instructs running
    ``python uniflowmatch/models/ufm.py`` and comparing ``ufm_output.png``
    against the bundled golden panel). Here the bundled example pairs carry
    analytic ground-truth flow (examples/make_example_pairs.py), so the check
    is quantitative: the panel's last cell is an EPE heatmap and the mean /
    p90 EPE are printed — with a real checkpoint these replace the
    reference's visual-only compare; with the default seeded random init the
    panel only demonstrates the pipeline end-to-end.

    Writes a 2x3 panel: source / target / flow color (top), covisibility /
    covisibility-masked warped target / EPE heatmap (bottom).
    """
    import argparse
    import os

    parser = argparse.ArgumentParser(description=_golden_image_main.__doc__)
    parser.add_argument("--model", choices=("base", "refine"), default="base")
    parser.add_argument("--checkpoint", default=None, help="config.json + weights dir (else seeded random init)")
    parser.add_argument(
        "--pair",
        default="wide_baseline",
        help="bundled synthetic pair name, or one of the reference's real "
        "photo pairs (bike/building/cook/fire_academy/scene) when the "
        "read-only reference snapshot is mounted",
    )
    parser.add_argument("--output", default="ufm_output.png")
    parser.add_argument("--tiny", action="store_true", help="tiny seeded topology (CI smoke; no checkpoint)")
    args = parser.parse_args(argv)

    import cv2

    from ufm_tpu.models.config import ufm_base_config, ufm_refine_config, ufm_tiny_config
    from ufm_tpu.utils.viz import flow_to_color, warp_image_with_flow

    cls = UniFlowMatchClassificationRefinement if args.model == "refine" else UniFlowMatchConfidence
    if args.checkpoint:
        model = cls.from_pretrained(args.checkpoint)
    elif args.tiny:
        model = cls.from_config(ufm_tiny_config(has_classification_head=args.model == "refine"))
    else:
        print("No --checkpoint given: using seeded random init (zero-egress environment).")
        model = cls.from_config(ufm_refine_config() if args.model == "refine" else ufm_base_config())

    from ufm_tpu.utils.example_pairs import (
        REFERENCE_PAIR_NAMES,
        ensure_bundled_pairs,
        load_pair,
        reference_pair_dir,
    )

    ref_dir = reference_pair_dir()
    if args.pair in REFERENCE_PAIR_NAMES:
        if ref_dir is None:
            parser.error(
                f"--pair {args.pair} is a reference photo pair but the reference "
                "snapshot is not mounted (set UFM_REFERENCE_PAIRS)"
            )
        pair_dir = ref_dir
    else:
        pair_dir = ensure_bundled_pairs()
    src, tgt, gt = load_pair(pair_dir, args.pair)

    result = model.predict_correspondences_batched(source_image=src, target_image=tgt)
    flow = np.asarray(result.flow.flow_output[0]).transpose(1, 2, 0)  # (H, W, 2)
    covis = np.asarray(result.covisibility.mask[0]) if result.covisibility is not None else np.ones(flow.shape[:2], np.float32)

    def _err_heatmap(err, full_scale):
        vis = np.clip(err / full_scale, 0.0, 1.0)
        rgb = np.stack([np.full_like(vis, 1.0), 1.0 - vis, 1.0 - vis], axis=-1)
        return (rgb * 255).astype(np.uint8)

    stats = {}
    if gt is not None:
        epe = np.linalg.norm(flow - gt, axis=-1)
        print(f"EPE vs analytic ground truth: mean {epe.mean():.3f} px, p90 {np.percentile(epe, 90):.3f} px")
        epe_rgb = _err_heatmap(epe, 8.0)
        stats = {"epe_mean_px": float(epe.mean()), "epe_p90_px": float(np.percentile(epe, 90))}
    else:
        # real photo pair: no GT exists, so the quantitative cell is the
        # forward-backward cycle error over the model's covisibility mask
        from ufm_tpu.eval import cycle_consistency_metrics

        rev = model.predict_correspondences_batched(source_image=tgt, target_image=src)
        bwd = np.asarray(rev.flow.flow_output[0]).transpose(1, 2, 0)
        m, cyc = cycle_consistency_metrics(flow, bwd, covis, return_map=True)
        print(
            "Cycle consistency (no GT for real photos): "
            f"mean {m.get('cycle_epe', float('nan')):.3f} px, "
            f"median {m.get('cycle_epe_median', float('nan')):.3f} px "
            f"over {100 * m['cycle_coverage']:.1f}% of pixels"
        )
        epe_rgb = _err_heatmap(cyc, 8.0)
        stats = {k: float(v) for k, v in m.items()}

    warped = warp_image_with_flow(src, None, tgt, flow).astype(np.float32)
    alpha = covis[..., None]
    composite = (alpha * warped + (1.0 - alpha) * 255.0).astype(np.uint8)
    covis_rgb = np.repeat((covis * 255).astype(np.uint8)[..., None], 3, axis=-1)

    # real pairs can have per-view shapes (e.g. reference bike: 1080x1080 vs
    # 607x1080); the panel is laid out in the source frame
    tgt_disp = tgt if tgt.shape[:2] == src.shape[:2] else cv2.resize(tgt, (src.shape[1], src.shape[0]))
    top = np.concatenate([src, tgt_disp, flow_to_color(flow)], axis=1)
    bottom = np.concatenate([covis_rgb, composite, epe_rgb], axis=1)
    panel = np.concatenate([top, bottom], axis=0)
    cv2.imwrite(args.output, cv2.cvtColor(panel, cv2.COLOR_RGB2BGR))
    # quantitative sidecar: the committed expected panel's numbers, so the
    # golden check compares statistics rather than eyeballs (the reference
    # commits examples/example_ufm_output.png and instructs a visual compare
    # — reference README.md:71-78; this is the machine-checkable version)
    import json as _json

    stats.update({"pair": args.pair, "panel_wh": [int(panel.shape[1]), int(panel.shape[0])]})
    with open(args.output + ".json", "w") as f:
        _json.dump(stats, f, indent=1)
    print(f"Wrote {args.output} ({panel.shape[1]}x{panel.shape[0]}) + stats sidecar. "
          "With a real checkpoint, verify the flow/warp panels are coherent and EPE is small.")
    return args.output


if __name__ == "__main__":
    _golden_image_main()
