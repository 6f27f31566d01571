"""Full-model checkpoint-fidelity harness.

A complete tiny-scale PyTorch twin of the UFM network (reference checkpoint
naming, Lightning ``model.`` prefixes, ``head1.0.0`` Sequential nesting —
tests/torch_twins.py) is converted through the *production* loader
(``load_torch_checkpoint_into`` → ``torch_state_dict_to_params`` → strict
merge) and must reproduce our flax forward on every output field. This is the
zero-egress stand-in for loading the released ``infinity1096/UFM-*`` weights
(SURVEY.md §2.9, BASELINE.md ≤0.1px EPE north star).

Precision caveat (advisor r2): these tests run fp32 on CPU. On TPU the refine
variant's production default ``refinement_matmul_precision="default"`` feeds
the window-scores kernel bf16 operands — a deliberate speed default with
measured refined-flow drift ≤0.025 px max / 0.009 px p99.9 vs "highest"
(BENCH_NOTES.md), well inside the 0.1 px parity budget but NOT inside these
tests' tolerances. Set ``refinement_matmul_precision="highest"`` when
bit-level agreement with an fp32 reference matters more than ~25% refine
throughput.
"""

import importlib.util
import os

import numpy as np
import pytest

# torch-twin-through-converter heavyweights: quick lane excludes (-m "not slow")
pytestmark = pytest.mark.slow

torch = pytest.importorskip("torch")

import jax.numpy as jnp  # noqa: E402

from ufm_tpu.models import UniFlowMatchClassificationRefinement, UniFlowMatchConfidence  # noqa: E402
from ufm_tpu.nn.encoders.image_normalizations import IMAGE_NORMALIZATION_DICT  # noqa: E402

from torch_twins import TorchUFMTwin, lightning_checkpoint  # noqa: E402

# tiny full config: every subsystem on (uncertainty head, classification
# refinement, UNet combine), 56x56 inputs = 4x4 patch grid = the twin's
# pos-embed grid (no interpolation in the twin)
ENC_DIM, INFO_DIM, CLS_OUT = 32, 24, 4


def _dpt_kwargs(output_dim):
    return {
        "dpt_feature": {
            "input_dims": (ENC_DIM, INFO_DIM, INFO_DIM, INFO_DIM),
            "proj_dims": (8, 8, 8, 8),
            "feature_dim": 8,
        },
        "dpt_processor": {"input_dim": 8, "hidden_dims": (8, 8), "output_dim": output_dim},
    }


def _tiny_refine_kwargs(uncertainty_adaptors=None):
    return dict(
        encoder_str="dinov2_custom",
        encoder_kwargs={
            "embed_dim": ENC_DIM,
            "depth": 2,
            "num_heads": 2,
            "pretrain_grid_size": 4,
            "intermediate_layer_idx": (0, 1),
        },
        info_sharing_kwargs={
            "input_embed_dim": ENC_DIM,
            "dim": INFO_DIM,
            "depth": 2,
            "num_heads": 2,
            "intermediate_layer_idx": (0, 1),
        },
        feature_head_kwargs=_dpt_kwargs(2),
        adaptors_kwargs={"flow": {"class": "FlowAdaptor", "kwargs": {}}},
        uncertainty_head_kwargs=_dpt_kwargs(5),
        uncertainty_adaptors_kwargs=uncertainty_adaptors
        or {
            "flow_cov": {"class": "Covariance2DAdaptor", "kwargs": {}},
            "keypoint_confidence": {"class": "ConfidenceAdaptor", "kwargs": {}},
            "non_occluded_mask": {"class": "MaskAdaptor", "kwargs": {}},
        },
        classification_head_kwargs={
            "input_feature_dim": ENC_DIM + INFO_DIM,
            "hidden_dims": (16,),
            "output_dim": CLS_OUT,
            "patch_size": 14,
        },
        use_unet_feature=True,
        unet_kwargs={"out_channels": CLS_OUT, "features": (4, 8)},
        feature_combine_method="conv",
        refinement_range=3,
        temperature=4.0,
        inference_resolution=(56, 56),
        compute_dtype="float32",
    )


def _build_pair(kwargs, seed=0, tmp_path=None):
    """Twin + our model loaded from the twin's Lightning checkpoint through
    the production converter path."""
    from ufm_tpu.checkpoint import load_torch_checkpoint_into

    torch.manual_seed(seed)
    model = UniFlowMatchClassificationRefinement(**kwargs)
    model.init_params()
    twin = TorchUFMTwin(model.config).eval()
    # randomize params the default init leaves at zero/constant so parity is
    # meaningful (biases, layerscale, classification_bias, view_embed)
    with torch.no_grad():
        for name, p in twin.named_parameters():
            if p.std() < 1e-8:
                p.add_(torch.randn_like(p) * 0.05)

    ckpt_path = os.path.join(str(tmp_path), "twin_lightning.ckpt")
    torch.save(lightning_checkpoint(twin), ckpt_path)
    load_torch_checkpoint_into(model, ckpt_path)  # strict merge
    return twin, model


def _forward_both(twin, model, rng, batch=2, res=56):
    img = rng.standard_normal((2, batch, 3, res, res)).astype(np.float32) * 0.5
    with torch.no_grad():
        ref = twin(torch.from_numpy(img[0]), torch.from_numpy(img[1]))
    ours = model.net.apply(
        {"params": model._params_for_apply()},
        jnp.asarray(img[0].transpose(0, 2, 3, 1)),
        jnp.asarray(img[1].transpose(0, 2, 3, 1)),
    )
    return ref, ours


def _assert_field(ref_t, ours_j, name, atol=2e-4, rtol=2e-4):
    ref = ref_t.numpy()
    got = np.asarray(ours_j)
    if got.ndim == 4 and ref.ndim == 4 and got.shape != ref.shape:
        got = got.transpose(0, 3, 1, 2)  # ours channel-last
    np.testing.assert_allclose(got, ref, rtol=rtol, atol=atol, err_msg=f"field {name}")


FIELDS = [
    "flow",
    "regression_flow",
    "refinement_residual",
    "flow_cov",
    "flow_cov_inv",
    "flow_cov_log_det",
    "keypoint_confidence",
    "covis_mask",
    "covis_logits",
    "refinement_log_softmax",
    "refinement_feature_map_0",
    "refinement_feature_map_1",
]


def test_full_model_checkpoint_parity(rng, tmp_path):
    """Lightning ckpt of the full twin -> production converter -> forward
    parity on every UFMNet output field (refine variant: encoder +
    info-sharing + both DPT heads + adaptors + MLP head + UNet + refinement)."""
    twin, model = _build_pair(_tiny_refine_kwargs(), seed=0, tmp_path=tmp_path)
    ref, ours = _forward_both(twin, model, rng)

    assert set(ref) == set(ours), f"output keys differ: {set(ref) ^ set(ours)}"
    for name in FIELDS:
        if name == "refinement_log_softmax":
            np.testing.assert_allclose(
                np.asarray(ours[name]), ref[name].numpy(), rtol=1e-3, atol=1e-3, err_msg=name
            )
        else:
            _assert_field(ref[name], ours[name], name)


def test_adaptor_channel_split_order_contract(rng, tmp_path):
    """The AdaptorMap consumes head channels in adaptors_kwargs insertion
    order (contract pinned against ufm.py:275-289): a *permuted* order must
    still produce twin/flax parity — i.e. both sides honor the same split —
    and must actually change which channels feed which adaptor."""
    permuted = {
        "non_occluded_mask": {"class": "MaskAdaptor", "kwargs": {}},
        "keypoint_confidence": {"class": "ConfidenceAdaptor", "kwargs": {}},
        "flow_cov": {"class": "Covariance2DAdaptor", "kwargs": {}},
    }
    twin, model = _build_pair(_tiny_refine_kwargs(uncertainty_adaptors=permuted), seed=1, tmp_path=tmp_path)
    ref, ours = _forward_both(twin, model, rng)
    for name in ("covis_mask", "keypoint_confidence", "flow_cov", "flow_cov_log_det"):
        _assert_field(ref[name], ours[name], name)

    # same weights, default order: channel assignment must differ
    default_order = {
        "flow_cov": {"class": "Covariance2DAdaptor", "kwargs": {}},
        "keypoint_confidence": {"class": "ConfidenceAdaptor", "kwargs": {}},
        "non_occluded_mask": {"class": "MaskAdaptor", "kwargs": {}},
    }
    model.config.uncertainty_adaptors_kwargs.clear()
    model.config.uncertainty_adaptors_kwargs.update(default_order)
    model._apply_cache.clear()
    _, ours_default = _forward_both(twin, model, rng)
    assert np.abs(np.asarray(ours_default["covis_mask"]) - np.asarray(ours["covis_mask"])).max() > 1e-3


def test_predict_pipeline_epe_drift(rng, tmp_path):
    """End-to-end EPE drift: our full predict_correspondences_batched
    (normalize -> antialias resize -> forward -> unmap) vs the same pipeline
    run with the torch twin + the reference's own flow_resizing module as the
    resize/unmap oracle. North star: <=0.1 px EPE (BASELINE.md)."""
    ref_path = "/root/reference/uniflowmatch/utils/flow_resizing.py"
    if not os.path.exists(ref_path):
        pytest.skip("reference tree not mounted")
    spec = importlib.util.spec_from_file_location("ref_flow_resizing_e2e", ref_path)
    ref_fr = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ref_fr)

    twin, model = _build_pair(_tiny_refine_kwargs(), seed=2, tmp_path=tmp_path)

    # odd input resolution: exercises resize + unmap on both sides
    src = rng.integers(0, 255, (80, 100, 3), dtype=np.uint8)
    tgt = rng.integers(0, 255, (80, 100, 3), dtype=np.uint8)

    ours = model.predict_correspondences_batched(source_image=src, target_image=tgt)
    our_flow = np.asarray(ours.flow.flow_output[0])  # (2, 80, 100)
    our_covis = np.asarray(ours.covisibility.mask[0])
    our_cov = np.asarray(ours.flow.flow_covariance[0])

    # torch-side pipeline with the reference oracle
    norm = IMAGE_NORMALIZATION_DICT[model.data_norm_type]
    mean = np.asarray(norm.mean, dtype=np.float32)
    std = np.asarray(norm.std, dtype=np.float32)

    def prep(img):
        x = img.astype(np.float32) / 255.0
        x = (x - mean) / std
        return torch.from_numpy(x[None])  # (1, H, W, C) — reference scaler is BHWC

    scaler = ref_fr.AutomaticShapeSelection(ref_fr.ResizeToFixedManipulation((56, 56)), strategy="closest_aspect")
    s0, s1, reg0_src, reg1_src, reg0_rep, reg1_rep = scaler(prep(src), prep(tgt))
    s0, s1 = s0.permute(0, 3, 1, 2), s1.permute(0, 3, 1, 2)

    with torch.no_grad():
        raw = twin(s0, s1)

    flow_unmapped, _ = ref_fr.unmap_predicted_flow(
        raw["flow"], reg0_rep, reg1_rep, reg0_src, reg1_src, (80, 100), (80, 100)
    )
    cov_unmapped, _ = ref_fr.unmap_predicted_channels(raw["flow_cov"], reg0_rep, reg0_src, (80, 100))
    w_ratio, h_ratio = 100 / 56, 80 / 56
    cov_unmapped = cov_unmapped * torch.tensor([w_ratio**2, h_ratio**2, w_ratio * h_ratio]).view(1, 3, 1, 1)
    covis_unmapped, _ = ref_fr.unmap_predicted_channels(
        raw["covis_mask"][:, None], reg0_rep, reg0_src, (80, 100)
    )

    epe = np.linalg.norm(our_flow - flow_unmapped[0].numpy(), axis=0)
    assert epe.mean() < 0.01, f"mean EPE drift {epe.mean():.4f}"
    assert epe.max() < 0.1, f"max EPE drift {epe.max():.4f}"
    np.testing.assert_allclose(our_covis, covis_unmapped[0, 0].numpy(), atol=1e-4)
    np.testing.assert_allclose(our_cov, cov_unmapped[0].numpy(), rtol=1e-3, atol=1e-3)


def test_predict_pipeline_crop_composite_chain(rng, tmp_path):
    """A Resize+CenterCrop composite chain through the public predict API:
    the pipeline must run the *selected manipulation* (not hardcoded resize
    regions) and unmap with the chain's region bookkeeping, matching the
    reference oracle end to end (reference base.py:255-266,
    flow_resizing.py:517-744)."""
    ref_path = "/root/reference/uniflowmatch/utils/flow_resizing.py"
    if not os.path.exists(ref_path):
        pytest.skip("reference tree not mounted")
    spec = importlib.util.spec_from_file_location("ref_flow_resizing_chain", ref_path)
    ref_fr = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ref_fr)

    from ufm_tpu.utils.flow_resizing import (
        AutomaticShapeSelection,
        CenterCropManipulation,
        ImagePairsManipulationComposite,
        ResizeVerticalAxisManipulation,
    )

    twin, model = _build_pair(_tiny_refine_kwargs(), seed=4, tmp_path=tmp_path)
    # input 80x100 -> resize vertical axis to 70 (W becomes 87) -> center-crop
    # to the 56x56 model grid: a genuinely non-identity region chain
    model.image_scaler = AutomaticShapeSelection(
        ImagePairsManipulationComposite(ResizeVerticalAxisManipulation(70), CenterCropManipulation((56, 56)))
    )

    src = rng.integers(0, 255, (80, 100, 3), dtype=np.uint8)
    tgt = rng.integers(0, 255, (80, 100, 3), dtype=np.uint8)
    ours = model.predict_correspondences_batched(source_image=src, target_image=tgt)
    our_flow = np.asarray(ours.flow.flow_output[0])
    our_covis = np.asarray(ours.covisibility.mask[0])

    norm = IMAGE_NORMALIZATION_DICT[model.data_norm_type]
    mean = np.asarray(norm.mean, dtype=np.float32)
    std = np.asarray(norm.std, dtype=np.float32)

    def prep(img):
        return torch.from_numpy(((img.astype(np.float32) / 255.0 - mean) / std)[None])

    oracle = ref_fr.AutomaticShapeSelection(
        ref_fr.ImagePairsManipulationComposite(
            ref_fr.ResizeVerticalAxisManipulation(70), ref_fr.CenterCropManipulation((56, 56))
        )
    )
    s0, s1, reg0_src, reg1_src, reg0_rep, reg1_rep = oracle(prep(src), prep(tgt))
    with torch.no_grad():
        raw = twin(s0.permute(0, 3, 1, 2), s1.permute(0, 3, 1, 2))

    flow_unmapped, validity = ref_fr.unmap_predicted_flow(
        raw["flow"], reg0_rep, reg1_rep, reg0_src, reg1_src, (80, 100), (80, 100)
    )
    covis_unmapped, _ = ref_fr.unmap_predicted_channels(
        raw["covis_mask"][:, None], reg0_rep, reg0_src, (80, 100)
    )

    # the crop chain leaves a border of invalid pixels — both sides must zero it
    v = validity[0].numpy()
    assert not v.all() and v.any(), "chain should produce a partial-validity canvas"
    epe = np.linalg.norm(our_flow - flow_unmapped[0].numpy(), axis=0)
    assert epe.mean() < 0.01, f"mean EPE drift {epe.mean():.4f}"
    assert epe.max() < 0.1, f"max EPE drift {epe.max():.4f}"
    np.testing.assert_allclose(our_covis, covis_unmapped[0, 0].numpy(), atol=1e-4)


def test_confidence_variant_checkpoint_parity(rng, tmp_path):
    """Same harness for the UFM-Base-class confidence variant (no
    classification head): ensures parity isn't carried by refine-only paths."""
    from ufm_tpu.checkpoint import load_torch_checkpoint_into

    kwargs = _tiny_refine_kwargs()
    for k in (
        "classification_head_kwargs",
        "use_unet_feature",
        "unet_kwargs",
        "feature_combine_method",
        "refinement_range",
        "temperature",
    ):
        kwargs.pop(k)
    torch.manual_seed(3)
    model = UniFlowMatchConfidence(**kwargs)
    model.init_params()
    twin = TorchUFMTwin(model.config).eval()
    with torch.no_grad():
        for _, p in twin.named_parameters():
            if p.std() < 1e-8:
                p.add_(torch.randn_like(p) * 0.05)
    ckpt_path = os.path.join(str(tmp_path), "twin_conf.ckpt")
    torch.save(lightning_checkpoint(twin), ckpt_path)
    load_torch_checkpoint_into(model, ckpt_path)

    ref, ours = _forward_both(twin, model, rng, batch=1)
    for name in ("flow", "flow_cov", "keypoint_confidence", "covis_mask"):
        _assert_field(ref[name], ours[name], name)
