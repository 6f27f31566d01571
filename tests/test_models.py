"""End-to-end model tests on tiny configs (CPU)."""

import dataclasses

import numpy as np
import pytest

import jax.numpy as jnp

from ufm_tpu.models import (
    UniFlowMatch,
    UniFlowMatchClassificationRefinement,
    UniFlowMatchConfidence,
    ufm_tiny_config,
)


@pytest.fixture(scope="module")
def tiny_confidence_model():
    cfg = ufm_tiny_config()
    return UniFlowMatchConfidence.from_config(cfg)


def test_predict_correspondences_uint8(tiny_confidence_model, rng):
    model = tiny_confidence_model
    src = rng.integers(0, 255, (100, 80, 3), dtype=np.uint8)
    tgt = rng.integers(0, 255, (100, 80, 3), dtype=np.uint8)

    result = model.predict_correspondences_batched(source_image=src, target_image=tgt)

    flow = np.asarray(result.flow.flow_output)
    assert flow.shape == (1, 2, 100, 80)
    assert np.isfinite(flow).all()
    covis = np.asarray(result.covisibility.mask)
    assert covis.shape == (1, 100, 80)
    assert (covis >= 0).all() and (covis <= 1).all()
    cov = np.asarray(result.flow.flow_covariance)
    assert cov.shape == (3, 100, 80) or cov.shape == (1, 3, 100, 80)


def test_predict_float32_renormalization(tiny_confidence_model, rng):
    model = tiny_confidence_model
    u8 = rng.integers(0, 255, (64, 72, 3), dtype=np.uint8)
    f32_identity = (u8.astype(np.float32) / 255.0)  # "identity" normalization

    r1 = model.predict_correspondences_batched(source_image=u8, target_image=u8)
    r2 = model.predict_correspondences_batched(
        source_image=f32_identity, target_image=f32_identity, data_norm_type="identity"
    )
    np.testing.assert_allclose(
        np.asarray(r1.flow.flow_output), np.asarray(r2.flow.flow_output), rtol=1e-3, atol=1e-3
    )


def test_forward_contract(tiny_confidence_model, rng):
    model = tiny_confidence_model
    w, h = model.inference_resolution[0]
    img = jnp.asarray(rng.standard_normal((2, 3, h, w)).astype(np.float32))
    view1 = {"img": img, "instance": [0, 1], "data_norm_type": "dinov2", "symmetrized": False}
    view2 = {"img": img, "instance": [1, 0], "data_norm_type": "dinov2", "symmetrized": False}
    out = model.forward(view1, view2)
    assert out.flow.flow_output.shape == (2, 2, h, w)
    assert out.covisibility.mask.shape == (2, h, w)
    assert out.keypoint_confidence.shape == (2, h, w)
    assert out.flow.flow_covariance.shape == (2, 3, h, w)


def test_symmetrized_forward_matches_plain(tiny_confidence_model, rng):
    """(a,b),(b,a) batches encoded once must equal the unshared encoding."""
    model = tiny_confidence_model
    w, h = model.inference_resolution[0]
    a = rng.standard_normal((1, 3, h, w)).astype(np.float32)
    b = rng.standard_normal((1, 3, h, w)).astype(np.float32)
    img1 = jnp.asarray(np.concatenate([a, b], axis=0))
    img2 = jnp.asarray(np.concatenate([b, a], axis=0))

    plain = model.forward({"img": img1, "symmetrized": False}, {"img": img2, "symmetrized": False})
    symm = model.forward({"img": img1, "symmetrized": True}, {"img": img2, "symmetrized": True})
    np.testing.assert_allclose(
        np.asarray(symm.flow.flow_output), np.asarray(plain.flow.flow_output), rtol=1e-4, atol=1e-4
    )


def test_parameter_groups(tiny_confidence_model):
    groups = tiny_confidence_model.get_parameter_groups()
    assert {"encoder", "info_sharing", "output_head", "uncertainty_head"} <= set(groups)


def test_refinement_variant(rng):
    cfg = ufm_tiny_config(
        has_classification_head=True,
        use_unet_feature=True,
        refinement_range=3,
    )
    model = UniFlowMatchClassificationRefinement.from_config(cfg)
    src = rng.integers(0, 255, (90, 70, 3), dtype=np.uint8)
    tgt = rng.integers(0, 255, (90, 70, 3), dtype=np.uint8)
    result = model.predict_correspondences_batched(source_image=src, target_image=tgt)
    assert np.asarray(result.flow.flow_output).shape == (1, 2, 90, 70)

    w, h = model.inference_resolution[0]
    img = jnp.zeros((1, 3, h, w))
    out = model.forward({"img": img, "symmetrized": False}, {"img": img, "symmetrized": False})
    r = out.classification_refinement
    assert r is not None
    assert r.residual.shape == (1, 2, h, w)
    assert r.log_softmax.shape == (1, h, w, 3, 3)
    # final flow = regression flow + residual (reference ufm.py:991-1008);
    # regression_flow_output must be the PRE-refinement flow
    np.testing.assert_allclose(
        np.asarray(out.flow.flow_output),
        np.asarray(r.regression_flow_output + r.residual),
        rtol=1e-5,
        atol=1e-5,
    )


def test_staged_refine_forward_matches_monolithic(rng):
    """backbone + refine_tail as two applies must equal the single __call__
    (the staged path is how the refine variant runs on TPU — two smaller
    compiled programs; see UFMNet.backbone)."""
    import jax

    cfg = ufm_tiny_config(
        has_classification_head=True,
        use_unet_feature=True,
        refinement_range=3,
    )
    model = UniFlowMatchClassificationRefinement.from_config(cfg)
    net, params = model.net, model.params
    w, h = model.inference_resolution[0]
    i1 = jnp.asarray(rng.standard_normal((2, h, w, 3)).astype(np.float32))
    i2 = jnp.asarray(rng.standard_normal((2, h, w, 3)).astype(np.float32))

    full = net.apply({"params": params}, i1, i2)
    back = net.apply({"params": params}, i1, i2, method="backbone")
    tail = net.apply(
        {"params": params},
        i1,
        i2,
        back["flow"],
        back["cls_in_0"],
        back["cls_in_1"],
        method="refine_tail",
    )
    np.testing.assert_allclose(np.asarray(tail["flow"]), np.asarray(full["flow"]), rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(tail["refinement_log_softmax"]),
        np.asarray(full["refinement_log_softmax"]),
        rtol=1e-6,
        atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(back["flow"]), np.asarray(full["regression_flow"]), rtol=1e-6, atol=1e-6
    )


def test_save_load_roundtrip(tmp_path, tiny_confidence_model, rng):
    model = tiny_confidence_model
    model.save_pretrained(str(tmp_path / "ckpt"))

    loaded = UniFlowMatchConfidence.from_pretrained(str(tmp_path / "ckpt"))
    src = rng.integers(0, 255, (64, 72, 3), dtype=np.uint8)
    r1 = model.predict_correspondences_batched(source_image=src, target_image=src)
    r2 = loaded.predict_correspondences_batched(source_image=src, target_image=src)
    np.testing.assert_allclose(
        np.asarray(r1.flow.flow_output), np.asarray(r2.flow.flow_output), rtol=1e-5, atol=1e-5
    )


def test_multi_resolution_closest_aspect(rng):
    """With several trained resolutions, the pipeline picks the closest
    aspect per input (reference base.py:97-100 semantics)."""
    cfg = ufm_tiny_config(inference_resolution=[(56, 42), (42, 56)])  # (W, H) pair
    model = UniFlowMatchConfidence.from_config(cfg)

    wide = rng.integers(0, 255, (60, 120, 3), dtype=np.uint8)  # landscape
    tall = rng.integers(0, 255, (120, 60, 3), dtype=np.uint8)  # portrait

    r_wide = model.predict_correspondences_batched(source_image=wide, target_image=wide)
    r_tall = model.predict_correspondences_batched(source_image=tall, target_image=tall)
    assert np.asarray(r_wide.flow.flow_output).shape == (1, 2, 60, 120)
    assert np.asarray(r_tall.flow.flow_output).shape == (1, 2, 120, 60)

    # the scaler itself must choose different targets
    shape_wide, _ = model.image_scaler.select(60, 120, 60, 120)
    shape_tall, _ = model.image_scaler.select(120, 60, 120, 60)
    assert shape_wide[:2] == (42, 56)
    assert shape_tall[:2] == (56, 42)


def test_staged_predict_pipeline_matches_monolithic(rng, monkeypatch):
    """The refine variant's predict pipeline runs as two compiled programs by
    default; UFM_STAGED_REFINE=0 must produce identical results through the
    monolithic path (covers the staged branch of models/base._build_pipeline)."""
    cfg = ufm_tiny_config(
        has_classification_head=True,
        use_unet_feature=True,
        refinement_range=3,
    )
    model = UniFlowMatchClassificationRefinement.from_config(cfg)
    src = rng.integers(0, 255, (60, 84, 3), dtype=np.uint8)
    tgt = rng.integers(0, 255, (60, 84, 3), dtype=np.uint8)

    staged = model.predict_correspondences_batched(source_image=src, target_image=tgt)

    monkeypatch.setenv("UFM_STAGED_REFINE", "0")
    model._pipeline_cache.clear()
    mono = model.predict_correspondences_batched(source_image=src, target_image=tgt)

    # the monolithic jit may fuse across the stage boundary (float
    # reassociation), so exact bitwise equality is not expected
    np.testing.assert_allclose(
        np.asarray(staged.flow.flow_output), np.asarray(mono.flow.flow_output), rtol=1e-4, atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(staged.covisibility.mask), np.asarray(mono.covisibility.mask), rtol=1e-4, atol=1e-4
    )
