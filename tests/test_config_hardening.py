"""Round-3 hardening: unknown load-bearing config keys must hard-fail in
EVERY module-kwargs path (not just the encoder factory), and the predict
pipeline cache must key on scaler identity + staged mode correctly.

Why: the HF config.json is the single source of architecture truth
(reference uniflowmatch/models/ufm.py:120, SURVEY.md §3.5). A config carrying
a key this implementation doesn't understand (norm eps, attention variant, an
alternate mlp_ratio spelling) must never warn-and-build a wrong network that
still loads the checkpoint.
"""

import dataclasses

import numpy as np
import pytest

from ufm_tpu.models import UFMNet, ufm_tiny_config
from ufm_tpu.models.ufm import UniFlowMatch


def _init_tiny(cfg):
    import jax
    import jax.numpy as jnp

    net = UFMNet(cfg)
    img = jnp.zeros((1, 42, 56, 3), jnp.float32)
    return net.init(jax.random.PRNGKey(0), img, img)


def test_info_sharing_unknown_key_hard_fails():
    cfg = ufm_tiny_config()
    cfg = dataclasses.replace(
        cfg, info_sharing_kwargs={**cfg.info_sharing_kwargs, "attention_variant": "sdpa"}
    )
    with pytest.raises(ValueError, match="load-bearing"):
        _init_tiny(cfg)


def test_dpt_feature_unknown_key_hard_fails():
    cfg = ufm_tiny_config()
    fh = {
        "dpt_feature": {**cfg.feature_head_kwargs["dpt_feature"], "norm_eps": 1e-4},
        "dpt_processor": cfg.feature_head_kwargs["dpt_processor"],
    }
    cfg = dataclasses.replace(cfg, feature_head_kwargs=fh)
    with pytest.raises(ValueError, match="load-bearing"):
        _init_tiny(cfg)


def test_dpt_processor_unknown_key_hard_fails():
    cfg = ufm_tiny_config()
    fh = {
        "dpt_feature": cfg.feature_head_kwargs["dpt_feature"],
        "dpt_processor": {**cfg.feature_head_kwargs["dpt_processor"], "activation": "silu"},
    }
    cfg = dataclasses.replace(cfg, feature_head_kwargs=fh)
    with pytest.raises(ValueError, match="load-bearing"):
        _init_tiny(cfg)


def test_mlp_classification_head_unknown_key_hard_fails():
    cfg = ufm_tiny_config(has_classification_head=True)
    cfg = dataclasses.replace(
        cfg,
        classification_head_kwargs={**cfg.classification_head_kwargs, "mlp_norm": "layernorm"},
    )
    with pytest.raises(ValueError, match="load-bearing"):
        _init_tiny(cfg)


def test_unet_unknown_key_hard_fails():
    cfg = ufm_tiny_config(
        has_classification_head=True,
        use_unet_feature=True,
        unet_kwargs={"base_dim": 8, "depth_dims": (8, 16), "bilinear_upsample": True},
    )
    with pytest.raises(ValueError, match="load-bearing"):
        _init_tiny(cfg)


def test_benign_bookkeeping_keys_still_tolerated():
    cfg = ufm_tiny_config()
    cfg = dataclasses.replace(
        cfg,
        info_sharing_kwargs={
            **cfg.info_sharing_kwargs,
            "pretrained_checkpoint_path": None,
            "gradient_checkpointing": False,
        },
    )
    variables = _init_tiny(cfg)
    assert "info_sharing" in variables["params"]


# ---- pipeline cache keying ---------------------------------------------------


def _tiny_model():
    cfg = ufm_tiny_config()
    model = UniFlowMatch(**cfg.to_dict())
    model.init_params(seed=0)
    return model


def test_scaler_reassignment_bumps_generation_and_recompiles():
    """Replacing image_scaler must never serve a pipeline compiled for the old
    scaler — even if the new object reuses the old one's id() (VERDICT r2 #6)."""
    from ufm_tpu.utils.flow_resizing import AutomaticShapeSelection, ResizeToFixedManipulation

    model = _tiny_model()
    gen0 = model._scaler_generation

    rng = np.random.default_rng(0)
    src = rng.integers(0, 255, (1, 3, 84, 112), dtype=np.uint8)
    model.predict_correspondences_batched(src, src)
    keys_before = set(model._pipeline_cache)
    assert all(k[4] == gen0 for k in keys_before)

    model.image_scaler = AutomaticShapeSelection(
        ResizeToFixedManipulation((42, 56)), strategy="closest_aspect"
    )
    assert model._scaler_generation == gen0 + 1

    model.predict_correspondences_batched(src, src)
    new_keys = set(model._pipeline_cache) - keys_before
    assert new_keys, "reassigned scaler must build a fresh pipeline"
    assert all(k[4] == gen0 + 1 for k in new_keys)


def test_staged_mode_in_pipeline_cache_key(monkeypatch):
    """Flipping UFM_STAGED_REFINE after a pipeline is built must not silently
    reuse the previously compiled path (advisor round-2 low finding)."""
    from ufm_tpu.models.ufm import UniFlowMatchClassificationRefinement

    cfg = ufm_tiny_config(has_classification_head=True)
    d = cfg.to_dict()
    for k in ("has_classification_head", "has_uncertainty_head"):
        d.pop(k, None)
    model = UniFlowMatchClassificationRefinement(**d)
    model.init_params(seed=0)

    rng = np.random.default_rng(0)
    src = rng.integers(0, 255, (1, 3, 84, 112), dtype=np.uint8)

    monkeypatch.setenv("UFM_STAGED_REFINE", "0")
    out_mono = model.predict_correspondences_batched(src, src)
    keys_mono = set(model._pipeline_cache)
    assert all(k[5] is False for k in keys_mono)

    monkeypatch.setenv("UFM_STAGED_REFINE", "1")
    out_staged = model.predict_correspondences_batched(src, src)
    staged_keys = set(model._pipeline_cache) - keys_mono
    assert staged_keys and all(k[5] is True for k in staged_keys)

    np.testing.assert_allclose(
        np.asarray(out_staged.flow.flow_output),
        np.asarray(out_mono.flow.flow_output),
        atol=1e-5,
    )
