"""Checkpoint conversion: torch round trips, key surgery, ckpt loading."""

import numpy as np
import pytest

import jax

from ufm_tpu.checkpoint import (
    flatten_params,
    modify_state_dict,
    params_to_torch_state_dict,
    torch_state_dict_to_params,
)
from ufm_tpu.models import UFMNet, UniFlowMatchConfidence, ufm_tiny_config


@pytest.fixture(scope="module")
def tiny_params():
    import jax.numpy as jnp

    cfg = ufm_tiny_config()
    net = UFMNet(cfg)
    img = jnp.zeros((1, 42, 56, 3))
    return net.init(jax.random.PRNGKey(0), img, img)["params"]


def test_modify_state_dict_reference_semantics():
    sd = {
        "encoder.model.mask_token": 1,
        "encoder.model.patch_embed.proj.weight": 2,
        "feature_matching_proj.weight": 3,
        "head1.0.proj_0.weight": 4,
    }
    out = modify_state_dict(sd, {"feature_matching_proj": None, "encoder.model.mask_token": None})
    assert set(out) == {"encoder.model.patch_embed.proj.weight", "head1.0.proj_0.weight"}

    renamed = modify_state_dict(sd, {"encoder.model.": "encoder."})
    assert "encoder.mask_token" in renamed


def test_torch_roundtrip_identity(tiny_params):
    """params -> torch state_dict -> params must be the identity."""
    sd = params_to_torch_state_dict(tiny_params)
    # every tensor present, linear weights transposed
    assert any(k.endswith(".weight") for k in sd)
    back = torch_state_dict_to_params(sd)

    flat_a = flatten_params(tiny_params)
    flat_b = flatten_params(back)
    assert set(flat_a) == set(flat_b)
    for k in flat_a:
        np.testing.assert_array_equal(flat_a[k], flat_b[k], err_msg=k)


def test_load_pretrained_ckpt(tmp_path):
    """Reference from_pretrained_ckpt contract: torch file with model_args +
    model state dict (ufm.py:219-241)."""
    torch = pytest.importorskip("torch")

    cfg = ufm_tiny_config()
    model = UniFlowMatchConfidence.from_config(cfg)
    sd = params_to_torch_state_dict(model.params)
    sd_t = {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in sd.items()}

    ckpt_path = tmp_path / "ckpt.pt"
    torch.save({"model_args": cfg.to_dict(), "model": sd_t}, str(ckpt_path))

    loaded = UniFlowMatchConfidence.from_pretrained_ckpt(str(ckpt_path))
    flat_a = flatten_params(model.params)
    flat_b = flatten_params(loaded.params)
    for k in flat_a:
        np.testing.assert_array_equal(flat_a[k], np.asarray(flat_b[k]), err_msg=k)


def test_canonicalize_reference_names():
    from ufm_tpu.checkpoint.convert import canonicalize_reference_names

    sd = {
        "encoder.model.blocks.3.attn.qkv.weight": 1,
        "encoder.model.patch_embed.proj.weight": 2,
        "head1.0.0.proj_0.weight": 3,
        "head1.0.1.conv1.weight": 4,
        "uncertainty_head.0.0.fusion_2.rcu.conv1.bias": 5,
        "unet_feature.ups.0.weight": 6,   # ConvTranspose
        "unet_feature.ups.1.conv.0.weight": 7,  # DoubleConv first conv
        "unet_feature.downs.2.conv.2.weight": 8,  # DoubleConv second conv
        "unet_feature.final_conv.weight": 9,
        "info_sharing.blocks.11.mlp.fc2.bias": 10,
    }
    out = canonicalize_reference_names(sd)
    assert "encoder.blocks_3.attn.qkv.weight" in out
    assert "encoder.patch_embed.weight" in out
    assert "head1.feature.proj_0.weight" in out
    assert "head1.processor.conv1.weight" in out
    assert "uncertainty_head.feature.fusion_2.rcu.conv1.bias" in out
    assert "unet_feature.up_0.weight" in out
    assert "unet_feature.up_conv_0.conv1.weight" in out
    assert "unet_feature.down_2.conv2.weight" in out
    assert "unet_feature.final.weight" in out
    assert "info_sharing.blocks_11.mlp.fc2.bias" in out
