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


# ---------------------------------------------------------------------------
# HF config.json fixtures: the hub config is the single source of
# architecture truth (reference ufm.py:120 via PyTorchModelHubMixin,
# SURVEY.md §3.5) — from_pretrained must honor every reference constructor
# key, tolerate hub/bookkeeping extras, and hard-fail on load-bearing
# encoder options it can't build.
# ---------------------------------------------------------------------------

def _hub_style_config_json(tmp_path, extra_encoder_kwargs=None):
    """Save a tiny model, then rewrite its config.json the way the HF mixin
    writes the reference's (full constructor-kwargs schema, ufm.py:483-508,
    plus hub extras and UniCeption-style encoder bookkeeping keys)."""
    import json
    import os

    model = UniFlowMatchConfidence.from_config(ufm_tiny_config())
    d = str(tmp_path / "hub_ckpt")
    model.save_pretrained(d)

    with open(os.path.join(d, "config.json")) as f:
        cfg = json.load(f)
    # hub mixin extras the loader must ignore
    cfg["_name_or_path"] = "infinity1096/UFM-Base"
    cfg["architectures"] = ["UniFlowMatchConfidence"]
    cfg["transformers_version"] = "4.44.0"
    cfg["torch_dtype"] = "float32"
    # reference constructor keys our wrapper must accept verbatim
    cfg["encoder_skip_connection"] = None
    cfg["info_sharing_skip_connection"] = None
    cfg["pretrained_backbone_checkpoint_path"] = None
    cfg["pretrained_checkpoint_path"] = None
    # UniCeption-style encoder bookkeeping keys (benign; must not error)
    cfg["encoder_kwargs"].update(
        {"name": "dinov2", "uses_torch_hub": False, "data_norm_type": "dinov2", "num_register_tokens": 0}
    )
    if extra_encoder_kwargs:
        cfg["encoder_kwargs"].update(extra_encoder_kwargs)
    with open(os.path.join(d, "config.json"), "w") as f:
        json.dump(cfg, f)
    return model, d


def test_from_pretrained_hub_style_config(tmp_path, rng):
    """Full reference-schema config.json with hub extras loads and predicts
    identically to the saved model."""
    import jax.numpy as jnp

    ref_model, d = _hub_style_config_json(tmp_path)
    loaded = UniFlowMatchConfidence.from_pretrained(d)
    assert loaded.config.encoder_kwargs["embed_dim"] == ref_model.config.encoder_kwargs["embed_dim"]
    assert loaded.inference_resolution == ref_model.inference_resolution

    img = rng.standard_normal((1, 42, 56, 3)).astype(np.float32)
    a = ref_model.net.apply({"params": ref_model.params}, jnp.asarray(img), jnp.asarray(img))
    b = loaded.net.apply({"params": loaded.params}, jnp.asarray(img), jnp.asarray(img))
    np.testing.assert_allclose(np.asarray(a["flow"]), np.asarray(b["flow"]), atol=1e-6)


def test_from_pretrained_rejects_load_bearing_unknown_encoder_kwargs(tmp_path):
    """An encoder option that would change the architecture (e.g. DINOv2
    register tokens) must hard-fail, not silently build the wrong network."""
    _, d = _hub_style_config_json(tmp_path, extra_encoder_kwargs={"num_register_tokens": 4})
    with pytest.raises(ValueError, match="load-bearing"):
        UniFlowMatchConfidence.from_pretrained(d)


def test_encoder_factory_presets_and_aliases():
    from ufm_tpu.nn.encoders import feature_returner_encoder_factory

    enc = feature_returner_encoder_factory("dinov2_large", intermediate_layer_idx=(0, 23))
    assert (enc.embed_dim, enc.depth, enc.num_heads) == (1024, 24, 16)

    # UniCeption-style: size selector + timm aliases + benign keys
    enc = feature_returner_encoder_factory(
        "dinov2", size="base", init_values=1e-4, img_size=518, uses_torch_hub=False, name="dinov2"
    )
    assert (enc.embed_dim, enc.depth, enc.num_heads) == (768, 12, 12)
    assert enc.layerscale_init == 1e-4
    assert enc.pretrain_grid_size == 37

    with pytest.raises(ValueError, match="load-bearing"):
        feature_returner_encoder_factory("dinov2_large", ffn_layer="swiglu")


def test_flagship_config_schema_builds_expected_architecture():
    """The flagship UFM-Base-class constructor kwargs (reference schema,
    ufm.py:483-508) build the intended module dims without init."""
    from ufm_tpu.models import ufm_base_config

    cfg = ufm_base_config()
    model = UniFlowMatchConfidence(**{k: v for k, v in cfg.to_dict().items() if k not in (
        "has_uncertainty_head", "has_classification_head")})
    assert model.net.cfg.info_sharing_kwargs["dim"] == 768
    assert model.net.cfg.has_uncertainty_head
    assert model.inference_resolution == [(560, 420)]
    assert list(model.net.cfg.uncertainty_adaptors_kwargs) == [
        "flow_cov", "keypoint_confidence", "non_occluded_mask"]


def test_load_pre_scan_layout_checkpoint(tmp_path, rng):
    """Checkpoints saved before the scan-over-layers layout (per-layer
    blocks_N subtrees) must load transparently (checkpoint/convert.py
    migrate_unrolled_blocks)."""
    import flax
    import os

    model = UniFlowMatchConfidence.from_config(ufm_tiny_config())
    d = str(tmp_path / "old_ckpt")
    model.save_pretrained(d)

    # rewrite params.msgpack into the old unrolled layout
    with open(os.path.join(d, "params.msgpack"), "rb") as f:
        tree = flax.serialization.msgpack_restore(f.read())

    def unroll(node):
        if not isinstance(node, dict):
            return node
        node = {k: unroll(v) for k, v in node.items()}
        if "blocks" in node and isinstance(node["blocks"], dict):
            stacked = node.pop("blocks")
            depth = jax.tree.leaves(stacked)[0].shape[0]
            for i in range(depth):
                node[f"blocks_{i}"] = jax.tree.map(lambda x: x[i], stacked)
        return node

    with open(os.path.join(d, "params.msgpack"), "wb") as f:
        f.write(flax.serialization.msgpack_serialize(unroll(tree)))

    loaded = UniFlowMatchConfidence.from_pretrained(d)
    a = np.concatenate([np.ravel(x) for x in jax.tree.leaves(model.params)])
    b = np.concatenate([np.ravel(x) for x in jax.tree.leaves(loaded.params)])
    np.testing.assert_array_equal(a, b)
