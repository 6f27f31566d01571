"""Shape/contract tests for the neural component library (tiny configs)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ufm_tpu.nn.encoders import ViTEncoderInput, feature_returner_encoder_factory
from ufm_tpu.nn.info_sharing import (
    INFO_SHARING_CLASSES,
    MultiViewTransformerInput,
)
from ufm_tpu.nn.prediction_heads import (
    AdaptorMap,
    ConfidenceAdaptor,
    Covariance2DAdaptor,
    DPTFeature,
    DPTRegressionProcessor,
    FlowAdaptor,
    MaskAdaptor,
    MLPFeature,
    MoGeConvFeature,
    PredictionHeadInput,
    PredictionHeadLayeredInput,
    RegressionOutput,
)
from ufm_tpu.nn.unet import UNet

KEY = jax.random.PRNGKey(0)

TINY_VIT = dict(
    patch_size=14,
    embed_dim=64,
    depth=4,
    num_heads=2,
    pretrain_grid_size=7,
    intermediate_layer_idx=(0, 3),
)


def test_vit_encoder_feature_returner():
    enc = feature_returner_encoder_factory("dinov2_custom", **TINY_VIT)
    img = jnp.zeros((2, 56, 70, 3))
    params = enc.init(KEY, ViTEncoderInput(image=img))
    outs = enc.apply(params, ViTEncoderInput(image=img))
    assert len(outs) == 2
    for o in outs:
        assert o.features.shape == (2, 4, 5, 64)
    assert enc.data_norm_type == "dinov2"


def test_vit_duplicate_tap_indices():
    """A config may spell the same layer twice (e.g. 3 and -1 both naming the
    last layer of a depth-4 stack after the `t % depth` wrap). The tap-buffer
    scan must load and return that layer's output at BOTH positions — round 2
    accepted such checkpoints and the round-3 rewrite must keep doing so."""
    enc = feature_returner_encoder_factory("dinov2_custom", **{**TINY_VIT, "intermediate_layer_idx": (3, -1)})
    img = jnp.asarray(np.random.default_rng(0).standard_normal((1, 56, 70, 3)), jnp.float32)
    params = enc.init(KEY, ViTEncoderInput(image=img))
    outs = enc.apply(params, ViTEncoderInput(image=img))
    assert len(outs) == 2
    np.testing.assert_array_equal(np.asarray(outs[0].features), np.asarray(outs[1].features))
    # and against the unique spelling: same layer, same values
    enc1 = feature_returner_encoder_factory("dinov2_custom", **{**TINY_VIT, "intermediate_layer_idx": (3,)})
    outs1 = enc1.apply(params, ViTEncoderInput(image=img))
    np.testing.assert_array_equal(np.asarray(outs[0].features), np.asarray(outs1[0].features))


def test_vit_pos_embed_interpolation():
    """Grid != pretraining grid must still work (pos embed is interpolated)."""
    enc = feature_returner_encoder_factory("dinov2_custom", **{**TINY_VIT, "pretrain_grid_size": 3})
    img = jnp.zeros((1, 70, 84, 3))
    params = enc.init(KEY, ViTEncoderInput(image=img))
    (o1, o2) = enc.apply(params, ViTEncoderInput(image=img))
    assert o2.features.shape == (1, 5, 6, 64)


def test_info_sharing_contract():
    cls = INFO_SHARING_CLASSES["global_attention"][1]
    mod = cls(input_embed_dim=64, dim=32, depth=3, num_heads=2, intermediate_layer_idx=(0, 1))
    f = jnp.zeros((2, 4, 5, 64))
    inp = MultiViewTransformerInput(features=[f, f])
    params = mod.init(KEY, inp)
    final, intermediates = mod.apply(params, inp)
    assert len(intermediates) == 2
    assert final.features[0].shape == (2, 4, 5, 32)
    assert final.features[1].shape == (2, 4, 5, 32)
    assert intermediates[0].features[0].shape == (2, 4, 5, 32)


def test_dpt_head_and_adaptors():
    feats = [
        jnp.zeros((1, 4, 5, 64)),
        jnp.zeros((1, 4, 5, 32)),
        jnp.zeros((1, 4, 5, 32)),
        jnp.zeros((1, 4, 5, 32)),
    ]
    inp = PredictionHeadLayeredInput(list_features=feats, target_output_shape=(56, 70))
    dpt = DPTFeature(input_dims=(64, 32, 32, 32), proj_dims=(8, 16, 24, 32), feature_dim=16)
    params = dpt.init(KEY, inp)
    fused = dpt.apply(params, inp)
    assert fused.shape == (1, 32, 40, 16)

    proc = DPTRegressionProcessor(input_dim=16, hidden_dims=(8, 8), output_dim=5)
    p2 = proc.init(KEY, fused, (56, 70))
    reg = proc.apply(p2, fused, (56, 70))
    assert reg.value.shape == (1, 56, 70, 5)

    amap = AdaptorMap(Covariance2DAdaptor(), ConfidenceAdaptor(), MaskAdaptor())
    out = amap(reg)
    assert set(out) == {"flow_cov", "keypoint_confidence", "non_occluded_mask"}
    assert out["flow_cov"].covariance.shape == (1, 56, 70, 3)
    assert out["non_occluded_mask"].mask.shape == (1, 56, 70)
    # SPD check: var_x, var_y > 0 and log_det consistent
    cov = np.asarray(out["flow_cov"].covariance)
    assert (cov[..., 0] > 0).all() and (cov[..., 1] > 0).all()
    det = cov[..., 0] * cov[..., 1] - cov[..., 2] ** 2
    np.testing.assert_allclose(np.log(det), np.asarray(out["flow_cov"].log_det), rtol=1e-4, atol=1e-4)


def test_flow_adaptor_map():
    amap = AdaptorMap(FlowAdaptor())
    reg = RegressionOutput(value=jnp.ones((1, 8, 8, 2)))
    out = amap(reg)
    assert out["flow"].value.shape == (1, 8, 8, 2)


def test_mlp_feature_depth_to_space():
    mod = MLPFeature(input_feature_dim=96, hidden_dims=(32,), output_dim=4, patch_size=14)
    x = jnp.zeros((2, 3, 4, 96))
    params = mod.init(KEY, PredictionHeadInput(last_feature=x))
    out = mod.apply(params, PredictionHeadInput(last_feature=x))
    assert out.decoded_channels.shape == (2, 42, 56, 4)


def test_moge_conv_head():
    mod = MoGeConvFeature(input_dim=32, dims=(16, 8), output_dim=2)
    inp = PredictionHeadLayeredInput(list_features=[jnp.zeros((1, 4, 5, 32))], target_output_shape=(56, 70))
    params = mod.init(KEY, inp)
    out = mod.apply(params, inp)
    assert out.value.shape == (1, 56, 70, 2)


def test_unet_shapes():
    net = UNet(out_channels=8, features=(8, 16))
    x = jnp.zeros((1, 56, 70, 3))
    params = net.init(KEY, x)
    out = net.apply(params, x)
    assert out.shape == (1, 56, 70, 8)


@pytest.mark.parametrize("hw", [(44, 52)])  # not divisible by 4: exercises mismatch resize
def test_unet_odd_shapes(hw):
    net = UNet(out_channels=4, features=(4, 8))
    x = jnp.zeros((1, *hw, 3))
    params = net.init(KEY, x)
    assert net.apply(params, x).shape == (1, *hw, 4)
