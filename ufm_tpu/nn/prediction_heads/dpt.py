"""DPT dense prediction head (feature pyramid fusion + regression trunk).

TPU-native equivalent of ``uniception.models.prediction_heads.dpt``
(reference import surface: uniflowmatch/models/ufm.py:23, 262-264; pyramid
assembly at ufm.py:396-409): :class:`DPTFeature` reassembles 4 token levels
into a fused convolutional pyramid ("Vision Transformers for Dense
Prediction" architecture), and :class:`DPTRegressionProcessor` decodes the
fused map into a dense regression at the requested output resolution.

All convs are channel-last (NHWC) XLA convolutions — the layout the TPU
vector units and MXU want. Upsampling inside the fusion path uses
align_corners=True bilinear (DPT convention); the final decode resizes to the
exact ``target_output_shape``.

Precision: the head's matmul-based resizes run at DEFAULT matmul precision
(``interp_precision="default"``), consistent with the convolutions around
them — on TPU, DEFAULT rounds matmul inputs to bf16 (single MXU pass), and
every conv in this head already does that. HIGHEST-precision resizes between
default-precision convs cost 6 MXU passes each (~8 ms/head of the 13 ms
flagship head at b4, see BENCH_NOTES.md round 3) while adding one fewer
bf16 rounding among ~15; measured effect on flagship flow outputs is
≤0.05 px. Set ``interp_precision="highest"`` (per head via the config's
``dpt_feature``/``dpt_processor`` kwargs) to restore fp32 resizes.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax.lax
import jax.numpy as jnp

from ufm_tpu.nn.prediction_heads.base import (
    PredictionHeadLayeredInput,
    RegressionOutput,
)
from ufm_tpu.ops.resize import resize_hwc

__all__ = ["DPTFeature", "DPTRegressionProcessor"]


def _interp_precision(name: str):
    return {"default": jax.lax.Precision.DEFAULT, "highest": jax.lax.Precision.HIGHEST}[name]


class _ResidualConvUnit(nn.Module):
    """relu -> conv3x3 -> relu -> conv3x3, residual."""

    dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = nn.relu(x)
        h = nn.Conv(self.dim, (3, 3), padding=1, dtype=self.dtype, name="conv1")(h)
        h = nn.relu(h)
        h = nn.Conv(self.dim, (3, 3), padding=1, dtype=self.dtype, name="conv2")(h)
        return x + h


class _FeatureFusionBlock(nn.Module):
    """RefineNet-style fusion: (optional skip RCU) + RCU + 2x upsample + 1x1."""

    dim: int
    dtype: jnp.dtype = jnp.float32
    interp_precision: str = "default"

    @nn.compact
    def __call__(self, x, skip=None):
        prec = _interp_precision(self.interp_precision)
        if skip is not None:
            if x.shape[1:3] != skip.shape[1:3]:  # odd patch grids: align to the skip level
                x = resize_hwc(x, skip.shape[1:3], antialias=False, align_corners=True, precision=prec)
            x = x + _ResidualConvUnit(self.dim, dtype=self.dtype, name="rcu_skip")(skip)
        x = _ResidualConvUnit(self.dim, dtype=self.dtype, name="rcu")(x)
        h, w = x.shape[-3] * 2, x.shape[-2] * 2
        x = resize_hwc(x, (h, w), antialias=False, align_corners=True, precision=prec)
        x = nn.Conv(self.dim, (1, 1), dtype=self.dtype, name="project")(x)
        return x


class DPTFeature(nn.Module):
    """Reassemble 4 feature levels and fuse them top-down.

    ``input_dims`` gives the channel width of each incoming level (UFM feeds
    [encoder_last, info_interm0, info_interm1, info_final]; reference
    ufm.py:396-409). Output: fused (B, 8*Hp, 8*Wp, feature_dim) map.
    """

    input_dims: Sequence[int] = (1024, 768, 768, 768)
    proj_dims: Sequence[int] = (96, 192, 384, 768)
    feature_dim: int = 256
    dtype: jnp.dtype = jnp.float32
    interp_precision: str = "default"

    @nn.compact
    def __call__(self, inp: PredictionHeadLayeredInput) -> jnp.ndarray:
        feats = inp.list_features
        assert len(feats) == 4, f"DPT expects 4 levels, got {len(feats)}"

        # Per-level projection + spatial reassembly to [x4, x2, x1, x0.5].
        levels = []
        for i, f in enumerate(feats):
            f = f.astype(self.dtype)
            f = nn.Conv(self.proj_dims[i], (1, 1), dtype=self.dtype, name=f"proj_{i}")(f)
            if i == 0:
                f = nn.ConvTranspose(self.proj_dims[i], (4, 4), strides=(4, 4), dtype=self.dtype, name="resize_0")(f)
            elif i == 1:
                f = nn.ConvTranspose(self.proj_dims[i], (2, 2), strides=(2, 2), dtype=self.dtype, name="resize_1")(f)
            elif i == 3:
                f = nn.Conv(self.proj_dims[i], (3, 3), strides=(2, 2), padding=1, dtype=self.dtype, name="resize_3")(f)
            f = nn.Conv(self.feature_dim, (3, 3), padding=1, use_bias=False, dtype=self.dtype, name=f"scratch_{i}")(f)
            levels.append(f)

        l0, l1, l2, l3 = levels
        ffb = dict(dtype=self.dtype, interp_precision=self.interp_precision)
        x = _FeatureFusionBlock(self.feature_dim, name="fusion_3", **ffb)(l3)
        x = _FeatureFusionBlock(self.feature_dim, name="fusion_2", **ffb)(x, l2)
        x = _FeatureFusionBlock(self.feature_dim, name="fusion_1", **ffb)(x, l1)
        x = _FeatureFusionBlock(self.feature_dim, name="fusion_0", **ffb)(x, l0)
        return x


class DPTRegressionProcessor(nn.Module):
    """Decode the fused DPT map to ``output_dim`` channels at target res."""

    input_dim: int = 256
    hidden_dims: Tuple[int, int] = (128, 64)
    output_dim: int = 2
    dtype: jnp.dtype = jnp.float32
    interp_precision: str = "default"

    @nn.compact
    def __call__(self, x: jnp.ndarray, target_output_shape: Tuple[int, int]) -> RegressionOutput:
        x = nn.Conv(self.hidden_dims[0], (3, 3), padding=1, dtype=self.dtype, name="conv1")(x)
        x = resize_hwc(
            x,
            target_output_shape,
            antialias=False,
            align_corners=True,
            precision=_interp_precision(self.interp_precision),
        )
        x = nn.Conv(self.hidden_dims[1], (3, 3), padding=1, dtype=self.dtype, name="conv2")(x)
        x = nn.relu(x)
        x = nn.Conv(self.output_dim, (1, 1), dtype=self.dtype, name="conv3")(x)
        return RegressionOutput(value=x)
