"""MoGe-style convolutional regression head (alternative to DPT).

TPU-native equivalent of ``uniception.models.prediction_heads.moge_conv``
(reference import surface: uniflowmatch/models/ufm.py:25, 266-267): a light
conv decoder that projects the last feature level and upsamples with
conv+relu stages to the target output resolution.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

from ufm_tpu.nn.prediction_heads.base import (
    PredictionHeadLayeredInput,
    RegressionOutput,
)
from ufm_tpu.ops.resize import resize_hwc

__all__ = ["MoGeConvFeature"]


class MoGeConvFeature(nn.Module):
    input_dim: int = 768
    dims: Sequence[int] = (256, 128, 64)
    output_dim: int = 2
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, inp: PredictionHeadLayeredInput) -> RegressionOutput:
        x = inp.list_features[-1].astype(self.dtype)  # (B, Hp, Wp, C)
        x = nn.Conv(self.dims[0], (1, 1), dtype=self.dtype, name="proj")(x)
        for i, d in enumerate(self.dims):
            h, w = x.shape[-3] * 2, x.shape[-2] * 2
            x = resize_hwc(x, (h, w), antialias=False)
            x = nn.Conv(d, (3, 3), padding=1, dtype=self.dtype, name=f"conv{i}")(x)
            x = nn.relu(x)
        x = resize_hwc(x, inp.target_output_shape, antialias=False)
        x = nn.Conv(self.output_dim, (3, 3), padding=1, dtype=self.dtype, name="out")(x)
        return RegressionOutput(value=x)
