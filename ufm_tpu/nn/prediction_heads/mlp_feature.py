"""Patch-MLP feature head.

TPU-native equivalent of ``uniception.models.prediction_heads.mlp_feature``
(reference import surface: uniflowmatch/models/ufm.py:24, 802-805, 961-965):
maps per-patch tokens through an MLP to ``patch_size² * output_dim`` values
and unshuffles them to a full-resolution feature map (``decoded_channels``),
used as the classification-refinement feature extractor.

The final depth-to-space is a reshape/transpose — free on TPU — and the MLP
is one big MXU matmul over all patches.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

from ufm_tpu.nn.prediction_heads.base import PredictionHeadInput, PredictionHeadOutput

__all__ = ["MLPFeature"]


class MLPFeature(nn.Module):
    input_feature_dim: int = 1792  # encoder level0 (1024) + info final (768)
    hidden_dims: Sequence[int] = (1024,)
    output_dim: int = 16
    patch_size: int = 14
    dtype: jnp.dtype = jnp.float32

    @property
    def decoded_channels(self) -> int:
        return self.output_dim

    @nn.compact
    def __call__(self, inp: PredictionHeadInput) -> PredictionHeadOutput:
        x = inp.last_feature.astype(self.dtype)  # (B, Hp, Wp, C)
        b, hp, wp, _ = x.shape
        p = self.patch_size

        for i, h in enumerate(self.hidden_dims):
            x = nn.Dense(h, dtype=self.dtype, name=f"fc{i}")(x)
            x = nn.gelu(x, approximate=False)
        x = nn.Dense(p * p * self.output_dim, dtype=self.dtype, name="fc_out")(x)

        # depth-to-space: (B, Hp, Wp, p*p*C) -> (B, Hp*p, Wp*p, C)
        x = x.reshape(b, hp, wp, p, p, self.output_dim)
        x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b, hp * p, wp * p, self.output_dim)
        return PredictionHeadOutput(decoded_channels=x)
