"""UNet fine-feature encoder for classification refinement.

TPU-native equivalent of the reference's UNet
(uniflowmatch/models/unet_encoder.py:10-71): DoubleConv blocks, 2x2 maxpool
downs, ConvTranspose ups with skip concatenation (nearest-resize on shape
mismatch, matching torch ``F.interpolate`` default), final 1x1 conv. NHWC.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

from ufm_tpu.ops.resize import resize_nearest_hwc

__all__ = ["UNet"]


class _DoubleConv(nn.Module):
    dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.dim, (3, 3), padding=1, dtype=self.dtype, name="conv1")(x)
        x = nn.relu(x)
        x = nn.Conv(self.dim, (3, 3), padding=1, dtype=self.dtype, name="conv2")(x)
        return nn.relu(x)


class UNet(nn.Module):
    out_channels: int = 16
    features: Sequence[int] = (64, 128, 256, 512)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        """x: (B, H, W, C) -> (B, H, W, out_channels)."""
        x = x.astype(self.dtype)
        skips = []
        for i, f in enumerate(self.features):
            x = _DoubleConv(f, dtype=self.dtype, name=f"down_{i}")(x)
            skips.append(x)
            x = nn.max_pool(x, (2, 2), strides=(2, 2))

        x = _DoubleConv(self.features[-1] * 2, dtype=self.dtype, name="bottleneck")(x)

        for i, f in enumerate(reversed(self.features)):
            x = nn.ConvTranspose(f, (2, 2), strides=(2, 2), dtype=self.dtype, name=f"up_{i}")(x)
            skip = skips[-(i + 1)]
            if x.shape[1:3] != skip.shape[1:3]:
                x = resize_nearest_hwc(x, skip.shape[1:3])
            x = jnp.concatenate([skip, x], axis=-1)
            x = _DoubleConv(f, dtype=self.dtype, name=f"up_conv_{i}")(x)

        return nn.Conv(self.out_channels, (1, 1), dtype=self.dtype, name="final")(x)
