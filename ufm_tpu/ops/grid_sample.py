"""`grid_sample` for TPU/XLA, with torch-parity semantics.

The reference relies on ``torch.nn.functional.grid_sample`` in two places:

- the classification-refinement neighborhood sampler, ``mode="bicubic",
  padding_mode="zeros", align_corners=False``
  (reference: uniflowmatch/models/ufm.py:1168-1170);
- the visualization backward warp, ``mode="bilinear", align_corners=False``
  (reference: uniflowmatch/utils/viz.py:44-50).

There is no XLA primitive for this, so it is built from static-shape gathers:
per-sample taps are fetched with ``take`` on a flattened (H*W) axis and
combined with separable interpolation weights on the VPU. Out-of-bounds taps
contribute exactly zero (``padding_mode="zeros"``), including the torch corner
case where a tap row/col is out of range but the sample center is not.

Layout is channel-last: features (B, H, W, C), grid (B, *S, 2) with xy order
and values in [-1, 1] (align_corners=False convention: x = ((gx+1)*W - 1)/2).
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = ["grid_sample", "cubic_weights"]

_CUBIC_A = -0.75  # torch's cubic convolution constant


def cubic_weights(t: jnp.ndarray):
    """Cubic-convolution weights (A=-0.75) for taps at offsets [-1, 0, 1, 2].

    ``t`` is the fractional distance of the sample from the floor tap,
    broadcastable; returns a tuple of 4 arrays shaped like ``t``.
    """
    a = _CUBIC_A

    def k1(x):  # |x| <= 1
        return ((a + 2.0) * x - (a + 3.0)) * x * x + 1.0

    def k2(x):  # 1 < |x| < 2
        return (((x - 5.0) * x + 8.0) * x - 4.0) * a

    w0 = k2(t + 1.0)
    w1 = k1(t)
    w2 = k1(1.0 - t)
    w3 = k2(2.0 - t)
    return w0, w1, w2, w3


def _unnormalize(coord: jnp.ndarray, size: int) -> jnp.ndarray:
    # align_corners=False: [-1, 1] maps to [-0.5, size - 0.5] pixel centers.
    return ((coord + 1.0) * size - 1.0) / 2.0


def _gather_2d(flat: jnp.ndarray, ix: jnp.ndarray, iy: jnp.ndarray, h: int, w: int) -> jnp.ndarray:
    """Zero-padded gather. flat: (B, H*W, C); ix/iy: (B, *S) int32."""
    valid = (ix >= 0) & (ix < w) & (iy >= 0) & (iy < h)
    lin = jnp.clip(iy, 0, h - 1) * w + jnp.clip(ix, 0, w - 1)
    out = jnp.take_along_axis(flat, lin.reshape(lin.shape[0], -1)[..., None], axis=1)
    out = out.reshape(*ix.shape, flat.shape[-1])
    return jnp.where(valid[..., None], out, 0.0)


def grid_sample(
    features: jnp.ndarray,
    grid: jnp.ndarray,
    mode: str = "bilinear",
    padding_mode: str = "zeros",
    align_corners: bool = False,
) -> jnp.ndarray:
    """Sample ``features`` (B, H, W, C) at ``grid`` (B, *S, 2) xy in [-1, 1].

    Returns (B, *S, C). Only ``padding_mode="zeros"`` and
    ``align_corners=False`` are implemented (the only combination the
    reference uses).
    """
    if padding_mode != "zeros":
        raise NotImplementedError("only padding_mode='zeros' is supported")
    if align_corners:
        raise NotImplementedError("only align_corners=False is supported")

    b, h, w, c = features.shape
    flat = features.reshape(b, h * w, c)

    gx = _unnormalize(grid[..., 0], w)
    gy = _unnormalize(grid[..., 1], h)

    if mode == "nearest":
        ix = jnp.floor(gx + 0.5).astype(jnp.int32)
        iy = jnp.floor(gy + 0.5).astype(jnp.int32)
        return _gather_2d(flat, ix, iy, h, w)

    x0 = jnp.floor(gx)
    y0 = jnp.floor(gy)
    tx = gx - x0
    ty = gy - y0
    x0 = x0.astype(jnp.int32)
    y0 = y0.astype(jnp.int32)

    if mode == "bilinear":
        acc = 0.0
        for dy, wy in ((0, 1.0 - ty), (1, ty)):
            for dx, wx in ((0, 1.0 - tx), (1, tx)):
                tap = _gather_2d(flat, x0 + dx, y0 + dy, h, w)
                acc = acc + tap * (wx * wy)[..., None]
        return acc

    if mode == "bicubic":
        wxs = cubic_weights(tx)
        wys = cubic_weights(ty)
        acc = 0.0
        for dy in range(4):
            row = 0.0
            for dx in range(4):
                tap = _gather_2d(flat, x0 + (dx - 1), y0 + (dy - 1), h, w)
                row = row + tap * wxs[dx][..., None]
            acc = acc + row * wys[dy][..., None]
        return acc

    raise ValueError(f"unknown mode: {mode}")
