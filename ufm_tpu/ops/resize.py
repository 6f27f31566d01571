"""Image / field resizing ops, TPU-first.

Every resize in this framework is expressed as a pair of *static* separable
weight matrices (built host-side in float64 numpy at trace time) applied as two
matrix multiplies. On TPU this maps straight onto the MXU and fuses with the
surrounding graph; it also gives bit-accurate parity with the PyTorch reference
semantics that the original pipeline relies on:

- ``mode="bilinear", antialias=True``  — matches
  ``torch.nn.functional.interpolate(..., mode="bilinear", align_corners=False,
  antialias=True)`` (the PIL-style triangle filter). Used by the fixed-shape
  input scaler (reference: uniflowmatch/utils/flow_resizing.py:313-326).
- ``mode="bilinear", antialias=False`` — matches plain ``F.interpolate``
  bilinear with ``align_corners=False`` (reference: flow_resizing.py:137-142,
  816-827).
- ``mode="nearest"`` — matches torch's legacy ``nearest`` index rule
  ``src = floor(dst * in/out)`` (reference: flow_resizing.py:824-826, 989-994).

All functions take/return channel-last arrays (..., H, W, C) or channel-first
(..., C, H, W) depending on the documented argument; shapes must be static
under ``jax.jit``.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "resize_matrix",
    "resize_hwc",
    "resize_chw",
    "resize_nearest_hwc",
    "resize_nearest_chw",
]


def _triangle(t: np.ndarray) -> np.ndarray:
    return np.maximum(0.0, 1.0 - np.abs(t))


@functools.lru_cache(maxsize=256)
def _resize_matrix_np(in_size: int, out_size: int, antialias: bool, align_corners: bool = False) -> np.ndarray:
    """Row-stochastic (out_size, in_size) float64 interpolation matrix.

    Implements the exact tap/weight rule of torch's bilinear resampling with
    half-pixel centers (``align_corners=False``); with ``antialias`` the filter
    support is widened by the downscale factor and weights renormalized, which
    is the PIL-style convolution torch uses for ``antialias=True``. With
    ``align_corners=True`` (DPT-style upsampling) endpoints map to endpoints.
    """
    if in_size == out_size:
        return np.eye(in_size, dtype=np.float64)

    if align_corners:
        assert not antialias, "align_corners=True is only used without antialias"
        w = np.zeros((out_size, in_size), dtype=np.float64)
        scale32 = (np.float32(in_size) - 1) / (np.float32(out_size) - 1) if out_size > 1 else np.float32(0)
        src = (np.arange(out_size, dtype=np.float32) * scale32)
        x0 = np.floor(src).astype(np.int64)
        t = src.astype(np.float64) - x0
        for i in range(out_size):
            lo = min(max(int(x0[i]), 0), in_size - 1)
            hi = min(max(int(x0[i]) + 1, 0), in_size - 1)
            w[i, lo] += 1.0 - t[i]
            w[i, hi] += t[i]
        return w

    # torch computes source coordinates in the tensor dtype (float32 for the
    # pipeline's images); mirror that so tap choices and fractional weights
    # round identically.
    scale32 = np.float32(in_size) / np.float32(out_size)
    scale = float(scale32)
    w = np.zeros((out_size, in_size), dtype=np.float64)

    if antialias and scale > 1.0:
        support = scale  # triangle radius 1.0 * scale
        for i in range(out_size):
            center = float((np.float32(i) + np.float32(0.5)) * scale32)
            xmin = max(int(center - support + 0.5), 0)
            xmax = min(int(center + support + 0.5), in_size)
            x = np.arange(xmin, xmax)
            weights = _triangle((x + 0.5 - center) / scale)
            s = weights.sum()
            if s > 0:
                w[i, xmin:xmax] = weights / s
            else:  # degenerate: fall back to nearest tap
                w[i, min(int(center), in_size - 1)] = 1.0
    else:
        i = np.arange(out_size, dtype=np.float32)
        src = (i + np.float32(0.5)) * scale32 - np.float32(0.5)
        x0 = np.floor(src).astype(np.int64)
        t = (src.astype(np.float64) - x0)
        for i in range(out_size):
            lo = min(max(int(x0[i]), 0), in_size - 1)
            hi = min(max(int(x0[i]) + 1, 0), in_size - 1)
            w[i, lo] += 1.0 - t[i]
            w[i, hi] += t[i]

    return w


@functools.lru_cache(maxsize=256)
def _nearest_index_np(in_size: int, out_size: int) -> np.ndarray:
    """torch legacy-nearest source indices: src = floor(dst * in/out)."""
    scale = in_size / out_size
    idx = np.floor(np.arange(out_size) * scale).astype(np.int64)
    return np.minimum(idx, in_size - 1)


def resize_matrix(
    in_size: int, out_size: int, antialias: bool, dtype=jnp.float32, align_corners: bool = False
) -> jnp.ndarray:
    """Return the (out_size, in_size) interpolation matrix as a jnp array."""
    return jnp.asarray(_resize_matrix_np(in_size, out_size, antialias, align_corners), dtype=dtype)


def resize_hwc(
    image: jnp.ndarray,
    out_shape: Tuple[int, int],
    antialias: bool = True,
    align_corners: bool = False,
    precision=jax.lax.Precision.HIGHEST,
) -> jnp.ndarray:
    """Bilinear-resize a (..., H, W, C) array to (..., H', W', C).

    ``antialias=True`` matches torch ``F.interpolate(..., antialias=True)``;
    ``False`` matches plain bilinear. Internally two MXU matmuls.
    """
    h_out, w_out = int(out_shape[0]), int(out_shape[1])
    h_in, w_in = image.shape[-3], image.shape[-2]
    dt = image.dtype if jnp.issubdtype(image.dtype, jnp.floating) else jnp.float32
    wh = resize_matrix(h_in, h_out, antialias, dt, align_corners)
    ww = resize_matrix(w_in, w_out, antialias, wh.dtype, align_corners)

    x = image.astype(wh.dtype)
    # (..., H, W, C): contract H with wh then W with ww.
    x = jnp.einsum("oh,...hwc->...owc", wh, x, precision=precision)
    x = jnp.einsum("ow,...hwc->...hoc", ww, x, precision=precision)
    return x


def resize_chw(
    image: jnp.ndarray,
    out_shape: Tuple[int, int],
    antialias: bool = True,
    align_corners: bool = False,
    precision=jax.lax.Precision.HIGHEST,
) -> jnp.ndarray:
    """Bilinear-resize a (..., C, H, W) array to (..., C, H', W')."""
    h_out, w_out = int(out_shape[0]), int(out_shape[1])
    h_in, w_in = image.shape[-2], image.shape[-1]
    dt = image.dtype if jnp.issubdtype(image.dtype, jnp.floating) else jnp.float32
    wh = resize_matrix(h_in, h_out, antialias, dt, align_corners)
    ww = resize_matrix(w_in, w_out, antialias, wh.dtype, align_corners)

    x = image.astype(wh.dtype)
    x = jnp.einsum("oh,...hw->...ow", wh, x, precision=precision)
    x = jnp.einsum("ow,...hw->...ho", ww, x, precision=precision)
    return x


def resize_nearest_hwc(image: jnp.ndarray, out_shape: Tuple[int, int]) -> jnp.ndarray:
    """Nearest-resize (..., H, W, C) with torch's legacy-nearest index rule."""
    h_out, w_out = int(out_shape[0]), int(out_shape[1])
    hi = jnp.asarray(_nearest_index_np(image.shape[-3], h_out))
    wi = jnp.asarray(_nearest_index_np(image.shape[-2], w_out))
    return image[..., hi, :, :][..., :, wi, :]


def resize_nearest_chw(image: jnp.ndarray, out_shape: Tuple[int, int]) -> jnp.ndarray:
    """Nearest-resize (..., C, H, W) with torch's legacy-nearest index rule."""
    h_out, w_out = int(out_shape[0]), int(out_shape[1])
    hi = jnp.asarray(_nearest_index_np(image.shape[-2], h_out))
    wi = jnp.asarray(_nearest_index_np(image.shape[-1], w_out))
    return image[..., hi, :][..., :, wi]
