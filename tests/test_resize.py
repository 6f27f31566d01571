"""Parity tests for ufm_tpu.ops.resize against torch F.interpolate."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from ufm_tpu.ops.resize import (
    resize_chw,
    resize_hwc,
    resize_nearest_chw,
    resize_nearest_hwc,
)

SHAPES = [
    ((420, 560), (420, 560)),  # identity
    ((1080, 1920), (420, 560)),  # big downscale (the demo image path)
    ((145, 256), (288, 512)),  # upscale (flow_resizing __main__ case)
    ((288, 512), (145, 256)),
    ((37, 53), (41, 29)),  # odd shapes, mixed up/down per axis
]


@pytest.mark.parametrize("in_shape,out_shape", SHAPES)
@pytest.mark.parametrize("antialias", [True, False])
def test_bilinear_matches_torch(rng, in_shape, out_shape, antialias):
    x = rng.standard_normal((2, 3, *in_shape)).astype(np.float32) * 50 + 100

    ref = F.interpolate(
        torch.from_numpy(x),
        size=out_shape,
        mode="bilinear",
        align_corners=False,
        antialias=antialias,
    ).numpy()

    got = np.asarray(resize_chw(jnp.asarray(x), out_shape, antialias=antialias))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=5e-3)

    got_hwc = np.asarray(resize_hwc(jnp.asarray(x.transpose(0, 2, 3, 1)), out_shape, antialias=antialias))
    np.testing.assert_allclose(got_hwc.transpose(0, 3, 1, 2), ref, rtol=1e-4, atol=5e-3)


@pytest.mark.parametrize(
    "in_shape,out_shape",
    [
        ((7, 9), (14, 18)),  # DPT fusion 2x upsample
        ((15, 20), (30, 40)),
        ((24, 32), (56, 42)),  # DPT processor decode-to-target (mixed axes)
        ((5, 5), (9, 13)),
    ],
)
def test_bilinear_align_corners_matches_torch(rng, in_shape, out_shape):
    """The DPT head upsamples with align_corners=True (dpt.py); pin torch parity."""
    x = rng.standard_normal((2, 3, *in_shape)).astype(np.float32) * 10

    ref = F.interpolate(torch.from_numpy(x), size=out_shape, mode="bilinear", align_corners=True).numpy()
    got = np.asarray(resize_chw(jnp.asarray(x), out_shape, antialias=False, align_corners=True))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)

    got_hwc = np.asarray(
        resize_hwc(jnp.asarray(x.transpose(0, 2, 3, 1)), out_shape, antialias=False, align_corners=True)
    )
    np.testing.assert_allclose(got_hwc.transpose(0, 3, 1, 2), ref, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("in_shape,out_shape", SHAPES)
def test_nearest_matches_torch(rng, in_shape, out_shape):
    x = rng.standard_normal((2, 3, *in_shape)).astype(np.float32)

    ref = F.interpolate(torch.from_numpy(x), size=out_shape, mode="nearest").numpy()

    got = np.asarray(resize_nearest_chw(jnp.asarray(x), out_shape))
    np.testing.assert_array_equal(got, ref)

    got_hwc = np.asarray(resize_nearest_hwc(jnp.asarray(x.transpose(0, 2, 3, 1)), out_shape))
    np.testing.assert_array_equal(got_hwc.transpose(0, 3, 1, 2), ref)


def test_uint8_input_promotes():
    x = (np.arange(2 * 8 * 8 * 3) % 255).astype(np.uint8).reshape(2, 8, 8, 3)
    out = resize_hwc(jnp.asarray(x), (4, 4), antialias=True)
    assert out.dtype == jnp.float32
