"""Resize/unmap subsystem: parity against the reference implementation.

The PyTorch reference's flow_resizing module is self-contained (torch only),
so where the reference tree is mounted we import it directly as the oracle
and check our JAX port produces identical regions and unmapped fields.
"""

import os
import sys

import numpy as np
import pytest

import jax.numpy as jnp

from ufm_tpu.utils.flow_resizing import (
    AutomaticShapeSelection,
    CenterCropManipulation,
    ImagePairsManipulationComposite,
    ResizeHorizontalAxisManipulation,
    ResizeToFixedManipulation,
    unmap_predicted_channels,
    unmap_predicted_flow,
)

_REF = "/root/reference"
_HAS_REF = os.path.isdir(os.path.join(_REF, "uniflowmatch"))


def _ref_modules():
    # load the module file directly — the reference package __init__ imports
    # its (absent) uniception dependency
    import importlib.util

    path = os.path.join(_REF, "uniflowmatch", "utils", "flow_resizing.py")
    spec = importlib.util.spec_from_file_location("ref_flow_resizing", path)
    ref = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ref)
    return ref


@pytest.mark.skipif(not _HAS_REF, reason="reference tree not mounted")
def test_resize_to_fixed_regions_match_reference(rng):
    import torch

    ref = _ref_modules()

    img0 = rng.integers(0, 255, (1, 145, 256, 3), dtype=np.uint8)
    img1 = rng.integers(0, 255, (1, 135, 250, 3), dtype=np.uint8)

    ours = AutomaticShapeSelection(ResizeToFixedManipulation((42, 56)))
    theirs = ref.AutomaticShapeSelection(ref.ResizeToFixedManipulation((42, 56)))

    o = ours(jnp.asarray(img0), jnp.asarray(img1))
    t = theirs(torch.from_numpy(img0), torch.from_numpy(img1))

    for i in (2, 3, 4, 5):  # region vectors
        np.testing.assert_allclose(np.asarray(o[i], dtype=np.float64), t[i].numpy().astype(np.float64))
    # resized images match to rounding (uint8 cast after float resize)
    np.testing.assert_allclose(
        np.asarray(o[0], dtype=np.int32), t[0].numpy().astype(np.int32), atol=1
    )


@pytest.mark.skipif(not _HAS_REF, reason="reference tree not mounted")
def test_unmap_flow_matches_reference(rng):
    import torch

    ref = _ref_modules()

    # the reference __main__ scenario: resize + center crop chain
    img0 = np.zeros((1, 145, 256, 3), dtype=np.uint8)
    img1 = np.zeros((1, 135, 256, 3), dtype=np.uint8)

    # the reference __main__ scenario uses two candidate chains
    # (flow_resizing.py:1039-1042)
    theirs = ref.AutomaticShapeSelection(
        ref.ImagePairsManipulationComposite(
            ref.ResizeHorizontalAxisManipulation(512), ref.CenterCropManipulation((288, 512))
        ),
        ref.ImagePairsManipulationComposite(
            ref.ResizeHorizontalAxisManipulation(512), ref.CenterCropManipulation((200, 512))
        ),
    )
    _, _, t_src0, t_src1, t_rep0, t_rep1 = theirs(torch.from_numpy(img0), torch.from_numpy(img1))

    ours = AutomaticShapeSelection(
        ImagePairsManipulationComposite(
            ResizeHorizontalAxisManipulation(512), CenterCropManipulation((288, 512))
        ),
        ImagePairsManipulationComposite(
            ResizeHorizontalAxisManipulation(512), CenterCropManipulation((200, 512))
        ),
    )
    _, _, o_src0, o_src1, o_rep0, o_rep1 = ours(jnp.asarray(img0), jnp.asarray(img1))

    np.testing.assert_allclose(np.asarray(o_rep0), t_rep0.numpy())
    np.testing.assert_allclose(np.asarray(o_rep1), t_rep1.numpy())
    np.testing.assert_allclose(np.asarray(o_src0, dtype=np.float64), t_src0.numpy(), atol=1e-6)
    np.testing.assert_allclose(np.asarray(o_src1, dtype=np.float64), t_src1.numpy(), atol=1e-6)

    flow_pred = rng.standard_normal((1, 2, 288, 512)).astype(np.float32) * 20

    t_flow, t_valid = ref.unmap_predicted_flow(
        torch.from_numpy(flow_pred), t_rep0, t_rep1, t_src0, t_src1, (145, 256), (135, 256)
    )
    o_flow, o_valid = unmap_predicted_flow(
        jnp.asarray(flow_pred.transpose(0, 2, 3, 1)),
        np.asarray(o_rep0),
        np.asarray(o_rep1),
        np.asarray(o_src0),
        np.asarray(o_src1),
        (145, 256),
        (135, 256),
    )
    np.testing.assert_allclose(
        np.asarray(o_flow).transpose(0, 3, 1, 2), t_flow.numpy(), rtol=1e-4, atol=1e-3
    )
    np.testing.assert_array_equal(np.asarray(o_valid), t_valid.numpy())


@pytest.mark.skipif(not _HAS_REF, reason="reference tree not mounted")
def test_unmap_channels_matches_reference(rng):
    import torch

    ref = _ref_modules()

    chan = rng.random((1, 1, 42, 56)).astype(np.float32)
    rep = np.array([0, 42, 0, 56], dtype=np.int64)
    src = np.array([0, 100, 0, 80], dtype=np.float64)

    t_out, t_valid = ref.unmap_predicted_channels(
        torch.from_numpy(chan), torch.from_numpy(rep), torch.from_numpy(src.astype(np.int64)), (100, 80)
    )
    o_out, o_valid = unmap_predicted_channels(
        jnp.asarray(chan.transpose(0, 2, 3, 1)), rep, src, (100, 80)
    )
    np.testing.assert_allclose(np.asarray(o_out).transpose(0, 3, 1, 2), t_out.numpy(), rtol=1e-5, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(o_valid), t_valid.numpy())


def test_center_crop_region_clipping():
    """When the crop removes part of the valid region, source regions shrink
    accordingly (the complex path of CenterCropManipulation)."""
    img0 = jnp.zeros((1, 100, 100, 3))
    img1 = jnp.zeros((1, 100, 100, 3))
    crop = CenterCropManipulation((50, 50))
    src = np.array([0, 100, 0, 100], dtype=np.float64)
    rep = np.array([0, 100, 0, 100], dtype=np.float64)
    out = crop(img0, img1, src.copy(), src.copy(), rep.copy(), rep.copy())
    _, _, src0, _, rep0, _ = out
    np.testing.assert_allclose(rep0, [0, 50, 0, 50])
    np.testing.assert_allclose(src0, [25, 75, 25, 75])
