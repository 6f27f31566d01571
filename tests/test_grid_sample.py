"""Parity tests for ufm_tpu.ops.grid_sample against torch grid_sample."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from ufm_tpu.ops.grid_sample import grid_sample


def _torch_ref(feat_nchw, grid, mode):
    return (
        F.grid_sample(
            torch.from_numpy(feat_nchw),
            torch.from_numpy(grid),
            mode=mode,
            padding_mode="zeros",
            align_corners=False,
        )
        .permute(0, 2, 3, 1)
        .numpy()
    )


@pytest.mark.parametrize("mode", ["bilinear", "bicubic", "nearest"])
def test_matches_torch_random_grid(rng, mode):
    b, h, w, c = 2, 13, 17, 5
    feat = rng.standard_normal((b, c, h, w)).astype(np.float32)
    # include plenty of out-of-bounds samples to exercise zeros padding
    grid = (rng.random((b, 9, 11, 2)).astype(np.float32) * 3.0) - 1.5

    ref = _torch_ref(feat, grid, mode)
    got = np.asarray(grid_sample(jnp.asarray(feat.transpose(0, 2, 3, 1)), jnp.asarray(grid), mode=mode))

    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


def test_matches_torch_identity_grid(rng):
    b, h, w, c = 1, 8, 6, 3
    feat = rng.standard_normal((b, c, h, w)).astype(np.float32)

    ys, xs = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    gx = ((xs + 0.5) / w) * 2 - 1
    gy = ((ys + 0.5) / h) * 2 - 1
    grid = np.stack([gx, gy], axis=-1).astype(np.float32)[None]

    for mode in ("bilinear", "bicubic"):
        got = np.asarray(grid_sample(jnp.asarray(feat.transpose(0, 2, 3, 1)), jnp.asarray(grid), mode=mode))
        np.testing.assert_allclose(got, feat.transpose(0, 2, 3, 1), rtol=1e-4, atol=1e-4)


def test_extra_sample_dims(rng):
    """Grid may have arbitrary inner sample dims, e.g. (B, H, W, P, P, 2)."""
    b, h, w, c = 2, 10, 12, 4
    feat = rng.standard_normal((b, h, w, c)).astype(np.float32)
    grid = (rng.random((b, 5, 6, 3, 3, 2)).astype(np.float32) * 2.2) - 1.1

    got = grid_sample(jnp.asarray(feat), jnp.asarray(grid), mode="bicubic")
    assert got.shape == (b, 5, 6, 3, 3, c)

    ref = _torch_ref(
        feat.transpose(0, 3, 1, 2),
        grid.reshape(b, 5, 6 * 9, 2),
        "bicubic",
    ).reshape(b, 5, 6, 3, 3, c)
    np.testing.assert_allclose(np.asarray(got), ref, rtol=1e-5, atol=1e-5)
