"""Refinement ops: fused path vs naive path vs torch reference semantics."""

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from ufm_tpu.ops.refinement import (
    fused_refinement_attention,
    neighborhood_offsets_xy,
    obtain_neighborhood_features,
    refinement_attention,
)


def _torch_neighborhood(flow_b2hw, feats_bchw, p):
    """Literal re-statement of the reference sampling semantics
    (ufm.py:1112-1178) used as the parity oracle."""
    r = (p - 1) // 2
    b, c, h, w = feats_bchw.shape
    i_local, j_local = torch.meshgrid(torch.arange(-r, r + 1), torch.arange(-r, r + 1), indexing="ij")
    ij_local = torch.stack((i_local, j_local), dim=0).float()

    u, v = torch.meshgrid(torch.arange(w).float(), torch.arange(h).float(), indexing="xy")
    base_xy = torch.stack((u, v), dim=-1).permute(2, 0, 1).reshape(1, 2, h, w)

    target_xy = (flow_b2hw + base_xy).view(b, 2, h, w, 1, 1)
    target_ij = target_xy[:, [1, 0]]
    neigh_ij = target_ij + ij_local.view(1, 2, 1, 1, p, p)
    grid = neigh_ij[:, [1, 0]].permute(0, 2, 3, 4, 5, 1).reshape(b, h, w * p * p, 2)
    grid = (grid + 0.5) / torch.tensor([w, h]).view(1, 1, 1, 2)
    grid = grid * 2 - 1
    out = F.grid_sample(feats_bchw, grid, mode="bicubic", padding_mode="zeros", align_corners=False)
    out = out.view(b, c, h, w, p, p).permute(0, 2, 3, 4, 5, 1)
    resid = ij_local[[1, 0]].view(1, 2, 1, 1, p, p).permute(0, 2, 3, 4, 5, 1)
    return out, resid


def test_neighborhood_matches_torch(rng):
    b, h, w, c, p = 1, 7, 9, 4, 3
    feats = rng.standard_normal((b, c, h, w)).astype(np.float32)
    flow = (rng.standard_normal((b, 2, h, w)) * 2).astype(np.float32)

    ref_feats, ref_resid = _torch_neighborhood(torch.from_numpy(flow), torch.from_numpy(feats), p)

    got_feats, got_offs = obtain_neighborhood_features(
        jnp.asarray(flow.transpose(0, 2, 3, 1)), jnp.asarray(feats.transpose(0, 2, 3, 1)), p
    )
    np.testing.assert_allclose(np.asarray(got_feats), ref_feats.numpy(), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(
        np.broadcast_to(np.asarray(got_offs), (1, 1, 1, p, p, 2)), ref_resid.numpy(), atol=0
    )


def test_fused_matches_naive(rng):
    b, h, w, c, p = 2, 11, 13, 8, 5
    q = rng.standard_normal((b, h, w, c)).astype(np.float32)
    f = rng.standard_normal((b, h, w, c)).astype(np.float32)
    flow = (rng.standard_normal((b, h, w, 2)) * 3).astype(np.float32)
    bias = rng.standard_normal(p * p).astype(np.float32)
    temp = 4.0

    neigh, offs = obtain_neighborhood_features(jnp.asarray(flow), jnp.asarray(f), p)
    res_naive, lsm_naive = refinement_attention(jnp.asarray(q), neigh, offs, jnp.asarray(bias), temp)
    res_fused, lsm_fused = fused_refinement_attention(
        jnp.asarray(q), jnp.asarray(f), jnp.asarray(flow), jnp.asarray(bias), temp, p
    )

    np.testing.assert_allclose(np.asarray(res_fused), np.asarray(res_naive), rtol=1e-3, atol=5e-4)
    np.testing.assert_allclose(np.asarray(lsm_fused), np.asarray(lsm_naive), rtol=1e-3, atol=5e-4)


def test_zero_flow_residual_is_small(rng):
    """With zero flow and strongly self-similar features, the argmax
    neighborhood point is the center, so the residual should be near zero
    when the temperature is small."""
    b, h, w, c, p = 1, 8, 8, 16, 5
    f = rng.standard_normal((b, h, w, c)).astype(np.float32) * 10
    res, lsm = fused_refinement_attention(
        jnp.asarray(f), jnp.asarray(f), jnp.zeros((b, h, w, 2)), jnp.zeros(p * p), 0.05, p
    )
    inner = np.asarray(res)[:, 2:-2, 2:-2]
    assert np.abs(inner).max() < 0.1
    assert np.asarray(lsm).shape == (b, h, w, p, p)
