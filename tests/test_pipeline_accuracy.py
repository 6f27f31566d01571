"""End-to-end pipeline accuracy: with a perfect-oracle network, the public
predict API must recover the analytic ground-truth flow at full resolution.

This validates the whole pre/post chain — normalization, antialias resize to
the model grid, flow unmapping (nearest-value/bilinear-coordinate upsample,
per-axis rescale) — independently of network weights. The reference's unmap
carries a documented ≈0.5 px interpolation error (flow_resizing.py:820-829),
so the tolerance is ~1 px.
"""

import numpy as np

import jax.numpy as jnp

from examples.make_example_pairs import synthetic_pair
from ufm_tpu.models import UniFlowMatchConfidence, ufm_tiny_config


def test_oracle_flow_roundtrip():
    sh, sw = 108, 144
    img0, img1, gt_flow, valid = synthetic_pair(h=sh, w=sw, seed=3, max_disp=8.0)

    cfg = ufm_tiny_config()
    model = UniFlowMatchConfidence.from_config(cfg)
    tw, th = model.inference_resolution[0]  # (W, H) = (56, 42)

    # analytic GT flow at the model grid: sample at source positions mapped
    # back to full res, scale per axis
    ys = (np.arange(th) + 0.5) * sh / th - 0.5
    xs = (np.arange(tw) + 0.5) * sw / tw - 0.5
    yi = np.clip(np.round(ys).astype(int), 0, sh - 1)
    xi = np.clip(np.round(xs).astype(int), 0, sw - 1)
    flow_small = gt_flow[yi][:, xi]  # (th, tw, 2)
    flow_small = flow_small * np.array([tw / sw, th / sh])

    oracle_out = jnp.asarray(flow_small[None].astype(np.float32))

    def oracle_network(params, img1_s, img2_s):
        b = img1_s.shape[0]
        return {
            "flow": jnp.broadcast_to(oracle_out, (b, th, tw, 2)),
            "covis_mask": jnp.ones((b, th, tw)),
            "covis_logits": jnp.zeros((b, th, tw)),
        }

    model._network_fn = lambda: oracle_network

    result = model.predict_correspondences_batched(source_image=img0, target_image=img1)
    flow_pred = np.asarray(result.flow.flow_output[0]).transpose(1, 2, 0)

    err = np.linalg.norm(flow_pred - gt_flow, axis=-1)
    inner = err[4:-4, 4:-4]  # borders suffer from nearest-tap quantization
    assert np.median(inner) < 1.0, f"median EPE {np.median(inner):.3f}"
    assert np.mean(inner) < 1.5, f"mean EPE {np.mean(inner):.3f}"

    covis = np.asarray(result.covisibility.mask[0])
    assert covis.shape == (sh, sw)
    np.testing.assert_allclose(covis, 1.0, atol=1e-5)
