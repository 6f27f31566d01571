"""Training-loss unit tests."""

import numpy as np

import jax
import jax.numpy as jnp

from ufm_tpu.training import (
    covariance_nll_loss,
    covisibility_bce_loss,
    epe,
    flow_regression_loss,
    refinement_classification_loss,
    ufm_total_loss,
)


def test_epe_basic():
    f = jnp.ones((1, 4, 4, 2))
    assert float(epe(f, f)) == 0.0
    np.testing.assert_allclose(float(epe(f, f + 3.0)), np.sqrt(18.0), rtol=1e-5)


def test_flow_loss_masked():
    pred = jnp.zeros((1, 2, 2, 2))
    gt = jnp.ones((1, 2, 2, 2)) * 10
    mask = jnp.asarray([[[1.0, 0.0], [0.0, 0.0]]])
    full = float(flow_regression_loss(pred, gt))
    masked = float(flow_regression_loss(pred, gt, mask))
    np.testing.assert_allclose(full, masked, rtol=1e-6)  # error uniform -> equal
    zero_mask = jnp.zeros((1, 2, 2))
    assert float(flow_regression_loss(pred, gt, zero_mask)) == 0.0


def test_covariance_nll_prefers_matched_scale():
    """NLL should be lower when predicted variance matches the error scale."""
    rng = np.random.default_rng(0)
    err = rng.standard_normal((1, 8, 8, 2)).astype(np.float32) * 2.0  # std 2
    gt = jnp.zeros((1, 8, 8, 2))
    pred = jnp.asarray(err)

    def nll_for_var(var):
        inv = jnp.concatenate(
            [jnp.full((1, 8, 8, 1), 1 / var), jnp.full((1, 8, 8, 1), 1 / var), jnp.zeros((1, 8, 8, 1))],
            axis=-1,
        )
        log_det = jnp.full((1, 8, 8), np.log(var**2))
        return float(covariance_nll_loss(pred, gt, inv, log_det))

    assert nll_for_var(4.0) < nll_for_var(0.25)
    assert nll_for_var(4.0) < nll_for_var(64.0)


def test_bce_matches_manual():
    logits = jnp.asarray([[[-2.0, 3.0]]])
    gt = jnp.asarray([[[0.0, 1.0]]])
    expected = np.mean([np.log1p(np.exp(-2.0)), np.log1p(np.exp(-3.0))])
    np.testing.assert_allclose(float(covisibility_bce_loss(logits, gt)), expected, rtol=1e-5)


def test_refinement_loss_picks_correct_cell():
    """The loss must index the cell whose offset moves regression toward GT."""
    b, h, w, p = 1, 2, 2, 3
    log_softmax = jnp.log(jnp.full((b, h, w, p, p), 1e-6).at[:, :, :, 2, 0].set(1.0))
    reg = jnp.zeros((b, h, w, 2))
    # gt offset (dx=-1, dy=+1) -> row i=2 (y), col j=0 (x)
    gt = jnp.zeros((b, h, w, 2)).at[..., 0].set(-1.0).at[..., 1].set(1.0)
    good = float(refinement_classification_loss(log_softmax, reg, gt))
    bad = float(
        refinement_classification_loss(log_softmax, reg, -gt)  # opposite cell has ~0 prob
    )
    assert good < 1e-4
    assert bad > 5.0


def test_total_loss_grad_flows():
    outputs = {
        "flow": jnp.zeros((1, 4, 4, 2)),
        "covis_logits": jnp.zeros((1, 4, 4)),
        "covis_mask": jnp.full((1, 4, 4), 0.5),
    }
    batch = {
        "gt_flow": jnp.ones((1, 4, 4, 2)),
        "gt_covisibility": jnp.ones((1, 4, 4)),
    }

    def f(flow):
        out = dict(outputs, flow=flow)
        return ufm_total_loss(out, batch)[0]

    g = jax.grad(f)(outputs["flow"])
    assert float(jnp.abs(g).sum()) > 0
