"""Training losses for the UFM family.

The reference release is inference-only, but its architecture carries the
training-era contracts: per-group optimizer LRs via ``get_parameter_groups``
(reference ufm.py:455-471), a covariance head designed for Gaussian NLL
supervision, a covisibility head with logits for BCE, and the refinement
stage returning ``log_softmax`` "for the training loss" plus the warning that
the residual construction cancels gradients to the base flow so a
"specialized loss function" supervises ``regression_flow_output``
(ufm.py:994-996, base.py:47-54). This module supplies those losses.

All maps channel-last; masks broadcast (B, H, W).
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp

__all__ = [
    "epe",
    "flow_regression_loss",
    "covariance_nll_loss",
    "covisibility_bce_loss",
    "refinement_classification_loss",
    "ufm_total_loss",
]


def _masked_mean(x: jnp.ndarray, mask: Optional[jnp.ndarray]) -> jnp.ndarray:
    if mask is None:
        return jnp.mean(x)
    m = mask.astype(x.dtype)
    return jnp.sum(x * m) / jnp.maximum(jnp.sum(m), 1.0)


def epe(pred_flow: jnp.ndarray, gt_flow: jnp.ndarray, mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Average end-point error; flows (B, H, W, 2)."""
    err = jnp.linalg.norm(pred_flow - gt_flow, axis=-1)
    return _masked_mean(err, mask)


def flow_regression_loss(
    pred_flow: jnp.ndarray,
    gt_flow: jnp.ndarray,
    mask: Optional[jnp.ndarray] = None,
    charbonnier_eps: float = 1e-3,
) -> jnp.ndarray:
    """Robust (Charbonnier) flow regression loss."""
    sq = jnp.sum((pred_flow - gt_flow) ** 2, axis=-1)
    err = jnp.sqrt(sq + charbonnier_eps**2)
    return _masked_mean(err, mask)


def covariance_nll_loss(
    pred_flow: jnp.ndarray,
    gt_flow: jnp.ndarray,
    cov_inv: jnp.ndarray,
    cov_log_det: jnp.ndarray,
    mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Bivariate Gaussian negative log-likelihood of the flow error under the
    predicted covariance ([inv_xx, inv_yy, inv_xy] channel layout of
    Covariance2DAdaptor)."""
    e = jax.lax.stop_gradient(pred_flow - gt_flow)  # supervise only the covariance branch
    ex, ey = e[..., 0], e[..., 1]
    quad = cov_inv[..., 0] * ex * ex + cov_inv[..., 1] * ey * ey + 2.0 * cov_inv[..., 2] * ex * ey
    nll = 0.5 * (quad + cov_log_det)
    return _masked_mean(nll, mask)


def covisibility_bce_loss(
    logits: jnp.ndarray, gt_mask: jnp.ndarray, valid: Optional[jnp.ndarray] = None
) -> jnp.ndarray:
    """Binary cross-entropy on covisibility logits (B, H, W)."""
    gt = gt_mask.astype(logits.dtype)
    bce = jnp.maximum(logits, 0) - logits * gt + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    return _masked_mean(bce, valid)


def refinement_classification_loss(
    log_softmax: jnp.ndarray,
    regression_flow: jnp.ndarray,
    gt_flow: jnp.ndarray,
    mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Cross-entropy over the P×P neighborhood: the correct class is the
    offset that moves the regressed flow toward the ground truth (the
    "specialized loss" the refinement stage needs, ufm.py:994-996)."""
    b, h, w, p, _ = log_softmax.shape
    r = (p - 1) // 2
    target_off = gt_flow - jax.lax.stop_gradient(regression_flow)  # (B, H, W, 2) xy
    jx = jnp.clip(jnp.round(target_off[..., 0]) + r, 0, p - 1).astype(jnp.int32)
    iy = jnp.clip(jnp.round(target_off[..., 1]) + r, 0, p - 1).astype(jnp.int32)
    flat = log_softmax.reshape(b, h, w, p * p)
    idx = iy * p + jx
    nll = -jnp.take_along_axis(flat, idx[..., None], axis=-1)[..., 0]
    # only supervise where the true offset lies inside the window
    inside = (jnp.abs(target_off[..., 0]) <= r + 0.5) & (jnp.abs(target_off[..., 1]) <= r + 0.5)
    m = inside if mask is None else (inside & (mask > 0))
    return _masked_mean(nll, m)


def ufm_total_loss(
    outputs: Dict[str, jnp.ndarray],
    batch: Dict[str, jnp.ndarray],
    weights: Optional[Dict[str, float]] = None,
) -> tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Combined training loss from the raw network output dict
    (models/network.py) and a batch with ``gt_flow`` (B, H, W, 2),
    ``gt_covisibility`` (B, H, W), optional ``valid`` mask."""
    w = {"flow": 1.0, "covariance": 0.1, "covisibility": 1.0, "refinement": 1.0}
    if weights:
        w.update(weights)

    gt_flow = batch["gt_flow"]
    valid = batch.get("valid")
    metrics: Dict[str, jnp.ndarray] = {}

    reg_flow = outputs.get("regression_flow", outputs["flow"])
    loss = w["flow"] * flow_regression_loss(reg_flow, gt_flow, valid)
    metrics["flow_loss"] = loss
    metrics["epe"] = epe(outputs["flow"], gt_flow, valid)

    if "flow_cov_inv" in outputs:
        cov = w["covariance"] * covariance_nll_loss(
            reg_flow, gt_flow, outputs["flow_cov_inv"], outputs["flow_cov_log_det"], valid
        )
        metrics["covariance_loss"] = cov
        loss = loss + cov

    if "covis_logits" in outputs and "gt_covisibility" in batch:
        cv = w["covisibility"] * covisibility_bce_loss(outputs["covis_logits"], batch["gt_covisibility"], valid)
        metrics["covisibility_loss"] = cv
        loss = loss + cv

    if "refinement_log_softmax" in outputs:
        rf = w["refinement"] * refinement_classification_loss(
            outputs["refinement_log_softmax"], outputs.get("regression_flow", reg_flow), gt_flow, valid
        )
        metrics["refinement_loss"] = rf
        loss = loss + rf

    metrics["total_loss"] = loss
    return loss, metrics
