"""Output adaptors: thin transforms from raw regression channels to outputs.

TPU-native equivalent of ``uniception.models.prediction_heads.adaptors``
(reference import surface: uniflowmatch/models/ufm.py:15-21; consumption at
ufm.py:418-431, 648-660). Adaptors are parameter-free pure transforms; each
declares its channel budget and output name, and returns a small dataclass
with exactly the attributes the model layer reads.

Maps are channel-last (B, H, W, C); mask/confidence outputs drop the channel
axis where the reference does (mask: (B, H, W); reference base.py:331).
"""

from __future__ import annotations

import dataclasses

import jax.nn
import jax.numpy as jnp

__all__ = [
    "FlowAdaptor",
    "FlowWithConfidenceAdaptor",
    "MaskAdaptor",
    "ConfidenceAdaptor",
    "Covariance2DAdaptor",
    "FlowOutput",
    "FlowWithConfidenceOutput",
    "MaskOutput",
    "ConfidenceOutput",
    "Covariance2DOutput",
]


@dataclasses.dataclass
class FlowOutput:
    value: jnp.ndarray  # (B, H, W, 2)


@dataclasses.dataclass
class FlowWithConfidenceOutput:
    value: jnp.ndarray  # (B, H, W, 2)
    confidence: jnp.ndarray  # (B, H, W)


@dataclasses.dataclass
class MaskOutput:
    mask: jnp.ndarray  # (B, H, W) in [0, 1]
    logits: jnp.ndarray  # (B, H, W)


@dataclasses.dataclass
class ConfidenceOutput:
    value: jnp.ndarray  # (B, H, W, 1)


@dataclasses.dataclass
class Covariance2DOutput:
    covariance: jnp.ndarray  # (B, H, W, 3): [var_x, var_y, cov_xy]
    inv_covariance: jnp.ndarray  # (B, H, W, 3)
    log_det: jnp.ndarray  # (B, H, W)


class FlowAdaptor:
    """Raw 2-channel flow; identity transform."""

    input_channels = 2

    def __init__(self, name: str = "flow", **_ignored):
        self.name = name

    def __call__(self, x: jnp.ndarray) -> FlowOutput:
        return FlowOutput(value=x)


class FlowWithConfidenceAdaptor:
    """3 channels: flow (2) + sigmoid confidence (1)."""

    input_channels = 3

    def __init__(self, name: str = "flow", **_ignored):
        self.name = name

    def __call__(self, x: jnp.ndarray) -> FlowWithConfidenceOutput:
        return FlowWithConfidenceOutput(value=x[..., :2], confidence=jax.nn.sigmoid(x[..., 2]))


class MaskAdaptor:
    """1 channel of logits -> sigmoid mask (covisibility / non-occlusion)."""

    input_channels = 1

    def __init__(self, name: str = "non_occluded_mask", **_ignored):
        self.name = name

    def __call__(self, x: jnp.ndarray) -> MaskOutput:
        logits = x[..., 0]
        return MaskOutput(mask=jax.nn.sigmoid(logits), logits=logits)


class ConfidenceAdaptor:
    """1 channel -> sigmoid confidence, channel axis kept (squeezed by the
    model layer, mirroring ufm.py:654)."""

    input_channels = 1

    def __init__(self, name: str = "keypoint_confidence", activation: str = "sigmoid", **_ignored):
        self.name = name
        self.activation = activation

    def __call__(self, x: jnp.ndarray) -> ConfidenceOutput:
        if self.activation == "sigmoid":
            v = jax.nn.sigmoid(x)
        elif self.activation == "exp":
            v = jnp.exp(x)
        elif self.activation == "softplus":
            v = jax.nn.softplus(x)
        else:
            raise ValueError(f"unknown confidence activation: {self.activation}")
        return ConfidenceOutput(value=v)


class Covariance2DAdaptor:
    """3 raw channels -> SPD 2x2 flow covariance.

    Parameterization: ``var_x = exp(a)``, ``var_y = exp(b)``,
    ``cov_xy = tanh(c) * sqrt(var_x * var_y)`` — guarantees positive
    definiteness; inverse and log-determinant are analytic. Channel order
    [var_x, var_y, cov_xy] matches the (w², h², w·h) rescaling the prediction
    pipeline applies after unmapping (reference base.py:304-317).
    """

    input_channels = 3

    def __init__(self, name: str = "flow_cov", min_log_var: float = -10.0, max_log_var: float = 10.0, **_ignored):
        self.name = name
        self.min_log_var = min_log_var
        self.max_log_var = max_log_var

    def __call__(self, x: jnp.ndarray) -> Covariance2DOutput:
        a = jnp.clip(x[..., 0], self.min_log_var, self.max_log_var)
        b = jnp.clip(x[..., 1], self.min_log_var, self.max_log_var)
        rho = jnp.tanh(x[..., 2]) * 0.999  # keep strictly inside (-1, 1)

        var_x = jnp.exp(a)
        var_y = jnp.exp(b)
        cov_xy = rho * jnp.exp(0.5 * (a + b))

        one_m_rho2 = 1.0 - rho * rho
        det = var_x * var_y * one_m_rho2
        log_det = a + b + jnp.log(one_m_rho2)

        inv = jnp.stack([var_y / det, var_x / det, -cov_xy / det], axis=-1)
        cov = jnp.stack([var_x, var_y, cov_xy], axis=-1)
        return Covariance2DOutput(covariance=cov, inv_covariance=inv, log_det=log_det)
