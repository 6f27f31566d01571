"""Prediction-head base types: inputs, regression output, AdaptorMap.

TPU-native equivalent of ``uniception.models.prediction_heads.base``
(reference import surface: uniflowmatch/models/ufm.py:22, 447-453): heads are
composed as ``feature_processor -> regression_processor -> AdaptorMap`` and
the AdaptorMap output behaves as a dict keyed by adaptor name.

Layout convention: all dense maps are channel-last (B, H, W, C); the public
model API converts to the reference's BCHW at its boundary.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Tuple

import jax.numpy as jnp

__all__ = [
    "PredictionHeadInput",
    "PredictionHeadLayeredInput",
    "PredictionHeadOutput",
    "RegressionOutput",
    "AdaptorMap",
]


@dataclasses.dataclass
class PredictionHeadInput:
    """Single-level head input: ``last_feature`` is (B, Hp, Wp, C)."""

    last_feature: jnp.ndarray


@dataclasses.dataclass
class PredictionHeadLayeredInput:
    """Multi-level head input (DPT): 4 maps + the target output (H, W)."""

    list_features: List[jnp.ndarray]
    target_output_shape: Tuple[int, int]


@dataclasses.dataclass
class PredictionHeadOutput:
    """Feature-head output: ``decoded_channels`` is (B, H, W, C)."""

    decoded_channels: jnp.ndarray


@dataclasses.dataclass
class RegressionOutput:
    """Dense regression map prior to adaptors: ``value`` is (B, H, W, C)."""

    value: jnp.ndarray


class AdaptorMap:
    """Splits a regression map channel-wise and applies each adaptor.

    Each adaptor declares ``input_channels`` and ``name``; channels are
    consumed in the order adaptors are listed (this order comes from the
    model config's ``adaptors_kwargs`` dict, mirroring
    uniflowmatch/models/ufm.py:275-289).
    """

    def __init__(self, *adaptors: Any):
        self.adaptors = list(adaptors)
        self.total_channels = sum(a.input_channels for a in self.adaptors)

    def __call__(self, regression: RegressionOutput) -> Dict[str, Any]:
        value = regression.value
        assert value.shape[-1] == self.total_channels, (
            f"AdaptorMap expected {self.total_channels} channels, got {value.shape[-1]}"
        )
        out: Dict[str, Any] = {}
        offset = 0
        for adaptor in self.adaptors:
            sl = value[..., offset : offset + adaptor.input_channels]
            out[adaptor.name] = adaptor(sl)
            offset += adaptor.input_channels
        return out
