"""Encoder registry — TPU-native equivalent of ``uniception.models.encoders``.

Re-creates the factory contract the reference uses
(uniflowmatch/models/ufm.py:13, 187): a ``feature_returner_encoder_factory``
keyed by an ``encoder_str``, returning a module that maps a
:class:`ViTEncoderInput` to a list of per-layer feature maps and exposes
``data_norm_type``.
"""

from __future__ import annotations

from typing import Any, Callable, Dict

from ufm_tpu.nn.encoders.image_normalizations import IMAGE_NORMALIZATION_DICT, ImageNormalization
from ufm_tpu.nn.encoders.vit import ViTEncoder, ViTEncoderInput, ViTEncoderOutput

__all__ = [
    "IMAGE_NORMALIZATION_DICT",
    "ImageNormalization",
    "ViTEncoder",
    "ViTEncoderInput",
    "ViTEncoderOutput",
    "feature_returner_encoder_factory",
    "register_encoder",
]

_PRESETS: Dict[str, Dict[str, Any]] = {
    # DINOv2 family (patch 14). `size` presets follow the standard ViT dims.
    "dinov2_small": dict(embed_dim=384, depth=12, num_heads=6),
    "dinov2_base": dict(embed_dim=768, depth=12, num_heads=12),
    "dinov2_large": dict(embed_dim=1024, depth=24, num_heads=16),
    "dinov2_giant": dict(embed_dim=1536, depth=40, num_heads=24),
}

_FACTORIES: Dict[str, Callable[..., Any]] = {}


def register_encoder(name: str, factory: Callable[..., Any]) -> None:
    _FACTORIES[name] = factory


def feature_returner_encoder_factory(encoder_str: str, **kwargs) -> ViTEncoder:
    """Build a feature-returner encoder from a name + config kwargs.

    Accepts either an explicit preset name ("dinov2_large", ...) or any
    "dinov2"-prefixed string with dims given in kwargs. Unknown kwargs that
    this implementation does not use are ignored (the reference forwards the
    checkpoint's config.json verbatim, which may carry torch-specific keys).
    """
    if encoder_str in _FACTORIES:
        return _FACTORIES[encoder_str](**kwargs)

    cfg: Dict[str, Any] = {}
    if encoder_str in _PRESETS:
        cfg.update(_PRESETS[encoder_str])
    elif "size" in kwargs and f"dinov2_{kwargs['size']}" in _PRESETS:
        cfg.update(_PRESETS[f"dinov2_{kwargs['size']}"])

    known = set(ViTEncoder.__dataclass_fields__)  # flax modules are dataclasses
    cfg.update({k: v for k, v in kwargs.items() if k in known})
    return ViTEncoder(**cfg)
