"""Neural-net component library (UniCeption-equivalent, TPU-native)."""

from ufm_tpu.nn import encoders, info_sharing, prediction_heads
from ufm_tpu.nn.layers import Attention, LayerScale, Mlp, TransformerBlock
from ufm_tpu.nn.unet import UNet

__all__ = [
    "Attention",
    "LayerScale",
    "Mlp",
    "TransformerBlock",
    "UNet",
    "encoders",
    "info_sharing",
    "prediction_heads",
]
