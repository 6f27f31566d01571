"""Models subpackage: the UFM family + output interfaces."""

from ufm_tpu.models.base import (
    UFMClassificationRefinementOutput,
    UFMFlowFieldOutput,
    UFMMaskFieldOutput,
    UFMOutputInterface,
    UniFlowMatchModelsBase,
)
from ufm_tpu.models.config import (
    UFMArchConfig,
    ufm_base_config,
    ufm_refine_config,
    ufm_tiny_config,
)
from ufm_tpu.models.network import UFMNet
from ufm_tpu.models.tiled import predict_correspondences_tiled
from ufm_tpu.models.ufm import (
    UniFlowMatch,
    UniFlowMatchClassificationRefinement,
    UniFlowMatchConfidence,
)

__all__ = [
    "UFMArchConfig",
    "UFMClassificationRefinementOutput",
    "UFMFlowFieldOutput",
    "UFMMaskFieldOutput",
    "UFMNet",
    "UFMOutputInterface",
    "UniFlowMatch",
    "UniFlowMatchClassificationRefinement",
    "UniFlowMatchConfidence",
    "UniFlowMatchModelsBase",
    "predict_correspondences_tiled",
    "ufm_base_config",
    "ufm_refine_config",
    "ufm_tiny_config",
]
