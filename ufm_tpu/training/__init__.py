from ufm_tpu.training.losses import (
    covariance_nll_loss,
    covisibility_bce_loss,
    epe,
    flow_regression_loss,
    refinement_classification_loss,
    ufm_total_loss,
)
from ufm_tpu.training.trainer import (
    make_optimizer,
    make_sharded_train_step,
    make_train_step,
    synthetic_batch,
)

__all__ = [
    "covariance_nll_loss",
    "covisibility_bce_loss",
    "epe",
    "flow_regression_loss",
    "make_optimizer",
    "make_sharded_train_step",
    "make_train_step",
    "refinement_classification_loss",
    "synthetic_batch",
    "ufm_total_loss",
]

from ufm_tpu.training.loop import fit  # noqa: E402

__all__.append("fit")
