"""ufm_tpu — a TPU-native dense-correspondence framework.

A from-scratch JAX/XLA/Pallas implementation with the capabilities of UFM
(UniFlowMatch): given a source/target image pair, regress a dense optical-flow
field plus covisibility mask, unifying optical flow and wide-baseline matching.
"""

from ufm_tpu.version import __version__

__all__ = ["__version__"]


def __getattr__(name):
    # Lazy model exports so `import ufm_tpu` stays light for ops-only users.
    if name in (
        "UniFlowMatch",
        "UniFlowMatchConfidence",
        "UniFlowMatchClassificationRefinement",
    ):
        from ufm_tpu import models

        return getattr(models, name)
    raise AttributeError(f"module 'ufm_tpu' has no attribute {name!r}")
