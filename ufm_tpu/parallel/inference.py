"""Data-parallel batched inference over a device mesh.

The TPU-native scaling story for this model family (SURVEY §5): the model
fits on one chip, so throughput scales by sharding the pair batch across the
ICI mesh — parameters replicated, batch split on the "data" axis, outputs
sharded the same way. One jitted program; XLA keeps everything local to each
chip (no collectives in the forward).
"""

from __future__ import annotations

from typing import Any, Callable, Dict

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["make_data_parallel_forward"]


def make_data_parallel_forward(model, mesh: Mesh) -> Callable[[Any, Any], Dict[str, Any]]:
    """Return ``forward(src_bhwc, tgt_bhwc) -> raw output dict`` running
    data-parallel over ``mesh``. Batch must divide the data-axis size.

    ``model`` is a UniFlowMatch wrapper with initialized params; params are
    replicated onto the mesh once.
    """
    replicated = NamedSharding(mesh, P())
    params = jax.device_put(model._params_for_apply(), replicated)
    net = model.net
    batch_sharding = NamedSharding(mesh, P("data", None, None, None))

    @jax.jit
    def forward(p, src, tgt):
        # params are an ARGUMENT (closing over the pytree would embed it in
        # the lowered computation); the trace-time flag routes attention
        # through its SPMD wrapper so the kernel runs per-shard
        from ufm_tpu.ops.flash_attention import spmd_attention

        with spmd_attention():
            return net.apply({"params": p}, src, tgt)

    def run(src, tgt):
        n = src.shape[0]
        data_n = mesh.shape["data"]
        assert n % data_n == 0, f"batch {n} must divide data axis {data_n}"
        src = jax.device_put(jax.numpy.asarray(src, dtype=jax.numpy.float32), batch_sharding)
        tgt = jax.device_put(jax.numpy.asarray(tgt, dtype=jax.numpy.float32), batch_sharding)
        return forward(params, src, tgt)

    return run
