"""Device-mesh sharding rules for the UFM family.

The reference has no distributed runtime at all (SURVEY.md §2/§5: no
torch.distributed, one process, one device). This module supplies the
TPU-native scaling design instead:

- mesh axes ``("data", "fsdp", "model")`` over ICI;
- batch sharded on ``data``;
- tensor-parallel sharding of the transformer matmuls on ``model``
  (qkv/fc1 column-parallel, proj/fc2 row-parallel — XLA SPMD inserts the
  reduce-scatter/all-reduce collectives);
- remaining large parameters sharded on ``fsdp`` (XLA all-gathers at use).

Everything is expressed as `NamedSharding` annotations on the param pytree +
`jax.jit` in/out shardings; no hand-written collectives in the model code.
"""

from __future__ import annotations

import re
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = [
    "make_mesh",
    "param_partition_spec",
    "tree_shardings",
    "shard_params",
    "batch_sharding",
]


def make_mesh(
    n_devices: Optional[int] = None,
    data: Optional[int] = None,
    fsdp: int = 1,
    model: int = 1,
    devices=None,
) -> Mesh:
    """Create a ("data", "fsdp", "model") mesh.

    With only ``n_devices`` given, everything goes to the data axis (the
    natural layout for this model family — it fits on one chip, so batch
    parallelism is the throughput axis; SURVEY.md §5).
    """
    if devices is None:
        devices = jax.devices()
    if n_devices is None:
        n_devices = len(devices)
    devices = devices[:n_devices]
    if data is None:
        data = n_devices // (fsdp * model)
    assert data * fsdp * model == n_devices, (
        f"mesh {data}x{fsdp}x{model} != {n_devices} devices"
    )
    dev_array = np.asarray(devices).reshape(data, fsdp, model)
    return Mesh(dev_array, ("data", "fsdp", "model"))


# Column-parallel (output dim on 'model'): qkv and MLP up-projections; the
# generic fc\d* alternative covers the classification head's patch-MLP
# layers. Row-parallel (input dim on 'model'): attention out-proj and MLP
# down-proj — checked FIRST because fc\d* would otherwise also claim
# mlp/fc2 and force an activation all-gather between fc1 and fc2 instead of
# the single post-fc2 all-reduce of the Megatron pairing.
_COL_PARALLEL = re.compile(r"(attn/qkv|mlp/fc1|fc\d*)/kernel$")
_ROW_PARALLEL = re.compile(r"(attn/proj|mlp/fc2)/kernel$")


def param_partition_spec(path: str, shape: Tuple[int, ...], mesh: Mesh) -> P:
    """Partition spec for one parameter, by its tree path and shape."""
    model_n = mesh.shape["model"]
    fsdp_n = mesh.shape["fsdp"]

    if len(shape) == 2:
        if model_n > 1 and _ROW_PARALLEL.search(path) and shape[0] % model_n == 0:
            return P("model", None)
        if model_n > 1 and _COL_PARALLEL.search(path) and shape[1] % model_n == 0:
            return P(None, "model")
        # generic dense: FSDP-shard a divisible dim
        if fsdp_n > 1:
            if shape[1] % fsdp_n == 0:
                return P(None, "fsdp")
            if shape[0] % fsdp_n == 0:
                return P("fsdp", None)
        return P()

    if len(shape) == 3:
        # scan-stacked transformer kernels, (layers, in, out): same TP rules
        # with the layer axis replicated (nn/layers.py scan_transformer_blocks)
        if model_n > 1 and _ROW_PARALLEL.search(path) and shape[1] % model_n == 0:
            return P(None, "model", None)
        if model_n > 1 and _COL_PARALLEL.search(path) and shape[2] % model_n == 0:
            return P(None, None, "model")
        if fsdp_n > 1:
            if shape[2] % fsdp_n == 0:
                return P(None, None, "fsdp")
            if shape[1] % fsdp_n == 0:
                return P(None, "fsdp", None)
        return P()

    if len(shape) == 4:  # conv HWIO: shard output channels on fsdp
        if fsdp_n > 1 and shape[3] % fsdp_n == 0:
            return P(None, None, None, "fsdp")
        return P()

    if fsdp_n > 1 and len(shape) >= 1 and shape[-1] % fsdp_n == 0 and int(np.prod(shape)) >= 1 << 14:
        return P(*([None] * (len(shape) - 1)), "fsdp")
    return P()


def tree_shardings(tree: Any, mesh: Mesh) -> Any:
    """NamedShardings for an arbitrary pytree whose dict-key path identifies
    each parameter.

    Works on parameter trees AND on structures that embed mirrored copies of
    them (optimizer states: adam's mu/nu dicts repeat the param paths), and
    on ``ShapeDtypeStruct`` trees — which is what makes flagship-scale AOT
    lowering proofs possible without materializing the 428M parameters.
    Leaves without a shape (optimizer scalars reached through non-dict
    containers) replicate.
    """
    from jax.tree_util import DictKey, tree_map_with_path

    def one(path, leaf):
        keys = [str(p.key) for p in path if isinstance(p, DictKey)]
        shape = getattr(leaf, "shape", None)
        if shape is None:
            return NamedSharding(mesh, P())
        return NamedSharding(mesh, param_partition_spec("/".join(keys), tuple(shape), mesh))

    return tree_map_with_path(one, tree)


def shard_params(params: Dict[str, Any], mesh: Mesh) -> Any:
    """Return (sharding pytree, placed params) for a param tree."""
    shardings = tree_shardings(params, mesh)
    placed = jax.tree.map(lambda x, s: jax.device_put(x, s), params, shardings)
    return shardings, placed


def batch_sharding(mesh: Mesh, ndim: int) -> NamedSharding:
    """Batch arrays shard on the data axis (dim 0), replicated elsewhere."""
    return NamedSharding(mesh, P("data", *([None] * (ndim - 1))))
