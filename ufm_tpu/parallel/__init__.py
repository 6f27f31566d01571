from ufm_tpu.parallel.sharding import (
    batch_sharding,
    make_mesh,
    param_partition_spec,
    shard_params,
    tree_shardings,
)

__all__ = ["batch_sharding", "make_mesh", "param_partition_spec", "shard_params", "tree_shardings"]

from ufm_tpu.parallel.inference import make_data_parallel_forward  # noqa: E402

__all__.append("make_data_parallel_forward")
