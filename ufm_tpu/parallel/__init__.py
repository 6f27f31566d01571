from ufm_tpu.parallel.sharding import (
    batch_sharding,
    make_mesh,
    param_partition_spec,
    shard_params,
)

__all__ = ["batch_sharding", "make_mesh", "param_partition_spec", "shard_params"]
