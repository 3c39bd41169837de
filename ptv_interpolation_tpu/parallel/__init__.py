"""Device-mesh parallelism: query sharding + z-slab field sharding."""

from ptv_interpolation_tpu.parallel.mesh import (
    DATA_AXIS,
    initialize_distributed,
    make_mesh,
    replicated,
    row_sharded,
    shard_fields,
)
from ptv_interpolation_tpu.parallel.sharding import (
    make_pipeline_step,
    sharded_interpolate_field,
    sharded_interpolate_values,
)

__all__ = [
    "DATA_AXIS",
    "initialize_distributed",
    "make_mesh",
    "replicated",
    "row_sharded",
    "shard_fields",
    "make_pipeline_step",
    "sharded_interpolate_field",
    "sharded_interpolate_values",
]
