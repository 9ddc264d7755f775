from .mesh import (
    DATA_AXIS,
    MODEL_AXIS,
    batch_sharding,
    local_batch_rows,
    local_data_parallelism,
    make_mesh,
    pad_batch_to_multiple,
    replicated,
    shard_batch,
)
from .fsdp import fsdp_param_specs, shard_params_fsdp
from .tp import replicate_tree, shard_params, tp_param_specs

__all__ = [
    "fsdp_param_specs",
    "shard_params_fsdp",
    "DATA_AXIS",
    "MODEL_AXIS",
    "batch_sharding",
    "local_batch_rows",
    "local_data_parallelism",
    "make_mesh",
    "pad_batch_to_multiple",
    "replicated",
    "replicate_tree",
    "shard_batch",
    "shard_params",
    "tp_param_specs",
]
