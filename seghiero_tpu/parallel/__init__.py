from seghiero_tpu.parallel.mesh import (
    make_mesh,
    batch_sharding,
    replicated_sharding,
    DATA_AXIS,
    MODEL_AXIS,
)

__all__ = [
    "make_mesh",
    "batch_sharding",
    "replicated_sharding",
    "DATA_AXIS",
    "MODEL_AXIS",
]
