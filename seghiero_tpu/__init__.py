"""seghiero_tpu — a TPU-native (JAX / Flax / pjit / Pallas) framework for
hierarchical semantic segmentation.

A ground-up rebuild of the capabilities of Shadowfear36/SegHiero (a
YAML-config-driven framework for per-pixel fine/coarse/super-coarse
classification trained with hierarchy-consistency BCE, per-level CE, a
tree-triplet embedding loss and an optional RMI spatial term), re-designed
for TPU hardware:

- NHWC tensors and bfloat16-friendly convs that tile onto the MXU
- a single jitted train step (no data-dependent Python control flow)
- hierarchy algebra as static, fully vectorized min/max reductions
  (the reference's per-bucket Python loops become trace-time-unrolled
  XLA reductions)
- data parallelism via ``jax.sharding.Mesh`` + sharding annotations, with
  the triplet-readiness gate as a real cross-replica collective
- Orbax checkpointing with resume (the reference saves but never resumes)

Public API re-exports the most commonly used entry points.
"""

from seghiero_tpu.version import __version__
from seghiero_tpu.hierarchy import Hierarchy, build_fine_to_level_map
from seghiero_tpu.config import SegHieroConfig, load_config

__all__ = [
    "__version__",
    "Hierarchy",
    "build_fine_to_level_map",
    "SegHieroConfig",
    "load_config",
]
