"""Device mesh and sharding rules.

The reference has no working distribution: its ``gpus:`` key only sets
CUDA_VISIBLE_DEVICES (train.py:109-113) and the DDP ``all_gather`` inside
the losses is dead code (SURVEY.md §2 parallelism table). Here data
parallelism is first-class:

  * a 2-axis mesh ``(data, model)`` — batch sharded over ``data``;
    ``model`` is exposed from day 1 for channel-sharded convs (TP) but
    defaults to size 1 (a ResNet-101-scale model does not need TP; the
    axis exists so configs/shardings don't change when it does);
  * parameters/optimizer state replicated, batch sharded → the gradient
    all-reduce is inserted by the partitioner and rides ICI;
  * the triplet readiness gate (the one real collective the loss
    semantics require) is a ``pmin`` over ``data`` via ``shard_map``
    (losses/tree_triplet.py:triplet_readiness).

Multi-host: call ``jax.distributed.initialize()`` before ``make_mesh``
(standard JAX runtime; ICI intra-slice, DCN across slices).
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(spec: Optional[Dict[str, int]] = None, devices=None) -> Mesh:
    """Build a ``Mesh`` from ``{axis: size}``; -1 = all remaining devices.

    Defaults to pure data-parallel over every visible device.
    """
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    spec = dict(spec or {DATA_AXIS: -1})
    spec.setdefault(DATA_AXIS, -1)
    spec.setdefault(MODEL_AXIS, 1)

    sizes = dict(spec)
    wildcard = [k for k, v in sizes.items() if v == -1]
    fixed = int(np.prod([v for v in sizes.values() if v != -1]))
    if len(wildcard) > 1:
        raise ValueError("at most one mesh axis may be -1")
    if wildcard:
        if n % fixed:
            raise ValueError(f"{n} devices not divisible by fixed axes {sizes}")
        sizes[wildcard[0]] = n // fixed
    need = int(np.prod(list(sizes.values())))
    if need > n:
        raise ValueError(f"mesh {sizes} needs {need} devices, only {n} visible")

    axis_names = (DATA_AXIS, MODEL_AXIS)
    shape = (sizes[DATA_AXIS], sizes[MODEL_AXIS])
    # a mesh smaller than the machine is fine — use the first `need` devices
    return Mesh(np.asarray(devices[:need]).reshape(shape), axis_names)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading (batch) dim sharded over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def stacked_batch_sharding(mesh: Mesh, spatial: bool = False) -> NamedSharding:
    """Sharding for ``[K, B, ...]`` stacked batches
    (``training.steps_per_dispatch``): axis 0 is the step index within
    the dispatch (replicated — each device sees every step), axis 1 the
    global batch dim sharded over ``data`` exactly like a single batch;
    with ``spatial`` the height axis additionally shards over ``model``
    (training.spatial_shards, parallel/spatial.py)."""
    if spatial:
        return NamedSharding(mesh, P(None, DATA_AXIS, MODEL_AXIS))
    return NamedSharding(mesh, P(None, DATA_AXIS))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


# leaves smaller than this stay replicated under FSDP: sharding a [64]
# BN scale across 8 devices saves nothing and costs a collective
FSDP_MIN_SIZE = 16_384


def fsdp_state_sharding(mesh: Mesh, tree, min_size: int = FSDP_MIN_SIZE):
    """ZeRO/FSDP-style sharding tree for the train state.

    Every large array leaf (params, momentum/Adam moments, EMA) is
    sharded over the ``data`` axis on its largest evenly-divisible
    dimension; XLA's SPMD partitioner then all-gathers each parameter
    just-in-time for its consumer op in forward/backward, reduce-
    scatters its gradient back to the shard layout, and runs the
    optimizer update sharded. Per-device memory for params + optimizer
    state drops ~data×, which is what lets one train models whose
    replicated state cannot fit a single chip; the price is the
    per-layer all-gather traffic riding ICI (the standard FSDP
    trade — see the scaling-book recipe: annotate shardings, let XLA
    insert collectives).

    Small leaves (< ``min_size`` elements) and shapes with no dimension
    divisible by the axis size stay replicated.
    """
    n = mesh.shape[DATA_AXIS]

    def rule(x):
        shape = getattr(x, "shape", ())
        if n <= 1 or len(shape) == 0 or int(np.prod(shape)) < min_size:
            return NamedSharding(mesh, P())
        # largest divisible dim; ties resolve to the LAST such dim
        # (conv kernels are HWIO — prefer sharding output channels)
        best = None
        for d, ext in enumerate(shape):
            if ext % n == 0 and (best is None or ext >= shape[best]):
                best = d
        if best is None:
            return NamedSharding(mesh, P())
        spec = [None] * len(shape)
        spec[best] = DATA_AXIS
        return NamedSharding(mesh, P(*spec))

    return jax.tree_util.tree_map(rule, tree)
