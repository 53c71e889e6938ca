"""Spatial sharding — the CNN analogue of sequence/context parallelism.

The reference has no attention/sequence dimension; SURVEY.md §2 maps the
"long context" capability onto *spatial resolution*: for images too large
for one chip (or to cut latency), shard the H dimension of the NHWC
activations across the ``model`` mesh axis.

TPU-native mechanism: we do NOT hand-write halo exchanges. Annotating the
input sharding as ``P(data, model, None, None)`` and jitting the forward
lets XLA's SPMD partitioner insert the minimal ``collective-permute``
halo exchanges for every conv/pool window that straddles a shard
boundary, and the cross-shard reductions for the ASPP global pool — the
same machinery (and ICI links) a hand-rolled ring would use, with the
compiler picking the overlap schedule. Verified equivalent to the
unsharded forward in tests/test_spatial.py.

A manual ``ppermute`` halo-exchange helper is provided for custom Pallas
consumers that bypass the partitioner.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from seghiero_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS


def spatial_batch_sharding(mesh: Mesh) -> NamedSharding:
    """NHWC images: batch over ``data``, height over ``model``."""
    return NamedSharding(mesh, P(DATA_AXIS, MODEL_AXIS))


def halo_exchange_h(x: jax.Array, halo: int, axis_name: str = MODEL_AXIS) -> jax.Array:
    """Manual height-halo exchange for H-sharded [B, h_local, W, C] blocks
    inside ``shard_map``: concatenates ``halo`` rows from the upper and
    lower neighbors (edge-clamped at the boundary shards), returning
    [B, h_local + 2·halo, W, C].
    """
    n = jax.lax.axis_size(axis_name)
    idx = jax.lax.axis_index(axis_name)

    # send my bottom rows down / top rows up (ring permutes)
    down = [(i, (i + 1) % n) for i in range(n)]
    up = [(i, (i - 1) % n) for i in range(n)]
    from_above = jax.lax.ppermute(x[:, -halo:], axis_name, down)
    from_below = jax.lax.ppermute(x[:, :halo], axis_name, up)

    # boundary shards clamp to their own edge rows (same as XLA 'edge'
    # behavior for the partitioner's generated halos with explicit pad)
    top_pad = jnp.where(idx == 0, 0, 1)
    from_above = jnp.where(top_pad[..., None, None, None] > 0,
                           from_above, jnp.repeat(x[:, :1], halo, axis=1))
    bot_pad = jnp.where(idx == n - 1, 0, 1)
    from_below = jnp.where(bot_pad[..., None, None, None] > 0,
                           from_below, jnp.repeat(x[:, -1:], halo, axis=1))
    return jnp.concatenate([from_above, x, from_below], axis=1)
