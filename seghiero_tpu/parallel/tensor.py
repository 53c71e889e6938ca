"""Tensor parallelism: Megatron-style weight sharding over the `model` axis.

``training.tensor_shards: M`` makes the mesh's ``model`` axis real
(size M) and shards the transformer backbones' attention / FFN weights
across it with the standard Megatron column→row pattern
(arXiv:1909.08053 §3):

  * q/k/v projection kernels **column-parallel** (output dim sharded) —
    each device computes its own slice of heads;
  * the attention output projection and the FFN's second matmul
    **row-parallel** (input dim sharded) — the partial products are
    reduced with ONE psum per block, inserted by XLA's SPMD partitioner;
  * the FFN's first matmul column-parallel, the Mix-FFN depthwise conv
    sharded on its channel dim (it is elementwise across channels).

There is no hand-written collective code: the rules below only *place*
the weights; the partitioner propagates the shardings through the
reshape-to-heads and einsums and inserts the all-gather/psum pattern
Megatron codes by hand (the scaling-book recipe: pick shardings, let
XLA insert collectives). Any leaf the rules do not match — conv
backbones, the sep-ASPP head, BN/LayerNorm scales — keeps its base
sharding (replicated, or the FSDP data-axis sharding when
``param_sharding: fsdp`` is combined with TP).

Matching is by parameter-path SUFFIX, so the same rules cover MiT
(``.../attn/q/kernel``, ``.../mlp/fc1/kernel``) and Swin
(``.../attn/q/kernel``, ``.../fc1/kernel``) — and the optimizer's
momentum/moment trees, whose leaf paths end with the same module path.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from seghiero_tpu.parallel.mesh import MODEL_AXIS

# (path suffix, index of the dimension sharded over `model`)
TP_RULES = (
    # attention: q/k/v column-parallel (heads split across devices).
    # Plain ViT's FUSED qkv projection is sharded on its output axis
    # too, but that axis is the [q|k|v] concat, so GSPMD's contiguous
    # chunks cross the q/k/v boundaries (not the head-aligned Megatron
    # layout): the downstream jnp.split re-shards each third with a
    # collective. Correct under GSPMD, and the matmul itself — the FLOPs
    # — still runs column-parallel; the resharding is one all-to-all of
    # activations per block. (A head-aligned layout would need an
    # interleaved sharding GSPMD cannot express on one axis, or a
    # checkpoint-breaking split of the fused kernel.)
    ("attn/qkv/kernel", 1),
    ("attn/qkv/bias", 0),
    ("attn/q/kernel", 1),
    ("attn/k/kernel", 1),
    ("attn/v/kernel", 1),
    ("attn/q/bias", 0),
    ("attn/k/bias", 0),
    ("attn/v/bias", 0),
    # attention output projection row-parallel (psum after)
    ("attn/proj/kernel", 0),
    # FFN: fc1 column-parallel, fc2 row-parallel; Mix-FFN depthwise conv
    # is per-channel, so it shards with fc1's output channels
    ("fc1/kernel", 1),
    ("fc1/bias", 0),
    ("dwconv/kernel", 3),
    ("dwconv/bias", 0),
    ("fc2/kernel", 0),
)


def _path_str(path) -> str:
    parts = []
    for k in path:
        if hasattr(k, "key"):
            parts.append(str(k.key))
        elif hasattr(k, "name"):
            parts.append(str(k.name))
        elif hasattr(k, "idx"):
            parts.append(str(k.idx))
        else:
            parts.append(str(k))
    return "/".join(parts)


def tp_spec(path_str: str, shape, m: int):
    """The TP PartitionSpec for a leaf, or None if no rule matches (or
    the matched dim is not divisible by the axis size)."""
    for suffix, dim in TP_RULES:
        if path_str.endswith(suffix):
            if dim < len(shape) and shape[dim] % m == 0 and shape[dim] >= m:
                spec = [None] * len(shape)
                spec[dim] = MODEL_AXIS
                return P(*spec)
            return None
    return None


def tp_matched_leaf_count(tree, m: int) -> int:
    """How many leaves of ``tree`` the Megatron rules would actually
    shard at ``tensor_shards=m``. Zero means TP is a silent no-op for
    this model (e.g. a conv-only backbone: TP_RULES match only
    transformer attention/FFN paths) — the trainer raises in that case
    rather than let the model axis eat devices for nothing."""
    count = 0

    def visit(path, x):
        nonlocal count
        if tp_spec(_path_str(path), getattr(x, "shape", ()), m) is not None:
            count += 1
        return x

    jax.tree_util.tree_map_with_path(visit, tree)
    return count


def tp_state_sharding(mesh: Mesh, tree, base_tree):
    """Overlay the Megatron rules on ``base_tree`` (a sharding pytree of
    the same structure — replicated, or fsdp_state_sharding's output)."""
    m = mesh.shape[MODEL_AXIS]

    def rule(path, x, base):
        shape = getattr(x, "shape", ())
        spec = tp_spec(_path_str(path), shape, m) if m > 1 else None
        if spec is None:
            return base
        return NamedSharding(mesh, spec)

    return jax.tree_util.tree_map_with_path(rule, tree, base_tree)
