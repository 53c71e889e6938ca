"""Focal variant of the hierarchy BCE.

The reference carries a dead-code focal variant (models/loss/
hiera_loss.py:72-115, γ=2 — unusable there: the module references an
undefined mmseg ``@LOSSES.register_module`` at :118). We provide it as a
live, general 2-level option: same min/max tree algebra as
``hiera_bce_two_level`` but with focal modulation
``(1-M↓)^γ·log(M↓)`` / ``(M↑)^γ·log(1-M↑)``, and — matching the dead
reference code — *without* the ×5 scale.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from seghiero_tpu.hierarchy import Hierarchy
from seghiero_tpu.losses.hiera import _bucket_max, _one_hot_valid


def hiera_focal_loss(
    logits: jax.Array,  # [B, H, W, n_fine + n_coarse]
    targets_fine: jax.Array,
    targets_coarse: jax.Array,
    hierarchy: Hierarchy,
    gamma: float = 2.0,
    eps: float = 1e-8,
) -> jax.Array:
    n_fine, n_coarse = hierarchy.n_fine, hierarchy.n_coarse
    probs = jax.nn.sigmoid(logits.astype(jnp.float32))
    mcma = probs[..., :n_fine]
    mclb = probs[..., n_fine : n_fine + n_coarse]
    mcmb = _bucket_max(mcma, hierarchy.fine_by_coarse, mclb)
    mcla = jnp.minimum(mcma, mclb[..., np.asarray(hierarchy.fine_to_coarse)])

    oh_f, valid_f = _one_hot_valid(targets_fine, n_fine, hierarchy.ignore_index)
    oh_c, valid_c = _one_hot_valid(targets_coarse, n_coarse, hierarchy.ignore_index)

    def level(oh, pos, neg, valid, n):
        v = valid[..., None].astype(jnp.float32)
        nv = jnp.maximum(jnp.sum(v), 1.0)
        return jnp.sum(
            (
                -oh * (1.0 - pos) ** gamma * jnp.log(pos + eps)
                - (1.0 - oh) * neg**gamma * jnp.log(1.0 - neg + eps)
            )
            * v
        ) / (nv * n)

    return level(oh_f, mcla, mcma, valid_f, n_fine) + level(
        oh_c, mclb, mcmb, valid_c, n_coarse
    )
