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
from seghiero_tpu.losses.hiera import (
    _bucket_max,
    _log_one_minus_sig_eps,
    _log_sig_eps,
    _one_hot_valid,
)


def hiera_focal_loss(
    logits: jax.Array,  # [B, H, W, n_fine + n_coarse]
    targets_fine: jax.Array,
    targets_coarse: jax.Array,
    hierarchy: Hierarchy,
    gamma: float = 2.0,
    eps: float = 1e-8,
) -> jax.Array:
    n_fine, n_coarse = hierarchy.n_fine, hierarchy.n_coarse
    lg = logits.astype(jnp.float32)
    la = lg[..., :n_fine]
    lb = lg[..., n_fine : n_fine + n_coarse]
    mcmb_l = _bucket_max(la, hierarchy.fine_by_coarse, lb)
    mcla_l = jnp.minimum(la, lb[..., np.asarray(hierarchy.fine_to_coarse)])

    oh_f, valid_f = _one_hot_valid(targets_fine, n_fine, hierarchy.ignore_index)
    oh_c, valid_c = _one_hot_valid(targets_coarse, n_coarse, hierarchy.ignore_index)

    def level(oh, pos_l, neg_l, valid, n):
        v = valid[..., None].astype(jnp.float32)
        nv = jnp.maximum(jnp.sum(v), 1.0)
        # modulation factors from probabilities; logs via the stable
        # logit-space identities (losses/hiera.py)
        pos_p = jax.nn.sigmoid(pos_l)
        neg_p = jax.nn.sigmoid(neg_l)
        return jnp.sum(
            (
                -oh * (1.0 - pos_p) ** gamma * _log_sig_eps(pos_l, eps)
                - (1.0 - oh) * neg_p**gamma * _log_one_minus_sig_eps(neg_l, eps)
            )
            * v
        ) / (nv * n)

    return level(oh_f, mcla_l, la, valid_f, n_fine) + level(
        oh_c, lb, mcmb_l, valid_c, n_coarse
    )
