"""Focal variant of the hierarchy BCE.

The reference carries a dead-code focal variant (models/loss/
hiera_loss.py:72-115, γ=2 — unusable there: the module references an
undefined mmseg ``@LOSSES.register_module`` at :118). That dead code is
a *3-level* loss over a fixed fine + 3-middle (back/upper/lower) +
2-top (back/fore) tree; we provide both forms live and general:

* ``hiera_focal_loss`` — a 2-level adaptation (same min/max tree as
  ``hiera_bce_two_level``, focal-modulated);
* ``hiera_focal_three_level`` — the genuine 3-level form for any
  range-based YAML hierarchy, matching the dead code's algebra exactly
  (parity-tested against it in tests/test_losses_parity.py).

Both use focal modulation ``(1-M↓)^γ·log(M↓)`` / ``(M↑)^γ·log(1-M↑)``
and — matching the dead reference code — *without* the ×5 scale.
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


def hiera_focal_three_level(
    logits: jax.Array,  # [B, H, W, n_fine + n_mid + n_high]
    targets_fine: jax.Array,
    targets_mid: jax.Array,
    targets_high: jax.Array,
    hierarchy: Hierarchy,
    gamma: float = 2.0,
    eps: float = 1e-8,
) -> jax.Array:
    """The reference's dead 3-level focal loss (hiera_loss.py:72-115),
    generalized from its fixed back/upper/lower structure to any
    range-based 3-level hierarchy.

    Max side is identical to ``hiera_bce_three_level`` (up the tree).
    Min side differs from the *live* 3-level BCE: the dead focal takes
    the min over the FULL ancestor chain — ``MCLB = min(mid, top-of-mid)``
    first, then ``MCLA = min(fine, MCLB-of-fine)`` (hiera_loss.py:46-57)
    — whereas the live loss mins fine with the raw mid logit only
    (rmi_hiera_triplet_loss.py:417-425). Per-level focal terms, no ×5
    (the dead code returns the bare sum).

    The reference's ``len(upper_ids)>5`` branch (hiera_loss.py:55) is a
    hardcoded channel re-ordering that undoes its non-contiguous
    Cityscapes id grouping; with range-based hierarchies the min is
    computed per fine channel directly, so channel order is always
    preserved by construction.
    """
    n_f, n_m, n_h = hierarchy.n_fine, hierarchy.n_coarse, hierarchy.n_super
    lg = logits.astype(jnp.float32)
    la = lg[..., :n_f]
    lb = lg[..., n_f : n_f + n_m]
    lc = lg[..., n_f + n_m : n_f + n_m + n_h]

    # up the tree (same algebra as the BCE form)
    mcmb_l = _bucket_max(la, hierarchy.fine_by_coarse, lb)
    mcmc_l = _bucket_max(mcmb_l, hierarchy.coarse_by_super, lc)
    # down the tree: full ancestor chain (sigmoid is monotone, so min
    # commutes with it — computed in logit space like the BCE form)
    mclb_l = jnp.minimum(lb, lc[..., np.asarray(hierarchy.coarse_to_super)])
    mcla_l = jnp.minimum(la, mclb_l[..., np.asarray(hierarchy.fine_to_coarse)])

    oh_f, valid_f = _one_hot_valid(targets_fine, n_f, hierarchy.ignore_index)
    oh_m, valid_m = _one_hot_valid(targets_mid, n_m, hierarchy.ignore_index)
    oh_h, valid_h = _one_hot_valid(targets_high, n_h, hierarchy.ignore_index)

    def level(oh, pos_l, neg_l, valid, n):
        v = valid[..., None].astype(jnp.float32)
        nv = jnp.maximum(jnp.sum(v), 1.0)
        pos_p = jax.nn.sigmoid(pos_l)
        neg_p = jax.nn.sigmoid(neg_l)
        return jnp.sum(
            (
                -oh * (1.0 - pos_p) ** gamma * _log_sig_eps(pos_l, eps)
                - (1.0 - oh) * neg_p**gamma * _log_one_minus_sig_eps(neg_l, eps)
            )
            * v
        ) / (nv * n)

    return (
        level(oh_f, mcla_l, la, valid_f, n_f)
        + level(oh_m, mclb_l, mcmb_l, valid_m, n_m)
        + level(oh_h, lc, mcmc_l, valid_h, n_h)
    )
