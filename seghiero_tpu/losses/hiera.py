"""Hierarchy-consistency BCE losses and the 2-level composite loss.

Rebuilds models/loss/hiera_triplet_loss.py (2-level) and the hierarchy-BCE
half of models/loss/rmi_hiera_triplet_loss.py (3-level) with the
per-bucket Python loops of the reference
(hiera_triplet_loss.py:81-92, rmi_hiera_triplet_loss.py:377-442) replaced
by *static* trace-time reductions: the hierarchy is a compile-time
constant, so every bucket max/min unrolls into fused XLA slice-reductions
— one kernel, no per-class launches, no dynamic shapes.

Notation follows HieraSeg (arXiv:2203.14335): for pixel p and node v,
the "max" score M↑(v) is the max of sigmoid scores over v and its
children (used as the negative-side probability) and the "min" score
M↓(v) is the min over v and its ancestors (positive side). MCMA/MCMB/…
names kept so the algebra can be eyeballed against the reference.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from seghiero_tpu.hierarchy import Hierarchy
from seghiero_tpu.losses.cross_entropy import softmax_cross_entropy
from seghiero_tpu.losses.tree_triplet import (
    tree_triplet_loss_range,
    triplet_readiness,
    triplet_schedule_factor,
)


# ---------------------------------------------------------------------------
# Target preparation
# ---------------------------------------------------------------------------


# Above this table size the unrolled compare-select chain switches to a
# plain gather: the chain is O(len(lut)) fused VPU compares per pixel
# (great for the ≤32-class configs it was profiled on; see below), but
# at ADE20K scale (150+ fine classes) its per-pixel op count exceeds
# what the ~3 GB/s TPU gather costs, and trace/compile time grows
# linearly with the table. Overridable for experiments.
LUT_UNROLL_MAX = 64


def lut_lookup(lut, idx: jax.Array) -> jax.Array:
    """Apply a small static LUT to an index array WITHOUT a gather.

    On TPU a full-resolution gather lowers to a "custom fusion" running
    at ~3 GB/s — profiled at 16.6 ms/step (30% of the whole train step)
    for the fine→coarse target LUT at 512²/b8. The unrolled
    compare-select chain over the (compile-time constant) table fuses
    into one elementwise pass at HBM bandwidth instead.

    Tables longer than ``LUT_UNROLL_MAX`` use the MONOTONE shortcut when
    they can: hierarchy LUTs over contiguous buckets are non-decreasing,
    so the value only changes at the bucket boundaries and
    ``out = lut[0] + Σ_b step_b · (idx ≥ boundary_b)`` needs one fused
    compare per *boundary* (n_buckets − 1 ≈ 14 at ADE20K scale), not per
    table entry. Exact for any non-decreasing table incl. out-of-range
    idx (matches the gather's index clamping for idx ≥ len). Profiled on
    a v5e at 150 fine classes / 512²·b8: the full-res ``jnp.take`` this
    replaces was 21.3 ms/step of the train step.

    Non-monotone long tables (arbitrary user hierarchies) still take the
    gather: per-pixel compare count would grow with the table while the
    gather's cost is flat (and a 150-entry unroll also bloats the traced
    program).
    """
    lut = np.asarray(lut)
    if len(lut) > LUT_UNROLL_MAX:
        steps = np.diff(lut)
        if len(lut) > 1 and np.all(steps >= 0) and (
            np.count_nonzero(steps) <= LUT_UNROLL_MAX
        ):
            out = jnp.full(idx.shape, int(lut[0]), dtype=jnp.int32)
            for b in np.nonzero(steps)[0]:
                out = out + np.int32(steps[b]) * (
                    idx >= np.int32(b + 1)
                ).astype(jnp.int32)
            return out
        return jnp.take(
            jnp.asarray(lut, jnp.int32), idx.astype(jnp.int32), axis=0
        )
    out = jnp.full(idx.shape, int(lut[0]), dtype=jnp.int32)
    for i in range(1, len(lut)):
        out = jnp.where(idx == i, np.int32(lut[i]), out)
    return out


def prepare_targets_two_level(
    labels: jax.Array, hierarchy: Hierarchy
) -> Tuple[jax.Array, jax.Array]:
    """(fine, coarse) targets from fine labels (hiera_triplet_loss.py:11-38).

    Ignored (255) pixels stay 255 at both levels.
    """
    valid = (labels >= 0) & (labels < hierarchy.n_fine)
    safe = jnp.where(valid, labels, 0)
    coarse = jnp.where(
        valid, lut_lookup(hierarchy.fine_to_coarse, safe), hierarchy.ignore_index
    )
    return labels, coarse.astype(labels.dtype)


def prepare_targets_three_level(
    labels: jax.Array, hierarchy: Hierarchy
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """(fine, mid, high) targets (rmi_hiera_triplet_loss.py:21-63), with
    255 propagated and the fine→high LUT composed correctly
    (reference bug #3 fixed — see hierarchy.py docstring)."""
    valid = (labels >= 0) & (labels < hierarchy.n_fine)
    safe = jnp.where(valid, labels, 0)
    mid = jnp.where(
        valid, lut_lookup(hierarchy.fine_to_coarse, safe), hierarchy.ignore_index
    )
    high = jnp.where(
        valid, lut_lookup(hierarchy.fine_to_super, safe), hierarchy.ignore_index
    )
    return labels, mid.astype(labels.dtype), high.astype(labels.dtype)


# ---------------------------------------------------------------------------
# Hierarchy-consistency BCE
# ---------------------------------------------------------------------------


def _one_hot_valid(labels: jax.Array, n: int, ignore_index: int):
    void = labels == ignore_index
    safe = jnp.where(void, 0, labels)
    oh = jax.nn.one_hot(safe, n, dtype=jnp.float32)
    return oh, ~void


def _log_sig_eps(logit: jax.Array, eps: float) -> jax.Array:
    """log(sigmoid(logit) + eps), computed stably in logit space.

    Identity: log(a + eps) = logaddexp(log a, log eps) with
    log sigmoid(x) = -softplus(-x). Bit-for-bit this matches the naive
    form to float rounding, but its backward contains no 1/(p+eps)
    divisions — the naive composition is vulnerable to XLA fusion
    rewrites that emit inf·0 when sigmoid saturates to exactly 1.0f
    (observed on both CPU and TPU backends: finite un-jitted gradients,
    NaN jitted; see tests/test_losses_parity.py saturation tests).
    """
    return jnp.logaddexp(-jax.nn.softplus(-logit), jnp.log(eps))


def _log_one_minus_sig_eps(logit: jax.Array, eps: float) -> jax.Array:
    """log(1 - sigmoid(logit) + eps) via 1 - sigmoid(x) = sigmoid(-x)."""
    return jnp.logaddexp(-jax.nn.softplus(logit), jnp.log(eps))


def _bucket_max(probs_child: jax.Array, buckets, own: jax.Array) -> jax.Array:
    """Per-bucket max over static child-id sets, joined with the bucket's
    own channel. probs_child [..., n_child]; own [..., n_bucket]."""
    cols = []
    for i, ids in enumerate(buckets):
        o = own[..., i]
        if ids:
            cols.append(jnp.maximum(jnp.max(probs_child[..., list(ids)], axis=-1), o))
        else:
            cols.append(o)  # empty bucket falls back to its own channel
    return jnp.stack(cols, axis=-1)


def hiera_bce_two_level(
    logits: jax.Array,  # [B, H, W, n_fine + n_coarse] raw scores
    targets_fine: jax.Array,  # [B, H, W]
    targets_coarse: jax.Array,  # [B, H, W]
    hierarchy: Hierarchy,
    eps: float = 1e-8,
) -> jax.Array:
    """2-level hierarchy BCE, 5 * (fine + coarse) (hiera_triplet_loss.py:41-107).

    MCMB[c] = max(fine scores in bucket c ∪ {coarse score c});
    MCLA[f] = min(fine score f, coarse score of f's bucket).
    BCE pulls up the min-path for positives and pushes down the max-path
    for negatives, each level normalized by (#valid px × #classes).

    Computed in LOGIT space: sigmoid is monotone, so the min/max tree
    algebra commutes with it, and the log terms use the stable
    ``logaddexp``/``softplus`` identities (see ``_log_sig_eps``) —
    numerically identical to sigmoiding first, but with a
    fusion-rewrite-proof backward.
    """
    n_fine, n_coarse = hierarchy.n_fine, hierarchy.n_coarse
    lg = logits.astype(jnp.float32)
    la = lg[..., :n_fine]
    lb = lg[..., n_fine : n_fine + n_coarse]

    mcmb_l = _bucket_max(la, hierarchy.fine_by_coarse, lb)
    mcla_l = jnp.minimum(la, lb[..., np.asarray(hierarchy.fine_to_coarse)])

    oh_f, valid_f = _one_hot_valid(targets_fine, n_fine, hierarchy.ignore_index)
    oh_c, valid_c = _one_hot_valid(targets_coarse, n_coarse, hierarchy.ignore_index)
    vf = valid_f[..., None].astype(jnp.float32)
    vc = valid_c[..., None].astype(jnp.float32)
    nvf = jnp.maximum(jnp.sum(vf), 1.0)
    nvc = jnp.maximum(jnp.sum(vc), 1.0)

    loss_fine = jnp.sum(
        (-oh_f * _log_sig_eps(mcla_l, eps)
         - (1.0 - oh_f) * _log_one_minus_sig_eps(la, eps)) * vf
    ) / (nvf * n_fine)
    loss_coarse = jnp.sum(
        (-oh_c * _log_sig_eps(lb, eps)
         - (1.0 - oh_c) * _log_one_minus_sig_eps(mcmb_l, eps)) * vc
    ) / (nvc * n_coarse)
    return 5.0 * (loss_fine + loss_coarse)


def hiera_bce_three_level(
    logits: jax.Array,  # [B, H, W, n_fine + n_mid + n_high]
    targets_fine: jax.Array,
    targets_mid: jax.Array,
    targets_high: jax.Array,
    hierarchy: Hierarchy,
    clip_min: float = 1e-6,
) -> jax.Array:
    """3-level hierarchy BCE, 5 * (fine + mid + high)
    (rmi_hiera_triplet_loss.py:352-470, constants at :16-17).

    Max side goes up the tree (MCMB_combined, MCMC_combined); min side
    goes down (MCLA, MCLB_combined). All bucket memberships come from the
    static hierarchy LUTs — the reference derives them from
    ``fine_to_mid``/``fine_to_high`` at :379-442, identically static.
    """
    n_f, n_m, n_h = hierarchy.n_fine, hierarchy.n_coarse, hierarchy.n_super
    lg = logits.astype(jnp.float32)  # logit-space algebra, see 2-level note
    la = lg[..., :n_f]
    lb = lg[..., n_f : n_f + n_m]
    lc = lg[..., n_f + n_m : n_f + n_m + n_h]

    # up the tree: fine→mid, then mid→high (:377-411)
    mcmb_comb = _bucket_max(la, hierarchy.fine_by_coarse, lb)
    mcmc_comb = _bucket_max(mcmb_comb, hierarchy.coarse_by_super, lc)

    # down the tree: MCLA[f] = min(fine f, mid-of-f) (:417-425)
    mcla = jnp.minimum(la, lb[..., np.asarray(hierarchy.fine_to_coarse)])
    # MCLB_combined[m] = min(high-of-m, mid m) (:427-442; with the fixed
    # fine→high LUT each mid has exactly one high ancestor)
    mclb_comb = jnp.minimum(lb, lc[..., np.asarray(hierarchy.coarse_to_super)])

    oh_f, valid_f = _one_hot_valid(targets_fine, n_f, hierarchy.ignore_index)
    oh_m, valid_m = _one_hot_valid(targets_mid, n_m, hierarchy.ignore_index)
    oh_h, valid_h = _one_hot_valid(targets_high, n_h, hierarchy.ignore_index)

    def level_loss(oh, pos_l, neg_l, valid, n):
        v = valid[..., None].astype(jnp.float32)
        nv = jnp.maximum(jnp.sum(v), 1.0)
        return jnp.sum(
            (-oh * _log_sig_eps(pos_l, clip_min)
             - (1.0 - oh) * _log_one_minus_sig_eps(neg_l, clip_min)) * v
        ) / (nv * n)

    loss_f = level_loss(oh_f, mcla, la, valid_f, n_f)
    loss_m = level_loss(oh_m, mclb_comb, mcmb_comb, valid_m, n_m)
    loss_h = level_loss(oh_h, lc, mcmc_comb, valid_h, n_h)  # :464-468
    return 5.0 * (loss_f + loss_m + loss_h)


# ---------------------------------------------------------------------------
# 2-level composite loss (BCE + CE + scheduled triplet)
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class HieraTripletLoss:
    """2-level composite loss (hiera_triplet_loss.py:110-211), pure/jittable.

    ``loss = loss_weight * (5·hieraBCE + CE_fine + CE_coarse
             + ready · schedule(step) · triplet)``

    Call signature mirrors the reference forward: ``(step, embedding,
    cls_score_before, cls_score, label)``. ``cls_score_before`` (the 1/8
    fine slice) is accepted for interface parity but — exactly like the
    reference (hiera_triplet_loss.py:163) — unused; the triplet runs on
    the embedding.

    ``axis_name`` routes the readiness gate through a ``pmin`` over the
    data mesh axis (the reference's DDP all_gather at :193-200).
    """

    hierarchy: Hierarchy
    loss_weight: float = 1.0
    schedule_total_steps: int = 80_000  # :204
    max_triplet: int = 200
    margin: float = 0.6
    axis_name: Optional[str] = None
    # "bce" (reference live path) | "focal" (the reference's dead focal
    # variant made selectable — losses/focal.py, hiera_loss.py:72-115)
    hiera_variant: str = "bce"
    focal_gamma: float = 2.0
    # optional (thresh, batch_kept) hard-pixel mining on the per-level CE
    # terms (losses/ohem.py); None = reference behavior (all pixels)
    ohem: Optional[Tuple[float, int]] = None
    # triplet pixel-selection backend: "auto" | "mask" | "sorted"
    # (losses/tree_triplet.py — identical indices, different cost curves)
    selection: str = "auto"

    def __call__(
        self,
        step: jax.Array,
        embedding: jax.Array,  # [B, h, w, D] L2-normalized
        cls_score_before: jax.Array,  # [B, h', w', n_fine] (unused; parity)
        cls_score: jax.Array,  # [B, H, W, n_fine + n_coarse]
        label: jax.Array,  # [B, H, W]
    ) -> jax.Array:
        h = self.hierarchy
        t_fine, t_coarse = prepare_targets_two_level(label, h)
        if self.hiera_variant == "focal":
            from seghiero_tpu.losses.focal import hiera_focal_loss

            loss = hiera_focal_loss(
                cls_score, t_fine, t_coarse, h, gamma=self.focal_gamma
            )
        else:
            loss = hiera_bce_two_level(cls_score, t_fine, t_coarse, h)
        loss = loss + softmax_cross_entropy(
            cls_score[..., : h.n_fine], t_fine, divide_by="all", ohem=self.ohem
        )
        loss = loss + softmax_cross_entropy(
            cls_score[..., h.n_fine : h.n_fine + h.n_coarse],
            t_coarse,
            divide_by="all",
            ohem=self.ohem,
        )

        triplet, class_count = tree_triplet_loss_range(
            embedding, label, h, max_triplet=self.max_triplet,
            margin=self.margin, selection=self.selection,
        )
        ready = triplet_readiness(class_count, self.axis_name)
        factor = triplet_schedule_factor(step, self.schedule_total_steps)
        loss = loss + jnp.where(ready, factor * triplet, 0.0)
        return loss * self.loss_weight
