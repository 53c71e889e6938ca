"""Regional Mutual Information (RMI) loss and the 3-level composite loss.

Rebuilds models/loss/rmi_hiera_triplet_loss.py:180-546. The RMI term
(Zhao et al., NeurIPS 2019) treats each radius×radius neighborhood of the
(one-hot target, sigmoid prob) maps as a multivariate pair and maximizes a
lower bound on their mutual information via
``0.5·logdet(Σ_y - Σ_yp Σ_p⁻¹ Σ_yp^T)`` per class.

TPU design notes:

  * The covariance assembly is restructured as one batched matmul
    ``[9, N] @ [N, 9]`` per (batch, class) — the contraction over N
    (≈ H·W) is exactly what the MXU wants. The 9 shifted views are
    produced by static slices (radius is compile-time), so XLA fuses the
    shift+stack into the matmul's operand reads.
  * The reference computes in float64 (``.double()``,
    rmi_hiera_triplet_loss.py:500-503). TPUs have no native f64, so the
    default here is float32 with the same diagonal jitter; tests compare
    f32-vs-f64 oracles and the difference is at the 1e-5 level for
    realistic magnitudes. ``use_float64=True`` restores bit-faithful
    semantics on CPU (requires ``jax_enable_x64``).
  * 3×3 covariances are 9×9 — tiny; the batched cholesky/inverse is
    negligible next to the matmuls.

The reference's ``rmi_pool_*`` knobs are stored but never applied in its
forward pass (constructor at :255-260; ``map_get_pairs`` is called on the
full-resolution maps at :493-495) — we mirror that: accepted, validated,
unused. A deliberate extension ``downsample`` is available to cut the RMI
cost 4× (off by default for parity).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from seghiero_tpu.hierarchy import Hierarchy
from seghiero_tpu.losses.cross_entropy import softmax_cross_entropy
from seghiero_tpu.losses.hiera import (
    hiera_bce_three_level,
    prepare_targets_three_level,
    _one_hot_valid,
)
from seghiero_tpu.losses.tree_triplet import (
    tree_triplet_loss_groups,
    triplet_readiness,
    triplet_schedule_factor,
)

_CLIP_MIN = 1e-6  # rmi_hiera_triplet_loss.py:16
_POS_ALPHA = 1e-3  # rmi_hiera_triplet_loss.py:18


def _neighborhood_vectors(x: jax.Array, radius: int) -> jax.Array:
    """Stack the radius² shifted views of [B, H, W, C] → [B, C, r², N].

    Mirrors ``map_get_pairs`` (rmi_hiera_triplet_loss.py:292-311): view
    (y, x) is the slice ``[:, y:y+H-r+1, x:x+W-r+1, :]``, flattened.
    """
    B, H, W, C = x.shape
    nh, nw = H - (radius - 1), W - (radius - 1)
    views = [
        x[:, y : y + nh, xx : xx + nw, :]
        for y in range(radius)
        for xx in range(radius)
    ]
    stacked = jnp.stack(views, axis=-1)  # [B, nh, nw, C, r²]
    return stacked.reshape(B, nh * nw, C, radius * radius).transpose(0, 2, 3, 1)


def _rmi_logdet_core(la, pr, half_d: int, use_float64: bool) -> jax.Array:
    """Shared RMI numerics: per-(batch, class) ``0.5·logdet`` of the
    conditional covariance, [B, C].

    f32-safe reformulation of rmi_hiera_triplet_loss.py:489-517. Three
    layers of defense, all derived from hard failures at 512²:

    1. N-normalization (exact rewrite): the reference's raw Gram entries
       reach N = H·W ≈ 2.6e5 and rely on float64;
       ``logdet(N·B + αI) = d·log N + logdet(B + α/N·I)`` keeps every
       accumulated f32 value in ~[0, 1].
    2. PSD by construction: instead of ``la_cov − la_pr·inv(pr_cov+αI)·
       la_prᵀ`` (a cancellation whose PSD margin is below f32 noise, and
       an LU inverse whose pivots can underflow — forward NaNs), compute
       the RESIDUAL vectors ``r = la − W·pr`` with ``W = la_pr·
       solve(pr_cov + jitter)`` and form ``appro_var = r·rᵀ`` — a Gram
       matrix, PSD up to rounding regardless of conditioning.
    3. noise-aware jitter: the reference's absolute α = 1e-3 becomes
       α/N ≈ 4e-9 after normalization — BELOW the f32 noise floor for
       the near-rank-1 matrices produced by smooth probability fields.
       In f32 the jitter is floored at ``32·eps_f32 · mean(diag)``; with
       ``use_float64`` (CPU oracle mode) the reference's exact α/N is
       kept. Divergence in the ill-conditioned regime is inherent to
       f32 and documented (docs/DESIGN.md).

    ``default_matmul_precision("highest")`` additionally pins matmuls
    inside solve/cholesky and their VJPs (bf16 MXU passes otherwise
    break PSD in the fused backward program).
    """
    compute_dtype = jnp.float64 if use_float64 else jnp.float32
    n = la.shape[-1]
    with jax.default_matmul_precision("highest"):
        la = la.astype(compute_dtype) * (1.0 / np.sqrt(n))
        pr = pr.astype(compute_dtype) * (1.0 / np.sqrt(n))
        alpha_n = _POS_ALPHA / n
        eps_rel = 0.0 if use_float64 else 32 * np.finfo(np.float32).eps
        diag = jnp.eye(half_d, dtype=compute_dtype)

        la_cov = jnp.einsum("bcin,bcjn->bcij", la, la)
        pr_cov = jnp.einsum("bcin,bcjn->bcij", pr, pr)
        la_pr = jnp.einsum("bcin,bcjn->bcij", la, pr)

        def jitter(m):
            mean_diag = jnp.mean(jnp.diagonal(m, axis1=-2, axis2=-1), -1)
            return jnp.maximum(alpha_n, eps_rel * mean_diag)[..., None, None]

        m_pr = pr_cov + diag * jitter(pr_cov)
        w = jnp.linalg.solve(m_pr, jnp.swapaxes(la_pr, -1, -2))  # [.., d, d]
        r = la - jnp.einsum("bcji,bcjn->bcin", w, pr)  # residual vectors
        appro_var = jnp.einsum("bcin,bcjn->bcij", r, r)  # Gram: PSD
        appro_var = 0.5 * (appro_var + jnp.swapaxes(appro_var, -1, -2))
        del la_cov  # implicit in the residual Gram

        chol = jnp.linalg.cholesky(appro_var + diag * jitter(appro_var))
        # reference guard log(diag + 1e-8) applies at the unnormalized
        # scale: diag_unnorm = sqrt(N)·diag_norm
        logdet = 2.0 * jnp.sum(
            jnp.log(jnp.diagonal(chol, axis1=-2, axis2=-1) * np.sqrt(n) + 1e-8),
            axis=-1,
        )  # [B, C]
        return (0.5 * logdet).astype(jnp.float32)


def _pick_chunk_rows(nh: int, target: int = 64) -> int:
    """Largest divisor of ``nh`` that is ≤ ``target`` (static shapes)."""
    best = 1
    for d in range(1, min(nh, target) + 1):
        if nh % d == 0:
            best = d
    return best


def rmi_logdet_streaming_cmajor(
    oh_map: jax.Array,  # [B, C, H, W] one-hot targets (no grad)
    pr_map: jax.Array,  # [B, C, H, W] masked sigmoid probabilities
    *,
    radius: int = 3,
    use_float64: bool = False,
    target_rows: int = 64,
) -> jax.Array:
    """Per-(batch, class) ``0.5·logdet`` — same numerics as
    ``_rmi_logdet_core`` but with O(chunk) activation memory.

    The materialized path stacks the r² shifted views into a
    ``[B, C, r², N]`` tensor (~1.1 GB at 512²·b4·15-class including the
    residual vectors kept for the backward). Here the Gram matrices are
    accumulated over row-chunks of the spatial plane with a
    rematerialized ``lax.scan`` body, in two passes:

      1. accumulate ``pr_cov``/``la_pr`` → solve for the regression W
      2. accumulate the residual Gram ``Σ_chunks r_c·r_cᵀ``

    A sum of per-chunk Gram matrices is still a Gram matrix, so the
    PSD-by-construction property of the residual formulation (see
    ``_rmi_logdet_core`` note 2) is preserved exactly; only the f32
    accumulation order differs from the materialized path.
    ``jax.checkpoint`` on the bodies keeps the backward at O(chunk) too
    (views are recomputed from the base maps per chunk).
    """
    compute_dtype = jnp.float64 if use_float64 else jnp.float32
    B, C, H, W = pr_map.shape
    r = radius
    d = r * r
    nh, nw = H - (r - 1), W - (r - 1)
    n = nh * nw
    rows = _pick_chunk_rows(nh, target_rows)
    n_chunks = nh // rows
    scale = 1.0 / np.sqrt(n)

    oh_map = jax.lax.stop_gradient(oh_map).astype(compute_dtype)
    pr_map = pr_map.astype(compute_dtype)

    def views(m, row0):
        """[B,C,d,rows·nw] neighborhood vectors for output rows
        [row0, row0+rows) — r²  static slices of a [rows+r-1]-row band."""
        band = jax.lax.dynamic_slice_in_dim(m, row0, rows + r - 1, axis=2)
        vs = [
            band[:, :, y : y + rows, x : x + nw]
            for y in range(r)
            for x in range(r)
        ]
        return jnp.stack(vs, axis=2).reshape(B, C, d, rows * nw) * scale

    with jax.default_matmul_precision("highest"):
        alpha_n = _POS_ALPHA / n
        eps_rel = 0.0 if use_float64 else 32 * np.finfo(np.float32).eps
        diag = jnp.eye(d, dtype=compute_dtype)
        row0s = jnp.arange(n_chunks, dtype=jnp.int32) * rows
        zeros = jnp.zeros((B, C, d, d), compute_dtype)

        @jax.checkpoint
        def body1(carry, row0):
            pr_cov, la_pr = carry
            la = views(oh_map, row0)
            pr = views(pr_map, row0)
            pr_cov = pr_cov + jnp.einsum("bcin,bcjn->bcij", pr, pr)
            la_pr = la_pr + jnp.einsum("bcin,bcjn->bcij", la, pr)
            return (pr_cov, la_pr), None

        (pr_cov, la_pr), _ = jax.lax.scan(body1, (zeros, zeros), row0s)

        def jitter(m):
            mean_diag = jnp.mean(jnp.diagonal(m, axis1=-2, axis2=-1), -1)
            return jnp.maximum(alpha_n, eps_rel * mean_diag)[..., None, None]

        m_pr = pr_cov + diag * jitter(pr_cov)
        w = jnp.linalg.solve(m_pr, jnp.swapaxes(la_pr, -1, -2))

        @jax.checkpoint
        def body2(carry, row0):
            la = views(oh_map, row0)
            pr = views(pr_map, row0)
            res = la - jnp.einsum("bcji,bcjn->bcin", w, pr)
            return carry + jnp.einsum("bcin,bcjn->bcij", res, res), None

        appro_var, _ = jax.lax.scan(body2, zeros, row0s)
        appro_var = 0.5 * (appro_var + jnp.swapaxes(appro_var, -1, -2))

        chol = jnp.linalg.cholesky(appro_var + diag * jitter(appro_var))
        logdet = 2.0 * jnp.sum(
            jnp.log(jnp.diagonal(chol, axis1=-2, axis2=-1) * np.sqrt(n) + 1e-8),
            axis=-1,
        )
        return (0.5 * logdet).astype(jnp.float32)


def rmi_lower_bound(
    onehot: jax.Array,  # [B, H, W, C] one-hot targets (zeros at ignored px)
    probs: jax.Array,  # [B, H, W, C] masked sigmoid probabilities
    *,
    radius: int = 3,
    use_float64: bool = False,
) -> jax.Array:
    """Per-class RMI lower-bound loss, summed over classes (scalar).

    Follows rmi_hiera_triplet_loss.py:489-517 (see ``_rmi_logdet_core``
    for the f32-safe numerics).
    """
    half_d = radius * radius
    la = jax.lax.stop_gradient(_neighborhood_vectors(onehot, radius))  # :500
    pr = _neighborhood_vectors(probs, radius)
    half = _rmi_logdet_core(la, pr, half_d, use_float64)
    rmi_per_class = jnp.mean(half, axis=0) / float(half_d)
    return jnp.sum(rmi_per_class)


@dataclasses.dataclass(frozen=True)
class RMIHieraTripletLoss:
    """3-level composite loss (rmi_hiera_triplet_loss.py:180-546), jittable.

    ``loss = loss_weight * (λ·RMI + 0.5·hieraBCE₃ + CE_f + CE_m + CE_h
             + ready · schedule(step) · triplet_groups)``

    ``upper_ids``/``lower_ids`` default to a hierarchy-derived split
    (``Hierarchy.split_upper_lower``) instead of the reference's
    hardcoded-by-``n_fine>15`` lists (:263-270) — pass them explicitly for
    bit-parity with a specific reference setup.
    """

    hierarchy: Hierarchy
    rmi_radius: int = 3
    rmi_pool_way: int = 0  # stored, never applied — parity with :255-260
    rmi_pool_size: int = 3
    rmi_pool_stride: int = 3
    loss_weight_lambda: float = 0.5
    loss_weight: float = 1.0
    upper_ids: Optional[Tuple[int, ...]] = None
    lower_ids: Optional[Tuple[int, ...]] = None
    max_triplet: int = 200
    margin: float = 0.6
    use_float64: bool = False
    axis_name: Optional[str] = None
    # "bce" (live reference path) | "focal" (the reference's dead
    # 3-level focal made live — losses/focal.py:hiera_focal_three_level)
    hiera_variant: str = "bce"
    focal_gamma: float = 2.0
    # optional (thresh, batch_kept) hard-pixel mining on the per-level CE
    # terms (losses/ohem.py); None = reference behavior (all pixels)
    ohem: Optional[Tuple[float, int]] = None
    # triplet pixel-selection backend: "auto" | "mask" | "sorted"
    # (losses/tree_triplet.py — identical indices, different cost curves)
    selection: str = "auto"

    def __post_init__(self):
        if self.rmi_pool_size != self.rmi_pool_stride:
            raise ValueError("rmi_pool_size must equal rmi_pool_stride (:260)")

    def _groups(self) -> Tuple[Tuple[int, ...], Tuple[int, ...]]:
        if self.upper_ids is not None and self.lower_ids is not None:
            return tuple(self.upper_ids), tuple(self.lower_ids)
        return self.hierarchy.split_upper_lower()

    @property
    def schedule_total_steps(self) -> int:
        # :539 — 160k for Cityscapes-scale hierarchies, 60k for small ones
        return 160_000 if self.hierarchy.n_fine > 15 else 60_000

    def __call__(
        self,
        step: jax.Array,
        embedding: jax.Array,  # [B, h, w, D] L2-normalized
        cls_score_before: jax.Array,  # [B, h', w', n_fine] (unused; parity)
        cls_score: jax.Array,  # [B, H, W, n_f + n_m + n_h]
        label: jax.Array,  # [B, H, W]
    ) -> jax.Array:
        h = self.hierarchy
        n_f, n_m, n_h = h.n_fine, h.n_coarse, h.n_super
        t_fine, t_mid, t_high = prepare_targets_three_level(label, h)

        if self.hiera_variant == "focal":
            from seghiero_tpu.losses.focal import hiera_focal_three_level

            hiera_loss = hiera_focal_three_level(
                cls_score, t_fine, t_mid, t_high, h, gamma=self.focal_gamma
            )
        else:
            hiera_loss = hiera_bce_three_level(cls_score, t_fine, t_mid, t_high, h)

        # RMI on the concatenated per-level one-hots vs masked sigmoids
        # (:479-495). Each level's probs are zeroed at that level's
        # ignored pixels then floored at _CLIP_MIN.
        probs = jax.nn.sigmoid(cls_score.astype(jnp.float32))
        oh_f, valid_f = _one_hot_valid(t_fine, n_f, h.ignore_index)
        oh_m, valid_m = _one_hot_valid(t_mid, n_m, h.ignore_index)
        oh_h, valid_h = _one_hot_valid(t_high, n_h, h.ignore_index)
        onehot_all = jnp.concatenate([oh_f, oh_m, oh_h], axis=-1)
        valid_all = jnp.concatenate(
            [
                jnp.repeat(valid_f[..., None], n_f, axis=-1),
                jnp.repeat(valid_m[..., None], n_m, axis=-1),
                jnp.repeat(valid_h[..., None], n_h, axis=-1),
            ],
            axis=-1,
        ).astype(jnp.float32)
        probs_masked = probs * valid_all + _CLIP_MIN
        rmi = rmi_lower_bound(
            onehot_all, probs_masked, radius=self.rmi_radius,
            use_float64=self.use_float64,
        )

        loss = self.loss_weight_lambda * rmi + 0.5 * hiera_loss

        loss = loss + softmax_cross_entropy(
            cls_score[..., :n_f], t_fine, ohem=self.ohem
        )
        loss = loss + softmax_cross_entropy(
            cls_score[..., n_f : n_f + n_m], t_mid, ohem=self.ohem
        )
        loss = loss + softmax_cross_entropy(
            cls_score[..., n_f + n_m : n_f + n_m + n_h], t_high, ohem=self.ohem
        )

        upper, lower = self._groups()
        triplet, class_count = tree_triplet_loss_groups(
            embedding,
            label,
            upper,
            lower,
            n_f,
            ignore_index=h.ignore_index,
            max_triplet=self.max_triplet,
            margin=self.margin,
            selection=self.selection,
        )
        ready = triplet_readiness(class_count, self.axis_name)
        factor = triplet_schedule_factor(step, self.schedule_total_steps)
        loss = loss + jnp.where(ready, factor * triplet, 0.0)
        return loss * self.loss_weight
