"""Optional per-level segmentation losses — Dice and Lovász-Softmax.

The reference's loss menu is fixed (CE + hierarchy BCE + triplet
[+ RMI]); these are the two standard extras segmentation users reach
for first, added to the total via config::

    training:
      extra_losses:
        - {type: dice,   level: fine,   weight: 0.5}
        - {type: lovasz, level: coarse, weight: 0.3}

Both consume the full-resolution logits slice of one hierarchy level
and that level's targets (derived from the fine mask by the same LUTs
the main loss uses), with 255-ignore masking.

TPU notes: Dice is pure elementwise + reductions (one fused pass).
Lovász-Softmax needs a per-class descending sort of the per-pixel
errors — expressed as ONE batched ``jnp.argsort`` over a [C, N] array
(XLA sorts all classes in parallel) and cumulative sums, no Python
per-class loop, no dynamic shapes; ignored pixels contribute
zero-valued errors, which both sort to the tail and multiply zero in
the final dot, so masking needs no compaction.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from seghiero_tpu.hierarchy import IGNORE_INDEX


def dice_loss(
    logits: jax.Array,
    labels: jax.Array,
    n_classes: int,
    ignore_index: int = IGNORE_INDEX,
    eps: float = 1.0,
) -> jax.Array:
    """Soft multi-class Dice (Milletari et al., arXiv:1606.04797 form):
    ``1 − mean_c (2·Σ p_c·t_c + eps) / (Σ p_c + Σ t_c + eps)`` over the
    classes present in ``labels`` (plus any the model predicts mass for),
    sums over batch+spatial, ignored pixels excluded from both terms.

    logits [B, H, W, C] (any float dtype), labels [B, H, W] int.
    """
    valid = (labels >= 0) & (labels < n_classes)
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    probs = probs * valid[..., None]
    t = jax.nn.one_hot(
        jnp.where(valid, labels, 0), n_classes, dtype=jnp.float32
    ) * valid[..., None]
    inter = jnp.sum(probs * t, axis=(0, 1, 2))  # [C]
    denom = jnp.sum(probs, axis=(0, 1, 2)) + jnp.sum(t, axis=(0, 1, 2))
    dice = (2.0 * inter + eps) / (denom + eps)
    return 1.0 - jnp.mean(dice)


def lovasz_softmax(
    logits: jax.Array,
    labels: jax.Array,
    n_classes: int,
    ignore_index: int = IGNORE_INDEX,
) -> jax.Array:
    """Lovász-Softmax (Berman et al., arXiv:1705.08790), "present"
    class averaging, whole-batch flattening (per_image=False).

    For each class c: errors ``e = |1{y=c} − p_c|`` over all valid
    pixels, sorted descending; the loss is ``⟨sorted e, ∇Lovász(IoU_c)⟩``
    where the gradient comes from the Jaccard extension's cumulative
    sums. Averaged over classes present in ``labels``.

    logits [B, H, W, C], labels [B, H, W] int. All shapes static; the
    sort is one batched [C, N] argsort.
    """
    valid = (labels >= 0) & (labels < n_classes)
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    fg = jax.nn.one_hot(
        jnp.where(valid, labels, 0), n_classes, dtype=jnp.float32
    ) * valid[..., None]

    # [C, N] class-major flattening
    v = valid.reshape(-1)
    e = jnp.abs(fg - probs).reshape(-1, n_classes).T * v[None, :]
    gt = fg.reshape(-1, n_classes).T  # ignored rows already zeroed

    order = jnp.argsort(-e, axis=1)  # descending per class
    e_s = jnp.take_along_axis(e, order, axis=1)
    gt_s = jnp.take_along_axis(gt, order, axis=1)

    gts = jnp.sum(gt_s, axis=1, keepdims=True)  # [C, 1]
    inter = gts - jnp.cumsum(gt_s, axis=1)
    union = gts + jnp.cumsum(1.0 - gt_s, axis=1)
    jacc = 1.0 - inter / jnp.maximum(union, 1.0)
    grad = jnp.concatenate([jacc[:, :1], jacc[:, 1:] - jacc[:, :-1]], axis=1)
    per_class = jnp.sum(e_s * grad, axis=1)  # [C]

    present = gts[:, 0] > 0
    n_present = jnp.maximum(jnp.sum(present), 1.0)
    return jnp.sum(jnp.where(present, per_class, 0.0)) / n_present


LOSS_FNS = {"dice": dice_loss, "lovasz": lovasz_softmax}


def extra_losses_total(
    specs,
    logits_full: jax.Array,
    fine_labels: jax.Array,
    hierarchy,
) -> jax.Array:
    """Sum of the configured ``training.extra_losses`` terms.

    ``logits_full`` [B, H, W, total_classes] at label resolution;
    per-level channel slices and targets follow the main loss's layout
    (fine | coarse | super) and LUT derivations.
    """
    from seghiero_tpu.losses.hiera import lut_lookup

    slices = hierarchy.level_slices  # ((lo, hi), ...) fine, coarse[, super]
    level_idx = {"fine": 0, "coarse": 1, "super": 2}
    total = jnp.zeros((), jnp.float32)
    valid = (fine_labels >= 0) & (fine_labels < hierarchy.n_fine)
    safe = jnp.where(valid, fine_labels, 0)
    for spec in specs:
        level = spec["level"]
        lo, hi = slices[level_idx[level]]
        if level == "fine":
            labels = fine_labels
        else:
            lut = (
                hierarchy.fine_to_coarse
                if level == "coarse"
                else hierarchy.fine_to_super
            )
            labels = jnp.where(
                valid, lut_lookup(lut, safe), hierarchy.ignore_index
            ).astype(fine_labels.dtype)
        fn = LOSS_FNS[spec["type"]]
        term = fn(
            logits_full[..., lo:hi], labels, hi - lo, hierarchy.ignore_index
        )
        total = total + jnp.float32(spec.get("weight", 1.0)) * term
    return total
