"""Per-level softmax cross-entropy with ignore-index masking.

Rebuilds the reference's mmseg-style CE wrapper
(models/loss/cross_entropy_loss.py:7-30,136-195 + utils.py:26-55) as a
pure function on NHWC logits.

Averaging semantics — an important, non-obvious parity detail:

  * The reference's ``CrossEntropyLoss`` calls
    ``F.cross_entropy(reduction='none', ignore_index=255)`` (per-pixel
    losses, zeros at ignored pixels) and then reduces with a plain
    ``.mean()`` over ALL pixels (utils.py:20-21 via
    cross_entropy_loss.py:17-28). The divisor is the TOTAL pixel count,
    ignored pixels included → ``divide_by="all"``.

  * The aux-head criterion is vanilla ``nn.CrossEntropyLoss
    (ignore_index=255)`` (train.py:236) whose default 'mean' divides by
    the count of NON-ignored pixels only → ``divide_by="valid"``.

Both are exposed via ``divide_by``.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def _weight_reduce(
    loss: jax.Array,
    weight: Optional[jax.Array],
    reduction: str,
    avg_factor: Optional[float],
    valid_denom: Optional[jax.Array] = None,
) -> jax.Array:
    """utils.py:26-55 of the reference: optional element-wise weight, then
    none/mean/sum reduction with optional avg_factor override."""
    if weight is not None:
        loss = loss * weight.astype(jnp.float32)
    if reduction == "none":
        return loss
    total = jnp.sum(loss)
    if reduction == "sum":
        return total
    if reduction != "mean":
        raise ValueError(f"unknown reduction {reduction!r}")
    if avg_factor is not None:
        return total / avg_factor
    denom = valid_denom if valid_denom is not None else jnp.asarray(loss.size, jnp.float32)
    return total / denom


def softmax_cross_entropy(
    logits: jax.Array,
    labels: jax.Array,
    *,
    weight: Optional[jax.Array] = None,
    ignore_index: int = 255,
    class_weight: Optional[jax.Array] = None,
    reduction: str = "mean",
    avg_factor: Optional[float] = None,
    divide_by: str = "all",
    loss_weight: float = 1.0,
    ohem: Optional[Tuple[float, int]] = None,
) -> jax.Array:
    """Cross entropy on ``logits`` [..., C] vs integer ``labels`` [...].

    Args:
      logits: [..., C] raw scores (channels last).
      labels: [...] int labels in [0, C) or ``ignore_index``.
      weight: optional per-element loss weight (cross_entropy_loss.py:25-28).
      class_weight: optional [C] per-class rescaling (torch ``weight=``).
      reduction: 'none' | 'mean' | 'sum'.
      avg_factor: with 'mean', divide the summed loss by this instead
        (utils.py:45-54).
      divide_by: 'all' (mmseg wrapper parity) or 'valid' (torch default
        CE parity); only used when reduction='mean' and avg_factor=None.
      ohem: optional ``(thresh, batch_kept)`` hard-pixel mining — the
        kept-pixel 0/1 mask (losses/ohem.py) multiplies into ``weight``.
    """
    valid = labels != ignore_index
    safe = jnp.where(valid, labels, 0)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, safe[..., None], axis=-1)[..., 0]
    if ohem is not None:
        from seghiero_tpu.losses.ohem import ohem_pixel_weight

        w = ohem_pixel_weight(jnp.exp(-nll), valid, ohem[0], ohem[1])
        weight = w if weight is None else weight * w
    if class_weight is not None:
        class_weight = jnp.asarray(class_weight, jnp.float32)
        nll = nll * class_weight[safe]
    nll = jnp.where(valid, nll, 0.0)

    if divide_by == "all" or reduction != "mean" or avg_factor is not None:
        valid_denom = None
    elif divide_by == "valid":
        if class_weight is not None:
            # torch 'mean' divides by the sum of weights at valid pixels
            valid_denom = jnp.maximum(
                jnp.sum(jnp.where(valid, class_weight[safe], 0.0)), 1e-12
            )
        elif ohem is not None:
            # 'valid' semantics under OHEM: average over the KEPT pixels
            valid_denom = jnp.maximum(jnp.sum(weight), 1.0)
        else:
            valid_denom = jnp.maximum(jnp.sum(valid.astype(jnp.float32)), 1.0)
    else:
        raise ValueError(f"divide_by must be 'all' or 'valid', got {divide_by!r}")
    return loss_weight * _weight_reduce(nll, weight, reduction, avg_factor, valid_denom)


def binary_cross_entropy(
    logits: jax.Array,
    labels: jax.Array,
    *,
    weight: Optional[jax.Array] = None,
    ignore_index: int = 255,
    class_weight: Optional[jax.Array] = None,
    reduction: str = "mean",
    avg_factor: Optional[float] = None,
    loss_weight: float = 1.0,
) -> jax.Array:
    """Sigmoid-mode CE (cross_entropy_loss.py:55-95, ``use_sigmoid=True``).

    Two input forms, mirroring the reference:
      * ``labels`` same shape as ``logits``: element-wise BCE-with-logits
        (``class_weight`` acts as torch ``pos_weight``).
      * ``labels`` one dim short (class indices): labels are expanded to
        one-hot with ignore-index masking folded into the element weight
        (``_expand_onehot_labels``, cross_entropy_loss.py:33-52).
    """
    logits = logits.astype(jnp.float32)
    if labels.ndim == logits.ndim - 1:
        # channel axis position differs by rank (NC vs NCHW in the
        # reference); ours is channels-last for both
        valid = ((labels >= 0) & (labels != ignore_index))[..., None]
        safe = jnp.where(valid[..., 0], labels, 0)
        onehot = jax.nn.one_hot(safe, logits.shape[-1], dtype=jnp.float32)
        onehot = onehot * valid
        w = valid.astype(jnp.float32)
        if weight is not None:
            w = w * weight[..., None].astype(jnp.float32)
        labels, weight = onehot, w
    labels = labels.astype(jnp.float32)
    # BCE with logits, optional pos_weight on the positive term
    log_p = -jax.nn.softplus(-logits)  # log sigmoid
    log_np = -jax.nn.softplus(logits)  # log (1 - sigmoid)
    pos = labels * log_p
    if class_weight is not None:
        pos = pos * jnp.asarray(class_weight, jnp.float32)
    loss = -(pos + (1.0 - labels) * log_np)
    return loss_weight * _weight_reduce(loss, weight, reduction, avg_factor)


def mask_cross_entropy(
    logits: jax.Array,
    target: jax.Array,
    label: jax.Array,
    *,
    class_weight: Optional[jax.Array] = None,
    loss_weight: float = 1.0,
) -> jax.Array:
    """Mask-mode CE (cross_entropy_loss.py:98-133, ``use_mask=True``):
    per-ROI binary CE on the channel selected by ``label``.

    logits [N, H, W, C]; target [N, H, W] binary; label [N] int.
    """
    logits = logits.astype(jnp.float32)
    n = logits.shape[0]
    sel = logits[jnp.arange(n), ..., label]  # [N, H, W]
    log_p = -jax.nn.softplus(-sel)
    log_np = -jax.nn.softplus(sel)
    loss = -(target * log_p + (1.0 - target) * log_np)
    if class_weight is not None:
        loss = loss * jnp.asarray(class_weight, jnp.float32)[label][:, None, None]
    return loss_weight * jnp.mean(loss)
