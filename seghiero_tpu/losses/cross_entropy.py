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

from typing import Optional

import jax
import jax.numpy as jnp


def softmax_cross_entropy(
    logits: jax.Array,
    labels: jax.Array,
    *,
    ignore_index: int = 255,
    class_weight: Optional[jax.Array] = None,
    reduction: str = "mean",
    avg_factor: Optional[float] = None,
    divide_by: str = "all",
    loss_weight: float = 1.0,
) -> jax.Array:
    """Cross entropy on ``logits`` [..., C] vs integer ``labels`` [...].

    Args:
      logits: [..., C] raw scores (channels last).
      labels: [...] int labels in [0, C) or ``ignore_index``.
      class_weight: optional [C] per-class rescaling (torch ``weight=``).
      reduction: 'none' | 'mean' | 'sum'.
      avg_factor: with 'mean', divide the summed loss by this instead
        (utils.py:45-54).
      divide_by: 'all' (mmseg wrapper parity) or 'valid' (torch default
        CE parity); only used when reduction='mean' and avg_factor=None.
    """
    num_classes = logits.shape[-1]
    valid = labels != ignore_index
    safe = jnp.where(valid, labels, 0)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, safe[..., None], axis=-1)[..., 0]
    if class_weight is not None:
        class_weight = jnp.asarray(class_weight, jnp.float32)
        w = class_weight[safe]
        nll = nll * w
    nll = jnp.where(valid, nll, 0.0)

    if reduction == "none":
        return loss_weight * nll
    total = jnp.sum(nll)
    if reduction == "sum":
        return loss_weight * total
    if reduction != "mean":
        raise ValueError(f"unknown reduction {reduction!r}")
    if avg_factor is not None:
        return loss_weight * total / avg_factor
    if divide_by == "all":
        denom = jnp.asarray(nll.size, jnp.float32)
    elif divide_by == "valid":
        if class_weight is not None:
            # torch 'mean' divides by the sum of weights at valid pixels
            denom = jnp.maximum(jnp.sum(jnp.where(valid, class_weight[safe], 0.0)), 1e-12)
        else:
            denom = jnp.maximum(jnp.sum(valid.astype(jnp.float32)), 1.0)
    else:
        raise ValueError(f"divide_by must be 'all' or 'valid', got {divide_by!r}")
    return loss_weight * total / denom
