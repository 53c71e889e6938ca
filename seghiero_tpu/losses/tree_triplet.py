"""Tree-triplet embedding losses, jit-compatible.

Rebuilds both reference variants as pure functions with *static shapes*:

  * range variant (models/loss/tree_triplet_loss.py:6-65): for each fine
    class present, positives are same-coarse-bucket pixels, negatives are
    out-of-bucket pixels (note: this includes ignore-255 pixels — kept
    for parity, see ``exclude_ignore_from_neg``), cosine distances on the
    L2-normalized embedding, margin 0.6, ≤200 triplets per class.

  * group variant (models/loss/rmi_tree_triplet_loss.py:5-70): positives/
    negatives come from two explicit fine-id groups ("upper"/"lower");
    background class 0 is skipped. The reference *hardcodes* the groups by
    ``n_fine>15`` (rmi_hiera_triplet_loss.py:263-270) and crashes on any
    class in neither group (``list.remove``); we take the groups as
    arguments (derivable from the hierarchy via
    ``Hierarchy.split_upper_lower``) and skip unlisted classes.

TPU design notes: the reference's data-dependent boolean fancy-indexing
("first ``min_size`` pixels of each mask", tree_triplet_loss.py:38-46)
cannot be jitted. We reproduce it exactly with a fixed-size selection:
score each pixel ``mask * (N - position)`` and take ``top_k`` — the k
highest scores are precisely the first k masked pixels in flat order —
then mask out lanes past ``min_size``. Everything is vectorized over
classes; nothing depends on runtime values except through ``where``.

Returns (loss, class_count) like the reference; ``class_count == 0``
implies ``loss == 0`` (the reference returns ``None`` — the caller's
readiness gate must check the count, not the loss).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from seghiero_tpu.hierarchy import Hierarchy
from seghiero_tpu.ops.resize import downsample_labels_nearest


def _first_k_selection(mask: jax.Array, k: int) -> jax.Array:
    """Indices of the first ``k`` True positions per row of ``mask`` [C, N].

    Rows with fewer than k True entries return arbitrary trailing indices;
    callers must mask lanes ``i >= count``.
    """
    n = mask.shape[-1]
    position = jnp.arange(n, dtype=jnp.int32)
    scores = jnp.where(mask, n - position, 0).astype(jnp.int32)
    _, idx = jax.lax.top_k(scores, k)  # descending score == ascending position
    return idx


def _triplet_core(
    feats: jax.Array,  # [N, D] L2-normalized embeddings
    anchor_mask: jax.Array,  # [C, N]
    pos_mask: jax.Array,  # [C, N]
    neg_mask: jax.Array,  # [C, N]
    max_triplet: int,
    margin: float,
) -> Tuple[jax.Array, jax.Array]:
    """Shared fixed-size triplet computation. Returns (loss, class_count)."""
    max_triplet = min(max_triplet, anchor_mask.shape[-1])  # k ≤ N for top_k
    n_anchor = jnp.sum(anchor_mask, axis=-1)
    n_pos = jnp.sum(pos_mask, axis=-1)
    n_neg = jnp.sum(neg_mask, axis=-1)
    min_size = jnp.minimum(
        jnp.minimum(n_anchor, n_pos), jnp.minimum(n_neg, max_triplet)
    )  # [C]

    idx_a = _first_k_selection(anchor_mask, max_triplet)  # [C, k]
    idx_p = _first_k_selection(pos_mask, max_triplet)
    idx_n = _first_k_selection(neg_mask, max_triplet)

    fa = feats[idx_a]  # [C, k, D]
    fp = feats[idx_p]
    fn = feats[idx_n]

    # cosine distances (embeddings are unit-norm): 1 - a·p vs 1 - a·n
    d_pos = 1.0 - jnp.sum(fa * fp, axis=-1)  # [C, k]
    d_neg = 1.0 - jnp.sum(fa * fn, axis=-1)
    tl = jax.nn.relu(d_pos - d_neg + margin)

    lane = jnp.arange(max_triplet, dtype=jnp.int32)[None, :]
    lane_valid = lane < min_size[:, None]
    per_class = jnp.sum(jnp.where(lane_valid, tl, 0.0), axis=-1) / jnp.maximum(
        min_size.astype(jnp.float32), 1.0
    )

    has = min_size > 0
    class_count = jnp.sum(has.astype(jnp.int32))
    loss = jnp.sum(jnp.where(has, per_class, 0.0)) / jnp.maximum(
        class_count.astype(jnp.float32), 1.0
    )
    return loss, class_count


def tree_triplet_loss_range(
    embedding: jax.Array,  # [B, h, w, D], L2-normalized over D
    labels: jax.Array,  # [B, H, W] fine ids or 255
    hierarchy: Hierarchy,
    *,
    max_triplet: int = 200,
    margin: float = 0.6,
    exclude_ignore_from_neg: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """Range variant (tree_triplet_loss.py:6-65).

    ``exclude_ignore_from_neg=False`` reproduces the reference exactly:
    its negative mask ``(labels < start) | (labels >= end)``
    (tree_triplet_loss.py:36) admits ignore-255 pixels as negatives.
    """
    if hierarchy.coarse_ranges is None:
        raise ValueError(
            "range-variant triplet loss requires contiguous coarse buckets; "
            "use tree_triplet_loss_groups for general hierarchies"
        )
    embedding = jnp.asarray(embedding)
    labels = jnp.asarray(labels)
    B, h, w, D = embedding.shape
    lbl = downsample_labels_nearest(labels, (h, w)).reshape(-1)  # [N]
    feats = embedding.reshape(-1, D)

    n_fine = hierarchy.n_fine
    starts = np.array(
        [hierarchy.coarse_ranges[hierarchy.fine_to_coarse[c]][0] for c in range(n_fine)]
    )
    ends = np.array(
        [hierarchy.coarse_ranges[hierarchy.fine_to_coarse[c]][1] for c in range(n_fine)]
    )
    classes = np.arange(n_fine)

    lblr = lbl[None, :]
    anchor = lblr == classes[:, None]
    in_bucket = (lblr >= starts[:, None]) & (lblr < ends[:, None])
    pos = in_bucket & ~anchor
    neg = ~in_bucket
    if exclude_ignore_from_neg:
        neg = neg & (lblr != hierarchy.ignore_index)

    return _triplet_core(feats, anchor, pos, neg, max_triplet, margin)


def tree_triplet_loss_groups(
    embedding: jax.Array,  # [B, h, w, D]
    labels: jax.Array,  # [B, H, W]
    upper_ids: Sequence[int],
    lower_ids: Sequence[int],
    n_fine: int,
    *,
    ignore_index: int = 255,
    max_triplet: int = 200,
    margin: float = 0.6,
) -> Tuple[jax.Array, jax.Array]:
    """Group variant (rmi_tree_triplet_loss.py:5-70).

    For anchor class c in ``upper_ids``: positives = other upper ids,
    negatives = lower ids (and vice versa). Classes in neither group —
    including background 0, which the reference skips explicitly
    (rmi_tree_triplet_loss.py:28) — contribute nothing (the reference
    would crash on them; divergence documented in module docstring).
    """
    embedding = jnp.asarray(embedding)
    labels = jnp.asarray(labels)
    B, h, w, D = embedding.shape
    lbl = downsample_labels_nearest(labels, (h, w)).reshape(-1)
    feats = embedding.reshape(-1, D)

    upper = sorted(int(i) for i in upper_ids)
    lower = sorted(int(i) for i in lower_ids)
    listed = upper + lower
    if not listed:
        zero = jnp.zeros((), jnp.float32)
        return zero, jnp.zeros((), jnp.int32)

    C = len(listed)
    pos_lut = np.zeros((C, n_fine), dtype=bool)
    neg_lut = np.zeros((C, n_fine), dtype=bool)
    for row, c in enumerate(listed):
        group, other = (upper, lower) if c in upper else (lower, upper)
        for p in group:
            if p != c:
                pos_lut[row, p] = True
        for q in other:
            neg_lut[row, q] = True

    valid_lbl = (lbl >= 0) & (lbl < n_fine) & (lbl != ignore_index)
    safe = jnp.where(valid_lbl, lbl, 0)
    anchor = (lbl[None, :] == np.array(listed)[:, None]) & valid_lbl[None, :]
    pos = jnp.asarray(pos_lut)[:, safe] & valid_lbl[None, :]
    neg = jnp.asarray(neg_lut)[:, safe] & valid_lbl[None, :]

    return _triplet_core(feats, anchor, pos, neg, max_triplet, margin)


def triplet_schedule_factor(step: jax.Array, total_steps: int) -> jax.Array:
    """Cosine ramp of the triplet weight (hiera_triplet_loss.py:203-208):
    ``0.25 * (1 + cos((step - T)/T * pi))`` before ``T`` steps, else 0.5.
    """
    s = step.astype(jnp.float32)
    t = float(total_steps)
    ramp = 0.25 * (1.0 + jnp.cos((s - t) / t * jnp.pi))
    return jnp.where(s < t, ramp, 0.5)


def triplet_readiness(class_count: jax.Array, axis_name: Optional[str]) -> jax.Array:
    """The one semantically-required cross-replica collective.

    The reference gates the triplet term on *every* DDP rank having found
    at least one triplet class (all_gather of class_count,
    hiera_triplet_loss.py:193-200). On a TPU mesh this is a ``pmin`` over
    the data axis inside the jitted loss. With ``axis_name=None``
    (single replica / global-batch semantics) it reduces to
    ``class_count > 0``.
    """
    local_ready = (class_count > 0).astype(jnp.int32)
    if axis_name is None:
        return local_ready > 0
    return jax.lax.pmin(local_ready, axis_name) > 0
