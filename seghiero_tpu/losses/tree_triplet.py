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


def _per_class_first_k(
    lbl: jax.Array, n_fine: int, k: int
) -> Tuple[jax.Array, jax.Array]:
    """First ``k`` flat positions of every fine class via ONE stable sort.

    Replaces ``n_fine`` rows of ``_first_k_selection`` (each a top_k over
    the full pixel axis) with a single ``lax.sort`` of the labels: after a
    stable sort by class id, each class's pixels are contiguous *and in
    flat-position order*, so its first-k is a k-slice at the class offset.
    Out-of-range labels (incl. ignore-255) sort into a trailing bucket.

    Returns ``(idx [n_fine, k], counts [n_fine + 1])``; rows with
    ``counts[c] < k`` hold neighboring classes' positions past lane
    ``counts[c]`` — callers must mask those lanes (same contract as
    ``_first_k_selection``).
    """
    n = lbl.shape[0]
    valid = (lbl >= 0) & (lbl < n_fine)
    key = jnp.where(valid, lbl, n_fine).astype(jnp.int32)
    position = jnp.arange(n, dtype=jnp.int32)
    skey, order = jax.lax.sort((key, position), num_keys=1, is_stable=True)
    # class offsets/counts from the sorted keys (no [n_fine, N] masks)
    class_ids = jnp.arange(n_fine + 2, dtype=jnp.int32)
    bounds = jnp.searchsorted(skey, class_ids, side="left").astype(jnp.int32)
    counts = bounds[1:] - bounds[:-1]  # [n_fine + 1]
    lane = jnp.arange(k, dtype=jnp.int32)
    at = jnp.minimum(bounds[:n_fine, None] + lane[None, :], n - 1)
    return order[at], counts


def _merged_first_k(
    idx_by_class: jax.Array,  # [n_fine, k] ascending positions per class
    counts: jax.Array,  # [n_fine + 1]
    member_rows: np.ndarray,  # [C, m] fine ids per output row, -1 = pad
    k: int,
    n: int,
) -> jax.Array:
    """First ``k`` flat positions of a UNION of per-class first-k lists.

    Exact: any position among the k smallest of the union has at most
    k−1 union positions below it, hence at most k−1 from its own class —
    so it appears in that class's first-k list. Merging the (≤ m) member
    lists and taking the k smallest therefore equals first-k of the full
    union, at [C, m·k] top_k cost instead of [C, N].
    """
    m = member_rows.shape[1]
    safe = np.maximum(member_rows, 0)
    cand = idx_by_class[safe]  # [C, m, k]
    lane = jnp.arange(k, dtype=jnp.int32)
    cand_valid = (lane[None, None, :] < counts[safe][:, :, None]) & (
        jnp.asarray(member_rows >= 0)[:, :, None]
    )
    merged = jnp.where(cand_valid, cand, n).reshape(len(member_rows), m * k)
    # m ≥ 1 (every row has at least one member column), so the merged
    # width m·k is never narrower than k and top_k needs no pad branch
    assert merged.shape[-1] >= k, (merged.shape, k)
    # k smallest positions, ascending (== first-k in flat order)
    _, mi = jax.lax.top_k(-merged, k)
    sel = jnp.take_along_axis(merged, mi, axis=-1)
    return jnp.minimum(sel, n - 1)


def _triplet_from_indices(
    feats: jax.Array,  # [N, D] L2-normalized embeddings
    idx_a: jax.Array,  # [C, k] ascending flat positions
    idx_p: jax.Array,
    idx_n: jax.Array,
    min_size: jax.Array,  # [C]
    max_triplet: int,
    margin: float,
) -> Tuple[jax.Array, jax.Array]:
    """Shared fixed-size triplet computation. Returns (loss, class_count)."""
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


def _triplet_core(
    feats: jax.Array,  # [N, D] L2-normalized embeddings
    anchor_mask: jax.Array,  # [C, N]
    pos_mask: jax.Array,  # [C, N]
    neg_mask: jax.Array,  # [C, N]
    max_triplet: int,
    margin: float,
) -> Tuple[jax.Array, jax.Array]:
    """Mask-based selection path (one top_k row per class and mask)."""
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
    return _triplet_from_indices(
        feats, idx_a, idx_p, idx_n, min_size, max_triplet, margin
    )


# Static crossover between the mask path (3·C top_k rows over N pixels)
# and the sorted path (one lax.sort + small merges). Measured on the v5e
# (32k pixels, k=200, fwd+grad): mask 13.2 ms vs sorted 4.2 ms at C=150;
# mask 2.26 ms vs sorted 1.11 ms at C=19 — the sort path wins everywhere
# the per-class top_k rows dominate the fixed sort cost. Below ~16
# classes both are sub-ms and the mask path avoids the sort's fixed
# cost. See docs/DESIGN.md (round 3, decision 22).
SORTED_SELECTION_MIN_CLASSES = 16


def tree_triplet_loss_range(
    embedding: jax.Array,  # [B, h, w, D], L2-normalized over D
    labels: jax.Array,  # [B, H, W] fine ids or 255
    hierarchy: Hierarchy,
    *,
    max_triplet: int = 200,
    margin: float = 0.6,
    exclude_ignore_from_neg: bool = False,
    selection: str = "auto",
) -> Tuple[jax.Array, jax.Array]:
    """Range variant (tree_triplet_loss.py:6-65).

    ``exclude_ignore_from_neg=False`` reproduces the reference exactly:
    its negative mask ``(labels < start) | (labels >= end)``
    (tree_triplet_loss.py:36) admits ignore-255 pixels as negatives.

    ``selection`` picks the index-selection backend — ``"mask"`` (per-class
    top_k rows), ``"sorted"`` (one stable sort + bucket merges; identical
    selected pixels, cheaper at many classes), or ``"auto"`` (static
    crossover at ``SORTED_SELECTION_MIN_CLASSES``).
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
    if selection == "auto":
        selection = (
            "sorted" if n_fine >= SORTED_SELECTION_MIN_CLASSES else "mask"
        )

    if selection == "mask":
        starts = np.array(
            [
                hierarchy.coarse_ranges[hierarchy.fine_to_coarse[c]][0]
                for c in range(n_fine)
            ]
        )
        ends = np.array(
            [
                hierarchy.coarse_ranges[hierarchy.fine_to_coarse[c]][1]
                for c in range(n_fine)
            ]
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

    if selection != "sorted":
        raise ValueError(f"selection must be auto|mask|sorted, got {selection!r}")

    n = lbl.shape[0]
    k = min(max_triplet, n)
    f2c = np.asarray(hierarchy.fine_to_coarse)
    n_coarse = hierarchy.n_coarse

    idx_by_class, counts = _per_class_first_k(lbl, n_fine, k)

    # counts per bucket / per class (no [n_fine, N] masks needed)
    bucket_totals = jnp.zeros(n_coarse, jnp.int32).at[f2c].add(counts[:n_fine])
    n_anchor = counts[:n_fine]
    n_pos = bucket_totals[f2c] - n_anchor
    n_neg = n - bucket_totals[f2c]
    if exclude_ignore_from_neg:
        n_neg = n_neg - jnp.sum(lbl == hierarchy.ignore_index).astype(jnp.int32)
    min_size = jnp.minimum(jnp.minimum(n_anchor, n_pos), jnp.minimum(n_neg, k))

    # positives: first-k of (own bucket minus own class), via exact merge
    max_b = max(len(m) for m in hierarchy.fine_by_coarse)
    member_rows = np.full((n_fine, max(max_b - 1, 1)), -1, dtype=np.int64)
    for c in range(n_fine):
        others = [p for p in hierarchy.fine_by_coarse[f2c[c]] if p != c]
        member_rows[c, : len(others)] = others
    idx_p = _merged_first_k(idx_by_class, counts, member_rows, k, n)

    # negatives: identical for every class of a bucket — n_coarse top_k
    # rows instead of n_fine
    bstarts = np.array([r[0] for r in hierarchy.coarse_ranges])
    bends = np.array([r[1] for r in hierarchy.coarse_ranges])
    neg_mask = ~(
        (lbl[None, :] >= bstarts[:, None]) & (lbl[None, :] < bends[:, None])
    )
    if exclude_ignore_from_neg:
        neg_mask = neg_mask & (lbl[None, :] != hierarchy.ignore_index)
    idx_n = _first_k_selection(neg_mask, k)[f2c]

    return _triplet_from_indices(
        feats, idx_by_class, idx_p, idx_n, min_size, k, margin
    )


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
    selection: str = "auto",
) -> Tuple[jax.Array, jax.Array]:
    """Group variant (rmi_tree_triplet_loss.py:5-70).

    For anchor class c in ``upper_ids``: positives = other upper ids,
    negatives = lower ids (and vice versa). Classes in neither group —
    including background 0, which the reference skips explicitly
    (rmi_tree_triplet_loss.py:28) — contribute nothing (the reference
    would crash on them; divergence documented in module docstring).

    ``selection`` as in :func:`tree_triplet_loss_range`: the sorted path
    selects identical pixels from one stable sort plus group merges
    (positives merge the ≤·|group| per-class lists; both groups' negative
    rows are shared, so only two merges are needed).
    """
    embedding = jnp.asarray(embedding)
    labels = jnp.asarray(labels)
    B, h, w, D = embedding.shape
    lbl = downsample_labels_nearest(labels, (h, w)).reshape(-1)
    feats = embedding.reshape(-1, D)

    upper = sorted(int(i) for i in upper_ids)
    lower = sorted(int(i) for i in lower_ids)
    # validate once at entry so BOTH backends fail loudly on bad ids —
    # the numpy pos_lut fill raises IndexError but JAX gathers in the
    # sorted path clamp silently, yielding wrong counts instead
    bad = [i for i in upper + lower if not 0 <= i < n_fine]
    if bad:
        raise ValueError(
            f"triplet group ids out of range [0, {n_fine}): {sorted(bad)}"
        )
    listed = upper + lower
    if not listed:
        zero = jnp.zeros((), jnp.float32)
        return zero, jnp.zeros((), jnp.int32)

    C = len(listed)
    if selection == "auto":
        selection = "sorted" if C >= SORTED_SELECTION_MIN_CLASSES else "mask"

    if selection == "mask":
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

    if selection != "sorted":
        raise ValueError(f"selection must be auto|mask|sorted, got {selection!r}")

    n = lbl.shape[0]
    k = min(max_triplet, n)
    # map ignore_index into the invalid bucket even if it were < n_fine
    lbl_sel = jnp.where(lbl == ignore_index, n_fine, lbl)
    idx_by_class, counts = _per_class_first_k(lbl_sel, n_fine, k)

    listed_np = np.array(listed)
    group_of = np.array([0 if c in upper else 1 for c in listed])  # [C]
    group_sum = jnp.stack(
        [
            jnp.sum(counts[np.array(upper, dtype=np.int64)]) if upper else jnp.int32(0),
            jnp.sum(counts[np.array(lower, dtype=np.int64)]) if lower else jnp.int32(0),
        ]
    )
    n_anchor = counts[listed_np]
    n_pos = group_sum[group_of] - n_anchor
    n_neg = group_sum[1 - group_of]
    min_size = jnp.minimum(jnp.minimum(n_anchor, n_pos), jnp.minimum(n_neg, k))

    idx_a = idx_by_class[listed_np]

    # positives: merge own group's per-class lists, excluding own class
    m = max(max(len(upper), len(lower)) - 1, 1)
    member_rows = np.full((C, m), -1, dtype=np.int64)
    for row, c in enumerate(listed):
        group = upper if c in upper else lower
        others = [p for p in group if p != c]
        member_rows[row, : len(others)] = others
    idx_p = _merged_first_k(idx_by_class, counts, member_rows, k, n)

    # negatives: one shared row per group (first-k of the OTHER group)
    mg = max(len(upper), len(lower), 1)
    neg_rows = np.full((2, mg), -1, dtype=np.int64)
    neg_rows[0, : len(lower)] = lower  # anchors in upper draw from lower
    neg_rows[1, : len(upper)] = upper
    idx_n = _merged_first_k(idx_by_class, counts, neg_rows, k, n)[group_of]

    return _triplet_from_indices(feats, idx_a, idx_p, idx_n, min_size, k, margin)


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
