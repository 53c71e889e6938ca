"""TPU-optimized composite losses (C-major layout).

The parity implementations in losses/hiera.py & losses/rmi.py follow the
framework-wide NHWC convention. For the *loss* tensors that convention is
hostile to TPU tiling: the minor-most (lane) dimension is the class axis
(C ≈ 13-31), which the hardware pads to 128 lanes — every full-resolution
f32 pass then moves ~10× the useful bytes. Measured on a v5e at 512²/b8,
the composite loss cost 87 ms inside the train step; transposing once at
LOW resolution (a [B, h/4, w/4, C] read) and doing the resize, hierarchy
algebra, CE and one-hot-free gathers in [B, C, H, W] cuts the whole train
step from ~153 ms to ~88 ms.

Equivalence with the NHWC parity implementations is asserted in
tests/test_fast_losses.py (same math, different layout/associativity:
tolerances ~1e-5). The trainer uses this path by default
(``training.fast_losses``); the NHWC modules remain the reference-parity
oracles.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from seghiero_tpu.hierarchy import Hierarchy
from seghiero_tpu.losses.hiera import (
    _log_one_minus_sig_eps,
    _log_sig_eps,
    prepare_targets_three_level,
    prepare_targets_two_level,
)
from seghiero_tpu.losses.rmi import _CLIP_MIN, _POS_ALPHA
from seghiero_tpu.losses.tree_triplet import (
    tree_triplet_loss_groups,
    tree_triplet_loss_range,
    triplet_readiness,
    triplet_schedule_factor,
)


def _resize_cmajor(x: jax.Array, hw) -> jax.Array:
    B, C = x.shape[:2]
    return jax.image.resize(x, (B, C, hw[0], hw[1]), "linear", antialias=False)


def _class_iota(n: int) -> jax.Array:
    return jnp.arange(n)[None, :, None, None]


def _pick_channel(x, t_safe):
    """``x[b, t[b,h,w], h, w]`` as a fused broadcast-compare reduction.

    Full-res gathers are ~10× slower than compare-select on TPU (see
    lut_lookup); the masked sum reads ``x`` once and its backward is a
    masked broadcast write — no scatter. ``t_safe`` must be in
    ``[0, x.shape[1])`` (callers pass 0 for ignore pixels and mask the
    result downstream, so the picked value there is irrelevant)."""
    n = x.shape[1]
    return jnp.sum(
        jnp.where(t_safe[:, None] == _class_iota(n), x, 0.0), axis=1
    )


def _masked_level_bce(pos_l, neg_l, targets, n, ignore_index, eps):
    """Σ_valid(-oh·log σ(pos) − (1−oh)·log(1−σ(neg))) / (n_valid · n),
    with the one-hot as a fused broadcast-compare on the C axis.
    ``pos_l`` full-width; kept for callers that already materialize the
    positive composite (focal path). The BCE levels use the picked form
    below."""
    valid = (targets != ignore_index)[:, None]  # [B,1,H,W]
    safe = jnp.where(valid[:, 0], targets, 0)[:, None]  # [B,1,H,W]
    oh = safe == _class_iota(n)  # [B,n,H,W] bool, fused
    nv = jnp.maximum(jnp.sum(valid.astype(jnp.float32)), 1.0)
    term = jnp.where(oh, _log_sig_eps(pos_l, eps), _log_one_minus_sig_eps(neg_l, eps))
    return jnp.sum(jnp.where(valid, -term, 0.0)) / (nv * n)


def _masked_level_bce_pick(pos_at_lbl, neg_l, targets, n, ignore_index, eps):
    """Same sum as ``_masked_level_bce`` with the positive side already
    picked at the label channel: per valid pixel the C-sum collapses to
    ``log σ(pos)[lbl] + Σ_c log(1−σ(neg_c)) − log(1−σ(neg))[lbl]``.

    Why: only ONE positive channel per pixel is ever consumed, so
    materializing the [B, n, H, W] positive composite (min-composed
    ancestor chain) and evaluating log σ at all n channels is pure HBM
    traffic that grows with n — 38 ms/step of the 150-class 512²·b8
    train step (v5e profile). Here the full-width work is a single
    fused reduction over ``neg_l``; everything else is [B, H, W]."""
    valid = targets != ignore_index
    safe = jnp.where(valid, targets, 0)
    nv = jnp.maximum(jnp.sum(valid.astype(jnp.float32)), 1.0)
    # upcasts fuse into the reads: with hiera_precision="fast" the
    # stored tensor is bf16 but all loss math stays f32
    neg_l = neg_l.astype(jnp.float32)
    # both reductions read neg_l once (multi-output fusion)
    neg_sum = jnp.sum(_log_one_minus_sig_eps(neg_l, eps), axis=1)
    neg_lbl = _log_one_minus_sig_eps(_pick_channel(neg_l, safe), eps)
    pos_lbl = _log_sig_eps(pos_at_lbl.astype(jnp.float32), eps)
    per_px = pos_lbl + neg_sum - neg_lbl
    return jnp.sum(jnp.where(valid, -per_px, 0.0)) / (nv * n)


def _ce_cmajor(logits, targets, ignore_index, divide_by="all", ohem=None):
    """Softmax CE on [B, C, H, W] logits as ``logsumexp − logit[label]``
    — two fused reductions over the logits; neither the full-width
    log-softmax nor the picked copy is ever materialized (the label pick
    is a broadcast-compare reduction; full-res gathers are ~10× slower
    on TPU). ``ohem``: optional ``(thresh, batch_kept)`` hard-pixel
    mining (losses/ohem.py) — the keep-mask multiplies the per-pixel
    loss."""
    logits = logits.astype(jnp.float32)  # fuses into the reads (bf16 storage)
    valid = targets != ignore_index
    safe = jnp.where(valid, targets, 0)
    lse = jax.scipy.special.logsumexp(logits, axis=1)
    pick = _pick_channel(logits, safe) - lse  # == log_softmax[label]
    nll = jnp.where(valid, -pick, 0.0)
    if ohem is not None:
        from seghiero_tpu.losses.ohem import ohem_pixel_weight

        w = ohem_pixel_weight(jnp.exp(pick), valid, ohem[0], ohem[1])
        total = jnp.sum(nll * w)
        if divide_by == "all":
            return total / targets.size
        return total / jnp.maximum(jnp.sum(w), 1.0)
    total = jnp.sum(nll)
    if divide_by == "all":
        return total / targets.size
    return total / jnp.maximum(jnp.sum(valid.astype(jnp.float32)), 1.0)


def _expand_channels(x, idx):
    """``x[:, idx]`` for a static index list, lowered as slice+concat —
    TPU gathers are slow even with constant indices (see
    losses/hiera.py:lut_lookup for the measured pathology). Above
    ``LUT_UNROLL_MAX`` output channels the slice+concat chain switches
    to a plain channel gather: per-channel slices stop fusing at
    many-class scale and trace size grows linearly (same crossover
    rationale as lut_lookup)."""
    from seghiero_tpu.losses.hiera import LUT_UNROLL_MAX

    if len(idx) > LUT_UNROLL_MAX:
        return jnp.take(x, jnp.asarray(np.asarray(idx, np.int32)), axis=1)
    return jnp.concatenate([x[:, int(c) : int(c) + 1] for c in idx], axis=1)


def _bucket_max_cmajor(child_l, buckets, own_l):
    # equal-size contiguous buckets (generated N-class hierarchies,
    # regular taxonomies): one reshape-max instead of per-bucket
    # slice+max — a single fused pass, and the backward is one fused
    # compare instead of n_bucket masked slice-grads (the slice chain
    # profiled at 24 ms/step across 199 ops at 150 classes, v5e)
    sizes = [len(ids) for ids in buckets]
    flat = [c for ids in buckets for c in ids]
    if (
        sizes
        and min(sizes) == max(sizes) > 0
        and flat == list(range(len(flat)))
        and child_l.shape[1] == len(flat)
    ):
        B, C, H, W = child_l.shape
        g = jnp.max(
            child_l.reshape(B, len(buckets), sizes[0], H, W), axis=2
        )
        return jnp.maximum(g, own_l)
    cols = []
    for i, ids in enumerate(buckets):
        o = own_l[:, i]
        if ids:
            cols.append(jnp.maximum(jnp.max(child_l[:, list(ids)], axis=1), o))
        else:
            cols.append(o)
    return jnp.stack(cols, axis=1)


def _masked_level_focal(pos_l, neg_l, targets, n, ignore_index, eps, gamma):
    """Focal-modulated level term (losses/focal.py:level in C-major)."""
    pos_l = pos_l.astype(jnp.float32)
    neg_l = neg_l.astype(jnp.float32)
    valid = (targets != ignore_index)[:, None]
    safe = jnp.where(valid[:, 0], targets, 0)[:, None]
    oh = safe == _class_iota(n)
    nv = jnp.maximum(jnp.sum(valid.astype(jnp.float32)), 1.0)
    pos_p = jax.nn.sigmoid(pos_l)
    neg_p = jax.nn.sigmoid(neg_l)
    term = jnp.where(
        oh,
        (1.0 - pos_p) ** gamma * _log_sig_eps(pos_l, eps),
        neg_p**gamma * _log_one_minus_sig_eps(neg_l, eps),
    )
    return jnp.sum(jnp.where(valid, -term, 0.0)) / (nv * n)


def hiera_focal_two_level_cmajor(
    lf, t_fine, t_coarse, h: Hierarchy, eps=1e-8, gamma=2.0
):
    """losses/focal.py:hiera_focal_loss in [B, C, H, W] (no ×5 scale,
    matching the reference's dead focal code, hiera_loss.py:72-115)."""
    nf, nc = h.n_fine, h.n_coarse
    la, lb = lf[:, :nf], lf[:, nf : nf + nc]
    mcmb = _bucket_max_cmajor(la, h.fine_by_coarse, lb)
    mcla = jnp.minimum(la, _expand_channels(lb, h.fine_to_coarse))
    loss_f = _masked_level_focal(mcla, la, t_fine, nf, h.ignore_index, eps, gamma)
    loss_c = _masked_level_focal(lb, mcmb, t_coarse, nc, h.ignore_index, eps, gamma)
    return loss_f + loss_c


def hiera_bce_two_level_cmajor(lf, t_fine, t_coarse, h: Hierarchy, eps=1e-8):
    """losses/hiera.py:hiera_bce_two_level in [B, C, H, W].

    The min-composed positive chains (MCLA) are evaluated only at the
    label channel (``_masked_level_bce_pick``): mcla[lbl] =
    min(la[lbl], lb[coarse(lbl)]), and for valid pixels coarse(lbl) is
    exactly ``t_coarse`` (prepare_targets_two_level); ignore pixels pick
    channel 0 and are masked out of the sum, so the full-width
    [B, n_fine, H, W] MCLA tensor is never built."""
    nf, nc = h.n_fine, h.n_coarse
    la, lb = lf[:, :nf], lf[:, nf : nf + nc]
    mcmb = _bucket_max_cmajor(la, h.fine_by_coarse, lb)
    sf = jnp.where(t_fine != h.ignore_index, t_fine, 0)
    sc = jnp.where(t_coarse != h.ignore_index, t_coarse, 0)
    lb_lbl = _pick_channel(lb, sc)
    pos_f = jnp.minimum(_pick_channel(la, sf), lb_lbl)
    loss_f = _masked_level_bce_pick(pos_f, la, t_fine, nf, h.ignore_index, eps)
    loss_c = _masked_level_bce_pick(lb_lbl, mcmb, t_coarse, nc, h.ignore_index, eps)
    return 5.0 * (loss_f + loss_c)


def hiera_focal_three_level_cmajor(
    lf, t_f, t_m, t_h, h: Hierarchy, eps=1e-8, gamma=2.0
):
    """losses/focal.py:hiera_focal_three_level in [B, C, H, W] (the
    reference's dead 3-level focal, hiera_loss.py:72-115: full
    ancestor-chain min side, no ×5 scale)."""
    nf, nm, nh = h.n_fine, h.n_coarse, h.n_super
    la = lf[:, :nf]
    lb = lf[:, nf : nf + nm]
    lc = lf[:, nf + nm : nf + nm + nh]
    mcmb_c = _bucket_max_cmajor(la, h.fine_by_coarse, lb)
    mcmc_c = _bucket_max_cmajor(mcmb_c, h.coarse_by_super, lc)
    mclb_c = jnp.minimum(lb, _expand_channels(lc, h.coarse_to_super))
    mcla = jnp.minimum(la, _expand_channels(mclb_c, h.fine_to_coarse))
    loss_f = _masked_level_focal(mcla, la, t_f, nf, h.ignore_index, eps, gamma)
    loss_m = _masked_level_focal(mclb_c, mcmb_c, t_m, nm, h.ignore_index, eps, gamma)
    loss_h = _masked_level_focal(lc, mcmc_c, t_h, nh, h.ignore_index, eps, gamma)
    return loss_f + loss_m + loss_h


def hiera_bce_three_level_cmajor(lf, t_f, t_m, t_h, h: Hierarchy, clip_min=_CLIP_MIN):
    """losses/hiera.py:hiera_bce_three_level in [B, C, H, W].

    Positive min-chains evaluated at the label channel only (see the
    2-level docstring). The mid pick composes ``coarse_to_super`` from
    the *mid* label (matching the parity path's MCLB — correct even
    when ``fine_to_super`` is the reference's non-composed bug-replica
    map, where lut(fine_to_super, f) ≠ coarse_to_super[mid])."""
    nf, nm, nh = h.n_fine, h.n_coarse, h.n_super
    la = lf[:, :nf]
    lb = lf[:, nf : nf + nm]
    lc = lf[:, nf + nm : nf + nm + nh]
    mcmb_c = _bucket_max_cmajor(la, h.fine_by_coarse, lb)
    mcmc_c = _bucket_max_cmajor(mcmb_c, h.coarse_by_super, lc)
    from seghiero_tpu.losses.hiera import lut_lookup

    sf = jnp.where(t_f != h.ignore_index, t_f, 0)
    sm = jnp.where(t_m != h.ignore_index, t_m, 0)
    sh = jnp.where(t_h != h.ignore_index, t_h, 0)
    sm_super = lut_lookup(h.coarse_to_super, sm)  # n_coarse-entry unroll
    lb_lbl = _pick_channel(lb, sm)
    pos_f = jnp.minimum(_pick_channel(la, sf), lb_lbl)
    pos_m = jnp.minimum(lb_lbl, _pick_channel(lc, sm_super))
    loss_f = _masked_level_bce_pick(pos_f, la, t_f, nf, h.ignore_index, clip_min)
    loss_m = _masked_level_bce_pick(pos_m, mcmb_c, t_m, nm, h.ignore_index, clip_min)
    loss_h = _masked_level_bce_pick(
        _pick_channel(lc, sh), mcmc_c, t_h, nh, h.ignore_index, clip_min
    )
    return 5.0 * (loss_f + loss_m + loss_h)


def rmi_lower_bound_cmajor(
    oh_all, probs_masked, *, radius=3, use_float64=False, streaming="auto",
    backend="auto", pallas_interpret=False, per_replica=False, mesh=None,
    precision="parity",
):
    """losses/rmi.py:rmi_lower_bound with [B, C, H, W] inputs (the
    neighborhood-stack transpose is free in this layout). Shares the
    f32-safe numerics core (residual Grams, noise-aware jitter) — see
    losses/rmi.py:_rmi_logdet_core.

    ``streaming``: "on" accumulates the 9×9 Grams over row-chunks
    (``rmi_logdet_streaming_cmajor``) instead of materializing the
    [B, C, r², N] neighborhood tensor; "auto" picks streaming only when
    that tensor would exceed ~1.5 GB (working set ≈ 3× that with the
    residual vectors — approaching the 16 GB HBM of a v5e). Below that,
    materializing is faster: streaming's remat recompute costs ~12% on
    the 512²·b4 3-level step (measured), so it should only buy back
    memory that is actually needed.

    ``mesh``: when given and its 'data' axis has >1 device (multi-chip
    pjit mode), the Pallas kernels run inside a nested ``shard_map``
    over the batch dimension — each device runs the kernel on its local
    shard (batch-parallel by construction). Without this the SPMD
    partitioner cannot split the custom call and config-4-style runs
    would fall back to the ~1.75× slower XLA RMI."""
    from seghiero_tpu.losses.rmi import (
        _pick_chunk_rows,
        _rmi_logdet_core,
        rmi_logdet_streaming_cmajor,
    )

    half_d = radius * radius
    B, C, H, W = probs_masked.shape
    nh, nw = H - (radius - 1), W - (radius - 1)

    if backend != "xla":
        from seghiero_tpu.ops.pallas.rmi_gram import (
            rmi_gram_pallas_available,
            rmi_logdet_pallas_cmajor,
        )

        if backend == "pallas":
            # forced path: fail loudly instead of silently computing
            # radius-3/f32 statistics for a different configuration
            # (rmi_logdet_pallas_cmajor hardcodes both), or crashing
            # deep inside pallas_call on a CPU backend.
            if radius != 3:
                raise ValueError(
                    "training.rmi_backend: pallas requires rmi_radius == 3 "
                    f"(got {radius}); use rmi_backend: auto or xla"
                )
            if use_float64:
                raise ValueError(
                    "training.rmi_backend: pallas is f32-only; disable "
                    "rmi_use_float64 or use rmi_backend: auto or xla"
                )
            if jax.default_backend() == "cpu" and not pallas_interpret:
                raise ValueError(
                    "training.rmi_backend: pallas needs a TPU backend "
                    "(CPU runs require pallas interpret mode); use "
                    "rmi_backend: auto or xla"
                )
        from seghiero_tpu.parallel.mesh import DATA_AXIS

        n_data = 1
        if mesh is not None and not per_replica:
            n_data = mesh.shape.get(DATA_AXIS, 1)
        if backend == "pallas" and n_data > 1 and B % n_data:
            # the shard_map wrapper below is the ONLY way the kernel can
            # run under multi-chip pjit (the SPMD partitioner cannot
            # split a custom call); an indivisible batch would reach the
            # unsharded call and die deep inside the partitioner
            raise ValueError(
                "training.rmi_backend: pallas under multi-chip pjit needs "
                f"the global batch ({B}) divisible by the data-axis size "
                f"({n_data}); adjust batch_size or use rmi_backend: auto "
                "or xla"
            )
        if n_data > 1 and B % n_data == 0:
            # multi-chip pjit: run the kernel per-device on the local
            # batch shard via a nested shard_map (the batch dimension is
            # embarrassingly parallel; grads flow through the custom VJP
            # exactly as in ddp mode)
            if backend == "pallas" or rmi_gram_pallas_available(
                H, W, radius, use_float64, per_replica=True
            ):
                from jax.sharding import PartitionSpec as P

                local = functools.partial(
                    rmi_logdet_pallas_cmajor,
                    interpret=pallas_interpret,
                    precision=precision,
                )
                half = jax.shard_map(
                    local,
                    mesh=mesh,
                    in_specs=(P(DATA_AXIS), P(DATA_AXIS)),
                    out_specs=P(DATA_AXIS),
                    check_vma=False,  # pallas outputs carry no vma metadata
                )(oh_all, probs_masked)
                return jnp.sum(jnp.mean(half, axis=0) / float(half_d))
        elif backend == "pallas" or rmi_gram_pallas_available(
            H, W, radius, use_float64, per_replica=per_replica
        ):
            half = rmi_logdet_pallas_cmajor(
                oh_all, probs_masked, interpret=pallas_interpret,
                precision=precision,
            )
            return jnp.sum(jnp.mean(half, axis=0) / float(half_d))

    use_streaming = streaming == "on" or (
        streaming == "auto" and B * C * half_d * nh * nw * 4 > 1536 * 2**20
    )
    if use_streaming and _pick_chunk_rows(nh) >= 8:
        half = rmi_logdet_streaming_cmajor(
            oh_all, probs_masked, radius=radius, use_float64=use_float64
        )
    else:

        def nbhd(x):
            views = [
                x[:, :, y : y + nh, xx : xx + nw]
                for y in range(radius)
                for xx in range(radius)
            ]
            return jnp.stack(views, axis=2).reshape(B, C, half_d, nh * nw)

        la = jax.lax.stop_gradient(nbhd(oh_all))
        pr = nbhd(probs_masked)
        half = _rmi_logdet_core(la, pr, half_d, use_float64)
    per_class = jnp.mean(half, axis=0) / float(half_d)
    return jnp.sum(per_class)


# ---------------------------------------------------------------------------
# Full composites (drop-in equivalents of HieraTripletLoss /
# RMIHieraTripletLoss with identical call signatures)
# ---------------------------------------------------------------------------


class FastHieraTripletLoss:
    """TPU fast path of losses/hiera.py:HieraTripletLoss. Accepts NHWC
    logits straight from the head at LOW resolution plus the target
    output size; transposes once, resizes and computes in C-major."""

    wants_low_res = True  # trainer feeds low-res logits (no NHWC full-res)

    def __init__(self, hierarchy, loss_weight=1.0, schedule_total_steps=80_000,
                 axis_name: Optional[str] = None, use_pallas: bool = False,
                 hiera_variant: str = "bce", focal_gamma: float = 2.0,
                 ohem=None, hiera_precision: str = "parity",
                 selection: str = "auto"):
        self.h = hierarchy
        self.loss_weight = loss_weight
        self.schedule_total_steps = schedule_total_steps
        self.axis_name = axis_name
        self.use_pallas = use_pallas
        self.hiera_variant = hiera_variant
        self.focal_gamma = focal_gamma
        self.ohem = ohem  # (thresh, batch_kept) or None — losses/ohem.py
        # "fast": store the upsampled logits bf16 (math stays f32 via
        # fused upcasts in every consumer) — config.py hiera_precision
        self.hiera_precision = hiera_precision
        # triplet pixel-selection backend (losses/tree_triplet.py)
        self.selection = selection

    def __call__(self, step, embedding, cls_score_before, cls_score, label):
        h = self.h
        out_hw = label.shape[1:3]
        store_dt = (
            jnp.bfloat16 if self.hiera_precision == "fast" else jnp.float32
        )
        lo = jnp.transpose(cls_score.astype(store_dt), (0, 3, 1, 2))
        t_fine, t_coarse = prepare_targets_two_level(label, h)

        use_pallas = False
        # the fused kernel computes CE inside the kernel (no per-pixel
        # keep-mask hook); OHEM selection forces the unfused path, and
        # the kernel is an f32 parity kernel (no bf16 storage mode)
        if (self.use_pallas and self.hiera_variant == "bce"
                and self.ohem is None and self.hiera_precision != "fast"):
            from seghiero_tpu.ops.pallas.hiera2_fused import (
                fused_hiera2_available,
                fused_hiera2_loss_sums,
            )

            use_pallas = fused_hiera2_available(lo, label)
        if use_pallas:
            s_f, s_c, nvf, nvc, ce_f, ce_c = fused_hiera2_loss_sums(
                lo, t_fine, t_coarse, h
            )
            total = label.size
            loss = 5.0 * (
                s_f / (jnp.maximum(nvf, 1.0) * h.n_fine)
                + s_c / (jnp.maximum(nvc, 1.0) * h.n_coarse)
            )
            loss = loss + ce_f / total + ce_c / total
        else:
            lf = _resize_cmajor(lo, out_hw)
            if self.hiera_variant == "focal":
                loss = hiera_focal_two_level_cmajor(
                    lf, t_fine, t_coarse, h, gamma=self.focal_gamma
                )
            else:
                loss = hiera_bce_two_level_cmajor(lf, t_fine, t_coarse, h)
            loss += _ce_cmajor(
                lf[:, : h.n_fine], t_fine, h.ignore_index, ohem=self.ohem
            )
            loss += _ce_cmajor(
                lf[:, h.n_fine : h.n_fine + h.n_coarse],
                t_coarse,
                h.ignore_index,
                ohem=self.ohem,
            )
        t, c = tree_triplet_loss_range(
            embedding, label, h, selection=self.selection
        )
        ready = triplet_readiness(c, self.axis_name)
        factor = triplet_schedule_factor(step, self.schedule_total_steps)
        return (loss + jnp.where(ready, factor * t, 0.0)) * self.loss_weight


class FastRMIHieraTripletLoss:
    """TPU fast path of losses/rmi.py:RMIHieraTripletLoss."""

    wants_low_res = True

    def __init__(self, hierarchy, rmi_radius=3, loss_weight_lambda=0.5,
                 loss_weight=1.0, upper_ids=None, lower_ids=None,
                 use_float64=False, axis_name: Optional[str] = None,
                 rmi_streaming: str = "auto", rmi_backend: str = "auto",
                 mesh=None, pallas_interpret: bool = False,
                 rmi_precision: str = "parity",
                 hiera_variant: str = "bce", focal_gamma: float = 2.0,
                 ohem=None, hiera_precision: str = "parity",
                 selection: str = "auto"):
        self.h = hierarchy
        self.rmi_radius = rmi_radius
        self.loss_weight_lambda = loss_weight_lambda
        self.loss_weight = loss_weight
        self.upper_ids = upper_ids
        self.lower_ids = lower_ids
        self.use_float64 = use_float64
        self.axis_name = axis_name
        self.rmi_streaming = rmi_streaming
        self.rmi_backend = rmi_backend
        # mesh enables the batch-parallel Pallas path under multi-chip
        # pjit (nested shard_map; see rmi_lower_bound_cmajor)
        self.mesh = mesh
        self.pallas_interpret = pallas_interpret
        self.rmi_precision = rmi_precision
        self.hiera_variant = hiera_variant
        self.focal_gamma = focal_gamma
        self.ohem = ohem  # (thresh, batch_kept) or None — losses/ohem.py
        # "fast": bf16 storage for the upsampled logits; BCE/CE math
        # stays f32 (fused upcasts) and the RMI input probs are formed
        # in f32 — only the materialized tensor + upsample halve
        self.hiera_precision = hiera_precision
        # triplet pixel-selection backend (losses/tree_triplet.py)
        self.selection = selection

    @property
    def schedule_total_steps(self):
        return 160_000 if self.h.n_fine > 15 else 60_000

    def __call__(self, step, embedding, cls_score_before, cls_score, label):
        h = self.h
        nf, nm, nh_ = h.n_fine, h.n_coarse, h.n_super
        out_hw = label.shape[1:3]
        store_dt = (
            jnp.bfloat16 if self.hiera_precision == "fast" else jnp.float32
        )
        lo = jnp.transpose(cls_score.astype(store_dt), (0, 3, 1, 2))
        lf = _resize_cmajor(lo, out_hw)
        t_f, t_m, t_h = prepare_targets_three_level(label, h)

        if self.hiera_variant == "focal":
            hiera = hiera_focal_three_level_cmajor(
                lf, t_f, t_m, t_h, h, gamma=self.focal_gamma
            )
        else:
            hiera = hiera_bce_three_level_cmajor(lf, t_f, t_m, t_h, h)

        # RMI over concatenated per-level one-hots vs masked sigmoids
        # (f32 regardless of storage precision; rmi_precision governs
        # the Gram internals separately)
        probs = jax.nn.sigmoid(lf.astype(jnp.float32))

        def oh_valid(t, n):
            valid = (t != h.ignore_index)[:, None]
            safe = jnp.where(valid[:, 0], t, 0)[:, None]
            return (safe == _class_iota(n)).astype(jnp.float32), valid

        ohf, vf = oh_valid(t_f, nf)
        ohm, vm = oh_valid(t_m, nm)
        ohh, vh = oh_valid(t_h, nh_)
        oh_all = jnp.concatenate([ohf, ohm, ohh], axis=1)
        valid_all = jnp.concatenate(
            [
                jnp.broadcast_to(vf, ohf.shape),
                jnp.broadcast_to(vm, ohm.shape),
                jnp.broadcast_to(vh, ohh.shape),
            ],
            axis=1,
        ).astype(jnp.float32)
        rmi = rmi_lower_bound_cmajor(
            oh_all, probs * valid_all + _CLIP_MIN,
            radius=self.rmi_radius, use_float64=self.use_float64,
            streaming=self.rmi_streaming, backend=self.rmi_backend,
            # axis_name set ⇒ running per-replica inside shard_map (ddp):
            # the kernel sees local shards, so it stays usable multi-chip
            per_replica=self.axis_name is not None,
            mesh=self.mesh,
            pallas_interpret=self.pallas_interpret,
            precision=self.rmi_precision,
        )
        loss = self.loss_weight_lambda * rmi + 0.5 * hiera
        loss += _ce_cmajor(lf[:, :nf], t_f, h.ignore_index, ohem=self.ohem)
        loss += _ce_cmajor(
            lf[:, nf : nf + nm], t_m, h.ignore_index, ohem=self.ohem
        )
        loss += _ce_cmajor(
            lf[:, nf + nm : nf + nm + nh_], t_h, h.ignore_index, ohem=self.ohem
        )

        upper, lower = (
            (tuple(self.upper_ids), tuple(self.lower_ids))
            if self.upper_ids is not None
            else h.split_upper_lower()
        )
        t, c = tree_triplet_loss_groups(
            embedding, label, upper, lower, nf,
            ignore_index=h.ignore_index, selection=self.selection,
        )
        ready = triplet_readiness(c, self.axis_name)
        factor = triplet_schedule_factor(step, self.schedule_total_steps)
        return (loss + jnp.where(ready, factor * t, 0.0)) * self.loss_weight


def aux_ce_fast(aux_logits_nhwc, labels, ignore_index=255,
                hiera_precision: str = "parity"):
    """Aux CE (train.py:308-313) with the upsample+CE in C-major.
    ``hiera_precision="fast"`` stores the upsampled aux logits bf16
    (math stays f32 — _ce_cmajor upcasts inside its fused reads)."""
    out_hw = labels.shape[1:3]
    dt = jnp.bfloat16 if hiera_precision == "fast" else jnp.float32
    lo = jnp.transpose(aux_logits_nhwc.astype(dt), (0, 3, 1, 2))
    lf = _resize_cmajor(lo, out_hw)
    return _ce_cmajor(lf, labels, ignore_index, divide_by="valid")
