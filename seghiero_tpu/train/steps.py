"""Jitted step builders: train / DDP-train / eval steps + the composite
loss dispatch and the shared forward.

Rebuilds the per-step math of the reference's train.py (C16) TPU-first:

  * ONE jitted ``train_step`` closed over the static hierarchy/config —
    forward, both logit resizes, the full composite loss, backward, and
    the SGD update all compile into a single XLA program (the reference
    re-launches hundreds of kernels per step and syncs with ``.item()``
    per batch, train.py:319).
  * the triplet schedule is driven by the *global optimizer step* by
    default, fixing reference sharp edge #6 (train.py:287 feeds the epoch
    index into iteration-scale thresholds); set
    ``training.triplet_schedule_unit: epoch`` for bug-parity.

Epoch orchestration lives in train/trainer.py + train/loop.py.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
from flax import struct

from seghiero_tpu.config import SegHieroConfig
from seghiero_tpu.data.pipeline import normalize_images
from seghiero_tpu.losses import HieraTripletLoss, RMIHieraTripletLoss
from seghiero_tpu.losses.cross_entropy import softmax_cross_entropy
from seghiero_tpu.models.segmenter import HieroSegmenter
from seghiero_tpu.ops.resize import half_size, resize_bilinear
from seghiero_tpu.parallel.mesh import DATA_AXIS
from seghiero_tpu.train.metrics import confusion_matrix, pixel_accuracy_counts


class TrainState(struct.PyTreeNode):
    step: jax.Array
    params: Any
    batch_stats: Any
    opt_state: Any
    # exponential moving average of params (training.ema_decay > 0);
    # None (an empty pytree) when EMA is off, so non-EMA states keep
    # their historical leaf structure and old checkpoints restore as-is
    ema_params: Any = None


def make_composite_loss(
    cfg: SegHieroConfig, axis_name: Optional[str] = None, mesh=None
):
    """2- vs 3-level loss dispatch on the presence of a super level
    (mirrors train.py:176-233). ``training.fast_losses`` selects the
    C-major TPU fast path (losses/fast.py), equivalence-tested against
    the NHWC parity implementations. ``mesh`` (pjit mode only) lets the
    3-level RMI Pallas kernels stay engaged on a multi-chip mesh via a
    nested shard_map over the batch dim."""
    h = cfg.hierarchy
    t = cfg.training
    # OHEM keep-floor is per image in config, per batch in the sampler
    # (mmseg multiplies min_kept by the batch size). In ddp mode the
    # composite runs per replica on its LOCAL shard, so the multiplier is
    # the local batch.
    local_batch = t.batch_size
    if axis_name is not None and mesh is not None:
        local_batch = max(1, t.batch_size // mesh.shape[axis_name])
    ohem = (
        (t.ohem_thresh, t.ohem_min_kept * local_batch)
        if t.ohem_thresh is not None
        else None
    )
    # Degenerate-hierarchy guard (round-4 verdict): when the derived
    # triplet upper/lower split is one-sided (all non-background fine ids
    # share a single super/coarse bucket), the groups-variant triplet
    # term can never find a negative — class_count stays 0 and the term
    # silently never activates. Surface that at construction time instead
    # of training a different objective without notice.
    if h.has_super and (t.triplet_upper_ids is None or t.triplet_lower_ids is None):
        upper, lower = h.split_upper_lower()
        if not upper or not lower:
            import warnings

            warnings.warn(
                "the hierarchy-derived triplet upper/lower split is "
                f"one-sided (upper={upper}, lower={lower}): every "
                "non-background fine class falls in one super bucket, "
                "so the tree-triplet term will never activate. Set "
                "training.triplet_upper_ids / training.triplet_lower_ids "
                "explicitly to define the positive/negative groups.",
                stacklevel=2,
            )
    if t.fast_losses:
        from seghiero_tpu.losses.fast import (
            FastHieraTripletLoss,
            FastRMIHieraTripletLoss,
        )

        if h.has_super:
            return FastRMIHieraTripletLoss(
                h,
                rmi_radius=t.rmi_radius,
                loss_weight_lambda=t.fine_weight,
                loss_weight=1.0,
                axis_name=axis_name,
                rmi_streaming=t.rmi_streaming,
                rmi_backend=t.rmi_backend,
                mesh=mesh if axis_name is None else None,
                rmi_precision=t.rmi_precision,
                hiera_variant=t.hiera_variant,
                focal_gamma=t.focal_gamma,
                ohem=ohem,
                hiera_precision=t.hiera_precision,
                upper_ids=t.triplet_upper_ids,
                lower_ids=t.triplet_lower_ids,
                selection=t.triplet_selection,
            )
        return FastHieraTripletLoss(
            h,
            loss_weight=t.fine_weight,
            axis_name=axis_name,
            use_pallas=t.pallas_fused_loss,
            hiera_variant=t.hiera_variant,
            focal_gamma=t.focal_gamma,
            ohem=ohem,
            hiera_precision=t.hiera_precision,
            selection=t.triplet_selection,
        )
    if h.has_super:
        return RMIHieraTripletLoss(
            hierarchy=h,
            rmi_radius=t.rmi_radius,
            rmi_pool_way=t.rmi_pool_way,
            rmi_pool_size=t.rmi_pool_size,
            rmi_pool_stride=t.rmi_pool_stride,
            loss_weight_lambda=t.fine_weight,
            loss_weight=1.0,
            axis_name=axis_name,
            hiera_variant=t.hiera_variant,
            focal_gamma=t.focal_gamma,
            ohem=ohem,
            upper_ids=t.triplet_upper_ids,
            lower_ids=t.triplet_lower_ids,
            selection=t.triplet_selection,
        )
    return HieraTripletLoss(
        hierarchy=h,
        loss_weight=t.fine_weight,
        axis_name=axis_name,
        hiera_variant=t.hiera_variant,
        focal_gamma=t.focal_gamma,
        ohem=ohem,
        selection=t.triplet_selection,
    )


def _forward_losses(
    model: HieroSegmenter,
    composite,
    cfg: SegHieroConfig,
    variables: Dict,
    batch: Dict,
    sched_step: jax.Array,
    train: bool,
    need_full_logits: bool = False,
    flip_step: Optional[jax.Array] = None,
):
    """Shared forward + loss assembly (train.py:266-315 for train,
    :341-378 for val — identical math). Fast-path composites
    (losses/fast.py) take the LOW-resolution logits and do the resize
    internally in C-major layout; the NHWC full-res logits are then only
    materialized when the caller needs them (eval argmax)."""
    images = normalize_images(
        batch["image"], cfg.transform.normalize_mean, cfg.transform.normalize_std
    )
    # labels may arrive in a narrow transfer dtype (uint8 from the raw
    # cache — 4× less host→device traffic); widen on device for free
    fine = batch["fine"].astype(jnp.int32)
    if train and cfg.transform.device_hflip and cfg.transform.hflip_prob > 0:
        # transform.device_hflip: the random horizontal flip runs HERE,
        # fused into the jitted step (image + fine label with one shared
        # coin per sample), instead of as ~3 ms/image of strided host
        # copies. Coins come from the JAX PRNG folded with the schedule
        # step, so every step (incl. inside a superstep scan) draws a
        # fresh batch of coins. Host-side flips are disabled when this is
        # on (data/dataset.py). Folded with the true optimizer step
        # (flip_step) — sched_step may be the epoch index under
        # triplet_schedule_unit: epoch, which would repeat coins.
        coin_key = jax.random.fold_in(
            jax.random.key(cfg.training.seed + 0x5E6),
            sched_step if flip_step is None else flip_step,
        )
        axis = getattr(composite, "axis_name", None)
        if axis is not None:
            # ddp shard_map: decorrelate the per-replica coin streams
            coin_key = jax.random.fold_in(coin_key, jax.lax.axis_index(axis))
        coins = jax.random.bernoulli(
            coin_key, cfg.transform.hflip_prob, (images.shape[0],)
        )
        images = jnp.where(
            coins[:, None, None, None], images[:, :, ::-1, :], images
        )
        fine = jnp.where(coins[:, None, None], fine[:, :, ::-1], fine)
    H, W = fine.shape[1:3]
    n_fine = cfg.hierarchy.n_fine

    if train:
        out, mutated = model.apply(
            variables,
            images,
            train=True,
            mutable=["batch_stats"],
            # per-step dropout stream seeded from training.seed (only the
            # plain-ASPP head uses it)
            rngs={
                "dropout": jax.random.fold_in(
                    jax.random.key(cfg.training.seed), sched_step
                )
            },
        )
        new_batch_stats = mutated["batch_stats"]
    else:
        out = model.apply(variables, images, train=False)
        new_batch_stats = variables.get("batch_stats")

    logits = out["logits"]  # [B, H/4, W/4, C] f32
    fast = getattr(composite, "wants_low_res", False)

    extra_specs = cfg.training.extra_losses
    if fast:
        main_loss = composite(sched_step, out["embedding"], logits, logits, fine)
        from seghiero_tpu.losses.fast import aux_ce_fast

        aux_loss = aux_ce_fast(
            out["aux_logits"], fine, cfg.hierarchy.ignore_index,
            hiera_precision=cfg.training.hiera_precision,
        )
        logits_full = (
            resize_bilinear(logits, (H, W))
            if (need_full_logits or extra_specs)
            else None
        )
    else:
        logits_before = resize_bilinear(logits, half_size(logits.shape[1:3]))  # 1/8
        logits_full = resize_bilinear(logits, (H, W))
        main_loss = composite(
            sched_step, out["embedding"], logits_before[..., :n_fine], logits_full, fine
        )
        aux_up = resize_bilinear(out["aux_logits"], (H, W))
        aux_loss = softmax_cross_entropy(aux_up, fine, divide_by="valid")
    loss = main_loss + cfg.training.aux_weight * aux_loss
    if extra_specs:
        from seghiero_tpu.losses.extra import extra_losses_total

        loss = loss + extra_losses_total(
            extra_specs, logits_full, fine, cfg.hierarchy
        )
    return loss, main_loss, aux_loss, (logits, logits_full), new_batch_stats


def _ema_update(ema, params, decay: float):
    """Parameter EMA (``training.ema_decay``): ema ← d·ema + (1−d)·params
    after each optimizer update. Trace-time no-op when EMA is off."""
    if ema is None or not decay:
        return ema
    return jax.tree_util.tree_map(
        lambda e, p: (e * decay + (1.0 - decay) * p).astype(p.dtype), ema, params
    )


def make_train_step(
    model: HieroSegmenter, composite, cfg: SegHieroConfig, tx
) -> Callable:
    unit = cfg.training.triplet_schedule_unit

    def train_step(state: TrainState, batch: Dict, epoch: jax.Array):
        sched_step = state.step if unit == "step" else epoch

        def loss_fn(params):
            variables = {"params": params, "batch_stats": state.batch_stats}
            loss, main, aux, _, new_bs = _forward_losses(
                model, composite, cfg, variables, batch, sched_step,
                train=True, flip_step=state.step,
            )
            return loss, (main, aux, new_bs)

        (loss, (main, aux, new_bs)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
        new_params = jax.tree_util.tree_map(
            lambda p, u: (p + u).astype(p.dtype), state.params, updates
        )
        new_state = state.replace(
            step=state.step + 1,
            params=new_params,
            batch_stats=new_bs,
            opt_state=new_opt_state,
            ema_params=_ema_update(
                state.ema_params, new_params, cfg.training.ema_decay
            ),
        )
        metrics = {"loss": loss, "main_loss": main, "aux_loss": aux}
        return new_state, metrics

    return train_step


def make_train_step_ddp(
    model: HieroSegmenter, composite, cfg: SegHieroConfig, tx, mesh
) -> Callable:
    """DDP-semantics training step via shard_map over the 'data' axis.

    This is the faithful TPU translation of the reference's (dead) DDP
    spec: each replica computes the loss on its local shard — BatchNorm
    statistics are LOCAL to the replica (reference per-device BN), the
    triplet term activates only when EVERY replica found triplet classes
    (the all_gather gate at hiera_triplet_loss.py:193-200, here a
    ``pmin`` riding ICI), and gradients are pmean'd before the update so
    replicas stay bitwise in lock-step. ``composite`` must carry
    ``axis_name=DATA_AXIS``.
    """
    from jax.sharding import PartitionSpec as P
    from jax import shard_map

    unit = cfg.training.triplet_schedule_unit

    def per_replica(state: TrainState, batch: Dict, epoch: jax.Array):
        sched_step = state.step if unit == "step" else epoch

        def loss_fn(params):
            variables = {"params": params, "batch_stats": state.batch_stats}
            loss, main, aux, _, new_bs = _forward_losses(
                model, composite, cfg, variables, batch, sched_step,
                train=True, flip_step=state.step,
            )
            return loss, (main, aux, new_bs)

        (loss, (main, aux, new_bs)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        grads = jax.lax.pmean(grads, DATA_AXIS)
        # running BN stats averaged so the replicated state stays identical
        new_bs = jax.lax.pmean(new_bs, DATA_AXIS)
        metrics = {
            "loss": jax.lax.pmean(loss, DATA_AXIS),
            "main_loss": jax.lax.pmean(main, DATA_AXIS),
            "aux_loss": jax.lax.pmean(aux, DATA_AXIS),
        }
        updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
        new_params = jax.tree_util.tree_map(
            lambda p, u: (p + u).astype(p.dtype), state.params, updates
        )
        # grads are pmean'd, so params (and hence the EMA) stay bitwise
        # identical across replicas — no extra collective needed
        new_state = state.replace(
            step=state.step + 1,
            params=new_params,
            batch_stats=new_bs,
            opt_state=new_opt_state,
            ema_params=_ema_update(
                state.ema_params, new_params, cfg.training.ema_decay
            ),
        )
        return new_state, metrics

    return shard_map(
        per_replica,
        mesh=mesh,
        in_specs=(P(), P(DATA_AXIS), P()),
        out_specs=(P(), P()),
        check_vma=False,
    )  # check_vma off: pmean'd outputs are replicated by construction


def make_eval_step(model: HieroSegmenter, composite, cfg: SegHieroConfig) -> Callable:
    h = cfg.hierarchy
    # with EMA on, validation (and hence best-checkpoint selection) sees
    # the averaged weights — the weights one would deploy
    use_ema = cfg.training.ema_decay > 0

    def eval_step(state: TrainState, batch: Dict):
        params = state.ema_params if use_ema else state.params
        variables = {"params": params, "batch_stats": state.batch_stats}
        loss, main, aux, (logits_lo, logits_full), _ = _forward_losses(
            model, composite, cfg, variables, batch, state.step, train=False
        )
        if logits_full is None:
            # metrics in C-major (same layout rationale as the predictor)
            lo = jnp.transpose(logits_lo, (0, 3, 1, 2))
            B, C = lo.shape[:2]
            H, W = batch["fine"].shape[1:3]
            logits_cm = jax.image.resize(
                lo, (B, C, H, W), "linear", antialias=False
            )
        else:
            logits_cm = jnp.transpose(logits_full, (0, 3, 1, 2))
        stats = {}
        level_labels = {"fine": batch["fine"], "coarse": batch.get("coarse")}
        if h.has_super:
            level_labels["super"] = batch.get("super")
        for (lvl, (lo_, hi_)) in zip(level_labels, h.level_slices):
            labels = level_labels[lvl]
            pred = jnp.argmax(logits_cm[:, lo_:hi_], axis=1)
            correct, valid = pixel_accuracy_counts(pred, labels, h.ignore_index)
            cm = confusion_matrix(pred, labels, hi_ - lo_, h.ignore_index)
            stats[lvl] = {"correct": correct, "valid": valid, "cm": cm}
        return {"loss": loss, "levels": stats}

    return eval_step
