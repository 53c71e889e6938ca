"""Optimizer construction.

The reference trains everything with SGD(momentum=0.9, weight_decay=1e-4)
over backbone+head+aux jointly (train.py:239-246). Torch SGD's update
order is: g ← g + wd·p; buf ← μ·buf + g; p ← p − lr·buf — reproduced
exactly with the optax chain below (``add_decayed_weights`` before
``trace``). Learning-rate schedules are exposed as an extension (the
reference has a fixed lr).
"""

from __future__ import annotations

from typing import Optional

import optax

from seghiero_tpu.config import TrainingConfig


def make_schedule(cfg: TrainingConfig, total_steps: int):
    """Optional lr schedule from ``training.lr_schedule`` (extension —
    the reference trains at a fixed lr, train.py:243). "poly" with
    power 0.9 is the de-facto standard for semantic segmentation."""
    s = cfg.lr_schedule
    if not s:
        return None
    kind = s.get("type", "poly")
    warmup = int(s.get("warmup_steps", 0))
    end_lr = float(s.get("end_lr", 0.0))
    decay_steps = max(total_steps - warmup, 1)
    if kind == "poly":
        main = optax.polynomial_schedule(
            init_value=cfg.lr,
            end_value=end_lr,
            power=float(s.get("power", 0.9)),
            transition_steps=decay_steps,
        )
    elif kind == "cosine":
        main = optax.cosine_decay_schedule(cfg.lr, decay_steps, alpha=end_lr / cfg.lr)
    elif kind == "constant":
        main = optax.constant_schedule(cfg.lr)
    else:
        raise ValueError(f"unknown lr_schedule type {kind!r}")
    if warmup:
        return optax.join_schedules(
            [optax.linear_schedule(0.0, cfg.lr, warmup), main], [warmup]
        )
    return main


def _wd_mask(params):
    """True for leaves that should receive weight decay under
    ``training.wd_skip_norm_bias``: conv/dense kernels only. Everything
    flax names something else — BN/LN ``scale``/``bias``, LayerScale
    gammas, ``pos_embed``/``cls_token``/``reg_tokens`` — is skipped,
    matching the standard transformer recipe (timm's no-decay list)."""
    import jax

    return jax.tree_util.tree_map_with_path(
        lambda path, _: any(
            getattr(k, "key", None) == "kernel" for k in path
        ),
        params,
    )


def _base_tx(cfg: TrainingConfig, lr) -> optax.GradientTransformation:
    mask = _wd_mask if cfg.wd_skip_norm_bias else None
    if cfg.optimizer == "adamw":
        return optax.adamw(
            lr,
            b1=cfg.adam_beta1,
            b2=cfg.adam_beta2,
            weight_decay=cfg.weight_decay,
            mask=mask,
        )
    return optax.chain(
        optax.add_decayed_weights(cfg.weight_decay, mask=mask),
        optax.trace(decay=cfg.momentum, nesterov=False),
        optax.scale_by_learning_rate(lr),
    )


def make_optimizer(
    cfg: TrainingConfig, schedule: Optional[optax.Schedule] = None
) -> optax.GradientTransformation:
    """``training.optimizer``: "sgd" (reference parity, torch update
    order) | "adamw" (extension). ``training.grad_accum_steps > 1``
    wraps the result in ``optax.MultiSteps`` — gradients average over N
    micro-batches before one update (large effective batches without the
    memory; the optimizer step index then advances every N calls).

    ``training.backbone_lr_scale`` (extension; the fine-tuning knob for
    pretrained backbones): multiplies the backbone's learning rate —
    ``0`` freezes it outright (no update, no weight decay, no momentum
    state advance — matching torch's requires_grad=False semantics);
    head/aux always train at the full rate."""
    lr = schedule if schedule is not None else cfg.lr
    scale = getattr(cfg, "backbone_lr_scale", 1.0)
    if scale == 1.0:
        tx = _base_tx(cfg, lr)
    else:
        if scale == 0.0:
            tx_bb = optax.set_to_zero()
        elif schedule is not None:
            tx_bb = _base_tx(cfg, lambda count: schedule(count) * scale)
        else:
            tx_bb = _base_tx(cfg, cfg.lr * scale)

        def labels(params):
            import jax

            return {
                k: jax.tree_util.tree_map(
                    lambda _: "backbone" if k == "backbone" else "rest", v
                )
                for k, v in params.items()
            }

        tx = optax.multi_transform(
            {"backbone": tx_bb, "rest": _base_tx(cfg, lr)}, labels
        )
    if cfg.grad_clip_norm:
        # clip BEFORE wd/momentum — the clipped gradient is what enters
        # the torch-order update; inside MultiSteps so accumulation
        # averages raw gradients and the clip sees the average. The
        # global norm is taken over ALL grads (incl. a frozen backbone's,
        # which are then zeroed) — the standard composition
        tx = optax.chain(optax.clip_by_global_norm(cfg.grad_clip_norm), tx)
    if cfg.grad_accum_steps > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=cfg.grad_accum_steps)
    return tx
