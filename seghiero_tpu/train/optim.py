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


def make_optimizer(
    cfg: TrainingConfig, schedule: Optional[optax.Schedule] = None
) -> optax.GradientTransformation:
    lr = schedule if schedule is not None else cfg.lr
    return optax.chain(
        optax.add_decayed_weights(cfg.weight_decay),
        optax.trace(decay=cfg.momentum, nesterov=False),
        optax.scale_by_learning_rate(lr),
    )
