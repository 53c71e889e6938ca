"""Regression: BCE gradients must stay finite under jit when sigmoids
saturate to exactly 1.0f / 0.0f.

History: the naive probability-space composition
``log(min/max(sigmoid(x)) + eps)`` produced finite un-jitted gradients
but NaN *jitted* gradients (an XLA fusion rewrite emits inf·0) once any
logit exceeded ~±17 — killing training runs after a few steps. The
logit-space ``logaddexp``/``softplus`` formulation in losses/hiera.py is
fusion-proof; this test pins that behavior on saturated inputs.
"""

import jax
import jax.numpy as jnp
import numpy as np

from seghiero_tpu.hierarchy import Hierarchy
from seghiero_tpu.losses.focal import hiera_focal_loss
from seghiero_tpu.losses.hiera import (
    HieraTripletLoss,
    hiera_bce_three_level,
    hiera_bce_two_level,
    prepare_targets_three_level,
    prepare_targets_two_level,
)


def _saturated_logits(rng, shape, n_channels):
    x = rng.standard_normal((*shape, n_channels)).astype(np.float32) * 3
    # drive a scattered subset far into saturation, both directions
    mask = rng.random(x.shape) < 0.05
    x = np.where(mask, np.sign(x) * 40.0, x)
    return x


def test_bce2_grad_finite_under_saturation(rng, classes_2level):
    h = Hierarchy.from_class_config(classes_2level)
    logits = _saturated_logits(rng, (2, 16, 16), h.total_classes)
    labels = rng.integers(0, h.n_fine, (2, 16, 16)).astype(np.int32)
    t_fine, t_coarse = prepare_targets_two_level(labels, h)

    g = jax.jit(jax.grad(lambda x: hiera_bce_two_level(x, t_fine, t_coarse, h)))(
        jnp.asarray(logits)
    )
    assert np.all(np.isfinite(np.asarray(g)))
    assert np.isfinite(float(hiera_bce_two_level(logits, t_fine, t_coarse, h)))


def test_bce3_grad_finite_under_saturation(rng, classes_3level):
    h = Hierarchy.from_class_config(classes_3level)
    logits = _saturated_logits(rng, (2, 12, 12), h.total_classes)
    labels = rng.integers(0, h.n_fine, (2, 12, 12)).astype(np.int32)
    tf_, tm_, th_ = prepare_targets_three_level(labels, h)

    g = jax.jit(
        jax.grad(lambda x: hiera_bce_three_level(x, tf_, tm_, th_, h))
    )(jnp.asarray(logits))
    assert np.all(np.isfinite(np.asarray(g)))


def test_focal_grad_finite_under_saturation(rng, classes_2level):
    h = Hierarchy.from_class_config(classes_2level)
    logits = _saturated_logits(rng, (2, 12, 12), h.total_classes)
    labels = rng.integers(0, h.n_fine, (2, 12, 12)).astype(np.int32)
    t_fine, t_coarse = prepare_targets_two_level(labels, h)
    g = jax.jit(jax.grad(lambda x: hiera_focal_loss(x, labels, t_coarse, h)))(
        jnp.asarray(logits)
    )
    assert np.all(np.isfinite(np.asarray(g)))


def test_composite_2level_grad_finite_under_saturation(rng, classes_2level):
    h = Hierarchy.from_class_config(classes_2level)
    fn = HieraTripletLoss(h)
    logits = _saturated_logits(rng, (2, 16, 16), h.total_classes)
    before = rng.standard_normal((2, 8, 8, h.n_fine)).astype(np.float32)
    emb = rng.standard_normal((2, 4, 4, 8)).astype(np.float32)
    emb /= np.linalg.norm(emb, axis=-1, keepdims=True)
    labels = rng.integers(0, h.n_fine, (2, 16, 16)).astype(np.int32)

    g = jax.jit(
        jax.grad(lambda x: fn(jnp.array(0), emb, before, x, labels))
    )(jnp.asarray(logits))
    assert np.all(np.isfinite(np.asarray(g)))
