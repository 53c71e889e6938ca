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


def test_rmi_grad_finite_on_smooth_fields_traced_labels(rng, classes_3level):
    """Regression: the RMI backward NaN'd when (a) labels were traced
    arguments (not baked constants) and (b) the probability fields were
    smooth — the 9 shifted neighborhood views become near-rank-1 and the
    reference's α/N jitter sits below the f32 noise floor. The residual-
    Gram + noise-aware-jitter core (losses/rmi.py:_rmi_logdet_core) must
    keep value and grads finite."""
    import jax
    import jax.numpy as jnp

    from seghiero_tpu.losses.fast import FastRMIHieraTripletLoss

    h = Hierarchy.from_class_config(classes_3level)
    B, H, W = 2, 64, 64
    # smooth low-frequency logits → highly correlated neighborhoods
    base = rng.standard_normal((B, 4, 4, h.total_classes)).astype(np.float32)
    lo = jax.image.resize(jnp.asarray(base), (B, 16, 16, h.total_classes), "linear")
    emb = rng.standard_normal((B, 2, 2, 8)).astype(np.float32)
    emb /= np.linalg.norm(emb, axis=-1, keepdims=True)
    labels = rng.integers(0, h.n_fine, (B, H, W)).astype(np.int32)

    fn = FastRMIHieraTripletLoss(h)

    @jax.jit
    def vg(logits, lab):
        return jax.value_and_grad(
            lambda x: fn(jnp.array(0), emb, x, x, lab)
        )(logits)

    v, g = vg(lo, jnp.asarray(labels))  # labels traced, not constants
    assert np.isfinite(float(v))
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
