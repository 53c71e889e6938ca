"""Pallas fused upsample+BCE+CE kernel vs the XLA fast path (interpret
mode on CPU; the same kernel runs compiled on TPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from seghiero_tpu.hierarchy import Hierarchy
from seghiero_tpu.losses.fast import (
    _ce_cmajor,
    _resize_cmajor,
    hiera_bce_two_level_cmajor,
)
from seghiero_tpu.losses.hiera import prepare_targets_two_level
from seghiero_tpu.ops.pallas.hiera2_fused import (
    fused_hiera2_available,
    fused_hiera2_loss_sums,
)


def _xla_reference_loss(lo_cmajor, t_fine, t_coarse, h):
    lf = _resize_cmajor(lo_cmajor, t_fine.shape[1:3])
    loss = hiera_bce_two_level_cmajor(lf, t_fine, t_coarse, h)
    loss += _ce_cmajor(lf[:, : h.n_fine], t_fine, h.ignore_index)
    loss += _ce_cmajor(lf[:, h.n_fine :], t_coarse, h.ignore_index)
    return loss


def _fused_loss(lo_cmajor, t_fine, t_coarse, h, interpret=True):
    s_f, s_c, nvf, nvc, ce_f, ce_c = fused_hiera2_loss_sums(
        lo_cmajor, t_fine, t_coarse, h, interpret=interpret
    )
    total = t_fine.size
    loss = 5.0 * (
        s_f / (jnp.maximum(nvf, 1.0) * h.n_fine)
        + s_c / (jnp.maximum(nvc, 1.0) * h.n_coarse)
    )
    return loss + ce_f / total + ce_c / total


def _case(rng, h, B=2, hlo=16, wlo=32, saturate=False):
    lo = rng.standard_normal((B, h.total_classes, hlo, wlo)).astype(np.float32) * 3
    if saturate:
        mask = rng.random(lo.shape) < 0.05
        lo = np.where(mask, np.sign(lo) * 40.0, lo)
    labels = rng.integers(0, h.n_fine, (B, 4 * hlo, 4 * wlo)).astype(np.int32)
    labels[:, :5, :7] = 255
    t_fine, t_coarse = prepare_targets_two_level(labels, h)
    return jnp.asarray(lo), labels, jnp.asarray(t_coarse)


@pytest.fixture
def hier(classes_2level):
    return Hierarchy.from_class_config(classes_2level)


def test_fused_forward_matches_xla(rng, hier):
    lo, tf, tc = _case(rng, hier)
    assert fused_hiera2_available(lo, tf)
    ours = float(_fused_loss(lo, tf, tc, hier))
    ref = float(_xla_reference_loss(lo, tf, tc, hier))
    np.testing.assert_allclose(ours, ref, rtol=1e-5)


def test_fused_gradient_matches_xla(rng, hier):
    lo, tf, tc = _case(rng, hier)
    g_fused = jax.grad(lambda x: _fused_loss(x, tf, tc, hier))(lo)
    g_ref = jax.grad(lambda x: _xla_reference_loss(x, tf, tc, hier))(lo)
    np.testing.assert_allclose(
        np.asarray(g_fused), np.asarray(g_ref), rtol=2e-4, atol=1e-7
    )


def test_fused_gradient_finite_under_saturation(rng, hier):
    lo, tf, tc = _case(rng, hier, saturate=True)
    val = float(_fused_loss(lo, tf, tc, hier))
    g = jax.grad(lambda x: _fused_loss(x, tf, tc, hier))(lo)
    assert np.isfinite(val)
    assert np.all(np.isfinite(np.asarray(g)))
    ref = float(_xla_reference_loss(lo, tf, tc, hier))
    np.testing.assert_allclose(val, ref, rtol=1e-5)


def test_fused_all_ignored(rng, hier):
    lo, tf, tc = _case(rng, hier)
    tf255 = jnp.full_like(tf, 255)
    tc255 = jnp.full_like(tc, 255)
    val = float(_fused_loss(lo, tf255, tc255, hier))
    ref = float(_xla_reference_loss(lo, np.asarray(tf255), tc255, hier))
    np.testing.assert_allclose(val, ref, rtol=1e-5)


def test_fused_availability_gate(rng, hier):
    lo, tf, tc = _case(rng, hier)
    assert not fused_hiera2_available(lo, tf[:, :-4])  # ratio mismatch
