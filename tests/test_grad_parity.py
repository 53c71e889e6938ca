"""Gradient-VALUE parity of the composite losses vs torch autograd.

test_losses_parity.py establishes that the forward scalars match the
imported reference modules; test_e2e_parity.py chains that through real
model outputs. This file closes the remaining link of the training-math
chain: the GRADIENTS our jitted train step feeds the optimizer. For each
composite we differentiate w.r.t. the same leaves the reference's
autograd sees (embedding, the 1/8 fine slice, the full-res logits — or,
for the fast composites, the raw low-res head logits with the bilinear
resizes inside the differentiated graph) and compare element-wise
against ``loss.backward()`` on the imported reference modules
(hiera_triplet_loss.py:110-211, rmi_hiera_triplet_loss.py:180-546).

Shapes are chosen so every triplet count stays < max_triplet=200: both
implementations then consume the FULL deterministic first-k candidate
sets (tree_triplet_loss.py:38-47 truncates with ``[:min_size]`` in flat
scan order), so subgradient selection is identical and the triplet term
can be exercised with a non-zero schedule factor (step=40_000 → 0.25).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from seghiero_tpu.hierarchy import Hierarchy
from seghiero_tpu.losses.fast import FastHieraTripletLoss, FastRMIHieraTripletLoss
from seghiero_tpu.losses.hiera import HieraTripletLoss
from seghiero_tpu.losses.rmi import RMIHieraTripletLoss

from reference_oracle import (
    RefHieraTripletLoss,
    RefRMIHieraTripletLoss,
    random_labels,
    random_logits,
    random_unit_embedding,
    to_torch_nchw,
)

pytestmark = pytest.mark.fast


def _leaf(x_nhwc):
    t = to_torch_nchw(x_nhwc).clone()
    t.requires_grad_(True)
    return t


def _grad_nhwc(t: torch.Tensor) -> np.ndarray:
    g = t.grad.detach().numpy()
    return np.moveaxis(g, 1, -1)


def _ref_2level(h):
    return RefHieraTripletLoss(
        num_classes=h.n_fine,
        hiera_map=h.fine_to_coarse.tolist(),
        hiera_index=[list(r) for r in h.coarse_ranges],
    )


def _ref_3level(h):
    return RefRMIHieraTripletLoss(
        n_fine=h.n_fine,
        n_mid=h.n_coarse,
        n_high=h.n_super,
        fine_to_mid=torch.from_numpy(h.fine_to_coarse.astype(np.int64)),
        # fixed fine→high LUT (the reference's own builder is buggy,
        # train.py:86-99 — see tests/test_losses_parity.py)
        fine_to_high=torch.from_numpy(h.fine_to_super.astype(np.int64)),
    )


STEP_2LEVEL = 40_000  # cos((40k−80k)/80k·π) = 0 → factor 0.25, triplet ACTIVE


def test_2level_grad_matches_torch(rng, classes_2level):
    """∂loss/∂(embedding, full-res logits) vs reference autograd, with
    the scheduled triplet term live (factor 0.25 at step 40k)."""
    h = Hierarchy.from_class_config(classes_2level)
    emb = random_unit_embedding(rng, 2, 8, 8, 8)
    lb = random_logits(rng, 2, 8, 8, h.n_fine)  # parity arg, unused (:163)
    lf = random_logits(rng, 2, 64, 64, h.total_classes)
    labels = random_labels(rng, 2, 64, 64, h.n_fine, p_ignore=0.1)

    composite = HieraTripletLoss(hierarchy=h)
    step = jnp.asarray(STEP_2LEVEL)
    g_emb, g_lf = jax.grad(
        lambda e, lg: composite(step, e, jnp.asarray(lb), lg, jnp.asarray(labels)),
        argnums=(0, 1),
    )(jnp.asarray(emb), jnp.asarray(lf))

    emb_t, lb_t, lf_t = _leaf(emb), to_torch_nchw(lb), _leaf(lf)
    ref = _ref_2level(h)(
        torch.tensor([STEP_2LEVEL]),
        emb_t,
        lb_t,
        lf_t,
        torch.from_numpy(labels).long(),
    )
    ref.backward()

    np.testing.assert_allclose(np.asarray(g_lf), _grad_nhwc(lf_t), rtol=2e-4, atol=1e-6)
    # the triplet term is the only consumer of the embedding — nonzero
    # grads here prove the scheduled term (and its gate) is really live
    assert np.abs(np.asarray(g_emb)).max() > 0
    np.testing.assert_allclose(
        np.asarray(g_emb), _grad_nhwc(emb_t), rtol=2e-4, atol=1e-6
    )


def test_2level_fast_grad_matches_torch(rng, classes_2level):
    """Fast composite: leaf = the RAW low-res head logits; both bilinear
    resizes (train.py:277-284) sit inside the differentiated graph, so
    this also checks resize-transpose parity."""
    h = Hierarchy.from_class_config(classes_2level)
    emb = random_unit_embedding(rng, 2, 8, 8, 8)
    lo = random_logits(rng, 2, 16, 16, h.total_classes)  # head output @1/4
    labels = random_labels(rng, 2, 64, 64, h.n_fine, p_ignore=0.1)

    composite = FastHieraTripletLoss(h)
    step = jnp.asarray(STEP_2LEVEL)
    g_emb, g_lo = jax.grad(
        lambda e, lg: composite(step, e, lg, lg, jnp.asarray(labels)),
        argnums=(0, 1),
    )(jnp.asarray(emb), jnp.asarray(lo))

    emb_t, lo_t = _leaf(emb), _leaf(lo)
    lb_t = torch.nn.functional.interpolate(
        lo_t, scale_factor=0.5, mode="bilinear", align_corners=False
    )
    lf_t = torch.nn.functional.interpolate(
        lo_t, size=(64, 64), mode="bilinear", align_corners=False
    )
    ref = _ref_2level(h)(
        torch.tensor([STEP_2LEVEL]),
        emb_t,
        lb_t[:, : h.n_fine],
        lf_t,
        torch.from_numpy(labels).long(),
    )
    ref.backward()

    np.testing.assert_allclose(np.asarray(g_lo), _grad_nhwc(lo_t), rtol=2e-4, atol=1e-6)
    assert np.abs(np.asarray(g_emb)).max() > 0
    np.testing.assert_allclose(
        np.asarray(g_emb), _grad_nhwc(emb_t), rtol=2e-4, atol=1e-6
    )


@pytest.mark.parametrize("fast", [False, True], ids=["nhwc", "fast"])
def test_3level_grad_matches_torch(rng, classes_3level, fast):
    """3-level gradients in the f64 oracle mode: RMI logdet backward
    (through OUR residual-Gram formulation vs the reference's Schur/
    Cholesky one — algebraically equal, so grads must agree), 3-level
    hierarchy BCE, and the three CEs. step=0 → triplet factor exactly 0
    (rmi_hiera_triplet_loss.py:539), so the deliberate triplet-grouping
    divergence (sharp edge #5) contributes no gradient; labels are still
    restricted to ids 0-6 because the reference group-triplet FORWARD
    crashes on ids outside its hardcoded sets (rmi_tree_triplet_loss.py:31-38)."""
    h = Hierarchy.from_class_config(classes_3level)
    emb = random_unit_embedding(rng, 2, 8, 8, 8)
    labels = random_labels(rng, 2, 64, 64, 7, p_ignore=0.1)

    emb_j, labels_j = jnp.asarray(emb), jnp.asarray(labels)
    with jax.enable_x64():
        if fast:
            lo = random_logits(rng, 2, 16, 16, h.total_classes)
            composite = FastRMIHieraTripletLoss(h, use_float64=True)
            g_lo, g_emb = jax.grad(
                lambda lg, e: composite(jnp.asarray(0), e, lg, lg, labels_j),
                argnums=(0, 1),
            )(jnp.asarray(lo), emb_j)
        else:
            lb = random_logits(rng, 2, 32, 32, h.n_fine)  # 1/8 fine slice
            lf = random_logits(rng, 2, 64, 64, h.total_classes)
            composite = RMIHieraTripletLoss(hierarchy=h, use_float64=True)
            g_lb, g_lf, g_emb = jax.grad(
                lambda b, f, e: composite(jnp.asarray(0), e, b, f, labels_j),
                argnums=(0, 1, 2),
            )(jnp.asarray(lb), jnp.asarray(lf), emb_j)

    emb_t = _leaf(emb)
    if fast:
        lo_t = _leaf(lo)
        lb_t = torch.nn.functional.interpolate(
            lo_t, scale_factor=0.5, mode="bilinear", align_corners=False
        )[:, : h.n_fine]
        lf_t = torch.nn.functional.interpolate(
            lo_t, size=(64, 64), mode="bilinear", align_corners=False
        )
    else:
        lb_t, lf_t = _leaf(lb), _leaf(lf)
    ref = _ref_3level(h)(
        torch.tensor([0]), emb_t, lb_t, lf_t, torch.from_numpy(labels).long()
    )
    ref.backward()

    if fast:
        np.testing.assert_allclose(
            np.asarray(g_lo), _grad_nhwc(lo_t), rtol=1e-3, atol=1e-5
        )
    else:
        # cls_score_before is unused by BOTH 3-level composites
        # (rmi_hiera_triplet_loss.py:335 "unused except by triplet", and
        # the triplet runs on the embedding) — zero grad ours, None torch
        assert np.abs(np.asarray(g_lb)).max() == 0
        assert lb_t.grad is None
        np.testing.assert_allclose(
            np.asarray(g_lf), _grad_nhwc(lf_t), rtol=1e-3, atol=1e-5
        )
    # factor(0) = 0 ⇒ the embedding receives exactly zero gradient —
    # and the reference leaf must agree
    assert np.abs(np.asarray(g_emb)).max() == 0
    assert emb_t.grad is None or float(emb_t.grad.abs().max()) == 0
