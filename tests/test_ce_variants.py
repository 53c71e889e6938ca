"""Parity of the sigmoid- and mask-mode CE variants (reference C11:
cross_entropy_loss.py use_sigmoid/use_mask paths)."""

import numpy as np
import pytest
import torch

from seghiero_tpu.losses.cross_entropy import (
    binary_cross_entropy,
    mask_cross_entropy,
    softmax_cross_entropy,
)

from reference_oracle import RefCrossEntropyLoss, to_torch_nchw

pytestmark = pytest.mark.fast


def test_binary_ce_same_shape_labels(rng):
    logits = rng.standard_normal((2, 8, 8, 5)).astype(np.float32)
    labels = (rng.random((2, 8, 8, 5)) < 0.3).astype(np.float32)
    ours = float(binary_cross_entropy(logits, labels))
    ref = RefCrossEntropyLoss(use_sigmoid=True)(
        to_torch_nchw(logits), to_torch_nchw(labels)
    )
    np.testing.assert_allclose(ours, float(ref), rtol=1e-5)


def test_binary_ce_index_labels_with_ignore(rng):
    logits = rng.standard_normal((2, 8, 8, 5)).astype(np.float32)
    labels = rng.integers(0, 5, (2, 8, 8)).astype(np.int64)
    labels[:, 0] = 255
    ours = float(binary_cross_entropy(logits, labels))
    ref = RefCrossEntropyLoss(use_sigmoid=True)(
        to_torch_nchw(logits), torch.from_numpy(labels)
    )
    np.testing.assert_allclose(ours, float(ref), rtol=1e-5)


def test_mask_ce(rng):
    logits = rng.standard_normal((4, 6, 6, 3)).astype(np.float32)
    target = (rng.random((4, 6, 6)) < 0.5).astype(np.float32)
    label = rng.integers(0, 3, (4,)).astype(np.int64)
    ours = float(mask_cross_entropy(logits, target, label))
    ref = RefCrossEntropyLoss(use_mask=True)(
        # reference mask CE indexes pred[inds, label] then squeezes dim 1:
        # shape [N, C, H, W] -> select -> [N, H, W]
        to_torch_nchw(logits),
        torch.from_numpy(target),
        torch.from_numpy(label),
    )
    np.testing.assert_allclose(ours, float(ref), rtol=1e-5)


def test_softmax_ce_per_pixel_weight(rng):
    logits = rng.standard_normal((2, 6, 6, 4)).astype(np.float32)
    labels = rng.integers(0, 4, (2, 6, 6)).astype(np.int64)
    w = rng.random((2, 6, 6)).astype(np.float32)
    ours = float(softmax_cross_entropy(logits, labels, weight=w))
    ref = RefCrossEntropyLoss()(
        to_torch_nchw(logits), torch.from_numpy(labels), torch.from_numpy(w)
    )
    np.testing.assert_allclose(ours, float(ref), rtol=1e-5)


def test_softmax_ce_avg_factor(rng):
    logits = rng.standard_normal((2, 6, 6, 4)).astype(np.float32)
    labels = rng.integers(0, 4, (2, 6, 6)).astype(np.int64)
    ours = float(softmax_cross_entropy(logits, labels, avg_factor=17.0))
    ref = RefCrossEntropyLoss()(
        to_torch_nchw(logits), torch.from_numpy(labels), avg_factor=17.0
    )
    np.testing.assert_allclose(ours, float(ref), rtol=1e-5)
