"""Parity of our resize ops with torch F.interpolate (the reference's
resizing primitive at train.py:277-284 and tree_triplet_loss.py:17-19)."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

from seghiero_tpu.ops import downsample_labels_nearest, half_size, resize_bilinear

pytestmark = pytest.mark.fast


def _torch_bilinear(x_nhwc, size):
    t = torch.from_numpy(np.moveaxis(x_nhwc, -1, 1))
    out = F.interpolate(t, size=size, mode="bilinear", align_corners=False)
    return np.moveaxis(out.numpy(), 1, -1)


def test_bilinear_upsample_matches_torch(rng):
    x = rng.standard_normal((2, 13, 17, 5)).astype(np.float32)
    ours = np.asarray(resize_bilinear(x, (52, 68)))
    ref = _torch_bilinear(x, (52, 68))
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)


def test_bilinear_downsample_matches_torch(rng):
    # torch interpolate does NOT antialias on downsample; neither must we
    x = rng.standard_normal((2, 32, 40, 3)).astype(np.float32)
    ours = np.asarray(resize_bilinear(x, (16, 20)))
    ref = _torch_bilinear(x, (16, 20))
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)


def test_half_size_matches_torch_scale_factor():
    # train.py:277-279 uses scale_factor=0.5 (floor)
    x = np.zeros((1, 37, 51, 2), dtype=np.float32)
    t = torch.from_numpy(np.moveaxis(x, -1, 1))
    ref = F.interpolate(t, scale_factor=0.5, mode="bilinear", align_corners=False)
    assert half_size((37, 51)) == tuple(ref.shape[-2:])


def test_nearest_label_downsample_matches_torch(rng):
    lbl = rng.integers(0, 20, size=(2, 33, 47)).astype(np.int64)
    lbl[0, :5] = 255
    ours = np.asarray(downsample_labels_nearest(lbl, (9, 12)))
    ref = (
        F.interpolate(
            torch.from_numpy(lbl).unsqueeze(1).float(), size=(9, 12), mode="nearest"
        )
        .long()
        .squeeze(1)
        .numpy()
    )
    np.testing.assert_array_equal(ours, ref)
