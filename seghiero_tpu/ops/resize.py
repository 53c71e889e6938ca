"""Spatial resizing ops (NHWC).

The reference leans on ``torch.nn.functional.interpolate`` in three places:
  - logits → 1/2 scale for the "before" slice (train.py:277-279)
  - logits → full label resolution (train.py:282-284)
  - labels → embedding resolution, nearest (tree_triplet_loss.py:17-19)

``jax.image.resize(method="linear", antialias=False)`` uses the same
half-pixel-center convention as torch ``align_corners=False`` (verified by
parity tests in tests/test_resize.py), so XLA handles bilinear natively —
it lowers to gathers/matmuls that fuse well on TPU; no custom kernel
needed here.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def resize_bilinear(x: jax.Array, size: Tuple[int, int]) -> jax.Array:
    """Bilinear resize of NHWC (or HWC) to spatial ``size`` = (H, W).

    Matches torch ``F.interpolate(mode="bilinear", align_corners=False,
    antialias=False)`` for both up- and down-sampling.
    """
    if x.ndim == 4:
        out_shape = (x.shape[0], size[0], size[1], x.shape[3])
    elif x.ndim == 3:
        out_shape = (size[0], size[1], x.shape[2])
    else:
        raise ValueError(f"expected HWC or NHWC, got shape {x.shape}")
    return jax.image.resize(x, out_shape, method="linear", antialias=False)


def half_size(hw: Tuple[int, int]) -> Tuple[int, int]:
    """Output size of torch ``interpolate(scale_factor=0.5)`` (floor)."""
    return (hw[0] // 2, hw[1] // 2)


def downsample_labels_nearest(labels: jax.Array, size: Tuple[int, int]) -> jax.Array:
    """Nearest-neighbor resize of integer label maps [B, H, W] → [B, h, w].

    Matches torch ``F.interpolate(mode="nearest")`` which picks source
    index ``floor(dst * in/out)`` (tree_triplet_loss.py:17-19 downsamples
    labels this way before the triplet loss). Implemented as a static
    gather — no float round-tripping of the int labels.
    """
    H, W = labels.shape[-2:]
    h, w = size
    ys = (np.arange(h) * H) // h
    xs = (np.arange(w) * W) // w
    return labels[..., ys[:, None], xs[None, :]]
