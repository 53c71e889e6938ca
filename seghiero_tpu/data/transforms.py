"""Joint image/mask transforms (host-side, NumPy/PIL).

Rebuilds ``JointTransform`` (dataset/dataloader.py:37-63): resize
(bilinear image / nearest mask) + shared-coin horizontal flip. Unlike the
reference we do NOT normalize on the host — images stay uint8 and are
normalized on-device (seghiero_tpu/data/pipeline.py:normalize_images), so
the host→device transfer is 4× smaller and the normalize fuses into the
first conv.

Fixes folded in (documented divergences):
  * resize is (H, W) applied consistently — the reference mixes PIL's
    (W, H) with F.interpolate's (H, W) (dataloader.py:51-56), which only
    works for square sizes.
  * randomness is an explicit per-sample ``numpy.random.Generator`` —
    reproducible given (seed, epoch, index) instead of torch global RNG.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import numpy as np
from PIL import Image

from seghiero_tpu.config import TransformConfig


def resize_mask_nearest(mask: np.ndarray, size: Tuple[int, int]) -> np.ndarray:
    """Nearest-neighbor mask resize with torch-interpolate index mapping
    (floor(dst·in/out)), same as ops/resize.downsample_labels_nearest but
    host-side and valid for up- or down-sampling."""
    H, W = mask.shape
    h, w = size
    ys = (np.arange(h) * H) // h
    xs = (np.arange(w) * W) // w
    return mask[ys[:, None], xs[None, :]]


@dataclasses.dataclass(frozen=True)
class JointTransform:
    """backend "pil" (default) reproduces the reference's PIL bilinear
    (area-filtered); "native" uses the C++ transform core
    (data/native/transform.cpp — half-pixel sampling, the torch/jax
    convention) for higher host throughput."""

    resize: Optional[Tuple[int, int]] = None  # (H, W)
    hflip_prob: float = 0.5
    backend: str = "pil"

    def __call__(
        self, img: Image.Image, mask: np.ndarray, rng: Optional[np.random.Generator]
    ) -> Tuple[np.ndarray, np.ndarray]:
        """img: PIL RGB; mask: [H, W] int. Returns (uint8 HWC, int32 HW)."""
        if self.backend == "native":
            from seghiero_tpu.data import native

            arr = np.asarray(img, dtype=np.uint8)
            mask = np.ascontiguousarray(mask, np.int32)
            if self.resize is not None:
                arr = native.resize_bilinear_u8(arr, self.resize)
                mask = native.resize_nearest_i32(mask, self.resize)
            if (
                rng is not None
                and self.hflip_prob > 0
                and rng.random() < self.hflip_prob
            ):
                arr = native.hflip_u8(arr)
                mask = native.hflip_i32(mask)
            return arr, mask

        if self.resize is not None:
            h, w = self.resize
            img = img.resize((w, h), Image.BILINEAR)  # PIL wants (W, H)
            mask = resize_mask_nearest(mask, (h, w))
        arr = np.asarray(img, dtype=np.uint8)
        if rng is not None and self.hflip_prob > 0 and rng.random() < self.hflip_prob:
            arr = arr[:, ::-1]
            mask = mask[:, ::-1]
        return np.ascontiguousarray(arr), np.ascontiguousarray(mask.astype(np.int32))

    @classmethod
    def from_config(cls, tf: TransformConfig) -> "JointTransform":
        return cls(resize=tf.resize, hflip_prob=tf.hflip_prob, backend=tf.backend)
