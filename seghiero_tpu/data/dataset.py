"""File-backed hierarchical segmentation dataset.

Rebuilds ``HieroDataloader`` (dataset/dataloader.py:66-187): intersect
image/mask directories by filename, decode RGB image + integer fine mask,
derive coarse (and super) masks through the hierarchy LUTs, apply the
joint transform.

Fixes folded in (documented divergences from the reference):
  * 255-safe LUT indexing (reference crashes with IndexError on any
    ignored pixel, dataloader.py:166,175 — sharp edge #2).
  * the super-level path triggers on the documented config key
    (reference checks 'super_coarse_map' but documents
    'super_coarse_to_coarse_map', dataloader.py:128 — sharp edge #1).
  * fine→super derived via the coarse level (sharp edge #3).

Samples are dicts with static-shaped arrays: ``image`` uint8 [H, W, 3],
``fine``/``coarse``(/``super``) int32 [H, W]. A config ``resize`` (or
uniformly-sized data) is required — XLA wants static shapes.
"""

from __future__ import annotations

import os
from typing import Dict, Optional

import numpy as np
from PIL import Image

from seghiero_tpu.config import SegHieroConfig
from seghiero_tpu.data.transforms import JointTransform
from seghiero_tpu.hierarchy import Hierarchy


class HieroDataset:
    def __init__(
        self,
        config: SegHieroConfig,
        split: str = "train",
        transform: Optional[JointTransform] = None,
        seed: int = 0,
        include_levels: bool = True,
    ):
        if split not in ("train", "val"):
            raise ValueError("split must be 'train' or 'val'")
        self.split = split
        self.hierarchy: Hierarchy = config.hierarchy
        self.seed = seed
        self.epoch = 0
        # the jitted train step derives coarse/super targets on device
        # from the fine mask (train/steps.py); the trainer's TRAIN loader
        # passes include_levels=False so the host skips the per-sample
        # LUT mapping entirely (eval loaders keep it — metrics consume
        # the level masks)
        self.include_levels = include_levels

        img_dir = config.dataset.image_dir(split)
        msk_dir = config.dataset.mask_dir(split)
        img_files = set(os.listdir(img_dir))
        msk_files = set(os.listdir(msk_dir))
        common = sorted(img_files & msk_files)  # dataloader.py:106-113
        if not common:
            raise FileNotFoundError(
                f"No matching files between {img_dir} and {msk_dir}"
            )
        self.img_paths = [os.path.join(img_dir, f) for f in common]
        self.msk_paths = [os.path.join(msk_dir, f) for f in common]

        if transform is not None:
            self.transform = transform
        else:
            self.transform = JointTransform.from_config(config.transform)
            if split == "val" or config.transform.device_hflip:
                # val: deterministic eval — no flips (the reference flips
                # val batches too via the same transform — we diverge:
                # eval should be deterministic; resize still applies).
                # device_hflip: the jitted train step flips image+label
                # on device (train/steps.py), so the host must not.
                import dataclasses as _dc

                self.transform = _dc.replace(self.transform, hflip_prob=0.0)

    def set_epoch(self, epoch: int) -> None:
        """Advance the per-epoch augmentation stream."""
        self.epoch = epoch

    def __len__(self) -> int:
        return len(self.img_paths)

    def __getitem__(self, idx: int) -> Dict[str, np.ndarray]:
        img = Image.open(self.img_paths[idx]).convert("RGB")
        fine = np.asarray(Image.open(self.msk_paths[idx]), dtype=np.int64)
        if fine.ndim == 3:  # paletted masks may decode to HWC; take ch 0
            fine = fine[..., 0]

        rng = np.random.default_rng(
            np.random.SeedSequence([self.seed, self.epoch, idx])
        )
        image, fine = self.transform(img, fine, rng if self.split == "train" else None)

        out = {"image": image, "fine": fine}
        if self.include_levels:
            h = self.hierarchy
            out["coarse"] = h.map_fine_labels(fine, "coarse")
            if h.has_super:
                out["super"] = h.map_fine_labels(fine, "super")
        return out


def build_dataset(
    config: SegHieroConfig,
    split: str,
    seed: int = 0,
    include_levels: bool = True,
    verbose: bool = True,
):
    """Dataset factory: file-backed or synthetic per ``dataset.kind``;
    ``dataset.cache: raw`` wraps the file-backed dataset in the decoded
    memmap cache (data/cache.py)."""
    if config.dataset.kind == "synthetic":
        from seghiero_tpu.data.synthetic import SyntheticShapesDataset

        return SyntheticShapesDataset(config, split=split, seed=seed)
    ds = HieroDataset(
        config, split=split, seed=seed, include_levels=include_levels
    )
    if config.dataset.cache == "raw":
        from seghiero_tpu.data.cache import RawCacheDataset

        return RawCacheDataset(
            ds,
            cache_dir=config.dataset.cache_dir,
            include_levels=include_levels,
            verbose=verbose,
        )
    return ds
