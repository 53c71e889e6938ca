"""Raw decoded-sample cache (``dataset.cache: raw``).

The reference re-runs PIL decode + resize for every sample every epoch
inside DataLoader workers (dataset/dataloader.py:157-187). On hosts with
few cores that decode is the training bottleneck: PNG decode alone costs
~13 ms per 512² image (measured, single Xeon core) — ~55 img/s against a
TPU step that consumes 233 img/s.

``RawCacheDataset`` decodes every (image, mask) pair ONCE at the config
resize and memory-maps the raw arrays:

  * ``images.u8``  — uint8  [N, H, W, 3]
  * ``fine.<dt>``  — the fine mask, uint8 when the label space fits
    (n_fine < 255 with 255-ignore), else int32
  * ``meta.json``  — fingerprint (file list + mtimes + resize + backend)
    for invalidation

Later epochs read at page-cache/memcpy speed and re-run only the *random*
part of the transform (``JointTransform.apply_arrays`` — scale jitter,
flip, color jitter) with the exact same per-(seed, epoch, idx) RNG
stream, so a cached sample is bit-identical to the uncached one.

``get_batch`` is the batched fast path consumed by ``BatchLoader``: one
fancy-index gather collates the whole batch without per-sample stacking,
and the coarse/super level masks derive through a single 256-entry LUT
take per level (train pipelines skip them entirely —
``include_levels=False`` — since the jitted step derives targets from the
fine mask on device; see train/steps.py).
"""

from __future__ import annotations

import hashlib
import json
import os
from typing import Dict, List, Optional, Sequence

import numpy as np

from seghiero_tpu.hierarchy import Hierarchy


def _fingerprint(paths: List[str], extra: dict) -> str:
    h = hashlib.sha256()
    for p in paths:
        st = os.stat(p)
        h.update(f"{p}:{st.st_size}:{st.st_mtime_ns};".encode())
    h.update(json.dumps(extra, sort_keys=True).encode())
    return h.hexdigest()[:24]


def _take_lut(lut: np.ndarray, ignore_index: int) -> np.ndarray:
    """Extend a length-n_fine LUT to 256 entries mapping everything out of
    range (incl. the 255-ignore) to ``ignore_index`` — turns the 3-pass
    masked ``np.where`` mapping into one fancy-index take on uint8 masks.
    Output dtype is uint8 when the level's label space fits (narrow
    host→device transfer), else int32."""
    vals = np.asarray(lut)
    narrow = ignore_index == 255 and (vals.size == 0 or int(vals.max()) < 255)
    dt = np.uint8 if narrow else np.int32
    full = np.full(256, ignore_index, dt)
    full[: len(vals)] = vals.astype(dt)
    return full


def prune_stale(
    cache_root: str,
    older_than_days: float = 30.0,
    tmp_older_than_hours: float = 2.0,
) -> int:
    """Delete abandoned cache state under ``cache_root``: ``*.tmp.*``
    build dirs older than ``tmp_older_than_hours`` (a killed builder's
    leftovers) and ``raw_*`` fingerprint dirs whose ``meta.json`` has
    not been touched for ``older_than_days`` (every dataset open
    refreshes the stamp, so anything in use survives). Each obsolete
    fingerprint is N·H·W·3 bytes — without this, every file-mtime or
    resize change would abandon gigabytes forever. Returns the number
    of directories removed. Runs automatically on every cache open."""
    import shutil
    import time as _time

    if not os.path.isdir(cache_root):
        return 0
    now = _time.time()
    removed = 0
    for name in os.listdir(cache_root):
        path = os.path.join(cache_root, name)
        if not os.path.isdir(path):
            continue
        try:
            if ".tmp." in name:
                if now - os.path.getmtime(path) > tmp_older_than_hours * 3600:
                    shutil.rmtree(path, ignore_errors=True)
                    removed += 1
            elif name.startswith("raw_"):
                meta = os.path.join(path, "meta.json")
                stamp = (
                    os.path.getmtime(meta)
                    if os.path.exists(meta)
                    else os.path.getmtime(path)
                )
                if now - stamp > older_than_days * 86400:
                    shutil.rmtree(path, ignore_errors=True)
                    removed += 1
        except OSError:
            continue
    return removed


class RawCacheDataset:
    """Wraps a decoded dataset (``HieroDataset``-shaped: ``img_paths``,
    ``msk_paths``, ``transform``, ``hierarchy``) with a raw memmap cache.

    The cache stores the *base* (resize-only, un-augmented) arrays; the
    wrapped dataset's transform provides the per-epoch augmentation via
    ``apply_arrays``.
    """

    def __init__(
        self,
        base,
        cache_dir: Optional[str] = None,
        include_levels: bool = True,
        verbose: bool = True,
    ):
        self.base = base
        self.hierarchy: Hierarchy = base.hierarchy
        self.transform = base.transform
        self.split = base.split
        self.seed = base.seed
        self.epoch = getattr(base, "epoch", 0)
        self.include_levels = include_levels

        h, w = self._base_hw()
        self._hw = (h, w)
        hier = self.hierarchy
        self._fine_dtype = (
            np.uint8
            if hier.n_fine < 255 and hier.ignore_index == 255
            else np.int32
        )
        # the 256-entry take-LUTs only exist for the uint8 storage path;
        # wide hierarchies (n_fine >= 255 → int32 storage) use
        # map_fine_labels in get_batch instead
        if self._fine_dtype == np.uint8:
            self._lut_coarse = _take_lut(hier.fine_to_coarse, hier.ignore_index)
            self._lut_super = (
                _take_lut(hier.fine_to_super, hier.ignore_index)
                if hier.has_super
                else None
            )
        else:
            self._lut_coarse = self._lut_super = None

        extra = {
            "hw": [h, w],
            "backend": self.transform.backend,
            "fine_dtype": np.dtype(self._fine_dtype).name,
            "version": 1,
        }
        fp = _fingerprint(
            list(base.img_paths) + list(base.msk_paths), extra
        )
        root = cache_dir or os.path.join(
            os.path.expanduser("~"), ".cache", "seghiero_tpu"
        )
        self.cache_path = os.path.join(root, f"raw_{self.split}_{fp}")
        self._build_if_missing(verbose)
        self._open_memmaps()
        # mark this fingerprint as in-use (prune_stale keys on it) and
        # sweep the cache root: orphan tmp dirs from killed builders and
        # fingerprints untouched for 30 days (every open refreshes the
        # stamp, so anything in active use survives)
        try:
            os.utime(os.path.join(self.cache_path, "meta.json"))
            prune_stale(os.path.dirname(self.cache_path))
        except OSError:
            pass

    def _open_memmaps(self):
        n = len(self.base)
        h, w = self._hw
        self.images = np.memmap(
            os.path.join(self.cache_path, "images.u8"),
            np.uint8, "r", shape=(n, h, w, 3),
        )
        self.fine = np.memmap(
            os.path.join(self.cache_path, "fine.raw"),
            self._fine_dtype, "r", shape=(n, h, w),
        )

    def __getstate__(self):
        """Pickle WITHOUT the memmaps: np.memmap serializes as a full
        in-memory ndarray, so shipping this dataset to loader worker
        processes (grain) would materialize the whole cache per worker.
        Workers reopen the maps from the path instead."""
        state = dict(self.__dict__)
        state.pop("images", None)
        state.pop("fine", None)
        return state

    def __setstate__(self, state):
        self.__dict__.update(state)
        self._open_memmaps()

    # ------------------------------------------------------------------
    def _base_hw(self):
        if self.transform.resize is not None:
            return tuple(self.transform.resize)
        # no config resize: all files must already share one size — probe
        # the first sample (the uncached dataset has the same constraint:
        # XLA wants static shapes)
        from PIL import Image

        with Image.open(self.base.img_paths[0]) as im:
            w, h = im.size
        return (h, w)

    def _build_if_missing(self, verbose: bool):
        """Build into a private tmp dir, then atomically rename into
        place. Concurrent builders (multi-process training, two jobs
        sharing a cache_dir) each build their own tmp; the rename loser
        discards its copy — nobody ever writes into a directory another
        process may already have memory-mapped."""
        done = os.path.join(self.cache_path, "meta.json")
        if os.path.exists(done):
            return
        import shutil
        import time

        from PIL import Image

        tmp = f"{self.cache_path}.tmp.{os.getpid()}"
        os.makedirs(tmp, exist_ok=True)
        n = len(self.base)
        h, w = self._hw
        t0 = time.perf_counter()
        img_mm = np.memmap(
            os.path.join(tmp, "images.u8"),
            np.uint8, "w+", shape=(n, h, w, 3),
        )
        fin_mm = np.memmap(
            os.path.join(tmp, "fine.raw"),
            self._fine_dtype, "w+", shape=(n, h, w),
        )
        # decode WITHOUT augmentation (rng=None → resize only): the cache
        # holds base arrays, augmentation replays per epoch on top
        tf = self.transform
        for i in range(n):
            img = Image.open(self.base.img_paths[i]).convert("RGB")
            fine = np.asarray(Image.open(self.base.msk_paths[i]), dtype=np.int64)
            if fine.ndim == 3:
                fine = fine[..., 0]
            arr, mask = tf(img, fine, None)
            img_mm[i] = arr
            fin_mm[i] = mask.astype(self._fine_dtype)
        img_mm.flush()
        fin_mm.flush()
        del img_mm, fin_mm
        with open(os.path.join(tmp, "meta.json"), "w") as f:
            json.dump(
                {"n": n, "hw": [h, w], "built_s": time.perf_counter() - t0},
                f,
            )
        try:
            os.rename(tmp, self.cache_path)
        except OSError:
            # a concurrent builder won the rename; use theirs
            shutil.rmtree(tmp, ignore_errors=True)
        if verbose:
            print(
                f"[data] raw cache built: {n} samples at {h}x{w} in "
                f"{time.perf_counter() - t0:.1f}s -> {self.cache_path}"
            )

    # ------------------------------------------------------------------
    def set_epoch(self, epoch: int) -> None:
        self.epoch = epoch
        if hasattr(self.base, "set_epoch"):
            self.base.set_epoch(epoch)

    def __len__(self) -> int:
        return len(self.base)

    def _rng(self, idx: int):
        if self.split != "train":
            return None
        return np.random.default_rng(
            np.random.SeedSequence([self.seed, self.epoch, idx])
        )

    def _augment_one(self, idx: int):
        arr = np.asarray(self.images[idx])
        mask = np.asarray(self.fine[idx])
        return self.transform.apply_arrays(arr, mask, self._rng(idx))

    def __getitem__(self, idx: int) -> Dict[str, np.ndarray]:
        image, fine = self._augment_one(idx)
        out = {"image": image, "fine": fine}
        if self.include_levels:
            h = self.hierarchy
            out["coarse"] = h.map_fine_labels(fine, "coarse")
            if h.has_super:
                out["super"] = h.map_fine_labels(fine, "super")
        return out

    # ------------------------------------------------------------------
    def get_batch(self, indices: Sequence[int]) -> Dict[str, np.ndarray]:
        """Batched fetch (BatchLoader fast path): collated dict without
        per-sample stacking. Augmentation stays per-sample (same RNG
        stream as ``__getitem__``); level LUTs apply batched."""
        idx = [int(i) for i in indices]
        aug = self.transform
        plain = (
            self.split != "train"
            or (
                aug.hflip_prob == 0
                and aug.scale_range is None
                and aug.color_jitter == 0
            )
        )
        if plain:
            # pure gather: one fancy-index collates the batch
            images = self.images[idx]
            fine = self.fine[idx]
        else:
            pairs = [self._augment_one(i) for i in idx]
            images = np.stack([p[0] for p in pairs])
            fine = np.stack([p[1] for p in pairs])
        # labels ship in the narrow storage dtype (uint8 when the label
        # space fits): 4× less host→device traffic; the jitted step
        # widens on device (train/steps.py casts batch["fine"])
        out = {
            "image": np.ascontiguousarray(images),
            "fine": fine.astype(self._fine_dtype, copy=False),
        }
        if self.include_levels:
            if self._fine_dtype == np.uint8:
                # labels fit in u8 (incl. the 255-ignore): one take/level
                out["coarse"] = self._lut_coarse[out["fine"]]
                if self._lut_super is not None:
                    out["super"] = self._lut_super[out["fine"]]
            else:
                h = self.hierarchy
                out["coarse"] = h.map_fine_labels(out["fine"], "coarse")
                if h.has_super:
                    out["super"] = h.map_fine_labels(out["fine"], "super")
        return out


def main(argv=None) -> None:
    """``python -m seghiero_tpu.data.cache --config cfg.yaml``: pre-build
    the raw caches offline (both splits) so a training job starts warm —
    useful when the cache lives on shared storage and the first-epoch
    decode cost should not land inside the job's wall-clock. Also
    exposes ``--prune`` for explicit cache-root hygiene."""
    import argparse

    from seghiero_tpu.config import load_config

    p = argparse.ArgumentParser(
        description="Pre-build (or prune) the raw decoded-sample cache"
    )
    p.add_argument("--config", required=True, help="YAML config with "
                   "dataset.cache: raw (or any file-backed dataset — "
                   "cache is forced on here)")
    p.add_argument("--splits", default="train,val")
    p.add_argument("--prune-days", type=float, default=None,
                   help="also prune fingerprints untouched this many days")
    args = p.parse_args(argv)

    import dataclasses

    from seghiero_tpu.data.dataset import build_dataset

    cfg = load_config(args.config)
    if cfg.dataset.cache != "raw":
        cfg = dataclasses.replace(
            cfg, dataset=dataclasses.replace(cfg.dataset, cache="raw")
        )
    for split in args.splits.split(","):
        ds = build_dataset(cfg, split.strip(), verbose=True)
        print(
            f"→ {split}: {len(ds)} samples cached at {ds.cache_path} "
            f"({os.path.getsize(os.path.join(ds.cache_path, 'images.u8')) / 2**20:.1f} MiB images)"
        )
        if args.prune_days is not None:
            n = prune_stale(
                os.path.dirname(ds.cache_path), older_than_days=args.prune_days
            )
            print(f"→ pruned {n} stale cache dirs")


if __name__ == "__main__":
    main()
