"""Raw decoded-sample cache (data/cache.py) + device-side hflip.

Round-4 verdict ask #1 groundwork: the host input pipeline must be able
to feed the chip at step rate. The cache must be *transparent* — cached
samples bit-identical to uncached ones for the same (seed, epoch, idx),
including the augmentation stream — and the batched ``get_batch`` path
must match the per-sample path exactly.
"""

import dataclasses

import numpy as np
import pytest
import jax.numpy as jnp
from PIL import Image

from seghiero_tpu.config import SegHieroConfig
from seghiero_tpu.data.cache import RawCacheDataset
from seghiero_tpu.data.dataset import HieroDataset, build_dataset
from seghiero_tpu.data.pipeline import BatchLoader

pytestmark = pytest.mark.fast


def _write_files(root, n=6, hw=(24, 24), n_classes=9):
    rng = np.random.default_rng(3)
    for split in ("train", "val"):
        (root / split / "img").mkdir(parents=True)
        (root / split / "msk").mkdir(parents=True)
        for i in range(n):
            img = rng.integers(0, 255, (*hw, 3), dtype=np.uint8)
            mask = rng.integers(0, n_classes, hw).astype(np.uint8)
            mask[:2, :2] = 255
            Image.fromarray(img).save(root / split / "img" / f"s{i}.png")
            Image.fromarray(mask).save(root / split / "msk" / f"s{i}.png")


def _cfg(tmp_path, classes_2level, **transform):
    return SegHieroConfig.from_dict(
        {
            "dataset": {
                "root": str(tmp_path / "data"),
                "train": {"image_subdir": "train/img", "mask_subdir": "train/msk"},
                "val": {"image_subdir": "val/img", "mask_subdir": "val/msk"},
                "cache": "raw",
                "cache_dir": str(tmp_path / "cache"),
            },
            "classes": classes_2level,
            "transform": {"resize": [16, 16], "hflip_prob": 0.5, **transform},
            "output": {"checkpoint_dir": str(tmp_path), "project_name": "t"},
        }
    )


@pytest.fixture
def files(tmp_path, classes_2level):
    _write_files(tmp_path / "data")
    return _cfg(tmp_path, classes_2level)


def test_cached_samples_bit_identical(files):
    """Cache transparency: same (seed, epoch, idx) → same bytes as the
    uncached dataset, including random flips across epochs."""
    plain = HieroDataset(files, "train", seed=5)
    cached = RawCacheDataset(
        HieroDataset(files, "train", seed=5),
        cache_dir=files.dataset.cache_dir,
        verbose=False,
    )
    for epoch in (0, 1):
        plain.set_epoch(epoch)
        cached.set_epoch(epoch)
        for i in range(len(plain)):
            a, b = plain[i], cached[i]
            assert set(a) == set(b)
            for k in a:
                np.testing.assert_array_equal(a[k], b[k], err_msg=f"{k}@{i}")


def test_get_batch_matches_getitem(files):
    cached = build_dataset(files, "train", seed=1, verbose=False)
    assert isinstance(cached, RawCacheDataset)
    cached.set_epoch(2)
    idx = [3, 0, 5]
    batch = cached.get_batch(idx)
    for j, i in enumerate(idx):
        item = cached[i]
        np.testing.assert_array_equal(batch["image"][j], item["image"])
        np.testing.assert_array_equal(
            np.asarray(batch["fine"][j], np.int32), item["fine"]
        )
        np.testing.assert_array_equal(
            np.asarray(batch["coarse"][j], np.int32), item["coarse"]
        )


def test_val_split_plain_gather_and_loader_padding(files):
    """val: no augmentation → the pure-gather path; BatchLoader pads the
    short tail with 255 labels through get_batch too."""
    cached = build_dataset(files, "val", seed=1, verbose=False)
    batch = cached.get_batch([0, 1])
    plain = HieroDataset(files, "val", seed=1)
    np.testing.assert_array_equal(batch["image"][0], plain[0]["image"])
    np.testing.assert_array_equal(
        np.asarray(batch["fine"], np.int32),
        np.stack([plain[0]["fine"], plain[1]["fine"]]),
    )

    loader = BatchLoader(cached, 4, drop_last=False, prefetch=0)
    batches = list(loader)
    assert len(batches) == 2  # 6 samples → 4 + 2(padded to 4)
    tail = batches[-1]
    assert tail["image"].shape[0] == 4
    assert (np.asarray(tail["fine"][2:], np.int32) == 255).all()


def test_train_loader_skips_levels(files):
    """Trainer wiring: the train loader derives no level masks on the
    host (the jitted step derives targets on device)."""
    ds = build_dataset(files, "train", include_levels=False, verbose=False)
    assert set(ds.get_batch([0])) == {"image", "fine"}
    assert set(ds[0]) == {"image", "fine"}


def test_cache_invalidation(files, tmp_path):
    c1 = build_dataset(files, "train", verbose=False)
    # touching a mask re-fingerprints the cache
    p = tmp_path / "data" / "train" / "msk" / "s0.png"
    arr = np.asarray(Image.open(p)).copy()
    arr[5:7, 5:7] = 1
    Image.fromarray(arr).save(p)
    c2 = build_dataset(files, "train", verbose=False)
    assert c1.cache_path != c2.cache_path
    # the rebuilt cache reflects the edited mask (modulo the 24→16 resize)
    assert (np.asarray(c2.fine[0]) != np.asarray(c1.fine[0])).any()
    assert (np.asarray(c2.fine[0]) == 1).any()


def test_device_hflip_disables_host_flip_and_matches_manual_flip(
    tmp_path, classes_2level
):
    _write_files(tmp_path / "data")
    cfg = _cfg(tmp_path, classes_2level, device_hflip=True, hflip_prob=1.0)
    ds = build_dataset(cfg, "train", verbose=False)
    assert ds.transform.hflip_prob == 0.0  # host flip off

    # hflip_prob=1.0 → every coin True → the device flip is deterministic:
    # loss(device_hflip, batch) == loss(host-flipped batch, no flip)
    from seghiero_tpu.models.segmenter import build_model
    from seghiero_tpu.train.steps import _forward_losses, make_composite_loss

    cfg_small = dataclasses.replace(
        cfg,
        model=dataclasses.replace(
            cfg.model, depth=18, aspp_channels=16, c1_channels=8, proj_dim=8
        ),
    )
    model = build_model(cfg_small)
    composite = make_composite_loss(cfg_small)
    import jax

    variables = jax.jit(model.init, static_argnames=("train",))(
        jax.random.key(0), jnp.zeros((1, 16, 16, 3)), train=False
    )
    batch = ds.get_batch([0, 1])
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    step = jnp.zeros((), jnp.int32)

    loss_dev, *_ = _forward_losses(
        model, composite, cfg_small, variables, batch, step, train=True
    )
    flipped = {
        "image": batch["image"][:, :, ::-1, :],
        "fine": batch["fine"][:, :, ::-1],
    }
    cfg_off = dataclasses.replace(
        cfg_small,
        transform=dataclasses.replace(cfg_small.transform, device_hflip=False),
    )
    loss_ref, *_ = _forward_losses(
        model, composite, cfg_off, variables, flipped, step, train=True
    )
    np.testing.assert_allclose(
        np.asarray(loss_dev), np.asarray(loss_ref), rtol=1e-6
    )


@pytest.mark.medium
def test_trainer_e2e_with_cache_and_device_flip(tmp_path, classes_2level):
    """Full Trainer epoch over the raw cache with device-side flips:
    loaders wire include_levels correctly (train batches image+fine
    only, val keeps levels for metrics), the epoch completes, and a
    checkpoint lands."""
    # platform pinning comes from tests/conftest.py (env before jax
    # import) — no process-global jax.config mutation here
    _write_files(tmp_path / "data", n=6, hw=(24, 24))
    cfg0 = _cfg(tmp_path, classes_2level, device_hflip=True)
    import dataclasses as dc

    cfg = dc.replace(
        cfg0,
        model=dc.replace(
            cfg0.model, depth=18, dtype="float32",
            aspp_channels=16, c1_channels=8, proj_dim=8,
        ),
        training=dc.replace(
            cfg0.training, epochs=1, batch_size=2, lr=0.01, num_workers=0
        ),
    )
    from seghiero_tpu.train.trainer import Trainer

    trainer = Trainer(cfg, verbose=False)
    assert set(next(iter(trainer.train_loader))) == {"image", "fine"}
    val_batch = next(iter(trainer.val_loader))
    assert {"image", "fine", "coarse"} <= set(val_batch)
    history = trainer.fit()
    assert len(history) == 1 and "val_loss" in history[0]
    import os

    root = os.path.join(cfg.output.checkpoint_dir, cfg.output.project_name)
    assert any(d.startswith("step_") for d in os.listdir(root))


def test_wide_hierarchy_int32_storage_and_pickle(tmp_path):
    """Review findings (round 5): n_fine >= 257 must take the int32
    storage path (no 256-entry LUT build crash), and pickling must NOT
    materialize the memmaps (grain workers reopen them by path)."""
    import pickle

    root = tmp_path / "data"
    rng = np.random.default_rng(0)
    n_fine = 300
    for split in ("train", "val"):
        (root / split / "img").mkdir(parents=True)
        (root / split / "msk").mkdir(parents=True)
        for i in range(3):
            Image.fromarray(
                rng.integers(0, 255, (16, 16, 3), np.uint8)
            ).save(root / split / "img" / f"{i}.png")
            m = rng.integers(0, n_fine, (16, 16)).astype(np.int32)
            Image.fromarray(m, mode="I").save(root / split / "msk" / f"{i}.png")
    cfg = SegHieroConfig.from_dict(
        {
            "dataset": {
                "root": str(root),
                "train": {"image_subdir": "train/img", "mask_subdir": "train/msk"},
                "val": {"image_subdir": "val/img", "mask_subdir": "val/msk"},
                "cache": "raw",
                "cache_dir": str(tmp_path / "cache"),
            },
            "classes": {
                "coarse_to_fine_map": [
                    [i * 30, i * 30 + 29] for i in range(10)
                ],
                "coarse_names": {i: f"c{i}" for i in range(10)},
                "fine_names": {i: f"f{i}" for i in range(n_fine)},
            },
            "transform": {"resize": [16, 16]},
            "output": {"checkpoint_dir": str(tmp_path), "project_name": "w"},
        }
    )
    ds = build_dataset(cfg, "train", verbose=False)
    b = ds.get_batch([0, 1])
    assert b["fine"].dtype == np.int32
    assert b["coarse"].shape == (2, 16, 16)
    # derived levels match the uncached mapping
    h = cfg.hierarchy
    np.testing.assert_array_equal(
        b["coarse"], h.map_fine_labels(np.asarray(b["fine"]), "coarse")
    )
    blob = pickle.dumps(ds)
    assert len(blob) < 100_000, len(blob)  # memmaps not materialized
    ds2 = pickle.loads(blob)
    np.testing.assert_array_equal(
        ds2.get_batch([1])["image"], ds.get_batch([1])["image"]
    )


def test_prune_stale(tmp_path):
    """Cache-root hygiene: orphan tmp build dirs and month-stale
    fingerprints are swept; fresh fingerprints survive."""
    import os
    import time

    from seghiero_tpu.data.cache import prune_stale

    root = tmp_path / "cacheroot"
    (root / "raw_train_old").mkdir(parents=True)
    (root / "raw_train_new").mkdir()
    (root / "raw_val_x.tmp.999").mkdir()
    (root / "raw_train_old" / "meta.json").write_text("{}")
    (root / "raw_train_new" / "meta.json").write_text("{}")
    old = time.time() - 40 * 86400
    os.utime(root / "raw_train_old" / "meta.json", (old, old))
    os.utime(root / "raw_val_x.tmp.999", (old, old))
    assert prune_stale(str(root)) == 2
    assert sorted(os.listdir(root)) == ["raw_train_new"]


def test_cache_prebuild_cli(tmp_path, classes_2level, capsys):
    """python -m seghiero_tpu.data.cache --config ... builds both
    splits' caches offline (cache forced on even if the config says
    none) and supports explicit pruning."""
    import os

    import yaml

    from seghiero_tpu.data.cache import main as cache_main

    _write_files(tmp_path / "data", n=4)
    cfg = {
        "dataset": {
            "root": str(tmp_path / "data"),
            "train": {"image_subdir": "train/img", "mask_subdir": "train/msk"},
            "val": {"image_subdir": "val/img", "mask_subdir": "val/msk"},
            "cache_dir": str(tmp_path / "cache"),
        },
        "classes": classes_2level,
        "transform": {"resize": [16, 16]},
        "output": {"checkpoint_dir": str(tmp_path), "project_name": "c"},
    }
    p = tmp_path / "cfg.yaml"
    p.write_text(yaml.safe_dump(cfg))
    cache_main(["--config", str(p), "--prune-days", "30"])
    out = capsys.readouterr().out
    assert "train: 4 samples cached" in out and "val: 4 samples cached" in out
    dirs = sorted(os.listdir(tmp_path / "cache"))
    assert any(d.startswith("raw_train_") for d in dirs)
    assert any(d.startswith("raw_val_") for d in dirs)


def test_grain_loader_with_cache_worker_process(files):
    """grain worker_count=1 pickles the dataset into a real worker
    process — exercising the __getstate__/__setstate__ memmap reopen
    path end-to-end. Batches must match the in-process loader exactly."""
    from seghiero_tpu.data.pipeline import GrainBatchLoader

    cached = build_dataset(files, "val", seed=1, verbose=False)
    inproc = GrainBatchLoader(cached, 2, drop_last=True, num_workers=0)
    worker = GrainBatchLoader(cached, 2, drop_last=True, num_workers=1)
    a = list(inproc)
    b = list(worker)
    assert len(a) == len(b) == 3
    for x, y in zip(a, b):
        for k in x:
            np.testing.assert_array_equal(x[k], y[k])
