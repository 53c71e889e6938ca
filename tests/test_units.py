"""Unit tests for utilities: tables, metrics, loader, transforms,
synthetic data, focal loss oracle."""

import numpy as np
import pytest

from seghiero_tpu.hierarchy import Hierarchy
from seghiero_tpu.utils.tables import ascii_table


def test_ascii_table_shape():
    s = ascii_table([["A", "BB"], ["1", "2"], ["333", "4"]])
    lines = s.splitlines()
    assert lines[0].startswith("+") and lines[0].endswith("+")
    assert len({len(l) for l in lines}) == 1  # rectangular
    assert "| A " in lines[1] and "| 333" in lines[4]


def test_miou_and_pixel_acc():
    from seghiero_tpu.train.metrics import (
        confusion_matrix,
        miou_from_confusion,
        pixel_accuracy_counts,
    )

    preds = np.array([[0, 1, 1], [2, 2, 0]])
    labels = np.array([[0, 1, 0], [2, 255, 0]])
    cm = np.asarray(confusion_matrix(preds, labels, 3))
    # truth 0: preds 0,1,0 -> cm[0] = [2,1,0]; truth 1: pred 1; truth 2: pred 2
    assert cm.tolist() == [[2, 1, 0], [0, 1, 0], [0, 0, 1]]
    correct, valid = pixel_accuracy_counts(preds, labels)
    assert (int(correct), int(valid)) == (4, 5)
    # IoUs: 0: 2/3, 1: 1/2, 2: 1/1
    np.testing.assert_allclose(miou_from_confusion(cm), (2 / 3 + 1 / 2 + 1) / 3)
    # per-class recalls: 0: 2/3, 1: 1/1, 2: 1/1 (mmseg mAcc)
    from seghiero_tpu.train.metrics import macc_from_confusion

    np.testing.assert_allclose(macc_from_confusion(cm), (2 / 3 + 1 + 1) / 3)


def test_confusion_matrix_matches_numpy_on_random(rng):
    from seghiero_tpu.train.metrics import confusion_matrix

    n = 7
    labels = rng.integers(0, n, (3, 33, 33)).astype(np.int32)
    labels[labels == 3] = 255  # some ignored
    preds = rng.integers(0, n, (3, 33, 33)).astype(np.int32)
    cm = np.asarray(confusion_matrix(preds, labels, n))
    ref = np.zeros((n, n), np.int64)
    for t, p in zip(labels.ravel(), preds.ravel()):
        if t != 255:
            ref[t, p] += 1
    assert cm.tolist() == ref.tolist()


def test_lut_lookup_matches_take(rng):
    from seghiero_tpu.losses.hiera import lut_lookup

    lut = np.array([4, 0, 2, 2, 1, 3], np.int64)
    idx = rng.integers(0, len(lut), (2, 17, 9)).astype(np.int32)
    out = np.asarray(lut_lookup(lut, jnp_asarray(idx)))
    np.testing.assert_array_equal(out, lut[idx])


def jnp_asarray(x):
    import jax.numpy as jnp

    return jnp.asarray(x)


def test_accuracy_topk():
    import jax.numpy as jnp

    from seghiero_tpu.train.metrics import accuracy_topk

    logits = jnp.array([[0.1, 0.9, 0.0], [0.8, 0.1, 0.1], [0.2, 0.3, 0.5]])
    labels = jnp.array([1, 2, 1])
    top1 = accuracy_topk(logits, labels, topk=(1,))
    top2 = accuracy_topk(logits, labels, topk=(2,))
    np.testing.assert_allclose(float(top1), 100.0 / 3, rtol=1e-6)
    np.testing.assert_allclose(float(top2), 200.0 / 3, rtol=1e-6)


class _ToyDataset:
    def __init__(self, n):
        self.n = n

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        return {
            "image": np.full((4, 4, 3), i, np.uint8),
            "fine": np.full((4, 4), i, np.int32),
        }


def test_batch_loader_drop_last_and_padding():
    from seghiero_tpu.data.pipeline import BatchLoader

    ds = _ToyDataset(5)
    train = BatchLoader(ds, 2, drop_last=True, prefetch=0)
    assert len(train) == 2
    batches = list(train)
    assert all(b["image"].shape == (2, 4, 4, 3) for b in batches)

    val = BatchLoader(ds, 2, drop_last=False, prefetch=2)
    batches = list(val)
    assert len(batches) == 3
    # padded sample has 255 labels (ignored) but a real image
    assert batches[-1]["fine"][1].max() == 255
    assert batches[-1]["image"].shape == (2, 4, 4, 3)


def test_batch_loader_shuffle_is_per_epoch_deterministic():
    from seghiero_tpu.data.pipeline import BatchLoader

    ds = _ToyDataset(8)
    dl = BatchLoader(ds, 2, shuffle=True, seed=3, prefetch=0)
    dl.set_epoch(0)
    order0 = [b["fine"][0, 0, 0] for b in dl]
    dl.set_epoch(0)
    assert order0 == [b["fine"][0, 0, 0] for b in dl]
    dl.set_epoch(1)
    assert order0 != [b["fine"][0, 0, 0] for b in dl]


def test_batch_loader_num_workers_threadpool():
    from seghiero_tpu.data.pipeline import BatchLoader

    ds = _ToyDataset(6)
    dl = BatchLoader(ds, 2, num_workers=3, prefetch=0)
    batches = list(dl)
    assert len(batches) == 3
    # decode order preserved despite the pool
    assert [int(b["fine"][0, 0, 0]) for b in batches] == [0, 2, 4]


def test_grain_loader_batches_and_padding():
    from seghiero_tpu.data.pipeline import GrainBatchLoader

    ds = _ToyDataset(5)
    train = GrainBatchLoader(ds, 2, drop_last=True)
    assert len(train) == 2
    batches = list(train)
    assert len(batches) == 2
    assert all(b["image"].shape == (2, 4, 4, 3) for b in batches)
    # full coverage minus the dropped tail
    seen = sorted(int(b["fine"][j, 0, 0]) for b in batches for j in range(2))
    assert len(set(seen)) == 4

    val = GrainBatchLoader(ds, 2, drop_last=False)
    batches = list(val)
    assert len(batches) == 3
    assert batches[-1]["fine"][1].max() == 255  # eval-tail padding contract
    assert batches[-1]["image"].shape == (2, 4, 4, 3)


def test_grain_loader_shuffle_per_epoch_deterministic():
    from seghiero_tpu.data.pipeline import GrainBatchLoader

    ds = _ToyDataset(8)
    dl = GrainBatchLoader(ds, 2, shuffle=True, seed=3)
    dl.set_epoch(0)
    order0 = [int(b["fine"][0, 0, 0]) for b in dl]
    dl.set_epoch(0)
    assert order0 == [int(b["fine"][0, 0, 0]) for b in dl]
    dl.set_epoch(1)
    assert order0 != [int(b["fine"][0, 0, 0]) for b in dl]


def test_trainer_with_grain_loader(classes_2level, tmp_path):
    from tests.test_train_e2e import tiny_config
    from seghiero_tpu.train.trainer import Trainer

    cfg = tiny_config(
        classes_2level,
        tmp_path,
        epochs=1,
        size=4,
        extra_training={"loader": "grain", "num_workers": 0},
    )
    trainer = Trainer(cfg, verbose=False)
    history = trainer.fit()
    assert np.isfinite(history[0]["train_loss"])


def test_batch_loader_propagates_worker_errors():
    from seghiero_tpu.data.pipeline import BatchLoader

    class Bad(_ToyDataset):
        def __getitem__(self, i):
            raise RuntimeError("boom")

    with pytest.raises(RuntimeError, match="boom"):
        list(BatchLoader(Bad(4), 2, prefetch=2))


def test_joint_transform_flip_and_resize(classes_2level):
    from PIL import Image

    from seghiero_tpu.data.transforms import JointTransform

    img = Image.fromarray(np.arange(12 * 12 * 3, dtype=np.uint8).reshape(12, 12, 3))
    mask = np.arange(144).reshape(12, 12) % 9
    tf = JointTransform(resize=(6, 6), hflip_prob=1.0)
    out_img, out_mask = tf(img, mask, np.random.default_rng(0))
    assert out_img.shape == (6, 6, 3) and out_mask.shape == (6, 6)
    # flipped: column order reversed relative to no-flip
    out2_img, out2_mask = JointTransform(resize=(6, 6), hflip_prob=0.0)(
        img, mask, np.random.default_rng(0)
    )
    np.testing.assert_array_equal(out_img, out2_img[:, ::-1])
    np.testing.assert_array_equal(out_mask, out2_mask[:, ::-1])


def test_joint_transform_scale_crop_and_jitter():
    from PIL import Image

    from seghiero_tpu.data.transforms import JointTransform

    rng0 = np.random.default_rng(7)
    img = Image.fromarray(
        rng0.integers(0, 255, (20, 20, 3), dtype=np.uint8), "RGB"
    )
    mask = (np.arange(400).reshape(20, 20) % 9).astype(np.int64)

    # static output shape for any drawn scale; downscale pads mask w/ 255
    down = JointTransform(resize=(16, 16), hflip_prob=0.0, scale_range=(0.4, 0.6))
    a, m = down(img, mask, np.random.default_rng(1))
    assert a.shape == (16, 16, 3) and m.shape == (16, 16)
    assert (m[-1, :] == 255).all() and (m[:, -1] == 255).all()  # pad region
    up = JointTransform(resize=(16, 16), hflip_prob=0.0, scale_range=(1.5, 2.0))
    a2, m2 = up(img, mask, np.random.default_rng(1))
    assert a2.shape == (16, 16, 3) and (m2 != 255).all()  # crop, no pad

    # deterministic given the rng stream
    a3, m3 = down(img, mask, np.random.default_rng(1))
    np.testing.assert_array_equal(a, a3)
    np.testing.assert_array_equal(m, m3)

    # color jitter: image changes, mask untouched, dtype/shape kept
    jit = JointTransform(resize=(16, 16), hflip_prob=0.0, color_jitter=0.4)
    aj, mj = jit(img, mask, np.random.default_rng(2))
    base, mb = JointTransform(resize=(16, 16), hflip_prob=0.0)(
        img, mask, np.random.default_rng(2)
    )
    assert aj.dtype == np.uint8 and (aj != base).any()
    np.testing.assert_array_equal(mj, mb)

    # rng=None (val split): augmentations are inert even when configured
    av, mv = down(img, mask, None)
    ab, mbs = JointTransform(resize=(16, 16), hflip_prob=0.0)(img, mask, None)
    np.testing.assert_array_equal(av, ab)
    np.testing.assert_array_equal(mv, mbs)

    # native backend: same contract (values differ by resize convention)
    nat = JointTransform(
        resize=(16, 16), hflip_prob=0.0, scale_range=(0.4, 0.6),
        color_jitter=0.2, backend="native",
    )
    an, mn = nat(img, mask, np.random.default_rng(3))
    assert an.shape == (16, 16, 3) and mn.shape == (16, 16)
    assert (mn[-1, :] == 255).all()


def test_synthetic_dataset_hierarchy_consistent(classes_3level):
    from seghiero_tpu.config import SegHieroConfig
    from seghiero_tpu.data.synthetic import SyntheticShapesDataset

    cfg = SegHieroConfig.from_dict(
        {"classes": classes_3level, "transform": {"resize": [24, 24]}}
    )
    ds = SyntheticShapesDataset(cfg, size=4)
    h = cfg.hierarchy
    s0a, s0b = ds[0], ds[0]
    np.testing.assert_array_equal(s0a["fine"], s0b["fine"])  # deterministic
    fine = s0a["fine"]
    valid = fine != 255
    np.testing.assert_array_equal(
        s0a["coarse"][valid], h.fine_to_coarse[fine[valid]]
    )
    np.testing.assert_array_equal(s0a["super"][valid], h.fine_to_super[fine[valid]])
    assert (s0a["coarse"][~valid] == 255).all()


def test_normalize_images_matches_torchvision_formula(rng):
    import jax

    from seghiero_tpu.data.pipeline import normalize_images

    u8 = rng.integers(0, 255, (2, 4, 4, 3), dtype=np.uint8)
    out = np.asarray(normalize_images(u8))
    mean = np.array([0.485, 0.456, 0.406])
    std = np.array([0.229, 0.224, 0.225])
    ref = (u8.astype(np.float32) / 255.0 - mean) / std
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-6)


def test_profiler_trace_smoke(tmp_path):
    """output.profile_dir produces a jax.profiler trace (aux subsystem)."""
    import os

    import jax
    import jax.numpy as jnp

    from seghiero_tpu.utils.profiling import StepTimer, maybe_profile

    with maybe_profile(str(tmp_path / "prof")):
        jnp.sum(jnp.ones((8, 8))).block_until_ready()
    files = [
        os.path.join(dp, f)
        for dp, _, fs in os.walk(tmp_path / "prof")
        for f in fs
    ]
    assert files, "no trace files written"

    t = StepTimer(warmup_steps=1)
    for _ in range(3):
        t.tick(4)
    assert t.images_per_sec is not None and t.images_per_sec > 0


def test_focal_loss_numpy_oracle(rng, classes_2level):
    """hiera_focal_loss vs a direct NumPy transcription of the focal
    formula (reference dead code hiera_loss.py:72-115, γ=2)."""
    from seghiero_tpu.losses.focal import hiera_focal_loss
    from seghiero_tpu.losses.hiera import prepare_targets_two_level

    h = Hierarchy.from_class_config(classes_2level)
    logits = rng.standard_normal((2, 6, 6, h.total_classes)).astype(np.float32)
    labels = rng.integers(0, h.n_fine, (2, 6, 6)).astype(np.int32)
    labels[0, 0] = 255
    t_fine, t_coarse = prepare_targets_two_level(labels, h)
    ours = float(hiera_focal_loss(logits, labels, np.asarray(t_coarse), h))

    # oracle
    probs = 1 / (1 + np.exp(-logits))
    mcma = probs[..., : h.n_fine]
    mclb = probs[..., h.n_fine :]
    mcmb = np.stack(
        [
            np.maximum(mcma[..., list(ids)].max(-1), mclb[..., i])
            for i, ids in enumerate(h.fine_by_coarse)
        ],
        -1,
    )
    mcla = np.minimum(mcma, mclb[..., h.fine_to_coarse])
    eps, g = 1e-8, 2.0

    def lvl(t, pos, neg, n):
        void = t == 255
        oh = np.eye(n)[np.where(void, 0, t)]
        v = (~void)[..., None]
        num = np.maximum(v.sum(), 1)
        return (
            (-oh * (1 - pos) ** g * np.log(pos + eps)
             - (1 - oh) * neg**g * np.log(1 - neg + eps)) * v
        ).sum() / num / n

    oracle = lvl(labels, mcla, mcma, h.n_fine) + lvl(
        np.asarray(t_coarse), mclb, mcmb, h.n_coarse
    )
    np.testing.assert_allclose(ours, oracle, rtol=1e-5)


def test_metrics_logger_tensorboard(tmp_path):
    from seghiero_tpu.utils.logging_util import MetricsLogger

    tb = str(tmp_path / "tb")
    lg = MetricsLogger(str(tmp_path / "m.jsonl"), tb)
    lg.log({"epoch": 1, "train_loss": 1.5, "val_acc": 0.7, "note": "x"})
    lg.close()
    import os

    files = os.listdir(tb)
    assert any("tfevents" in f for f in files)
    with open(tmp_path / "m.jsonl") as f:
        assert "train_loss" in f.read()
