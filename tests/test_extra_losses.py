"""Dice / Lovász-Softmax extra losses: NumPy-oracle parity, ignore-index
semantics, config validation, trainer integration.

The reference has no such terms (its loss menu is fixed,
train.py:176-233); these are framework extensions, so the oracle is a
direct NumPy transcription of the published algorithms (arXiv:1606.04797
soft Dice; arXiv:1705.08790 Alg. 1 Lovász-Softmax), not torch code."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from seghiero_tpu.losses.extra import dice_loss, lovasz_softmax



def np_softmax(x):
    e = np.exp(x - x.max(-1, keepdims=True))
    return e / e.sum(-1, keepdims=True)


def np_dice(logits, labels, C, ignore=255, eps=1.0):
    valid = (labels >= 0) & (labels < C)
    p = np_softmax(logits) * valid[..., None]
    t = np.zeros_like(p)
    it = np.where(valid, labels, 0)
    np.put_along_axis(t, it[..., None], 1.0, axis=-1)
    t = t * valid[..., None]
    inter = (p * t).sum((0, 1, 2))
    denom = p.sum((0, 1, 2)) + t.sum((0, 1, 2))
    return 1.0 - np.mean((2 * inter + eps) / (denom + eps))


def np_lovasz(logits, labels, C, ignore=255):
    """Per-class loop transcription of arXiv:1705.08790 Alg. 1 with
    'present' class averaging and whole-batch flattening."""
    valid = ((labels >= 0) & (labels < C)).ravel()
    p = np_softmax(logits).reshape(-1, C)[valid]
    y = labels.ravel()[valid]
    losses = []
    for c in range(C):
        fg = (y == c).astype(np.float64)
        if fg.sum() == 0:
            continue
        e = np.abs(fg - p[:, c])
        order = np.argsort(-e, kind="stable")
        e_s, gt_s = e[order], fg[order]
        gts = gt_s.sum()
        inter = gts - np.cumsum(gt_s)
        union = gts + np.cumsum(1.0 - gt_s)
        jacc = 1.0 - inter / union
        grad = np.concatenate([jacc[:1], jacc[1:] - jacc[:-1]])
        losses.append((e_s * grad).sum())
    return float(np.mean(losses))


@pytest.fixture
def case(rng):
    C = 5
    logits = rng.standard_normal((2, 8, 8, C)).astype(np.float32) * 2
    labels = rng.integers(0, C, (2, 8, 8)).astype(np.int32)
    labels[0, :2, :3] = 255  # some ignored pixels
    return logits, labels, C


@pytest.mark.fast
def test_dice_matches_numpy(case):
    logits, labels, C = case
    got = float(dice_loss(jnp.asarray(logits), jnp.asarray(labels), C))
    want = np_dice(logits, labels, C)
    np.testing.assert_allclose(got, want, rtol=1e-5)


@pytest.mark.fast
def test_lovasz_matches_numpy(case):
    logits, labels, C = case
    got = float(lovasz_softmax(jnp.asarray(logits), jnp.asarray(labels), C))
    want = np_lovasz(logits, labels, C)
    np.testing.assert_allclose(got, want, rtol=1e-5)


@pytest.mark.fast
def test_perfect_prediction_near_zero(rng):
    C = 4
    labels = rng.integers(0, C, (1, 8, 8)).astype(np.int32)
    logits = np.full((1, 8, 8, C), -50.0, np.float32)
    np.put_along_axis(logits, labels[..., None], 50.0, axis=-1)
    assert float(lovasz_softmax(jnp.asarray(logits), jnp.asarray(labels), C)) < 1e-6
    # dice's +eps smoothing keeps a small floor; just require ≈0
    assert float(dice_loss(jnp.asarray(logits), jnp.asarray(labels), C)) < 1e-3


@pytest.mark.fast
def test_ignored_pixels_have_no_gradient_influence(case):
    logits, labels, C = case
    bumped = logits.copy()
    bumped[0, :2, :3] += 37.0  # only ignored pixels change
    for fn in (dice_loss, lovasz_softmax):
        a = float(fn(jnp.asarray(logits), jnp.asarray(labels), C))
        b = float(fn(jnp.asarray(bumped), jnp.asarray(labels), C))
        np.testing.assert_allclose(a, b, rtol=1e-6)


@pytest.mark.fast
def test_losses_are_differentiable(case):
    logits, labels, C = case
    for fn in (dice_loss, lovasz_softmax):
        g = jax.grad(lambda l: fn(l, jnp.asarray(labels), C))(jnp.asarray(logits))
        assert np.isfinite(np.asarray(g)).all()
        assert float(jnp.abs(g).sum()) > 0


@pytest.mark.fast
def test_config_validation():
    from seghiero_tpu.config import TrainingConfig

    ok = TrainingConfig.from_dict(
        {"extra_losses": [{"type": "dice", "weight": 0.5}]}
    )
    assert ok.extra_losses == ({"type": "dice", "level": "fine", "weight": 0.5},)
    with pytest.raises(ValueError, match="type"):
        TrainingConfig.from_dict({"extra_losses": [{"type": "iou"}]})
    with pytest.raises(ValueError, match="level"):
        TrainingConfig.from_dict(
            {"extra_losses": [{"type": "dice", "level": "mid"}]}
        )
    with pytest.raises(ValueError, match="weight"):
        TrainingConfig.from_dict(
            {"extra_losses": [{"type": "dice", "weight": 0}]}
        )


def _tiny_cfg(tmp_path, extra):
    from seghiero_tpu.config import SegHieroConfig

    return SegHieroConfig.from_dict(
        {
            "dataset": {"kind": "synthetic", "synthetic_size": 4},
            "classes": {
                "coarse_to_fine_map": [[0, 2], [3, 4]],
                "coarse_names": {0: "A", 1: "B"},
                "fine_names": {i: str(i) for i in range(5)},
            },
            "model": {"backbone": "resnet", "depth": 18, "dtype": "float32"},
            "training": {
                "epochs": 1,
                "batch_size": 2,
                "device": "cpu",
                "extra_losses": extra,
            },
            "transform": {"resize": [32, 32]},
            "output": {"checkpoint_dir": str(tmp_path), "project_name": "t"},
        }
    )


def test_trainer_integration(tmp_path):
    from seghiero_tpu.train.trainer import Trainer

    cfg = _tiny_cfg(
        tmp_path,
        [
            {"type": "dice", "level": "fine", "weight": 0.5},
            {"type": "lovasz", "level": "coarse", "weight": 0.3},
        ],
    )
    tr = Trainer(cfg, verbose=False)
    hist = tr.fit()
    assert np.isfinite(hist[-1]["train_loss"])

    # the extra terms must actually move the total: same model, no extras
    cfg0 = _tiny_cfg(tmp_path, [])
    tr0 = Trainer(cfg0, verbose=False)
    hist0 = tr0.fit()
    assert hist[-1]["train_loss"] != pytest.approx(hist0[-1]["train_loss"])


def test_super_level_requires_three_level(tmp_path):
    from seghiero_tpu.train.trainer import Trainer

    cfg = _tiny_cfg(tmp_path, [{"type": "dice", "level": "super"}])
    with pytest.raises(ValueError, match="super"):
        Trainer(cfg, verbose=False)
