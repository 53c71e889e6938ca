"""training.backbone_lr_scale — the fine-tuning knob: per-label update
scaling and outright backbone freezing (extension; the reference trains
everything at one joint rate, train.py:239-246)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from seghiero_tpu.config import TrainingConfig
from seghiero_tpu.train.optim import make_optimizer, make_schedule



def _tree(val):
    return {
        "backbone": {"w": jnp.full((3,), val)},
        "head": {"w": jnp.full((3,), val)},
        "aux_head": {"w": jnp.full((3,), val)},
    }


def test_scale_multiplies_backbone_update_only():
    cfg = TrainingConfig.from_dict(
        {"lr": 0.1, "momentum": 0.0, "weight_decay": 0.0,
         "backbone_lr_scale": 0.5}
    )
    tx = make_optimizer(cfg)
    params, grads = _tree(1.0), _tree(2.0)
    updates, _ = tx.update(grads, tx.init(params), params)
    np.testing.assert_allclose(updates["backbone"]["w"], -0.1, rtol=1e-6)
    np.testing.assert_allclose(updates["head"]["w"], -0.2, rtol=1e-6)
    np.testing.assert_allclose(updates["aux_head"]["w"], -0.2, rtol=1e-6)


def test_scale_composes_with_schedule():
    cfg = TrainingConfig.from_dict(
        {"lr": 0.1, "momentum": 0.0, "weight_decay": 0.0,
         "backbone_lr_scale": 0.5,
         "lr_schedule": {"type": "constant"}}
    )
    tx = make_optimizer(cfg, make_schedule(cfg, total_steps=10))
    params, grads = _tree(1.0), _tree(2.0)
    updates, _ = tx.update(grads, tx.init(params), params)
    np.testing.assert_allclose(updates["backbone"]["w"], -0.1, rtol=1e-6)
    np.testing.assert_allclose(updates["head"]["w"], -0.2, rtol=1e-6)


def test_zero_freezes_backbone():
    cfg = TrainingConfig.from_dict(
        {"lr": 0.1, "backbone_lr_scale": 0.0, "weight_decay": 1e-2}
    )
    tx = make_optimizer(cfg)
    params, grads = _tree(1.0), _tree(2.0)
    updates, _ = tx.update(grads, tx.init(params), params)
    # frozen: zero update despite nonzero grad AND weight decay
    np.testing.assert_array_equal(np.asarray(updates["backbone"]["w"]), 0.0)
    assert float(jnp.abs(updates["head"]["w"]).sum()) > 0


def test_validation():
    with pytest.raises(ValueError, match="backbone_lr_scale"):
        TrainingConfig.from_dict({"backbone_lr_scale": -0.5})


def test_trainer_freeze_end_to_end(classes_2level, tmp_path):
    from tests.test_train_e2e import tiny_config
    from seghiero_tpu.train.trainer import Trainer

    cfg = tiny_config(
        classes_2level, tmp_path, epochs=1, size=4,
        extra_training={"backbone_lr_scale": 0.0},
    )
    trainer = Trainer(cfg, verbose=False)
    before = jax.tree_util.tree_map(np.asarray, trainer.state.params)
    trainer.fit()
    after = jax.tree_util.tree_map(np.asarray, trainer.state.params)
    for (pa, a), (_, b) in zip(
        jax.tree_util.tree_leaves_with_path(before["backbone"]),
        jax.tree_util.tree_leaves_with_path(after["backbone"]),
    ):
        np.testing.assert_array_equal(a, b, err_msg=jax.tree_util.keystr(pa))
    head_moved = any(
        not np.array_equal(a, b)
        for a, b in zip(
            jax.tree_util.tree_leaves(before["head"]),
            jax.tree_util.tree_leaves(after["head"]),
        )
    )
    assert head_moved


def test_early_stopping(classes_2level, tmp_path):
    """training.early_stop_patience halts when val loss stops improving;
    the fit history is then shorter than training.epochs."""
    from tests.test_train_e2e import tiny_config
    from seghiero_tpu.train.trainer import Trainer

    # lr 0 → params never change → val loss identical every epoch →
    # epoch 1 is "best", epoch 2 is no-improvement #1 → stop at 2
    cfg = tiny_config(
        classes_2level, tmp_path, epochs=6, size=4, lr=0.0,
        extra_training={"early_stop_patience": 1},
    )
    trainer = Trainer(cfg, verbose=False)
    history = trainer.fit()
    assert len(history) == 2


def test_sample_image_export(classes_2level, tmp_path):
    """output.sample_images writes input/gt/pred PNGs per epoch."""
    import os

    from tests.test_train_e2e import tiny_config
    from seghiero_tpu.train.trainer import Trainer

    cfg = tiny_config(classes_2level, tmp_path, epochs=1, size=4)
    import dataclasses as dc

    cfg = dc.replace(cfg, output=dc.replace(cfg.output, sample_images=2))
    Trainer(cfg, verbose=False).fit()
    d = os.path.join(str(tmp_path), "t", "samples", "epoch_001")
    for i in range(2):
        for suffix in ("", "_gt_fine", "_pred_fine", "_pred_coarse"):
            assert os.path.exists(os.path.join(d, f"img{i}{suffix}.png")), suffix
