"""End-to-end integration: jitted train step on synthetic data, both
hierarchy depths, checkpoint/resume, and the virtual 8-device mesh."""

import numpy as np
import pytest

from seghiero_tpu.config import SegHieroConfig
from seghiero_tpu.train.trainer import Trainer


def tiny_config(classes, tmp_path, *, epochs=1, batch=2, size=6, hw=32, lr=0.005,
                mesh=None, extra_training=None):
    training = {
        "epochs": epochs,
        "batch_size": batch,
        "lr": lr,
        "log_every": 1000,
        "seed": 0,
    }
    if mesh:
        training["mesh"] = mesh
    training.update(extra_training or {})
    return SegHieroConfig.from_dict(
        {
            "dataset": {"kind": "synthetic", "synthetic_size": size},
            "classes": classes,
            "model": {
                "depth": 18,
                "dtype": "float32",
                "aspp_channels": 32,
                "c1_channels": 8,
                "proj_dim": 16,
                "dilations": [1, 2, 3, 4],
            },
            "training": training,
            "transform": {"resize": [hw, hw], "hflip_prob": 0.5},
            "output": {"checkpoint_dir": str(tmp_path), "project_name": "t"},
        }
    )


@pytest.mark.medium
def test_train_2level_loss_decreases(classes_2level, tmp_path):
    cfg = tiny_config(classes_2level, tmp_path, epochs=2, size=16)
    trainer = Trainer(cfg, verbose=False)
    history = trainer.fit()
    assert len(history) == 2
    # train loss decreases epoch-over-epoch. (Val loss is NOT asserted:
    # after a handful of steps BN running averages are still immature and
    # eval-mode CE can legitimately explode — same as the reference.)
    assert history[1]["train_loss"] < history[0]["train_loss"], history
    m = trainer.evaluate()
    assert np.isfinite(m["loss"])
    assert {"fine_acc", "coarse_acc", "fine_miou", "coarse_miou"} <= set(m)


def test_train_3level_runs_and_checkpoints(classes_3level, tmp_path):
    cfg = tiny_config(classes_3level, tmp_path, epochs=1, size=4)
    trainer = Trainer(cfg, verbose=False)
    history = trainer.fit()
    assert len(history) == 1
    assert np.isfinite(history[0]["val_loss"])
    m = trainer.evaluate()
    assert "super_miou" in m

    # checkpoint resume: fresh trainer restores epoch + step
    t2 = Trainer(cfg, verbose=False, resume=True)
    assert t2.start_epoch == 1
    assert int(t2.state.step) == int(trainer.state.step)
    # restored params identical
    import jax

    a = jax.tree_util.tree_leaves(trainer.state.params)
    b = jax.tree_util.tree_leaves(t2.state.params)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_train_on_8device_mesh(classes_2level, tmp_path):
    """Data-parallel pjit path on the virtual 8-CPU-device mesh
    (BASELINE config #4 shape; SURVEY §4 'distributed without a cluster')."""
    cfg = tiny_config(
        classes_2level, tmp_path, epochs=1, batch=8, size=16, mesh={"data": 8}
    )
    trainer = Trainer(cfg, verbose=False)
    assert trainer.mesh.shape["data"] == 8
    history = trainer.fit()
    assert np.isfinite(history[0]["val_loss"])


def test_val_padding_batch(classes_2level, tmp_path):
    """val set size not divisible by batch → padded batch, metrics ignore
    padding (255 labels)."""
    cfg = tiny_config(classes_2level, tmp_path, epochs=1, batch=4, size=6)
    trainer = Trainer(cfg, verbose=False)
    m = trainer.evaluate()
    assert 0.0 <= m["fine_acc"] <= 1.0


def test_adamw_optimizer_trains(classes_2level, tmp_path):
    cfg = tiny_config(
        classes_2level, tmp_path, epochs=1, size=4,
        extra_training={"optimizer": "adamw", "lr": 1e-3},
    )
    trainer = Trainer(cfg, verbose=False)
    history = trainer.fit()
    assert np.isfinite(history[0]["train_loss"])


def test_grad_accumulation_updates_every_k(classes_2level, tmp_path):
    """grad_accum_steps=2: parameters move only on every second call
    (optax.MultiSteps semantics)."""
    import jax
    import jax.numpy as jnp

    cfg = tiny_config(
        classes_2level, tmp_path, epochs=1, size=4, batch=2,
        extra_training={"grad_accum_steps": 2, "donate_state": False},
    )
    trainer = Trainer(cfg, verbose=False)
    batch = next(iter(trainer.train_loader))
    p0 = jax.device_get(trainer.state.params["head"]["cls_seg"]["bias"])
    s1, _ = trainer._train_step(trainer.state, batch, jnp.asarray(0))
    p1 = jax.device_get(s1.params["head"]["cls_seg"]["bias"])
    np.testing.assert_array_equal(p1, p0)  # accumulating, no update yet
    s2, _ = trainer._train_step(s1, batch, jnp.asarray(0))
    p2 = jax.device_get(s2.params["head"]["cls_seg"]["bias"])
    assert not np.array_equal(p2, p1)  # second micro-batch applies it


def test_restore_best_falls_back_on_orphaned_pointer(classes_2level, tmp_path):
    """A crash inside the async-save commit window leaves best.json
    pointing at a step with no committed state/ dir; restore_best must
    fall back to the latest COMPLETE checkpoint instead of failing
    permanently (checkpoint.py:restore_best)."""
    import json
    import os

    cfg = tiny_config(classes_2level, tmp_path, epochs=1, size=4)
    trainer = Trainer(cfg, verbose=False)
    trainer.fit()
    trainer.ckpt.wait()
    root = trainer.ckpt.root
    committed = trainer.ckpt._existing_steps()
    assert committed
    # simulate the crash: best.json points at a step that never committed
    with open(os.path.join(root, "best.json"), "w") as f:
        json.dump({"step": committed[-1] + 99}, f)
    with pytest.warns(UserWarning, match="never.*committed"):
        restored = trainer.ckpt.restore_best(trainer.state)
    assert restored is not None
    _, meta = restored
    assert meta["step"] == committed[-1]


def test_compiler_options_reach_the_compiler(classes_2level, tmp_path):
    """training.compiler_options must ride the jit compile call: a
    generic option compiles and trains; a bogus option surfaces as a
    compile-time error (proof of pass-through, not a silent no-op)."""
    cfg = tiny_config(
        classes_2level, tmp_path, size=2,
        extra_training={
            "compiler_options": {"xla_backend_optimization_level": "1"}
        },
    )
    history = Trainer(cfg, verbose=False).fit()
    assert np.isfinite(history[0]["train_loss"])

    bogus = tiny_config(
        classes_2level, tmp_path, size=2,
        extra_training={
            "compiler_options": {"xla_definitely_not_an_option": "1"}
        },
    )
    with pytest.raises(Exception, match="(?i)no such compile option|unknown"):
        Trainer(bogus, verbose=False).fit()


@pytest.mark.fast
def test_pretrained_true_without_path_hard_errors(classes_2level, tmp_path):
    """model.pretrained: true with no weight file must raise, not
    silently train a random init (the reference auto-downloads ImageNet
    weights, models/backbone/resnet.py:34-39; this runtime is offline)."""
    import dataclasses

    cfg = tiny_config(classes_2level, tmp_path)
    cfg = dataclasses.replace(
        cfg, model=dataclasses.replace(cfg.model, pretrained=True)
    )
    with pytest.raises(ValueError, match="offline|weight file"):
        Trainer(cfg, verbose=False)
