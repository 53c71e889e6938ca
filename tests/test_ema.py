"""training.ema_decay: parameter EMA tracked in the train state, used
for validation and deployed by the Predictor."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from seghiero_tpu.train.trainer import Trainer

from tests.test_train_e2e import tiny_config


def test_ema_matches_manual_recurrence(classes_2level, tmp_path):
    d = 0.9
    cfg = tiny_config(
        classes_2level,
        tmp_path,
        extra_training={"ema_decay": d, "donate_state": False},
    )
    trainer = Trainer(cfg, verbose=False)
    batch = next(iter(trainer.train_loader))

    # manual recurrence over the SAME param snapshots the step produces
    ema = jax.tree_util.tree_map(np.asarray, trainer.state.params)
    state = trainer.state
    for _ in range(3):
        state, _ = trainer._train_step(state, batch, jnp.asarray(0))
        p = jax.tree_util.tree_map(np.asarray, state.params)
        ema = jax.tree_util.tree_map(
            lambda e, q: d * e + (1 - d) * q, ema, p
        )

    got = jax.tree_util.tree_map(np.asarray, state.ema_params)
    for a, b in zip(
        jax.tree_util.tree_leaves(ema), jax.tree_util.tree_leaves(got)
    ):
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)


def test_ema_eval_checkpoint_and_resume_migration(classes_2level, tmp_path):
    # 1) train WITHOUT ema, checkpoint written
    cfg0 = tiny_config(classes_2level, tmp_path, size=4)
    t0 = Trainer(cfg0, verbose=False)
    t0.fit()
    assert t0.state.ema_params is None

    # 2) resume the same run WITH ema on: old checkpoint lacks the EMA
    #    subtree → compat path seeds it from the restored params
    cfg1 = tiny_config(
        classes_2level, tmp_path, size=4, extra_training={"ema_decay": 0.99}
    )
    t1 = Trainer(cfg1, verbose=False, resume=True)
    assert t1.start_epoch == 1
    assert t1.state.ema_params is not None
    for a, b in zip(
        jax.tree_util.tree_leaves(t1.state.params),
        jax.tree_util.tree_leaves(t1.state.ema_params),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # 3) another epoch with EMA: state diverges from params, eval +
    #    checkpoint round-trip carry it
    import dataclasses

    cfg2 = dataclasses.replace(
        cfg1, training=dataclasses.replace(cfg1.training, epochs=2)
    )
    t2 = Trainer(cfg2, verbose=False, resume=True)
    t2.fit()
    diffs = [
        float(np.max(np.abs(np.asarray(a) - np.asarray(b))))
        for a, b in zip(
            jax.tree_util.tree_leaves(t2.state.params),
            jax.tree_util.tree_leaves(t2.state.ema_params),
        )
    ]
    assert max(diffs) > 0.0  # EMA lags the raw params

    # 4) resume restores the EMA exactly
    t3 = Trainer(cfg2, verbose=False, resume=True)
    for a, b in zip(
        jax.tree_util.tree_leaves(t2.state.ema_params),
        jax.tree_util.tree_leaves(t3.state.ema_params),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # 5) the Predictor deploys the EMA weights (point at t2's final step
    #    dir explicitly — `best` may be the pre-EMA epoch-1 checkpoint,
    #    whose state has a different structure)
    from seghiero_tpu.infer.predictor import Predictor

    step_dir = t2.ckpt._step_dir(int(t2.state.step))
    pred = Predictor.from_checkpoint(cfg2, checkpoint=step_dir)
    for a, b in zip(
        jax.tree_util.tree_leaves(pred.variables["params"]),
        jax.tree_util.tree_leaves(t2.state.ema_params),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_grad_clip_norm_bounds_update():
    """training.grad_clip_norm: the post-clip update magnitude is bounded
    by lr * clip (momentum/wd off), and a tiny gradient is untouched."""
    import optax
    from seghiero_tpu.config import TrainingConfig
    from seghiero_tpu.train.optim import make_optimizer

    cfg = TrainingConfig.from_dict(
        {"lr": 0.1, "momentum": 0.0, "weight_decay": 0.0, "grad_clip_norm": 1.0}
    )
    tx = make_optimizer(cfg)
    params = {"w": jnp.zeros((4,))}
    st = tx.init(params)

    big = {"w": jnp.full((4,), 100.0)}  # norm 200 → clipped to 1
    upd, _ = tx.update(big, st, params)
    np.testing.assert_allclose(
        float(jnp.linalg.norm(upd["w"])), 0.1, rtol=1e-5
    )

    small = {"w": jnp.full((4,), 0.01)}  # norm 0.02 → untouched
    upd, _ = tx.update(small, st, params)
    np.testing.assert_allclose(
        np.asarray(upd["w"]), -0.1 * np.asarray(small["w"]), rtol=1e-5
    )
