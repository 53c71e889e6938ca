"""Distributed-semantics tests on the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from seghiero_tpu.losses.tree_triplet import triplet_readiness
from seghiero_tpu.parallel.mesh import DATA_AXIS, make_mesh


def test_triplet_readiness_pmin_gate():
    """The one required collective: ready iff EVERY replica has triplet
    classes (reference all_gather gate, hiera_triplet_loss.py:193-200)."""
    mesh = make_mesh({"data": 8})

    gate = jax.jit(
        jax.shard_map(
            lambda c: triplet_readiness(c[0], DATA_AXIS)[None],
            mesh=mesh,
            in_specs=P(DATA_AXIS),
            out_specs=P(DATA_AXIS),
        )
    )
    counts = jnp.array([3, 1, 2, 5, 1, 1, 4, 2], jnp.int32)
    assert bool(np.all(np.asarray(gate(counts))))

    counts = counts.at[5].set(0)  # one replica found nothing
    assert not np.any(np.asarray(gate(counts)))


def test_ddp_mode_trains(classes_2level, tmp_path):
    from tests.test_train_e2e import tiny_config
    from seghiero_tpu.train.trainer import Trainer

    cfg = tiny_config(
        classes_2level,
        tmp_path,
        epochs=1,
        batch=8,
        size=16,
        mesh={"data": 8},
        extra_training={"parallel_mode": "ddp"},
    )
    trainer = Trainer(cfg, verbose=False)
    history = trainer.fit()
    assert np.isfinite(history[0]["val_loss"])


def test_ddp_matches_pjit_on_one_device(classes_2level, tmp_path):
    """With a single replica the two modes are the same math."""
    from tests.test_train_e2e import tiny_config
    from seghiero_tpu.train.trainer import Trainer

    losses = {}
    for mode in ("pjit", "ddp"):
        cfg = tiny_config(
            classes_2level,
            tmp_path / mode,
            epochs=1,
            batch=2,
            size=4,
            mesh={"data": 1},
            extra_training={"parallel_mode": mode},
        )
        trainer = Trainer(cfg, verbose=False)
        batch = next(iter(trainer.train_loader))
        _, m = trainer._train_step(trainer.state, batch, jnp.asarray(0))
        losses[mode] = float(m["loss"])
    np.testing.assert_allclose(losses["pjit"], losses["ddp"], rtol=1e-5)
