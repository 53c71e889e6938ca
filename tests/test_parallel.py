"""Distributed-semantics tests on the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
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


def test_ddp_sync_bn_matches_global_batch_stats(classes_2level, tmp_path):
    """ddp + sync_bn computes BN statistics over the GLOBAL batch: the
    stem BN's updated running stats must match pjit mode (global-batch
    semantics) on the same batch, while plain ddp (local BN) must differ
    in the running variance (mean-of-local-vars ≠ global var)."""
    from tests.test_train_e2e import tiny_config
    from seghiero_tpu.train.trainer import Trainer

    stem_var = {}
    for key, extra in {
        # donate_state off: buffer donation + shard_map collectives has
        # produced rare XLA CPU aborts deep into long pytest processes
        # (never in isolation); donation is orthogonal to what this test
        # asserts
        "pjit": {"parallel_mode": "pjit", "donate_state": False},
        "ddp_sync": {"parallel_mode": "ddp", "sync_bn": True,
                     "donate_state": False},
        "ddp_local": {"parallel_mode": "ddp", "sync_bn": False,
                      "donate_state": False},
    }.items():
        cfg = tiny_config(
            classes_2level,
            tmp_path / key,
            epochs=1,
            batch=8,
            size=16,
            mesh={"data": 8},
            extra_training=extra,
        )
        trainer = Trainer(cfg, verbose=False)
        batch = next(iter(trainer.train_loader))
        state, _ = trainer._train_step(trainer.state, batch, jnp.asarray(0))
        stem_var[key] = np.asarray(
            jax.device_get(state.batch_stats["backbone"]["stem_bn"]["var"])
        )
    np.testing.assert_allclose(
        stem_var["ddp_sync"], stem_var["pjit"], rtol=1e-4, atol=1e-6
    )
    assert not np.allclose(stem_var["ddp_local"], stem_var["pjit"], rtol=1e-4)


@pytest.mark.medium
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


def test_attention_families_train_on_multi_device_mesh(classes_2level, tmp_path):
    """MiT, Swin, and plain ViT under pjit on the virtual 8-device mesh:
    GSPMD must partition the attention (global for MiT/ViT,
    windowed+rolled for Swin) without shape or collective errors, and
    one step must run."""
    import dataclasses

    from tests.test_train_e2e import tiny_config
    from seghiero_tpu.models.mit import VARIANTS as MIT_V
    from seghiero_tpu.models.swin import VARIANTS as SWIN_V
    from seghiero_tpu.models.vit import VARIANTS as VIT_V
    from seghiero_tpu.train.trainer import Trainer

    MIT_V["tiny_test"] = ((1, 1, 1, 1), (8, 8, 10, 16))
    SWIN_V["tiny_test"] = (8, (1, 1, 1, 1), (1, 2, 4, 8))
    VIT_V["tiny_test"] = (16, 1, 2)
    try:
        for backbone, opts, size in (
            ("mit", {"variant": "tiny_test"}, 8),
            ("swin", {"variant": "tiny_test", "window": 2}, 8),
            # vit needs H/W divisible by the patch; 16² → one token
            ("vit", {"variant": "tiny_test", "pos_grid": 2}, 16),
        ):
            cfg = tiny_config(
                classes_2level,
                tmp_path,
                epochs=1,
                batch=8,
                size=size,
                mesh={"data": 8},
            )
            cfg = dataclasses.replace(
                cfg,
                model=dataclasses.replace(
                    cfg.model, backbone=backbone, backbone_options=opts
                ),
            )
            trainer = Trainer(cfg, verbose=False)
            assert trainer.mesh.devices.size == 8
            history = trainer.fit()
            assert np.isfinite(history[0]["train_loss"]), backbone
    finally:
        del MIT_V["tiny_test"], SWIN_V["tiny_test"]
