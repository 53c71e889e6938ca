"""FSDP/ZeRO parameter+optimizer sharding (training.param_sharding: fsdp).

Runs on the virtual 8-device CPU mesh (conftest). The reference has no
distribution at all (SURVEY §2); this is the TPU-native state-sharding
mode layered on the same pjit train step — only the in/out shardings
change, so the math must match the replicated mode exactly (same XLA
program semantics, different layouts).
"""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from seghiero_tpu.config import SegHieroConfig
from seghiero_tpu.parallel.mesh import DATA_AXIS, fsdp_state_sharding, make_mesh



def _cfg(**training_extra):
    training = {
        "epochs": 1,
        "batch_size": 8,
        "lr": 0.01,
        "log_every": 10**9,
        "mesh": {"data": 8},
        "seed": 3,
    }
    training.update(training_extra)
    return SegHieroConfig.from_dict(
        {
            "dataset": {"kind": "synthetic", "synthetic_size": 8},
            "classes": {
                "coarse_to_fine_map": [[0, 2], [3, 4]],
                "coarse_names": {0: "a", 1: "b"},
                "fine_names": {i: f"f{i}" for i in range(5)},
            },
            "model": {"depth": 18},
            "training": training,
            "transform": {"resize": [32, 32], "hflip_prob": 0.0},
            "output": {"checkpoint_dir": "/tmp/fsdp_ckpt", "project_name": "t"},
        }
    )


@pytest.fixture(scope="module")
def eight_devices():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 (virtual) devices")


def test_sharding_rule(eight_devices):
    mesh = make_mesh({"data": 8})
    tree = {
        "big": jnp.zeros((3, 3, 64, 64)),  # 36k elems, dims 64 % 8 == 0
        "small": jnp.zeros((64,)),  # < FSDP_MIN_SIZE → replicated
        "odd": jnp.zeros((129, 129)),  # no divisible dim → replicated
        "scalar": jnp.zeros(()),
    }
    sh = fsdp_state_sharding(mesh, tree)
    assert sh["big"].spec == jax.sharding.PartitionSpec(None, None, None, DATA_AXIS)
    assert sh["small"].spec == jax.sharding.PartitionSpec()
    assert sh["odd"].spec == jax.sharding.PartitionSpec()
    assert sh["scalar"].spec == jax.sharding.PartitionSpec()


def test_fsdp_step_matches_replicated(eight_devices):
    from seghiero_tpu.train.trainer import Trainer

    tr_rep = Trainer(_cfg(), verbose=False)
    batch = next(iter(tr_rep.train_loader))

    tr_fsdp = Trainer(_cfg(param_sharding="fsdp"), verbose=False)
    batch2 = next(iter(tr_fsdp.train_loader))
    # param leaves big enough for the rule must actually be sharded
    sharded = [
        leaf
        for leaf in jax.tree_util.tree_leaves(tr_fsdp.state.params)
        if not leaf.sharding.is_fully_replicated
    ]
    assert sharded, "no parameter leaf ended up sharded over the data axis"

    # strong invariant: the EVAL forward+loss is bitwise identical across
    # the two layouts (same seed → same batch; measured exact on the
    # 8-device CPU mesh) — the resharded program computes the same math
    e_rep = tr_rep._eval_step(tr_rep.state, batch)
    e_fsdp = tr_fsdp._eval_step(tr_fsdp.state, batch2)
    assert float(e_rep["loss"]) == float(e_fsdp["loss"])

    # train steps AFTER the evals: donate_state deletes the input state
    s_rep, m_rep = tr_rep._train_step(tr_rep.state, batch, jnp.asarray(0))
    s_fsdp, m_fsdp = tr_fsdp._train_step(tr_fsdp.state, batch2, jnp.asarray(0))
    # the TRAIN step additionally takes grads through BN batch-stats and
    # the triplet top_k sampler; resharding reassociates the stat
    # reductions, whose float noise can flip top_k ties into genuinely
    # different (equally valid) triplet sets — same recompilation-tie
    # phenomenon documented in tests/test_superstep.py. Bound the loss,
    # don't expect bitwise params.
    np.testing.assert_allclose(
        float(m_rep["loss"]), float(m_fsdp["loss"]), rtol=2e-3
    )
    assert np.isfinite(float(m_fsdp["loss"]))
    del s_rep, s_fsdp


def test_fsdp_checkpoint_roundtrip(eight_devices, tmp_path):
    from seghiero_tpu.train.trainer import Trainer

    cfg = _cfg(param_sharding="fsdp")
    cfg = dataclasses.replace(
        cfg, output=dataclasses.replace(cfg.output, checkpoint_dir=str(tmp_path))
    )
    tr = Trainer(cfg, verbose=False)
    batch = next(iter(tr.train_loader))
    state, _ = tr._train_step(tr.state, batch, jnp.asarray(0))
    tr.ckpt.save(
        state,
        epoch=1,
        metrics={},
        best_val_loss=0.0,
        config_raw={},
        is_best=True,
    )
    tr.ckpt.wait()

    tr2 = Trainer(cfg, resume=True, verbose=False)
    assert int(tr2.state.step) == 1
    for x, y in zip(
        jax.tree_util.tree_leaves(state.params),
        jax.tree_util.tree_leaves(tr2.state.params),
    ):
        np.testing.assert_allclose(
            np.asarray(jax.device_get(x)), np.asarray(jax.device_get(y))
        )


def test_fsdp_rejects_ddp():
    with pytest.raises(ValueError, match="fsdp"):
        _cfg(param_sharding="fsdp", parallel_mode="ddp")
