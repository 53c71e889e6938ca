"""Gradient checkpointing (model.remat) — exact-math memory trade.

``nn.remat`` re-runs the backbone forward inside the backward pass.
Semantics are exact: the un-jitted train-mode apply is bitwise identical
with remat on/off (asserted below). The JITTED train step is a
different XLA program (the rematerialized backward fuses differently),
so its float reassociation noise is bounded, not zero — measured
~2e-4 max param delta after one lr=0.01 step on the MiT config.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from seghiero_tpu.config import SegHieroConfig
from seghiero_tpu.train.trainer import Trainer



def _cfg(remat, backbone="resnet"):
    model = {"depth": 18, "remat": remat}
    if backbone != "resnet":
        model = {
            "backbone": backbone,
            "backbone_options": {"variant": "b0"},
            "head": "segformer_mlp",
            "remat": remat,
        }
    return SegHieroConfig.from_dict(
        {
            "dataset": {"kind": "synthetic", "synthetic_size": 2},
            "classes": {
                "coarse_to_fine_map": [[0, 2], [3, 4]],
                "coarse_names": {0: "a", 1: "b"},
                "fine_names": {i: f"f{i}" for i in range(5)},
            },
            "model": model,
            "training": {"epochs": 1, "batch_size": 2, "lr": 0.01, "seed": 7},
            "transform": {"resize": [64, 64], "hflip_prob": 0.0},
            "output": {"checkpoint_dir": "/tmp/remat_ckpt", "project_name": "t"},
        }
    )


@pytest.mark.parametrize("backbone", ["resnet", "mit"])
def test_remat_apply_is_bitwise_exact(backbone):
    """Un-jitted train-mode forward: remat on/off bitwise identical."""
    from seghiero_tpu.models.segmenter import build_model

    outs = {}
    for r in (False, True):
        model = build_model(_cfg(r, backbone))
        x = jax.random.normal(jax.random.key(0), (1, 64, 64, 3), jnp.float32)
        v = model.init(jax.random.key(1), x, train=False)
        out, _ = model.apply(
            v, x, train=True, mutable=["batch_stats"],
            rngs={"dropout": jax.random.key(5)},
        )
        outs[r] = np.asarray(out["logits"])
    np.testing.assert_array_equal(outs[False], outs[True])


@pytest.mark.parametrize("backbone", ["resnet", "mit"])
def test_remat_train_step(backbone):
    """Jitted step: runs, finite, and post-update params agree within
    XLA-restructuring float noise (the remat'd backward is a different
    program; measured max delta ~2e-4 at lr=0.01)."""
    states = {}
    for r in (False, True):
        tr = Trainer(_cfg(r, backbone), verbose=False)
        batch = next(iter(tr.train_loader))
        s, m = tr._train_step(tr.state, batch, jnp.asarray(0))
        assert np.isfinite(float(m["loss"]))
        states[r] = jax.device_get(s.params)
    for x, y in zip(
        jax.tree_util.tree_leaves(states[False]),
        jax.tree_util.tree_leaves(states[True]),
    ):
        np.testing.assert_allclose(
            np.asarray(x), np.asarray(y), atol=1.5e-3, rtol=0
        )
