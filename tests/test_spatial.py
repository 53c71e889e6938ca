"""Spatial (H-dimension) sharding equivalence tests."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from seghiero_tpu.parallel.mesh import MODEL_AXIS, make_mesh
from seghiero_tpu.parallel.spatial import halo_exchange_h


def test_spatially_sharded_inference_matches_unsharded(classes_2level, tmp_path):
    """Same weights, image H sharded 4-way over the model axis → identical
    per-level masks (XLA inserts the conv halo exchanges)."""
    from tests.test_train_e2e import tiny_config
    from seghiero_tpu.infer.predictor import Predictor
    from seghiero_tpu.models.segmenter import build_model

    cfg = tiny_config(classes_2level, tmp_path, hw=64)
    model = build_model(cfg)
    variables = model.init(
        jax.random.key(0), jnp.zeros((1, 64, 64, 3)), train=False
    )
    variables = jax.device_get(variables)

    rng = np.random.default_rng(0)
    images = rng.integers(0, 255, (2, 64, 64, 3), dtype=np.uint8)

    plain = Predictor(cfg, variables)
    sharded = Predictor(cfg, variables, spatial_shards=4)
    p0 = plain.predict_array(images)
    p1 = sharded.predict_array(images)
    for lvl in p0:
        np.testing.assert_array_equal(p0[lvl], p1[lvl])


def test_halo_exchange_h_matches_manual_pad():
    """The manual ppermute halo helper reproduces edge-clamped neighbor
    rows on a 4-shard height split."""
    mesh = make_mesh({"data": 1, "model": 4})
    x = np.arange(1 * 8 * 2 * 3, dtype=np.float32).reshape(1, 8, 2, 3)

    fn = jax.jit(
        jax.shard_map(
            lambda b: halo_exchange_h(b, 1),
            mesh=mesh,
            in_specs=P(None, MODEL_AXIS),
            out_specs=P(None, MODEL_AXIS),
        )
    )
    out = np.asarray(fn(x))  # [1, 8 + 2*4, 2, 3] (each shard grew by 2)
    assert out.shape == (1, 16, 2, 3)
    # shard 1 (rows 2:4 of x) should carry row1 above and row4 below
    shard1 = out[:, 4:8]
    np.testing.assert_array_equal(shard1[:, 0], x[:, 1])
    np.testing.assert_array_equal(shard1[:, 1:3], x[:, 2:4])
    np.testing.assert_array_equal(shard1[:, 3], x[:, 4])
    # boundary shard 0 clamps its top halo to its own first row
    shard0 = out[:, 0:4]
    np.testing.assert_array_equal(shard0[:, 0], x[:, 0])
