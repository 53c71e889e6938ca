"""Equivalence of the Pallas depthwise 3×3 kernel (ops/pallas/
depthwise.py) with XLA's grouped convolution — values and both
gradients, interpret mode on CPU."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from seghiero_tpu.ops.pallas.depthwise import depthwise3x3


def _xla_dw(x, k):
    return jax.lax.conv_general_dilated(
        x,
        k.reshape(3, 3, 1, x.shape[-1]),
        (1, 1),
        ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=x.shape[-1],
    )


@pytest.mark.parametrize(
    "B,H,W,C",
    [
        (2, 16, 16, 5),
        (1, 13, 24, 3),
        # W=256 selects the TH=16 row tile (_row_tile): the serving
        # sep-bottleneck width, where TH=32 was a scoped-VMEM OOM
        (1, 20, 256, 3),
        # W=512 selects TH=8 (the availability-gate maximum width)
        (1, 8, 512, 2),
    ],
)
def test_depthwise_matches_xla_values_and_grads(rng, B, H, W, C):
    x = jnp.asarray(rng.standard_normal((B, H, W, C)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((9, C)).astype(np.float32))

    def loss_pal(x, k):
        return jnp.sum(depthwise3x3(x, k, True) ** 2)

    def loss_xla(x, k):
        return jnp.sum(_xla_dw(x, k) ** 2)

    v_p, (dx_p, dk_p) = jax.value_and_grad(loss_pal, argnums=(0, 1))(x, k)
    v_x, (dx_x, dk_x) = jax.value_and_grad(loss_xla, argnums=(0, 1))(x, k)
    np.testing.assert_allclose(float(v_p), float(v_x), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(dx_p), np.asarray(dx_x), rtol=1e-4,
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(dk_p), np.asarray(dk_x), rtol=1e-4,
                               atol=1e-5)


def test_row_tile_and_availability_gate():
    """Row tile adapts to W (VMEM bound); widths past 512 are rejected
    so a forced opt-in cannot hit the measured W>512 VMEM OOM."""
    from seghiero_tpu.ops.pallas.depthwise import (
        _row_tile,
        depthwise3x3_available,
    )

    assert [_row_tile(w) for w in (16, 128, 256, 512)] == [32, 32, 16, 8]
    assert not depthwise3x3_available((3, 3, 1, 4), (1, 1), (1, 1), 1024)


def test_config_depthwise_backend_plumbs_to_head(rng):
    """model.depthwise_backend: pallas reaches the head's DepthwiseConv
    modules; on CPU the availability gate falls back to XLA, so outputs
    are identical — this checks the config→module threading."""
    import jax.numpy as jnp

    from seghiero_tpu.config import SegHieroConfig
    from seghiero_tpu.models.segmenter import build_model

    def cfg(backend):
        return SegHieroConfig.from_dict(
            {
                "dataset": {"kind": "synthetic", "synthetic_size": 2},
                "classes": {
                    "coarse_to_fine_map": [[0, 2], [3, 4]],
                    "coarse_names": {0: "a", 1: "b"},
                    "fine_names": {i: f"f{i}" for i in range(5)},
                },
                "model": {
                    "depth": 18,
                    "dtype": "float32",
                    "aspp_channels": 16,
                    "c1_channels": 8,
                    "proj_dim": 8,
                    "depthwise_backend": backend,
                },
                "training": {"epochs": 1, "batch_size": 2, "lr": 0.01},
                "transform": {"resize": [32, 32]},
                "output": {"checkpoint_dir": "/tmp/dwb", "project_name": "x"},
            }
        )

    with pytest.raises(ValueError, match="depthwise_backend"):
        cfg("cuda")

    outs = {}
    x = jnp.asarray(rng.standard_normal((1, 32, 32, 3)).astype(np.float32))
    for backend in ("xla", "pallas"):
        model = build_model(cfg(backend))
        assert model.dw_backend == backend
        assert model.head_type == "sep_aspp_contrast"
        v = model.init(jax.random.key(0), x, train=False)
        outs[backend] = np.asarray(model.apply(v, x, train=False)["logits"])
    np.testing.assert_array_equal(outs["xla"], outs["pallas"])


def test_depthwise_module_param_tree_and_fallback(rng):
    """DepthwiseConv keeps the nn.Conv parameter path and matches XLA on
    CPU (where availability gates route to the fallback)."""
    from seghiero_tpu.models.heads import DepthwiseConv

    x = jnp.asarray(rng.standard_normal((1, 12, 16, 4)).astype(np.float32))
    mod = DepthwiseConv(3, 1)
    v = mod.init(jax.random.key(0), x)
    assert v["params"]["kernel"].shape == (3, 3, 1, 4)
    out = mod.apply(v, x)
    ref = _xla_dw(x, jnp.moveaxis(v["params"]["kernel"], 2, 0).reshape(9, 4))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5,
                               atol=1e-6)
