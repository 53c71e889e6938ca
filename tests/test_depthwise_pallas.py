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


@pytest.mark.parametrize("B,H,W,C", [(2, 16, 16, 5), (1, 13, 24, 3)])
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
