"""ConvNeXt backbone tests: shapes, dilated output_stride, stochastic
depth, segmenter integration via the registry, and numeric parity of a
block against a minimal torch implementation of the upstream
arXiv:2201.03545 block (built here from the paper — the reference repo
has no ConvNeXt; this guards our Flax translation of the well-known
architecture, not reference parity)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from seghiero_tpu.models import ConvNeXtBackbone, HieroSegmenter
from seghiero_tpu.models.convnext import VARIANTS

pytestmark = pytest.mark.fast


def test_shapes_tiny():
    bb = ConvNeXtBackbone(variant="tiny")
    x = jnp.zeros((1, 64, 64, 3))
    vars_ = bb.init(jax.random.key(0), x, train=False)
    c1, c2, c3, c4 = bb.apply(vars_, x, train=False)
    assert c1.shape == (1, 16, 16, 96)
    assert c2.shape == (1, 8, 8, 192)
    assert c3.shape == (1, 4, 4, 384)
    assert c4.shape == (1, 2, 2, 768)


@pytest.mark.parametrize("os_,shapes", [(16, (8, 8, 4, 4)), (8, (8, 8, 8, 8))])
def test_output_stride_dilation(os_, shapes):
    bb = ConvNeXtBackbone(variant="atto", output_stride=os_)
    x = jnp.zeros((1, 64, 64, 3))
    vars_ = bb.init(jax.random.key(0), x, train=False)
    feats = bb.apply(vars_, x, train=False)
    for f, s in zip(feats[1:], shapes[1:]):
        assert f.shape[1] == f.shape[2] == s
    # param tree is identical to the os=32 tree (stride→dilation swap
    # only), so checkpoints transfer between output strides
    v32 = ConvNeXtBackbone(variant="atto").init(jax.random.key(0), x, train=False)
    assert jax.tree_util.tree_structure(vars_) == jax.tree_util.tree_structure(v32)


def test_bad_variant_raises():
    bb = ConvNeXtBackbone(variant="nope")
    with pytest.raises(ValueError, match="variant"):
        bb.init(jax.random.key(0), jnp.zeros((1, 32, 32, 3)))


def test_drop_path_train_vs_eval():
    bb = ConvNeXtBackbone(variant="atto", drop_path_rate=0.5)
    x = jax.random.normal(jax.random.key(1), (4, 32, 32, 3))
    vars_ = bb.init(jax.random.key(0), x, train=False)
    # eval: deterministic, no dropout rng needed
    e1 = bb.apply(vars_, x, train=False)
    e2 = bb.apply(vars_, x, train=False)
    np.testing.assert_array_equal(np.asarray(e1[3]), np.asarray(e2[3]))
    # train: stochastic per dropout key
    t1 = bb.apply(vars_, x, train=True, rngs={"dropout": jax.random.key(1)})
    t2 = bb.apply(vars_, x, train=True, rngs={"dropout": jax.random.key(2)})
    assert not np.allclose(np.asarray(t1[3]), np.asarray(t2[3]))


def test_segmenter_integration_via_registry():
    m = HieroSegmenter(
        num_classes=13,
        n_fine=9,
        backbone="convnext",
        backbone_options={"variant": "atto"},
    )
    x = jax.random.normal(jax.random.key(1), (2, 64, 64, 3))
    vars_ = m.init(jax.random.key(0), x, train=False)
    assert sorted(vars_["params"].keys()) == ["aux_head", "backbone", "head"]
    out = m.apply(vars_, x, train=False)
    assert out["logits"].shape == (2, 16, 16, 13)
    norms = np.linalg.norm(np.asarray(out["embedding"]), axis=-1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-5)


class _TorchBlock(torch.nn.Module):
    """Upstream ConvNeXt block (arXiv:2201.03545 fig. 4 / official repo
    semantics): 7×7 depthwise → channels-last LN(1e-6) → Linear 4× →
    exact GELU → Linear → layer-scale γ → residual."""

    def __init__(self, dim):
        super().__init__()
        self.dwconv = torch.nn.Conv2d(dim, dim, 7, padding=3, groups=dim)
        self.norm = torch.nn.LayerNorm(dim, eps=1e-6)
        self.pwconv1 = torch.nn.Linear(dim, 4 * dim)
        self.act = torch.nn.GELU()
        self.pwconv2 = torch.nn.Linear(4 * dim, dim)
        self.gamma = torch.nn.Parameter(1e-6 * torch.ones(dim))

    def forward(self, x):  # NCHW
        y = self.dwconv(x).permute(0, 2, 3, 1)
        y = self.norm(y)
        y = self.pwconv2(self.act(self.pwconv1(y)))
        y = (self.gamma * y).permute(0, 3, 1, 2)
        return x + y


def test_block_parity_vs_torch(rng):
    from seghiero_tpu.models.convnext import ConvNeXtBlock

    dim = 16
    tb = _TorchBlock(dim)
    with torch.no_grad():
        for p in tb.parameters():
            p.copy_(torch.from_numpy(rng.standard_normal(p.shape).astype(np.float32) * 0.1))

    x = rng.standard_normal((2, dim, 9, 9)).astype(np.float32)
    want = tb(torch.from_numpy(x)).detach().numpy()

    params = {
        "dwconv": {
            "kernel": jnp.asarray(
                tb.dwconv.weight.detach().numpy().transpose(2, 3, 1, 0)
            ),
            "bias": jnp.asarray(tb.dwconv.bias.detach().numpy()),
        },
        "norm": {
            "scale": jnp.asarray(tb.norm.weight.detach().numpy()),
            "bias": jnp.asarray(tb.norm.bias.detach().numpy()),
        },
        "pwconv1": {
            "kernel": jnp.asarray(tb.pwconv1.weight.detach().numpy().T),
            "bias": jnp.asarray(tb.pwconv1.bias.detach().numpy()),
        },
        "pwconv2": {
            "kernel": jnp.asarray(tb.pwconv2.weight.detach().numpy().T),
            "bias": jnp.asarray(tb.pwconv2.bias.detach().numpy()),
        },
        "gamma": jnp.asarray(tb.gamma.detach().numpy()),
    }
    ours = ConvNeXtBlock(dim).apply(
        {"params": params}, jnp.asarray(x.transpose(0, 2, 3, 1)), False
    )
    np.testing.assert_allclose(
        np.asarray(ours).transpose(0, 3, 1, 2), want, rtol=1e-5, atol=1e-5
    )
