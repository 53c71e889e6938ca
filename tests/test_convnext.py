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


def _ln_cf(x, w, b, eps=1e-6):
    """Channels-first LayerNorm, the upstream ConvNeXt formulation."""
    u = x.mean(1, keepdim=True)
    s = (x - u).pow(2).mean(1, keepdim=True)
    x = (x - u) / torch.sqrt(s + eps)
    return w[:, None, None] * x + b[:, None, None]


class _TorchConvNeXt(torch.nn.Module):
    """Minimal upstream-semantics ConvNeXt (stem → stages with
    LN+2×2/s2 downsamples → per-stage features), built from the paper to
    generate golden outputs + state_dicts in both published layouts."""

    def __init__(self, depths, dims):
        super().__init__()
        self.depths, self.dims = depths, dims
        self.stem = torch.nn.Conv2d(3, dims[0], 4, stride=4)
        self.stem_ln_w = torch.nn.Parameter(torch.rand(dims[0]) + 0.5)
        self.stem_ln_b = torch.nn.Parameter(torch.rand(dims[0]) - 0.5)
        self.down_ln = torch.nn.ParameterDict()
        self.down_conv = torch.nn.ModuleDict()
        self.blocks = torch.nn.ModuleDict()
        for i in range(len(depths)):
            if i > 0:
                self.down_ln[f"{i}w"] = torch.nn.Parameter(torch.rand(dims[i - 1]) + 0.5)
                self.down_ln[f"{i}b"] = torch.nn.Parameter(torch.rand(dims[i - 1]) - 0.5)
                self.down_conv[str(i)] = torch.nn.Conv2d(dims[i - 1], dims[i], 2, stride=2)
            for j in range(depths[i]):
                self.blocks[f"{i}_{j}"] = _TorchBlock(dims[i])

    def forward(self, x):
        x = self.stem(x)
        x = _ln_cf(x, self.stem_ln_w, self.stem_ln_b)
        feats = []
        for i in range(len(self.depths)):
            if i > 0:
                x = _ln_cf(x, self.down_ln[f"{i}w"], self.down_ln[f"{i}b"])
                x = self.down_conv[str(i)](x)
            for j in range(self.depths[i]):
                x = self.blocks[f"{i}_{j}"](x)
            # the converter fills missing dense-prediction out-norms with
            # affine-identity LayerNorms (scale 1, bias 0) — features are
            # standardized, the affine is left for fine-tuning to learn
            d = x.shape[1]
            feats.append(_ln_cf(x, torch.ones(d), torch.zeros(d)))
        return feats

    def state_dict_facebook(self):
        sd = {
            "downsample_layers.0.0.weight": self.stem.weight,
            "downsample_layers.0.0.bias": self.stem.bias,
            "downsample_layers.0.1.weight": self.stem_ln_w,
            "downsample_layers.0.1.bias": self.stem_ln_b,
        }
        for i in range(1, len(self.depths)):
            sd[f"downsample_layers.{i}.0.weight"] = self.down_ln[f"{i}w"]
            sd[f"downsample_layers.{i}.0.bias"] = self.down_ln[f"{i}b"]
            sd[f"downsample_layers.{i}.1.weight"] = self.down_conv[str(i)].weight
            sd[f"downsample_layers.{i}.1.bias"] = self.down_conv[str(i)].bias
        for i in range(len(self.depths)):
            for j in range(self.depths[i]):
                b = self.blocks[f"{i}_{j}"]
                p = f"stages.{i}.{j}"
                sd.update({
                    f"{p}.dwconv.weight": b.dwconv.weight,
                    f"{p}.dwconv.bias": b.dwconv.bias,
                    f"{p}.norm.weight": b.norm.weight,
                    f"{p}.norm.bias": b.norm.bias,
                    f"{p}.pwconv1.weight": b.pwconv1.weight,
                    f"{p}.pwconv1.bias": b.pwconv1.bias,
                    f"{p}.pwconv2.weight": b.pwconv2.weight,
                    f"{p}.pwconv2.bias": b.pwconv2.bias,
                    f"{p}.gamma": b.gamma,
                })
        return {k: v.detach() for k, v in sd.items()}

    def state_dict_torchvision(self):
        sd = {
            "features.0.0.weight": self.stem.weight,
            "features.0.0.bias": self.stem.bias,
            "features.0.1.weight": self.stem_ln_w,
            "features.0.1.bias": self.stem_ln_b,
        }
        for i in range(1, len(self.depths)):
            sd[f"features.{2 * i}.0.weight"] = self.down_ln[f"{i}w"]
            sd[f"features.{2 * i}.0.bias"] = self.down_ln[f"{i}b"]
            sd[f"features.{2 * i}.1.weight"] = self.down_conv[str(i)].weight
            sd[f"features.{2 * i}.1.bias"] = self.down_conv[str(i)].bias
        for i in range(len(self.depths)):
            for j in range(self.depths[i]):
                b = self.blocks[f"{i}_{j}"]
                p = f"features.{2 * i + 1}.{j}"
                sd.update({
                    f"{p}.block.0.weight": b.dwconv.weight,
                    f"{p}.block.0.bias": b.dwconv.bias,
                    f"{p}.block.2.weight": b.norm.weight,
                    f"{p}.block.2.bias": b.norm.bias,
                    f"{p}.block.3.weight": b.pwconv1.weight,
                    f"{p}.block.3.bias": b.pwconv1.bias,
                    f"{p}.block.5.weight": b.pwconv2.weight,
                    f"{p}.block.5.bias": b.pwconv2.bias,
                    f"{p}.layer_scale": b.gamma.reshape(-1, 1, 1),
                })
        return {k: v.detach() for k, v in sd.items()}


@pytest.fixture
def micro_variant():
    VARIANTS["micro"] = ((1, 1, 2, 1), (8, 16, 24, 32))
    yield "micro"
    del VARIANTS["micro"]


@pytest.mark.parametrize("layout", ["facebook", "torchvision"])
def test_pretrained_import_parity(rng, micro_variant, layout):
    from seghiero_tpu.models.torch_convert import import_convnext_backbone

    depths, dims = VARIANTS[micro_variant]
    torch.manual_seed(0)
    tm = _TorchConvNeXt(depths, dims)
    with torch.no_grad():
        for p in tm.parameters():
            if p.ndim > 1:  # keep LN affines away from degenerate zeros
                p.copy_(torch.from_numpy(
                    rng.standard_normal(p.shape).astype(np.float32) * 0.1))

    x = rng.standard_normal((2, 3, 32, 32)).astype(np.float32)
    with torch.no_grad():
        want = [f.numpy() for f in tm(torch.from_numpy(x))]

    sd = (tm.state_dict_facebook() if layout == "facebook"
          else tm.state_dict_torchvision())
    params = import_convnext_backbone(sd, micro_variant)
    bb = ConvNeXtBackbone(variant=micro_variant)
    got = bb.apply({"params": params}, jnp.asarray(x.transpose(0, 2, 3, 1)),
                   train=False)
    for i, (g, w) in enumerate(zip(got, want)):
        np.testing.assert_allclose(
            np.asarray(g).transpose(0, 3, 1, 2), w, rtol=2e-4, atol=2e-5,
            err_msg=f"stage {i} features diverged ({layout} layout)",
        )


def test_trainer_pretrained_hook(rng, micro_variant, tmp_path):
    """model.pretrained + model.backbone: convnext loads converted
    weights into the train state (trainer._maybe_load_pretrained)."""
    from seghiero_tpu.config import SegHieroConfig
    from seghiero_tpu.train.trainer import Trainer

    depths, dims = VARIANTS[micro_variant]
    torch.manual_seed(3)
    tm = _TorchConvNeXt(depths, dims)
    path = tmp_path / "cnx.pth"
    torch.save(tm.state_dict_facebook(), path)

    cfg = SegHieroConfig.from_dict(
        {
            "dataset": {"kind": "synthetic", "synthetic_size": 4},
            "classes": {
                "coarse_to_fine_map": [[0, 2], [3, 4]],
                "coarse_names": {0: "A", 1: "B"},
                "fine_names": {i: str(i) for i in range(5)},
            },
            "model": {
                "backbone": "convnext",
                "backbone_options": {"variant": micro_variant},
                "dtype": "float32",
                "pretrained": str(path),
            },
            "training": {"epochs": 1, "batch_size": 2, "device": "cpu"},
            "transform": {"resize": [32, 32]},
            "output": {"checkpoint_dir": str(tmp_path), "project_name": "t"},
        }
    )
    trainer = Trainer(cfg, verbose=False)
    got = np.asarray(trainer.state.params["backbone"]["stem_conv"]["kernel"])
    want = tm.stem.weight.detach().numpy().transpose(2, 3, 1, 0)
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_import_rejects_unknown_layout(micro_variant):
    from seghiero_tpu.models.torch_convert import import_convnext_backbone

    with pytest.raises(ValueError, match="unrecognized ConvNeXt"):
        import_convnext_backbone({"foo.weight": np.zeros(3)}, micro_variant)


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
