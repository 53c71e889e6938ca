"""HRNet backbone tests: shapes, registry/segmenter integration, and
numeric parity of the full tiny network against a minimal torch
implementation of HRNetV2 (arXiv:1908.07919) built here from the paper —
the reference repo has no HRNet (it only *documents* swapping one in,
README.md:319-328); this guards our Flax translation of the well-known
architecture and the official-layout weight importer."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from seghiero_tpu.models import HieroSegmenter, HRNetBackbone
from seghiero_tpu.models.hrnet import VARIANTS, upsample_nearest



def test_shapes_w18_small():
    bb = HRNetBackbone(variant="w18_small")
    x = jnp.zeros((1, 64, 64, 3))
    vars_ = bb.init(jax.random.key(0), x, train=False)
    c1, c2, c3, c4 = bb.apply(vars_, x, train=False)
    assert c1.shape == (1, 16, 16, 18)
    assert c2.shape == (1, 8, 8, 36)
    assert c3.shape == (1, 4, 4, 72)
    assert c4.shape == (1, 2, 2, 144)


def test_bad_variant_raises():
    bb = HRNetBackbone(variant="nope")
    with pytest.raises(ValueError, match="variant"):
        bb.init(jax.random.key(0), jnp.zeros((1, 32, 32, 3)))


def test_upsample_nearest_matches_repeat():
    x = jnp.arange(2 * 3 * 4 * 5, dtype=jnp.float32).reshape(2, 3, 4, 5)
    got = upsample_nearest(x, 2)
    want = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_segmenter_integration_via_registry():
    m = HieroSegmenter(
        num_classes=13,
        n_fine=9,
        backbone="hrnet",
        backbone_options={"variant": "w18_small"},
    )
    x = jax.random.normal(jax.random.key(1), (2, 64, 64, 3))
    vars_ = m.init(jax.random.key(0), x, train=False)
    assert sorted(vars_["params"].keys()) == ["aux_head", "backbone", "head"]
    out = m.apply(vars_, x, train=False)
    assert out["logits"].shape == (2, 16, 16, 13)
    norms = np.linalg.norm(np.asarray(out["embedding"]), axis=-1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-5)


# ---------------------------------------------------------------------------
# torch golden: a minimal HRNetV2 written from the paper with the official
# state_dict key layout (conv1/bn1, layer1.{i}, transition{t}.{b},
# stage{s}.{m}.branches / fuse_layers)
# ---------------------------------------------------------------------------


class _TBasic(torch.nn.Module):
    def __init__(self, c):
        super().__init__()
        self.conv1 = torch.nn.Conv2d(c, c, 3, padding=1, bias=False)
        self.bn1 = torch.nn.BatchNorm2d(c)
        self.conv2 = torch.nn.Conv2d(c, c, 3, padding=1, bias=False)
        self.bn2 = torch.nn.BatchNorm2d(c)

    def forward(self, x):
        y = torch.relu(self.bn1(self.conv1(x)))
        y = self.bn2(self.conv2(y))
        return torch.relu(x + y)


class _TBottleneck(torch.nn.Module):
    def __init__(self, c_in, width):
        super().__init__()
        out = width * 4
        self.conv1 = torch.nn.Conv2d(c_in, width, 1, bias=False)
        self.bn1 = torch.nn.BatchNorm2d(width)
        self.conv2 = torch.nn.Conv2d(width, width, 3, padding=1, bias=False)
        self.bn2 = torch.nn.BatchNorm2d(width)
        self.conv3 = torch.nn.Conv2d(width, out, 1, bias=False)
        self.bn3 = torch.nn.BatchNorm2d(out)
        self.downsample = None
        if c_in != out:
            self.downsample = torch.nn.Sequential(
                torch.nn.Conv2d(c_in, out, 1, bias=False),
                torch.nn.BatchNorm2d(out),
            )

    def forward(self, x):
        idt = x if self.downsample is None else self.downsample(x)
        y = torch.relu(self.bn1(self.conv1(x)))
        y = torch.relu(self.bn2(self.conv2(y)))
        y = self.bn3(self.conv3(y))
        return torch.relu(idt + y)


class _THRModule(torch.nn.Module):
    def __init__(self, channels, n_blocks):
        super().__init__()
        self.channels = channels
        self.branches = torch.nn.ModuleList(
            [
                torch.nn.Sequential(*[_TBasic(c) for _ in range(n_blocks)])
                for c in channels
            ]
        )
        fuse = []
        for i, ci in enumerate(channels):
            row = []
            for j, cj in enumerate(channels):
                if j == i:
                    row.append(torch.nn.Identity())
                elif j > i:
                    row.append(
                        torch.nn.Sequential(
                            torch.nn.Conv2d(cj, ci, 1, bias=False),
                            torch.nn.BatchNorm2d(ci),
                            torch.nn.Upsample(
                                scale_factor=2 ** (j - i), mode="nearest"
                            ),
                        )
                    )
                else:
                    steps = []
                    for k in range(i - j):
                        last = k == i - j - 1
                        cout = ci if last else cj
                        ops = [
                            torch.nn.Conv2d(
                                cj, cout, 3, stride=2, padding=1, bias=False
                            ),
                            torch.nn.BatchNorm2d(cout),
                        ]
                        if not last:
                            ops.append(torch.nn.ReLU())
                        steps.append(torch.nn.Sequential(*ops))
                    row.append(torch.nn.Sequential(*steps))
            fuse.append(torch.nn.ModuleList(row))
        self.fuse_layers = torch.nn.ModuleList(fuse)

    def forward(self, xs):
        ys = [b(x) for b, x in zip(self.branches, xs)]
        outs = []
        for i in range(len(self.channels)):
            acc = None
            for j in range(len(self.channels)):
                t = self.fuse_layers[i][j](ys[j])
                acc = t if acc is None else acc + t
            outs.append(torch.relu(acc))
        return outs


class _THRNet(torch.nn.Module):
    def __init__(self, spec):
        super().__init__()
        w = spec["width"]
        chs = [w * 2 ** i for i in range(4)]
        self.spec, self.chs = spec, chs
        self.conv1 = torch.nn.Conv2d(3, 64, 3, stride=2, padding=1, bias=False)
        self.bn1 = torch.nn.BatchNorm2d(64)
        self.conv2 = torch.nn.Conv2d(64, 64, 3, stride=2, padding=1, bias=False)
        self.bn2 = torch.nn.BatchNorm2d(64)
        blocks, c_in = [], 64
        for _ in range(spec["stage1_blocks"]):
            blocks.append(_TBottleneck(c_in, 64))
            c_in = 256
        self.layer1 = torch.nn.Sequential(*blocks)
        self.transition1 = torch.nn.ModuleList(
            [
                torch.nn.Sequential(
                    torch.nn.Conv2d(256, chs[0], 3, padding=1, bias=False),
                    torch.nn.BatchNorm2d(chs[0]),
                    torch.nn.ReLU(),
                ),
                torch.nn.Sequential(
                    torch.nn.Sequential(
                        torch.nn.Conv2d(
                            256, chs[1], 3, stride=2, padding=1, bias=False
                        ),
                        torch.nn.BatchNorm2d(chs[1]),
                        torch.nn.ReLU(),
                    )
                ),
            ]
        )
        for t in (2, 3):
            trans = torch.nn.ModuleList(
                [torch.nn.Identity() for _ in range(t)]
                + [
                    torch.nn.Sequential(
                        torch.nn.Sequential(
                            torch.nn.Conv2d(
                                chs[t - 1], chs[t], 3, stride=2, padding=1,
                                bias=False,
                            ),
                            torch.nn.BatchNorm2d(chs[t]),
                            torch.nn.ReLU(),
                        )
                    )
                ]
            )
            setattr(self, f"transition{t}", trans)
        for stage, n_mod in zip((2, 3, 4), spec["modules"]):
            mods = torch.nn.Sequential(
                *[
                    _THRModule(chs[:stage], spec["blocks"])
                    for _ in range(n_mod)
                ]
            )
            setattr(self, f"stage{stage}", mods)

    def forward(self, x):
        x = torch.relu(self.bn1(self.conv1(x)))
        x = torch.relu(self.bn2(self.conv2(x)))
        x = self.layer1(x)
        xs = [t(x) for t in self.transition1]
        for stage in (2, 3, 4):
            if stage > 2:
                trans = getattr(self, f"transition{stage - 1}")
                xs = [t(v) for t, v in zip(trans, xs)] + [trans[-1](xs[-1])]
            for mod in getattr(self, f"stage{stage}"):
                xs = mod(xs)
        return xs


@pytest.fixture
def tiny_variant():
    VARIANTS["tiny"] = dict(width=4, stage1_blocks=1, modules=(1, 1, 1), blocks=1)
    yield "tiny"
    del VARIANTS["tiny"]


def _randomize(module, rng):
    with torch.no_grad():
        for p in module.parameters():
            p.copy_(
                torch.from_numpy(
                    rng.standard_normal(p.shape).astype(np.float32) * 0.1
                )
            )
        for m in module.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.weight.copy_(
                    torch.from_numpy(
                        (rng.standard_normal(m.weight.shape) * 0.1 + 1.0).astype(
                            np.float32
                        )
                    )
                )
                m.running_mean.copy_(
                    torch.from_numpy(
                        rng.standard_normal(m.running_mean.shape).astype(
                            np.float32
                        )
                        * 0.1
                    )
                )
                m.running_var.copy_(
                    torch.from_numpy(
                        (rng.random(m.running_var.shape) + 0.5).astype(np.float32)
                    )
                )


def test_pretrained_import_parity(rng, tiny_variant):
    from seghiero_tpu.models.torch_convert import import_hrnet_backbone

    torch.manual_seed(0)
    tm = _THRNet(VARIANTS[tiny_variant]).eval()
    _randomize(tm, rng)

    x = rng.standard_normal((2, 3, 32, 32)).astype(np.float32)
    with torch.no_grad():
        want = [f.numpy() for f in tm(torch.from_numpy(x))]

    sd = {k: v for k, v in tm.state_dict().items()}
    params, stats = import_hrnet_backbone(sd, tiny_variant)
    bb = HRNetBackbone(variant=tiny_variant)
    got = bb.apply(
        {"params": params, "batch_stats": stats},
        jnp.asarray(x.transpose(0, 2, 3, 1)),
        train=False,
    )
    for i, (g, w) in enumerate(zip(got, want)):
        np.testing.assert_allclose(
            np.asarray(g).transpose(0, 3, 1, 2),
            w,
            rtol=2e-4,
            atol=2e-4,
            err_msg=f"branch {i} features diverged",
        )


def test_trainer_pretrained_hook(rng, tiny_variant, tmp_path):
    from seghiero_tpu.config import SegHieroConfig
    from seghiero_tpu.train.trainer import Trainer

    torch.manual_seed(3)
    tm = _THRNet(VARIANTS[tiny_variant])
    path = tmp_path / "hrnet.pth"
    torch.save(tm.state_dict(), path)

    cfg = SegHieroConfig.from_dict(
        {
            "dataset": {"kind": "synthetic", "synthetic_size": 4},
            "classes": {
                "coarse_to_fine_map": [[0, 2], [3, 4]],
                "coarse_names": {0: "A", 1: "B"},
                "fine_names": {i: str(i) for i in range(5)},
            },
            "model": {
                "backbone": "hrnet",
                "backbone_options": {"variant": tiny_variant},
                "dtype": "float32",
                "pretrained": str(path),
            },
            "training": {"epochs": 1, "batch_size": 2, "device": "cpu"},
            "transform": {"resize": [32, 32]},
            "output": {"checkpoint_dir": str(tmp_path), "project_name": "t"},
        }
    )
    trainer = Trainer(cfg, verbose=False)
    got = np.asarray(trainer.state.params["backbone"]["conv1"]["kernel"])
    want = tm.conv1.weight.detach().numpy().transpose(2, 3, 1, 0)
    np.testing.assert_allclose(got, want, rtol=1e-6)
