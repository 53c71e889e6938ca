"""Model-layer tests: shapes, torch-padding parity, and numeric parity of
the decode head against the imported reference head module."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from seghiero_tpu.models import HieroSegmenter, ResNetBackbone, SepASPPContrastHead
from seghiero_tpu.models.torch_convert import (
    import_reference_head,
    import_torchvision_backbone,
)


def test_segmenter_shapes_r18():
    model = HieroSegmenter(num_classes=13, n_fine=9, depth=18)
    x = jax.random.normal(jax.random.key(1), (2, 64, 64, 3))
    vars_ = model.init(jax.random.key(0), x, train=False)
    out = model.apply(vars_, x, train=False)
    assert out["logits"].shape == (2, 16, 16, 13)  # stride 4
    assert out["embedding"].shape == (2, 2, 2, 256)  # stride 32
    assert out["aux_logits"].shape == (2, 4, 4, 9)  # stride 16
    # embedding is unit-norm per pixel
    norms = np.linalg.norm(np.asarray(out["embedding"]), axis=-1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-5)


def test_backbone_strides_and_channels():
    bb = ResNetBackbone(depth=50)
    x = jnp.zeros((1, 96, 96, 3))
    vars_ = bb.init(jax.random.key(0), x, train=False)
    c1, c2, c3, c4 = bb.apply(vars_, x, train=False)
    assert c1.shape == (1, 24, 24, 256)
    assert c2.shape == (1, 12, 12, 512)
    assert c3.shape == (1, 6, 6, 1024)
    assert c4.shape == (1, 3, 3, 2048)


@pytest.mark.parametrize("os_, c3s, c4s", [(16, 6, 6), (8, 12, 12)])
def test_backbone_dilated_output_stride(os_, c3s, c4s):
    """output_stride 8/16 via dilated stages: same params, larger maps."""
    bb = ResNetBackbone(depth=18, output_stride=os_)
    x = jnp.zeros((1, 96, 96, 3))
    vars_ = bb.init(jax.random.key(0), x, train=False)
    c1, c2, c3, c4 = bb.apply(vars_, x, train=False)
    assert c3.shape[1] == c3s and c4.shape[1] == c4s
    # identical parameter tree to the plain backbone → ImageNet weights
    # convert unchanged
    plain = ResNetBackbone(depth=18).init(jax.random.key(0), x, train=False)
    a = jax.tree_util.tree_map(jnp.shape, vars_["params"])
    b = jax.tree_util.tree_map(jnp.shape, plain["params"])
    assert a == b


def test_segmenter_output_stride8_trains(classes_2level, tmp_path):
    import dataclasses

    from tests.test_train_e2e import tiny_config
    from seghiero_tpu.train.trainer import Trainer
    import numpy as np

    cfg = tiny_config(classes_2level, tmp_path, epochs=1, size=4)
    cfg = dataclasses.replace(
        cfg, model=dataclasses.replace(cfg.model, output_stride=8)
    )
    trainer = Trainer(cfg, verbose=False)
    history = trainer.fit()
    assert np.isfinite(history[0]["train_loss"])


def test_stem_matches_torch_padding(rng):
    """The stem's 7×7/2 conv + 3×3/2 maxpool use torch-style symmetric
    padding, not XLA SAME — verify numerically against torch F ops."""
    x = rng.standard_normal((1, 32, 32, 3)).astype(np.float32)
    w = rng.standard_normal((64, 3, 7, 7)).astype(np.float32) * 0.1

    t = F.conv2d(torch.from_numpy(np.moveaxis(x, -1, 1)), torch.from_numpy(w),
                 stride=2, padding=3)
    t = F.max_pool2d(F.relu(t), 3, stride=2, padding=1)
    ref = np.moveaxis(t.numpy(), 1, -1)

    bb = ResNetBackbone(depth=18)
    vars_ = bb.init(jax.random.key(0), jnp.zeros((1, 32, 32, 3)), train=False)
    params = jax.tree_util.tree_map(lambda a: a, vars_["params"])
    params["stem_conv"]["kernel"] = jnp.asarray(w.transpose(2, 3, 1, 0))
    # identity BN
    params["stem_bn"]["scale"] = jnp.ones(64)
    params["stem_bn"]["bias"] = jnp.zeros(64)

    # run just the stem by capturing the first stage input via a sub-apply:
    import flax.linen as nn
    from seghiero_tpu.models.resnet import batch_norm, conv

    class Stem(nn.Module):
        @nn.compact
        def __call__(self, x):
            x = conv(64, 7, stride=2, name="stem_conv")(x)
            x = nn.relu(x)  # BN skipped (identity at init anyway)
            return nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])

    stem = Stem()
    sv = {"params": {"stem_conv": {"kernel": jnp.asarray(w.transpose(2, 3, 1, 0))}}}
    ours = np.asarray(stem.apply(sv, jnp.asarray(x)))
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-4)


def test_s2d_stem_matches_conv7(rng):
    """space-to-depth stem rewrite is mathematically identical to the
    plain 7×7/s2 conv (models/resnet.py StemConv docstring derivation)."""
    from seghiero_tpu.models.resnet import StemConv

    x = jnp.asarray(rng.standard_normal((2, 32, 48, 3)).astype(np.float32))
    mod7 = StemConv(mode="conv7")
    vars_ = mod7.init(jax.random.key(3), x)
    y7 = mod7.apply(vars_, x)
    ys = StemConv(mode="s2d").apply(vars_, x)  # same param tree
    assert ys.shape == y7.shape == (2, 16, 24, 64)
    np.testing.assert_allclose(np.asarray(ys), np.asarray(y7), rtol=1e-4, atol=1e-5)


def test_s2d_stem_odd_input_falls_back(rng):
    from seghiero_tpu.models.resnet import StemConv

    x = jnp.asarray(rng.standard_normal((1, 33, 33, 3)).astype(np.float32))
    mod = StemConv(mode="s2d")
    vars_ = mod.init(jax.random.key(3), x)
    y = mod.apply(vars_, x)
    y7 = StemConv(mode="conv7").apply(vars_, x)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y7))


def test_backbone_stem_modes_same_params_same_output(rng):
    """Full backbone: checkpoints interchange between stem modes."""
    x = jnp.asarray(rng.standard_normal((1, 64, 64, 3)).astype(np.float32))
    plain = ResNetBackbone(depth=18, stem="conv7")
    vars_ = plain.init(jax.random.key(0), x, train=False)
    outs7 = plain.apply(vars_, x, train=False)
    outss = ResNetBackbone(depth=18, stem="s2d").apply(vars_, x, train=False)
    for a, b in zip(outs7, outss):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-3, atol=2e-4)


def test_head_numeric_parity_with_reference(rng):
    """Convert a randomly-initialized reference head's weights and compare
    full forward outputs (eval mode)."""
    import sys

    sys.path.insert(0, "/root/reference")
    from models.head.sep_aspp_contrast_head import (
        DepthwiseSeparableASPPContrastHead as RefHead,
    )

    torch.manual_seed(0)
    ref_head = RefHead(
        in_channels=32,
        c1_in_channels=16,
        c1_channels=8,
        aspp_channels=16,
        dilations=(1, 2, 3, 4),
        num_classes=13,
        proj_dim=8,
        proj_type="convmlp",
    ).eval()

    B, H4, W4, h, w = 2, 16, 16, 4, 4
    c1 = rng.standard_normal((B, H4, W4, 16)).astype(np.float32)
    c4 = rng.standard_normal((B, h, w, 32)).astype(np.float32)

    with torch.no_grad():
        ref_logits, ref_emb = ref_head(
            [
                torch.from_numpy(np.moveaxis(c1, -1, 1)),
                None,
                None,
                torch.from_numpy(np.moveaxis(c4, -1, 1)),
            ]
        )

    params, stats = import_reference_head(
        {k: v for k, v in ref_head.state_dict().items()}, proj_type="convmlp"
    )
    ours = SepASPPContrastHead(
        num_classes=13,
        c1_channels=8,
        aspp_channels=16,
        dilations=(1, 2, 3, 4),
        proj_dim=8,
        proj_type="convmlp",
    )
    out_logits, out_emb = ours.apply(
        {"params": params, "batch_stats": stats},
        [jnp.asarray(c1), None, None, jnp.asarray(c4)],
        train=False,
    )
    np.testing.assert_allclose(
        np.asarray(out_logits),
        np.moveaxis(ref_logits.numpy(), 1, -1),
        rtol=1e-4,
        atol=1e-4,
    )
    np.testing.assert_allclose(
        np.asarray(out_emb), np.moveaxis(ref_emb.numpy(), 1, -1), rtol=1e-4, atol=1e-4
    )


def _synthetic_torchvision_sd(depth):
    """Minimal torchvision-style state_dict with correct shapes."""
    from seghiero_tpu.models.resnet import BOTTLENECK_DEPTHS, STAGE_BLOCKS

    g = np.random.default_rng(0)
    sd = {}

    def add_conv(name, o, i, k):
        sd[f"{name}.weight"] = torch.from_numpy(
            (g.standard_normal((o, i, k, k)) * 0.05).astype(np.float32)
        )

    def add_bn(name, c):
        sd[f"{name}.weight"] = torch.ones(c)
        sd[f"{name}.bias"] = torch.zeros(c)
        sd[f"{name}.running_mean"] = torch.zeros(c)
        sd[f"{name}.running_var"] = torch.ones(c)

    add_conv("conv1", 64, 3, 7)
    add_bn("bn1", 64)
    bottleneck = depth in BOTTLENECK_DEPTHS
    in_ch = 64
    for stage, n_blocks in enumerate(STAGE_BLOCKS[depth], start=1):
        width = 64 * 2 ** (stage - 1)
        out_ch = width * 4 if bottleneck else width
        for b in range(n_blocks):
            pre = f"layer{stage}.{b}"
            if bottleneck:
                add_conv(f"{pre}.conv1", width, in_ch, 1)
                add_bn(f"{pre}.bn1", width)
                add_conv(f"{pre}.conv2", width, width, 3)
                add_bn(f"{pre}.bn2", width)
                add_conv(f"{pre}.conv3", out_ch, width, 1)
                add_bn(f"{pre}.bn3", out_ch)
            else:
                add_conv(f"{pre}.conv1", width, in_ch, 3)
                add_bn(f"{pre}.bn1", width)
                add_conv(f"{pre}.conv2", width, width, 3)
                add_bn(f"{pre}.bn2", width)
            if in_ch != out_ch or (stage > 1 and b == 0):
                add_conv(f"{pre}.downsample.0", out_ch, in_ch, 1)
                add_bn(f"{pre}.downsample.1", out_ch)
            in_ch = out_ch
    return sd


@pytest.mark.parametrize("depth", [18, 50])
def test_torchvision_backbone_conversion_structure(depth):
    sd = _synthetic_torchvision_sd(depth)
    params, stats = import_torchvision_backbone(sd, depth)

    bb = ResNetBackbone(depth=depth)
    ref_vars = bb.init(jax.random.key(0), jnp.zeros((1, 32, 32, 3)), train=False)

    def shapes(tree):
        return jax.tree_util.tree_map(lambda a: jnp.shape(a), tree)

    assert shapes(ref_vars["params"]) == shapes(params)
    assert shapes(ref_vars["batch_stats"]) == shapes(stats)
    # and the converted params actually run
    out = bb.apply(
        {"params": params, "batch_stats": stats},
        jnp.ones((1, 32, 32, 3)),
        train=False,
    )
    assert out[-1].shape[-1] == (2048 if depth == 50 else 512)
