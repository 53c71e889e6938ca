"""Swin backbone tests: shapes, window/shift semantics, registry
integration, and numeric parity of the full network against HuggingFace
``transformers.SwinBackbone`` as the golden torch oracle (the reference
repo has no transformer backbone; HF Swin is the canonical public
implementation of arXiv:2103.14030 with dense-prediction per-stage
norms)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from seghiero_tpu.models import HieroSegmenter, SwinBackbone
from seghiero_tpu.models.swin import (
    VARIANTS,
    relative_position_index,
    shift_attn_mask,
    window_partition,
    window_reverse,
)



@pytest.fixture
def tiny_variant():
    # dims (d, 2d, 4d, 8d) must divide the per-stage head counts
    VARIANTS["tiny_test"] = (8, (2, 2, 2, 2), (1, 2, 4, 8))
    yield "tiny_test"
    del VARIANTS["tiny_test"]


def test_window_roundtrip(rng):
    x = jnp.asarray(rng.standard_normal((2, 8, 12, 5)).astype(np.float32))
    w = 4
    back = window_reverse(window_partition(x, w), w, 2, 8, 12)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(x))


def test_relative_position_index_properties():
    idx = relative_position_index(3)
    assert idx.shape == (9, 9)
    assert idx.min() >= 0 and idx.max() < 25  # (2*3-1)²
    # diagonal = zero displacement = center of the table
    assert (np.diag(idx) == idx[0, 0]).all()


def test_shift_mask_blocks_cross_region():
    m = shift_attn_mask(8, 8, 4, 2)
    assert m.shape == (4, 16, 16)
    # the window fully inside the image attends everywhere
    assert (m[0] == 0).all()
    # wrapped windows must mask something
    assert (m[-1] == -100).any()


def test_shapes_and_window_adjustment(tiny_variant):
    bb = SwinBackbone(variant=tiny_variant, window=4)
    x = jnp.zeros((1, 128, 128, 3))
    vars_ = bb.init(jax.random.key(0), x, train=False)
    c1, c2, c3, c4 = bb.apply(vars_, x, train=False)
    assert c1.shape == (1, 32, 32, 8)
    assert c2.shape == (1, 16, 16, 16)
    assert c3.shape == (1, 8, 8, 32)
    assert c4.shape == (1, 4, 4, 64)
    assert "batch_stats" not in vars_


def test_map_smaller_than_window_pads(tiny_variant):
    """Maps below the window are padded up to it (always-partition
    semantics, like HF SwinBackbone with always_partition=True)."""
    bb = SwinBackbone(variant=tiny_variant, window=4)
    x = jnp.zeros((1, 64, 64, 3))
    vars_ = bb.init(jax.random.key(0), x, train=False)
    c1, c2, c3, c4 = bb.apply(vars_, x, train=False)
    assert c4.shape == (1, 2, 2, 64)  # stride-32 map 2×2 < window 4


def test_bad_variant_raises():
    bb = SwinBackbone(variant="nope")
    with pytest.raises(ValueError, match="variant"):
        bb.init(jax.random.key(0), jnp.zeros((1, 32, 32, 3)))


def test_segmenter_integration_via_registry(tiny_variant):
    m = HieroSegmenter(
        num_classes=13,
        n_fine=9,
        backbone="swin",
        backbone_options={"variant": tiny_variant, "window": 4},
    )
    x = jax.random.normal(jax.random.key(1), (2, 128, 128, 3))
    vars_ = m.init(jax.random.key(0), x, train=False)
    assert sorted(vars_["params"].keys()) == ["aux_head", "backbone", "head"]
    out = m.apply(vars_, x, train=False)
    assert out["logits"].shape == (2, 32, 32, 13)
    norms = np.linalg.norm(np.asarray(out["embedding"]), axis=-1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-5)


# ---------------------------------------------------------------------------
# HF golden parity
# ---------------------------------------------------------------------------


def _hf_model(tiny_variant):
    from transformers import SwinConfig
    from transformers import SwinBackbone as HFSwinBackbone

    dim0, depths, heads = VARIANTS[tiny_variant]
    cfg = SwinConfig(
        image_size=128,
        embed_dim=dim0,
        depths=list(depths),
        num_heads=list(heads),
        window_size=4,
        mlp_ratio=4.0,
        qkv_bias=True,
        hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0,
        drop_path_rate=0.0,
        hidden_act="gelu",
        layer_norm_eps=1e-5,
        use_absolute_embeddings=False,
        out_features=["stage1", "stage2", "stage3", "stage4"],
    )
    torch.manual_seed(0)
    m = HFSwinBackbone(cfg).eval()
    # HF zero-inits the relative position bias tables; randomize them so
    # the parity test actually exercises the bias path
    with torch.no_grad():
        for name, p in m.named_parameters():
            if "relative_position_bias_table" in name:
                p.normal_(0.0, 0.5)
    return m


def test_hf_import_parity(rng, tiny_variant):
    from seghiero_tpu.models.torch_convert import import_swin_backbone

    tm = _hf_model(tiny_variant)
    x = rng.standard_normal((2, 3, 128, 128)).astype(np.float32)
    with torch.no_grad():
        want = [f.numpy() for f in tm(torch.from_numpy(x)).feature_maps]

    params = import_swin_backbone(dict(tm.state_dict()), tiny_variant)
    bb = SwinBackbone(variant=tiny_variant, window=4)
    got = bb.apply(
        {"params": params}, jnp.asarray(x.transpose(0, 2, 3, 1)), train=False
    )
    assert len(want) == 4
    for i, (g, w) in enumerate(zip(got, want)):
        np.testing.assert_allclose(
            np.asarray(g).transpose(0, 3, 1, 2),
            w,
            rtol=2e-4,
            atol=2e-4,
            err_msg=f"stage {i} features diverged",
        )


def test_official_layout_import_matches_hf(tiny_variant):
    """The official microsoft layout (fused attn.qkv, per-stage norms
    absent) must produce the same tree modulo identity out-norms."""
    from seghiero_tpu.models.torch_convert import import_swin_backbone

    tm = _hf_model(tiny_variant)
    hf_sd = dict(tm.state_dict())
    want = import_swin_backbone(hf_sd, tiny_variant)

    official = {}
    for k, v in hf_sd.items():
        if k.startswith("hidden_states_norms."):
            continue  # classification ckpts lack per-stage norms
        k = k.replace(
            "embeddings.patch_embeddings.projection", "patch_embed.proj"
        ).replace("embeddings.norm", "patch_embed.norm")
        if k.startswith("encoder.layers."):
            k = k[len("encoder."):]
        k = (
            k.replace("layernorm_before", "norm1")
            .replace("layernorm_after", "norm2")
            .replace(
                "attention.self.relative_position_bias_table",
                "attn.relative_position_bias_table",
            )
            .replace("attention.self.query", "attn.q")
            .replace("attention.output.dense", "attn.proj")
            .replace("intermediate.dense", "mlp.fc1")
            .replace("output.dense", "mlp.fc2")
        )
        official[k] = v
    # fuse q/k/v into the official qkv
    for k in [k for k in official if "attention.self.key" in k]:
        q = official[k.replace("attention.self.key", "attn.q")]
        kk = official[k]
        vv = official[k.replace(".key.", ".value.")]
        official[k.replace("attention.self.key", "attn.qkv")] = torch.cat(
            [q, kk, vv], dim=0
        )
        del official[k], official[k.replace(".key.", ".value.")]
        del official[k.replace("attention.self.key", "attn.q")]

    got = import_swin_backbone(official, tiny_variant)
    flat_w = dict(
        (jax.tree_util.keystr(p), a)
        for p, a in jax.tree_util.tree_leaves_with_path(want)
    )
    flat_g = dict(
        (jax.tree_util.keystr(p), a)
        for p, a in jax.tree_util.tree_leaves_with_path(got)
    )
    assert sorted(flat_w) == sorted(flat_g)
    for key in flat_w:
        if "out_norm" in key:
            continue  # identity-initialized in the official import
        np.testing.assert_array_equal(flat_w[key], flat_g[key], err_msg=key)


def test_trainer_pretrained_hook(tiny_variant, tmp_path):
    from seghiero_tpu.config import SegHieroConfig
    from seghiero_tpu.train.trainer import Trainer

    tm = _hf_model(tiny_variant)
    path = tmp_path / "swin.pth"
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
                "backbone": "swin",
                "backbone_options": {"variant": tiny_variant, "window": 4},
                "dtype": "float32",
                "pretrained": str(path),
            },
            "training": {"epochs": 1, "batch_size": 2, "device": "cpu"},
            "transform": {"resize": [128, 128]},
            "output": {"checkpoint_dir": str(tmp_path), "project_name": "t"},
        }
    )
    trainer = Trainer(cfg, verbose=False)
    got = np.asarray(trainer.state.params["backbone"]["patch_proj"]["kernel"])
    want = (
        tm.embeddings.patch_embeddings.projection.weight.detach()
        .numpy()
        .transpose(2, 3, 1, 0)
    )
    np.testing.assert_allclose(got, want, rtol=1e-6)
