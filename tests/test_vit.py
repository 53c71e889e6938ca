"""Plain-ViT backbone tests: shapes, position-embedding interpolation,
registry/segmenter integration, and numeric parity of the full encoder
against HuggingFace ``ViTModel`` (arXiv:2010.11929) and ``Dinov2Model``
(LayerScale + register tokens) as golden torch oracles — the reference
repo has no transformer backbone; the HF implementations are the
canonical public ones."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from seghiero_tpu.models import HieroSegmenter, ViTBackbone
from seghiero_tpu.models.vit import VARIANTS, interpolate_pos_embed
from seghiero_tpu.models.torch_convert import import_vit_backbone


@pytest.fixture
def tiny_variant():
    VARIANTS["tiny_test"] = (32, 2, 2)  # (dim, depth, heads)
    yield "tiny_test"
    del VARIANTS["tiny_test"]


def test_pos_embed_interpolation_identity_and_resize(rng):
    pos = jnp.asarray(rng.standard_normal((1, 1 + 16, 8)).astype(np.float32))
    same = interpolate_pos_embed(pos, (4, 4), (4, 4))
    np.testing.assert_array_equal(np.asarray(same), np.asarray(pos))
    up = interpolate_pos_embed(pos, (4, 4), (8, 6))
    assert up.shape == (1, 1 + 48, 8)
    # CLS slot untouched by the spatial resize
    np.testing.assert_array_equal(np.asarray(up[:, 0]), np.asarray(pos[:, 0]))


def test_shapes_nonsquare_and_channel_contract(tiny_variant):
    bb = ViTBackbone(variant=tiny_variant, patch=16, pos_grid=4)
    x = jnp.zeros((2, 64, 96, 3))
    vars_ = bb.init(jax.random.key(0), x, train=False)
    c1, c2, c3, c4 = bb.apply(vars_, x, train=False)
    assert c1.shape == (2, 16, 24, 8)
    assert c2.shape == (2, 8, 12, 16)
    assert c3.shape == (2, 4, 6, 32)
    assert c4.shape == (2, 2, 3, 32)
    assert ViTBackbone.stage_channels(tiny_variant) == (8, 16, 32, 32)
    assert "batch_stats" not in vars_


def test_indivisible_input_raises(tiny_variant):
    bb = ViTBackbone(variant=tiny_variant, patch=16)
    with pytest.raises(ValueError, match="divisible"):
        bb.init(jax.random.key(0), jnp.zeros((1, 60, 64, 3)), train=False)


def test_register_tokens_and_layer_scale(tiny_variant):
    bb = ViTBackbone(
        variant=tiny_variant,
        patch=16,
        pos_grid=4,
        n_register=4,
        layer_scale_init=1e-5,
    )
    x = jnp.zeros((1, 64, 64, 3))
    vars_ = bb.init(jax.random.key(0), x, train=False)
    p = vars_["params"]
    assert p["reg_tokens"].shape == (1, 4, 32)
    assert p["block0"]["ls1_gamma"].shape == (32,)
    c1, _, c3, _ = bb.apply(vars_, x, train=False)
    assert c3.shape == (1, 4, 4, 32)


def test_segmenter_integration_upernet(tiny_variant):
    m = HieroSegmenter(
        num_classes=13,
        n_fine=9,
        backbone="vit",
        backbone_options={"variant": tiny_variant, "pos_grid": 4},
        head_type="upernet",
    )
    x = jax.random.normal(jax.random.key(1), (2, 64, 64, 3))
    vars_ = m.init(jax.random.key(0), x, train=False)
    assert sorted(vars_["params"].keys()) == ["aux_head", "backbone", "head"]
    out = m.apply(vars_, x, train=False)
    assert out["logits"].shape == (2, 16, 16, 13)
    norms = np.linalg.norm(np.asarray(out["embedding"]), axis=-1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-5)


# ---------------------------------------------------------------------------
# HF golden parity
# ---------------------------------------------------------------------------


def _apply_imported(bb, sd, variant, x_np):
    vars_ = bb.init(jax.random.key(0), jnp.asarray(x_np), train=False)
    enc = import_vit_backbone(sd, variant)
    params = {**vars_["params"], **jax.tree_util.tree_map(jnp.asarray, enc)}
    return bb.apply({"params": params}, jnp.asarray(x_np), train=False)


def test_parity_vs_hf_vitmodel(tiny_variant, rng):
    from transformers import ViTConfig, ViTModel

    cfg = ViTConfig(
        image_size=64,
        patch_size=16,
        hidden_size=32,
        num_hidden_layers=2,
        num_attention_heads=2,
        intermediate_size=128,
        hidden_act="gelu",
        hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0,
        layer_norm_eps=1e-6,
    )
    torch.manual_seed(0)
    hf = ViTModel(cfg, add_pooling_layer=False).eval()
    x = rng.standard_normal((2, 64, 64, 3)).astype(np.float32)
    with torch.no_grad():
        ref = hf(torch.from_numpy(x.transpose(0, 3, 1, 2))).last_hidden_state
    ref_map = ref[:, 1:, :].reshape(2, 4, 4, 32).numpy()

    bb = ViTBackbone(variant=tiny_variant, patch=16, pos_grid=4)
    _, _, c3, _ = _apply_imported(bb, hf.state_dict(), tiny_variant, x)
    np.testing.assert_allclose(np.asarray(c3), ref_map, rtol=2e-4, atol=2e-5)


def test_parity_vs_hf_dinov2(tiny_variant, rng):
    # registers live in a separate model class on recent transformers
    # (Dinov2WithRegistersModel); fall back to register-free Dinov2Model
    # (LayerScale still exercised) where it does not exist
    try:
        from transformers import (
            Dinov2WithRegistersConfig as Cfg,
            Dinov2WithRegistersModel as Model,
        )

        n_reg = 4
        extra = {"num_register_tokens": n_reg}
    except ImportError:
        from transformers import Dinov2Config as Cfg, Dinov2Model as Model

        n_reg = 0
        extra = {}

    cfg = Cfg(
        image_size=64,
        patch_size=16,
        hidden_size=32,
        num_hidden_layers=2,
        num_attention_heads=2,
        mlp_ratio=4,
        hidden_act="gelu",
        hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0,
        layer_norm_eps=1e-6,
        layerscale_value=0.1,
        use_swiglu_ffn=False,
        **extra,
    )
    torch.manual_seed(1)
    hf = Model(cfg).eval()
    if n_reg:
        # make the register tokens non-trivial (HF inits them to zeros)
        with torch.no_grad():
            hf.embeddings.register_tokens.normal_(0, 0.5)
    x = rng.standard_normal((2, 64, 64, 3)).astype(np.float32)
    with torch.no_grad():
        ref = hf(torch.from_numpy(x.transpose(0, 3, 1, 2))).last_hidden_state
    ref_map = ref[:, 1 + n_reg:, :].reshape(2, 4, 4, 32).numpy()

    bb = ViTBackbone(
        variant=tiny_variant,
        patch=16,
        pos_grid=4,
        n_register=n_reg,
        layer_scale_init=0.1,
    )
    _, _, c3, _ = _apply_imported(bb, hf.state_dict(), tiny_variant, x)
    np.testing.assert_allclose(np.asarray(c3), ref_map, rtol=2e-4, atol=2e-5)


def test_import_timm_layout_matches_hf_layout(tiny_variant):
    """The fused-qkv (timm) import branch must agree with the split-q/k/v
    (HF) branch on the same underlying weights."""
    from transformers import ViTConfig, ViTModel

    cfg = ViTConfig(
        image_size=64,
        patch_size=16,
        hidden_size=32,
        num_hidden_layers=2,
        num_attention_heads=2,
        intermediate_size=128,
        layer_norm_eps=1e-6,
    )
    torch.manual_seed(2)
    hf = ViTModel(cfg, add_pooling_layer=False).eval()
    sd = hf.state_dict()
    from_hf = import_vit_backbone(sd, tiny_variant)

    timm = {
        "patch_embed.proj.weight": sd[
            "embeddings.patch_embeddings.projection.weight"
        ],
        "patch_embed.proj.bias": sd[
            "embeddings.patch_embeddings.projection.bias"
        ],
        "cls_token": sd["embeddings.cls_token"],
        "pos_embed": sd["embeddings.position_embeddings"],
        "norm.weight": sd["layernorm.weight"],
        "norm.bias": sd["layernorm.bias"],
    }
    for i in range(2):
        src = f"encoder.layer.{i}"
        timm[f"blocks.{i}.attn.qkv.weight"] = torch.cat(
            [
                sd[f"{src}.attention.attention.{n}.weight"]
                for n in ("query", "key", "value")
            ]
        )
        timm[f"blocks.{i}.attn.qkv.bias"] = torch.cat(
            [
                sd[f"{src}.attention.attention.{n}.bias"]
                for n in ("query", "key", "value")
            ]
        )
        timm[f"blocks.{i}.attn.proj.weight"] = sd[
            f"{src}.attention.output.dense.weight"
        ]
        timm[f"blocks.{i}.attn.proj.bias"] = sd[
            f"{src}.attention.output.dense.bias"
        ]
        timm[f"blocks.{i}.mlp.fc1.weight"] = sd[f"{src}.intermediate.dense.weight"]
        timm[f"blocks.{i}.mlp.fc1.bias"] = sd[f"{src}.intermediate.dense.bias"]
        timm[f"blocks.{i}.mlp.fc2.weight"] = sd[f"{src}.output.dense.weight"]
        timm[f"blocks.{i}.mlp.fc2.bias"] = sd[f"{src}.output.dense.bias"]
        timm[f"blocks.{i}.norm1.weight"] = sd[f"{src}.layernorm_before.weight"]
        timm[f"blocks.{i}.norm1.bias"] = sd[f"{src}.layernorm_before.bias"]
        timm[f"blocks.{i}.norm2.weight"] = sd[f"{src}.layernorm_after.weight"]
        timm[f"blocks.{i}.norm2.bias"] = sd[f"{src}.layernorm_after.bias"]
    from_timm = import_vit_backbone(timm, tiny_variant)

    flat_hf = jax.tree_util.tree_leaves_with_path(from_hf)
    flat_timm = dict(jax.tree_util.tree_leaves_with_path(from_timm))
    assert len(flat_hf) == len(flat_timm)
    for path, leaf in flat_hf:
        np.testing.assert_array_equal(leaf, flat_timm[path])


def test_import_rejects_wrong_variant_and_layout(tiny_variant):
    with pytest.raises(ValueError, match="unknown vit variant"):
        import_vit_backbone({}, "nope")
    with pytest.raises(ValueError, match="unrecognized ViT"):
        import_vit_backbone({"foo.bar": np.zeros(2)}, tiny_variant)

def test_pos_embed_interpolation_matches_torch_bicubic(rng):
    """timm/DINOv2/HF interpolate position tables with
    F.interpolate(mode='bicubic', antialias=False); ours must match so a
    224-pretrained table transfers with step-0 fidelity."""
    g, d = 5, 8
    pos = rng.standard_normal((1, 1 + g * g, d)).astype(np.float32)
    ours = interpolate_pos_embed(jnp.asarray(pos), (g, g), (9, 7))
    ref = torch.nn.functional.interpolate(
        torch.from_numpy(pos[:, 1:].reshape(1, g, g, d).transpose(0, 3, 1, 2)),
        size=(9, 7),
        mode="bicubic",
        align_corners=False,
        antialias=False,
    )
    ref = ref.permute(0, 2, 3, 1).reshape(1, 9 * 7, d).numpy()
    np.testing.assert_allclose(np.asarray(ours[:, 1:]), ref, rtol=1e-4, atol=1e-5)


def test_import_pos_grid_mismatch_raises(tiny_variant):
    from transformers import ViTConfig, ViTModel

    cfg = ViTConfig(
        image_size=64, patch_size=16, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=2, intermediate_size=128,
    )
    sd = ViTModel(cfg, add_pooling_layer=False).state_dict()  # 4x4 grid
    # matching grid passes; wrong grid raises at import time, naming the
    # knob and suggesting the checkpoint's actual grid
    import_vit_backbone(sd, tiny_variant, pos_grid=4)
    with pytest.raises(ValueError, match=r"pos_grid.*: 4"):
        import_vit_backbone(sd, tiny_variant, pos_grid=14)


def test_vit_merge_cross_check():
    """Importing DINOv2 weights into a backbone configured without
    LayerScale/registers must raise (flax would silently drop the
    gammas and run full-scale residual branches); the reverse direction
    warns."""
    from seghiero_tpu.train.trainer import Trainer

    init_bb = {
        "patch_embed": {"kernel": np.zeros((16, 16, 3, 8))},
        "block0": {"norm1": {"scale": np.ones(8)}},
    }
    imported_extra = {
        "patch_embed": {"kernel": np.zeros((16, 16, 3, 8))},
        "block0": {
            "norm1": {"scale": np.ones(8)},
            "ls1_gamma": np.full(8, 1e-5),
            "ls2_gamma": np.full(8, 1e-5),
        },
        "reg_tokens": np.zeros((1, 4, 8)),
    }
    with pytest.raises(ValueError, match="layer_scale_init"):
        Trainer._check_vit_merge(init_bb, imported_extra)
    with pytest.raises(ValueError, match="n_register"):
        Trainer._check_vit_merge(init_bb, imported_extra)

    init_with_scale = {
        "patch_embed": {"kernel": np.zeros((16, 16, 3, 8))},
        "block0": {
            "norm1": {"scale": np.ones(8)},
            "ls1_gamma": np.full(8, 0.1),
        },
    }
    imported_plain = {
        "patch_embed": {"kernel": np.zeros((16, 16, 3, 8))},
        "block0": {"norm1": {"scale": np.ones(8)}},
    }
    with pytest.warns(UserWarning, match="fresh init"):
        Trainer._check_vit_merge(init_with_scale, imported_plain)
    # clean merge: no error, no warning
    Trainer._check_vit_merge(imported_plain, imported_plain)
