"""MiT (SegFormer encoder) backbone + all-MLP head tests: shapes,
registry/segmenter integration, and numeric parity of the full network
against HuggingFace ``transformers.SegformerModel`` as the golden torch
oracle (the reference repo has no transformer backbone — it only
documents swapping backbones, README.md:319-328; transformers' Segformer
is the canonical public implementation of arXiv:2105.15203)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from seghiero_tpu.models import HieroSegmenter, MiTBackbone
from seghiero_tpu.models.mit import VARIANTS



def test_shapes_b0():
    bb = MiTBackbone(variant="b0")
    x = jnp.zeros((1, 64, 64, 3))
    vars_ = bb.init(jax.random.key(0), x, train=False)
    c1, c2, c3, c4 = bb.apply(vars_, x, train=False)
    assert c1.shape == (1, 16, 16, 32)
    assert c2.shape == (1, 8, 8, 64)
    assert c3.shape == (1, 4, 4, 160)
    assert c4.shape == (1, 2, 2, 256)
    assert "batch_stats" not in vars_  # LayerNorm-only backbone


def test_bad_variant_raises():
    bb = MiTBackbone(variant="nope")
    with pytest.raises(ValueError, match="variant"):
        bb.init(jax.random.key(0), jnp.zeros((1, 32, 32, 3)))


@pytest.fixture
def tiny_variant():
    # dims must divide NUM_HEADS (1,2,5,8) per stage
    VARIANTS["tiny"] = ((1, 1, 1, 1), (8, 8, 10, 16))
    yield "tiny"
    del VARIANTS["tiny"]


def test_segmenter_integration_mlp_head(tiny_variant):
    m = HieroSegmenter(
        num_classes=13,
        n_fine=9,
        backbone="mit",
        backbone_options={"variant": tiny_variant},
        head_type="segformer_mlp",
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


def _hf_model(tiny_variant):
    from transformers import SegformerConfig, SegformerModel

    depths, dims = VARIANTS[tiny_variant]
    cfg = SegformerConfig(
        num_channels=3,
        num_encoder_blocks=4,
        depths=list(depths),
        sr_ratios=[8, 4, 2, 1],
        hidden_sizes=list(dims),
        patch_sizes=[7, 3, 3, 3],
        strides=[4, 2, 2, 2],
        num_attention_heads=[1, 2, 5, 8],
        mlp_ratios=[4, 4, 4, 4],
        hidden_act="gelu",
        hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0,
        drop_path_rate=0.0,
        layer_norm_eps=1e-6,
        reshape_last_stage=True,
    )
    torch.manual_seed(0)
    return SegformerModel(cfg).eval()


def test_hf_import_parity(rng, tiny_variant):
    from seghiero_tpu.models.torch_convert import import_mit_backbone

    tm = _hf_model(tiny_variant)
    x = rng.standard_normal((2, 3, 32, 32)).astype(np.float32)
    with torch.no_grad():
        want = [
            f.numpy()
            for f in tm(torch.from_numpy(x), output_hidden_states=True).hidden_states
        ]

    params = import_mit_backbone(dict(tm.state_dict()), tiny_variant)
    bb = MiTBackbone(variant=tiny_variant)
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
    """The official NVlabs layout (fused attn.kv) must produce the same
    parameter tree as the HF layout (split query/key/value)."""
    from seghiero_tpu.models.torch_convert import import_mit_backbone

    tm = _hf_model(tiny_variant)
    hf_sd = dict(tm.state_dict())
    want = import_mit_backbone(hf_sd, tiny_variant)

    # rebuild the official naming from the HF dict, fusing k/v
    official = {}
    for k, v in hf_sd.items():
        if not k.startswith("encoder."):
            continue
        k = k[len("encoder."):]
        for i in range(4):
            k = k.replace(f"patch_embeddings.{i}.", f"patch_embed{i + 1}.")
            k = k.replace(f"block.{i}.", f"block{i + 1}.")
        if k.startswith("layer_norm."):
            k = "norm" + str(int(k.split(".")[1]) + 1) + "." + k.split(".", 2)[2]
        k = (
            k.replace(".layer_norm.", ".norm.")
            .replace("layer_norm_1", "norm1")
            .replace("layer_norm_2", "norm2")
            .replace("attention.self.query", "attn.q")
            .replace("attention.self.sr", "attn.sr")
            .replace("attention.self.norm", "attn.norm")
            .replace("attention.output.dense", "attn.proj")
            .replace("mlp.dense1", "mlp.fc1")
            .replace("mlp.dense2", "mlp.fc2")
        )
        official[k] = v
    for k in list(official):
        if "attention.self.key" in k:
            kv = torch.cat(
                [official[k], official[k.replace(".key.", ".value.")]], dim=0
            )
            official[
                k.replace("attention.self.key", "attn.kv")
            ] = kv
            del official[k], official[k.replace(".key.", ".value.")]

    got = import_mit_backbone(official, tiny_variant)
    flat_w = jax.tree_util.tree_leaves_with_path(want)
    flat_g = jax.tree_util.tree_leaves_with_path(got)
    assert [p for p, _ in flat_w] == [p for p, _ in flat_g]
    for (p, a), (_, b) in zip(flat_w, flat_g):
        np.testing.assert_array_equal(a, b, err_msg=str(p))


def test_trainer_pretrained_hook(tiny_variant, tmp_path):
    from seghiero_tpu.config import SegHieroConfig
    from seghiero_tpu.train.trainer import Trainer

    tm = _hf_model(tiny_variant)
    path = tmp_path / "mit.pth"
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
                "backbone": "mit",
                "backbone_options": {"variant": tiny_variant},
                "head": "segformer_mlp",
                "dtype": "float32",
                "pretrained": str(path),
            },
            "training": {"epochs": 1, "batch_size": 2, "device": "cpu"},
            "transform": {"resize": [32, 32]},
            "output": {"checkpoint_dir": str(tmp_path), "project_name": "t"},
        }
    )
    trainer = Trainer(cfg, verbose=False)
    got = np.asarray(
        trainer.state.params["backbone"]["patch_embed1_proj"]["kernel"]
    )
    want = (
        tm.encoder.patch_embeddings[0].proj.weight.detach().numpy()
        .transpose(2, 3, 1, 0)
    )
    np.testing.assert_allclose(got, want, rtol=1e-6)
