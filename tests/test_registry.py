"""Backbone/head registry tests — the plug-in mechanism that replaces the
reference's edit-the-code "Custom Backbones / Heads" workflow
(/root/reference/README.md:319-328)."""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from seghiero_tpu.config import SegHieroConfig
from seghiero_tpu.models import (
    HieroSegmenter,
    build_model,
    list_backbones,
    list_heads,
    register_backbone,
    register_head,
)
from seghiero_tpu.models.registry import _BACKBONES, _HEADS

pytestmark = pytest.mark.fast


@pytest.fixture
def scrub_registry():
    """Snapshot + restore the registries so test registrations don't leak."""
    bb, hh = dict(_BACKBONES), dict(_HEADS)
    yield
    _BACKBONES.clear()
    _BACKBONES.update(bb)
    _HEADS.clear()
    _HEADS.update(hh)


class _ToyBackbone(nn.Module):
    width: int = 8

    @nn.compact
    def __call__(self, x, train=False):
        w = self.width
        c1 = nn.Conv(w, (3, 3), strides=(4, 4))(x)
        c2 = nn.Conv(2 * w, (3, 3), strides=(2, 2))(c1)
        c3 = nn.Conv(4 * w, (3, 3), strides=(2, 2))(c2)
        c4 = nn.Conv(8 * w, (3, 3), strides=(2, 2))(c3)
        return c1, c2, c3, c4


def test_builtins_registered():
    assert "resnet" in list_backbones()
    assert set(list_heads()) >= {"sep_aspp_contrast", "aspp"}


def test_unknown_names_raise():
    m = HieroSegmenter(num_classes=13, n_fine=9, backbone="nope", depth=18)
    with pytest.raises(ValueError, match="unknown model.backbone 'nope'"):
        m.init(jax.random.key(0), jnp.zeros((1, 32, 32, 3)))
    m = HieroSegmenter(num_classes=13, n_fine=9, head_type="nope", depth=18)
    with pytest.raises(ValueError, match="unknown model.head 'nope'"):
        m.init(jax.random.key(0), jnp.zeros((1, 32, 32, 3)))


def test_custom_backbone_from_yaml_config(scrub_registry, classes_2level, tmp_path):
    """register → select via model.backbone in YAML → train-able model with
    the reference-compatible param-tree layout."""

    @register_backbone("toy")
    def _build(seg):
        width = (seg.backbone_options or {}).get("width", 8)
        return _ToyBackbone(width=width, name="backbone")

    cfg = SegHieroConfig.from_dict(
        {
            "classes": classes_2level,
            "model": {
                "backbone": "toy",
                "backbone_options": {"width": 16},
                "c1_in_channels": 16,
                "in_channels": 128,
                "dtype": "float32",
            },
            "training": {"device": "cpu"},
        }
    )
    assert cfg.model.backbone == "toy"
    assert cfg.model.backbone_options == {"width": 16}
    model = build_model(cfg)
    x = jax.random.normal(jax.random.key(1), (1, 64, 64, 3))
    vars_ = model.init(jax.random.key(0), x, train=False)
    # the registry contract: builders must name their module "backbone" so
    # the checkpoint layout stays reference-compatible
    assert sorted(vars_["params"].keys()) == ["aux_head", "backbone", "head"]
    kernel = vars_["params"]["backbone"]["Conv_0"]["kernel"]
    assert kernel.shape[-1] == 16  # backbone_options.width reached the builder
    out = model.apply(vars_, x, train=False)
    assert out["logits"].shape == (1, 16, 16, cfg.hierarchy.total_classes)
    norms = np.linalg.norm(np.asarray(out["embedding"]), axis=-1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-5)


def test_custom_head(scrub_registry):
    @register_head("toyhead")
    def _build(seg):
        class ToyHead(nn.Module):
            @nn.compact
            def __call__(self, feats, train=False):
                c1 = feats[0]
                logits = nn.Conv(seg.num_classes, (1, 1))(c1)
                emb = nn.Conv(seg.proj_dim, (1, 1))(feats[3])
                emb = emb * jax.lax.rsqrt(
                    jnp.sum(emb * emb, -1, keepdims=True) + 1e-12
                )
                return logits, emb

        return ToyHead(name="head")

    m = HieroSegmenter(
        num_classes=13, n_fine=9, depth=18, head_type="toyhead", with_aux=False
    )
    x = jnp.zeros((1, 64, 64, 3))
    vars_ = m.init(jax.random.key(0), x, train=False)
    out = m.apply(vars_, x, train=False)
    assert out["logits"].shape == (1, 16, 16, 13)
    assert out["embedding"].shape[-1] == 256


def test_non_resnet_backbone_skips_depth_validation(classes_2level):
    # depth 18/34/... is a resnet constraint; custom backbones are free
    cfg = SegHieroConfig.from_dict(
        {
            "classes": classes_2level,
            "model": {"backbone": "whatever", "depth": 7},
        }
    )
    assert cfg.model.depth == 7
