"""UNet backbone tests: shapes/widths, numeric decoder-skip wiring, and
segmenter integration via the registry. The reference has no UNet — it
only documents swapping one in (README.md:319-328); these tests guard
our from-the-paper (arXiv:1505.04597) construction."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from seghiero_tpu.models import HieroSegmenter, UNetBackbone



def test_shapes_and_widths():
    bb = UNetBackbone(base_width=8, max_width=32)
    x = jnp.zeros((1, 64, 64, 3))
    vars_ = bb.init(jax.random.key(0), x, train=False)
    c1, c2, c3, c4 = bb.apply(vars_, x, train=False)
    # widths: 8,16,32,32,32,32 (capped) → C1..C4 = dec2,dec3,dec4,bottleneck
    assert c1.shape == (1, 16, 16, 32)
    assert c2.shape == (1, 8, 8, 32)
    assert c3.shape == (1, 4, 4, 32)
    assert c4.shape == (1, 2, 2, 32)
    assert UNetBackbone.stage_channels(8, 32) == (32, 32, 32, 32)
    assert UNetBackbone.stage_channels(32, 512) == (128, 256, 512, 512)


def test_bad_widths_raise():
    bb = UNetBackbone(base_width=64, max_width=8)
    with pytest.raises(ValueError, match="base_width"):
        bb.init(jax.random.key(0), jnp.zeros((1, 64, 64, 3)))


def test_decoder_sees_skip_connections():
    """Zeroing an encoder skip's convs must change the decoder output —
    guards the concat wiring (a broken skip would silently degrade to a
    plain autoencoder)."""
    bb = UNetBackbone(base_width=4, max_width=16)
    x = jax.random.normal(jax.random.key(1), (1, 64, 64, 3))
    vars_ = bb.init(jax.random.key(0), x, train=False)
    base = np.asarray(bb.apply(vars_, x, train=False)[0])

    import flax

    mut = flax.core.unfreeze(vars_)
    for ci in (1, 2):
        k = mut["params"]["enc2"][f"conv{ci}"]["kernel"]
        mut["params"]["enc2"][f"conv{ci}"]["kernel"] = jnp.zeros_like(k)
    cut = np.asarray(bb.apply(flax.core.freeze(mut), x, train=False)[0])
    assert not np.allclose(base, cut)


def test_segmenter_integration_via_registry():
    m = HieroSegmenter(
        num_classes=13,
        n_fine=9,
        backbone="unet",
        backbone_options={"base_width": 8, "max_width": 32},
    )
    x = jax.random.normal(jax.random.key(1), (2, 64, 64, 3))
    vars_ = m.init(jax.random.key(0), x, train=False)
    assert sorted(vars_["params"].keys()) == ["aux_head", "backbone", "head"]
    out = m.apply(vars_, x, train=False)
    assert out["logits"].shape == (2, 16, 16, 13)
    norms = np.linalg.norm(np.asarray(out["embedding"]), axis=-1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-5)


def test_train_mode_updates_batch_stats():
    bb = UNetBackbone(base_width=4, max_width=8)
    x = jax.random.normal(jax.random.key(1), (2, 32, 32, 3))
    vars_ = bb.init(jax.random.key(0), x, train=False)
    _, mut = bb.apply(vars_, x, train=True, mutable=["batch_stats"])
    before = np.asarray(vars_["batch_stats"]["enc0"]["bn1"]["mean"])
    after = np.asarray(mut["batch_stats"]["enc0"]["bn1"]["mean"])
    assert not np.allclose(before, after)
