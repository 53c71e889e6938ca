"""Equivalence of the C-major TPU fast-path losses (losses/fast.py) with
the NHWC parity implementations."""

import jax.numpy as jnp
import numpy as np
import pytest

from seghiero_tpu.hierarchy import Hierarchy
from seghiero_tpu.losses import HieraTripletLoss, RMIHieraTripletLoss
from seghiero_tpu.losses.cross_entropy import softmax_cross_entropy
from seghiero_tpu.losses.fast import (
    FastHieraTripletLoss,
    FastRMIHieraTripletLoss,
    aux_ce_fast,
)
from seghiero_tpu.ops.resize import half_size, resize_bilinear


def _inputs(rng, h, B=2, H=64, W=64):
    lo = rng.standard_normal((B, H // 4, W // 4, h.total_classes)).astype(np.float32) * 3
    emb = rng.standard_normal((B, H // 32, W // 32, 16)).astype(np.float32)
    emb /= np.linalg.norm(emb, axis=-1, keepdims=True)
    labels = rng.integers(0, h.n_fine, (B, H, W)).astype(np.int32)
    labels[:, :3, :3] = 255
    return lo, emb, labels


def test_fast_2level_matches_parity(rng, classes_2level):
    h = Hierarchy.from_class_config(classes_2level)
    lo, emb, labels = _inputs(rng, h)
    lf = resize_bilinear(lo, labels.shape[1:3])
    lb = resize_bilinear(lo, half_size(lo.shape[1:3]))

    for step in (0, 50_000, 100_000):
        ref = float(
            HieraTripletLoss(h)(jnp.array(step), emb, lb[..., : h.n_fine], lf, labels)
        )
        fast = float(
            FastHieraTripletLoss(h)(jnp.array(step), emb, lo, lo, labels)
        )
        np.testing.assert_allclose(fast, ref, rtol=2e-5)


def test_fast_3level_matches_parity(rng, classes_3level):
    h = Hierarchy.from_class_config(classes_3level)
    lo, emb, labels = _inputs(rng, h, H=32, W=32)
    lf = resize_bilinear(lo, labels.shape[1:3])
    lb = resize_bilinear(lo, half_size(lo.shape[1:3]))

    ref = float(
        RMIHieraTripletLoss(h)(jnp.array(0), emb, lb[..., : h.n_fine], lf, labels)
    )
    fast = float(FastRMIHieraTripletLoss(h)(jnp.array(0), emb, lo, lo, labels))
    np.testing.assert_allclose(fast, ref, rtol=5e-5)


def test_fast_focal_variant_matches_nhwc(rng, classes_2level):
    """C-major focal hierarchy term (losses/fast.py) ≡ NHWC
    hiera_focal_loss, through the full composite."""
    from seghiero_tpu.losses.focal import hiera_focal_loss
    from seghiero_tpu.losses.hiera import prepare_targets_two_level
    from seghiero_tpu.losses.tree_triplet import (
        tree_triplet_loss_range,
        triplet_schedule_factor,
    )

    h = Hierarchy.from_class_config(classes_2level)
    lo, emb, labels = _inputs(rng, h)
    lf = resize_bilinear(lo, labels.shape[1:3])
    t_fine, t_coarse = prepare_targets_two_level(jnp.asarray(labels), h)

    from seghiero_tpu.losses.cross_entropy import softmax_cross_entropy

    ref = float(hiera_focal_loss(lf, t_fine, t_coarse, h))
    ref += float(softmax_cross_entropy(lf[..., : h.n_fine], t_fine))
    ref += float(
        softmax_cross_entropy(lf[..., h.n_fine : h.n_fine + h.n_coarse], t_coarse)
    )
    t, c = tree_triplet_loss_range(jnp.asarray(emb), jnp.asarray(labels), h)
    if int(c) > 0:
        ref += float(triplet_schedule_factor(jnp.array(0), 80_000) * t)

    fast = float(
        FastHieraTripletLoss(h, hiera_variant="focal")(
            jnp.array(0), emb, lo, lo, labels
        )
    )
    np.testing.assert_allclose(fast, ref, rtol=5e-5)


def test_fast_3level_focal_matches_nhwc(rng, classes_3level):
    """FastRMIHieraTripletLoss(hiera_variant='focal') ≡ the NHWC
    composite with the 3-level focal hiera term."""
    h = Hierarchy.from_class_config(classes_3level)
    lo, emb, labels = _inputs(rng, h, H=32, W=32)
    lf = resize_bilinear(lo, labels.shape[1:3])
    lb = resize_bilinear(lo, half_size(lo.shape[1:3]))

    ref = float(
        RMIHieraTripletLoss(h, hiera_variant="focal")(
            jnp.array(0), emb, lb[..., : h.n_fine], lf, labels
        )
    )
    fast = float(
        FastRMIHieraTripletLoss(h, hiera_variant="focal")(
            jnp.array(0), emb, lo, lo, labels
        )
    )
    np.testing.assert_allclose(fast, ref, rtol=5e-5)
    bce = float(FastRMIHieraTripletLoss(h)(jnp.array(0), emb, lo, lo, labels))
    assert fast != bce


def test_trainer_3level_focal_variant_trains(classes_3level, tmp_path):
    from tests.test_train_e2e import tiny_config
    from seghiero_tpu.train.trainer import Trainer

    cfg = tiny_config(
        classes_3level,
        tmp_path,
        epochs=1,
        size=4,
        extra_training={"hiera_variant": "focal"},
    )
    trainer = Trainer(cfg, verbose=False)
    history = trainer.fit()
    assert np.isfinite(history[0]["train_loss"])


def test_trainer_focal_variant_trains(classes_2level, tmp_path):
    from tests.test_train_e2e import tiny_config
    from seghiero_tpu.train.trainer import Trainer

    cfg = tiny_config(
        classes_2level,
        tmp_path,
        epochs=1,
        size=4,
        extra_training={"hiera_variant": "focal"},
    )
    trainer = Trainer(cfg, verbose=False)
    history = trainer.fit()
    assert np.isfinite(history[0]["train_loss"])


def test_rmi_streaming_matches_materialized(rng):
    """Chunked-Gram RMI (rmi_logdet_streaming_cmajor, forced to 4 row
    chunks) ≡ materialized core: forward values and gradients."""
    import jax

    from seghiero_tpu.losses.rmi import (
        _rmi_logdet_core,
        rmi_logdet_streaming_cmajor,
    )

    B, C, H, W = 2, 6, 34, 26  # nh = 32 → rows=8 gives 4 chunks
    oh = (rng.integers(0, 2, (B, C, H, W))).astype(np.float32)
    logits = rng.standard_normal((B, C, H, W)).astype(np.float32)
    radius, half_d = 3, 9
    nh, nw = H - 2, W - 2

    def nbhd(x):
        views = [
            x[:, :, y : y + nh, xx : xx + nw]
            for y in range(radius)
            for xx in range(radius)
        ]
        return jnp.stack(views, axis=2).reshape(B, C, half_d, nh * nw)

    def loss_mat(lg):
        pr = jax.nn.sigmoid(lg) + 1e-6
        la = jax.lax.stop_gradient(nbhd(jnp.asarray(oh)))
        return jnp.sum(_rmi_logdet_core(la, nbhd(pr), half_d, False))

    def loss_str(lg):
        pr = jax.nn.sigmoid(lg) + 1e-6
        return jnp.sum(
            rmi_logdet_streaming_cmajor(
                jnp.asarray(oh), pr, radius=radius, target_rows=8
            )
        )

    lg = jnp.asarray(logits)
    v_mat, g_mat = jax.value_and_grad(loss_mat)(lg)
    v_str, g_str = jax.value_and_grad(loss_str)(lg)
    np.testing.assert_allclose(float(v_str), float(v_mat), rtol=2e-4)
    np.testing.assert_allclose(
        np.asarray(g_str), np.asarray(g_mat), rtol=5e-3, atol=1e-5
    )


def test_fast_3level_streaming_on_matches_off(rng, classes_3level):
    h = Hierarchy.from_class_config(classes_3level)
    lo, emb, labels = _inputs(rng, h, H=32, W=32)
    off = float(
        FastRMIHieraTripletLoss(h, rmi_streaming="off")(
            jnp.array(0), emb, lo, lo, labels
        )
    )
    on = float(
        FastRMIHieraTripletLoss(h, rmi_streaming="on")(
            jnp.array(0), emb, lo, lo, labels
        )
    )
    np.testing.assert_allclose(on, off, rtol=1e-4)


def test_aux_ce_fast_matches_parity(rng, classes_2level):
    h = Hierarchy.from_class_config(classes_2level)
    B, H, W = 2, 64, 64
    aux = rng.standard_normal((B, H // 16, W // 16, h.n_fine)).astype(np.float32)
    labels = rng.integers(0, h.n_fine, (B, H, W)).astype(np.int32)
    labels[:, -4:] = 255
    ref = float(
        softmax_cross_entropy(
            resize_bilinear(aux, (H, W)), labels, divide_by="valid"
        )
    )
    fast = float(aux_ce_fast(aux, labels))
    np.testing.assert_allclose(fast, ref, rtol=2e-5)


def test_hiera_precision_fast_close_to_parity(rng, classes_2level):
    """hiera_precision='fast' (bf16 storage of the upsampled logits,
    f32 math) stays within bf16-rounding tolerance of the parity-
    precision composite, and its gradient is finite and close."""
    import jax

    h = Hierarchy.from_class_config(classes_2level)
    lo, emb, labels = _inputs(rng, h)

    def loss_fn(lo_in, precision):
        return FastHieraTripletLoss(h, hiera_precision=precision)(
            jnp.array(0), emb, lo_in, lo_in, labels
        )

    ref, gref = jax.value_and_grad(lambda x: loss_fn(x, "parity"))(lo)
    fast, gfast = jax.value_and_grad(lambda x: loss_fn(x, "fast"))(lo)
    np.testing.assert_allclose(float(fast), float(ref), rtol=5e-3)
    assert np.all(np.isfinite(np.asarray(gfast)))
    # grads agree to bf16-rounding scale relative to the grad magnitude
    scale = np.abs(np.asarray(gref)).max()
    np.testing.assert_allclose(
        np.asarray(gfast), np.asarray(gref), atol=5e-2 * scale
    )


def test_hiera_precision_fast_3level_close_to_parity(rng, classes_3level):
    h = Hierarchy.from_class_config(classes_3level)
    lo, emb, labels = _inputs(rng, h, H=32, W=32)
    ref = float(
        FastRMIHieraTripletLoss(h)(jnp.array(0), emb, lo, lo, labels)
    )
    fast = float(
        FastRMIHieraTripletLoss(h, hiera_precision="fast")(
            jnp.array(0), emb, lo, lo, labels
        )
    )
    np.testing.assert_allclose(fast, ref, rtol=1e-2)


def test_trainer_uses_fast_path_and_trains(classes_2level, tmp_path):
    from tests.test_train_e2e import tiny_config
    from seghiero_tpu.train.trainer import Trainer

    cfg = tiny_config(classes_2level, tmp_path, epochs=1, size=4)
    assert cfg.training.fast_losses
    trainer = Trainer(cfg, verbose=False)
    assert trainer.composite.__class__.__name__ == "FastHieraTripletLoss"
    history = trainer.fit()
    assert np.isfinite(history[0]["val_loss"])

    # parity mode still available and numerically close on one batch
    import dataclasses
    import jax

    cfg2 = tiny_config(
        classes_2level, tmp_path / "p", epochs=1, size=4,
        extra_training={"fast_losses": False},
    )
    t2 = Trainer(cfg2, verbose=False)
    b = next(iter(t2.train_loader))
    _, m_slow = t2._train_step(t2.state, b, jnp.asarray(0))
    t3 = Trainer(
        tiny_config(classes_2level, tmp_path / "f", epochs=1, size=4), verbose=False
    )
    b3 = next(iter(t3.train_loader))
    _, m_fast = t3._train_step(t3.state, b3, jnp.asarray(0))
    np.testing.assert_allclose(
        float(m_fast["loss"]), float(m_slow["loss"]), rtol=1e-4
    )
