"""Second head family (plain ASPP / DeepLabV3) + input-transform policies."""

import jax
import jax.numpy as jnp
import numpy as np

from seghiero_tpu.config import SegHieroConfig
from seghiero_tpu.models.decode_heads import ASPPHead, select_inputs


def test_select_inputs_policies(rng):
    feats = [
        jnp.asarray(rng.standard_normal((1, 16, 16, 4)).astype(np.float32)),
        jnp.asarray(rng.standard_normal((1, 8, 8, 6)).astype(np.float32)),
        jnp.asarray(rng.standard_normal((1, 4, 4, 8)).astype(np.float32)),
    ]
    assert select_inputs(feats, -1, None) is feats[-1]
    multi = select_inputs(feats, [0, 2], "multiple_select")
    assert len(multi) == 2 and multi[1] is feats[2]
    cat = select_inputs(feats, [0, 1, 2], "resize_concat")
    assert cat.shape == (1, 16, 16, 18)


def test_aspp_head_shapes(rng):
    head = ASPPHead(num_classes=13, channels=16, dilations=(1, 2, 3), with_projection=True,
                    proj_dim=8)
    feats = [None, None, None, jnp.asarray(rng.standard_normal((2, 4, 4, 32)).astype(np.float32))]
    vars_ = head.init(jax.random.key(0), feats, train=False)
    logits, emb = head.apply(vars_, feats, train=False)
    assert logits.shape == (2, 4, 4, 13)
    assert emb.shape == (2, 4, 4, 8)


def test_aspp_head_trains_end_to_end(classes_2level, tmp_path):
    from tests.test_train_e2e import tiny_config
    from seghiero_tpu.train.trainer import Trainer
    import dataclasses

    cfg = tiny_config(classes_2level, tmp_path, epochs=1, size=4)
    cfg = dataclasses.replace(
        cfg, model=dataclasses.replace(cfg.model, head="aspp")
    )
    trainer = Trainer(cfg, verbose=False)
    history = trainer.fit()
    assert np.isfinite(history[0]["train_loss"])
    m = trainer.evaluate()
    assert np.isfinite(m["loss"])


def test_adaptive_avg_pool_matches_torch(rng):
    import torch

    from seghiero_tpu.models.decode_heads import adaptive_avg_pool

    for h, w, s in ((7, 7, 3), (8, 12, 6), (5, 9, 2), (6, 6, 1)):
        x = rng.standard_normal((2, h, w, 5)).astype(np.float32)
        got = np.asarray(adaptive_avg_pool(jnp.asarray(x), s))
        want = (
            torch.nn.AdaptiveAvgPool2d(s)(
                torch.from_numpy(x.transpose(0, 3, 1, 2))
            )
            .numpy()
            .transpose(0, 2, 3, 1)
        )
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6,
                                   err_msg=f"{(h, w, s)}")


def test_upernet_head_shapes(rng):
    from seghiero_tpu.models.decode_heads import UPerNetHead

    head = UPerNetHead(num_classes=13, channels=16, proj_dim=8)
    feats = [
        jnp.asarray(rng.standard_normal((2, 16, 16, 8)).astype(np.float32)),
        jnp.asarray(rng.standard_normal((2, 8, 8, 16)).astype(np.float32)),
        jnp.asarray(rng.standard_normal((2, 4, 4, 32)).astype(np.float32)),
        jnp.asarray(rng.standard_normal((2, 2, 2, 64)).astype(np.float32)),
    ]
    vars_ = head.init(jax.random.key(0), feats, train=False)
    logits, emb = head.apply(vars_, feats, train=False)
    assert logits.shape == (2, 16, 16, 13)
    assert emb.shape == (2, 2, 2, 8)
    norms = np.linalg.norm(np.asarray(emb), axis=-1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-5)


def test_upernet_trains_end_to_end(classes_2level, tmp_path):
    """The canonical modern pairing: swin backbone + upernet head."""
    from tests.test_train_e2e import tiny_config
    from seghiero_tpu.train.trainer import Trainer
    from seghiero_tpu.models.swin import VARIANTS
    import dataclasses

    VARIANTS["tiny_test"] = (8, (1, 1, 1, 1), (1, 2, 4, 8))
    try:
        cfg = tiny_config(classes_2level, tmp_path, epochs=1, size=4)
        cfg = dataclasses.replace(
            cfg,
            model=dataclasses.replace(
                cfg.model,
                backbone="swin",
                backbone_options={"variant": "tiny_test", "window": 2},
                head="upernet",
                head_options={"channels": 16, "pool_scales": (1, 2)},
            ),
        )
        trainer = Trainer(cfg, verbose=False)
        history = trainer.fit()
        assert np.isfinite(history[0]["train_loss"])
        m = trainer.evaluate()
        assert np.isfinite(m["loss"])
    finally:
        del VARIANTS["tiny_test"]
