"""Fused 4×-upsample+argmax kernel (ops/pallas/upsample_argmax.py) vs
the XLA resize+argmax decode (interpret mode on CPU; the same kernel
runs compiled on TPU) — and its Predictor integration."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from seghiero_tpu.ops.pallas.upsample_argmax import (
    fused_argmax_available,
    fused_upsample_argmax,
)

pytestmark = pytest.mark.fast


def _xla_decode(lo, slices, out_hw):
    B, C = lo.shape[:2]
    up = jax.image.resize(
        lo, (B, C, out_hw[0], out_hw[1]), "linear", antialias=False
    )
    return [jnp.argmax(up[:, a:b], axis=1).astype(jnp.int32) for a, b in slices]


@pytest.mark.parametrize("seed", [0, 1])
@pytest.mark.parametrize(
    "shape,slices",
    [
        ((2, 15, 16, 128), [(0, 9), (9, 13), (13, 15)]),  # 3-level
        ((1, 13, 8, 128), [(0, 9), (9, 13)]),  # 2-level
    ],
)
def test_fused_argmax_matches_xla_decode(seed, shape, slices):
    rng = np.random.default_rng(seed)
    lo = jnp.asarray(rng.standard_normal(shape), jnp.float32)
    out_hw = (4 * shape[2], 4 * shape[3])
    assert fused_argmax_available(lo.shape, out_hw)
    fused = fused_upsample_argmax(lo, slices, interpret=True)
    ref = _xla_decode(lo, slices, out_hw)
    for f, r in zip(fused, ref):
        assert f.shape == r.shape == (shape[0],) + out_hw
        # continuous random logits: no near-ties, exact agreement.
        # (Engineered exact ties may flip by float summation order —
        # first-max-wins semantics are the same on both paths.)
        np.testing.assert_array_equal(np.asarray(f), np.asarray(r))


def test_fused_argmax_bf16_logits():
    rng = np.random.default_rng(2)
    lo = jnp.asarray(rng.standard_normal((1, 6, 8, 128)), jnp.bfloat16)
    fused = fused_upsample_argmax(lo, [(0, 6)], interpret=True)
    ref = _xla_decode(lo.astype(jnp.float32), [(0, 6)], (32, 512))
    np.testing.assert_array_equal(np.asarray(fused[0]), np.asarray(ref[0]))


def test_fused_argmax_availability_gates():
    assert not fused_argmax_available((1, 6, 8, 128), (31, 512))  # not 4×
    assert not fused_argmax_available((1, 6, 9, 128), (36, 512))  # h % 8
    assert not fused_argmax_available((1, 6, 8, 121), (32, 484))  # w % 8
    assert not fused_argmax_available((1, 100, 8, 128), (32, 512))  # C cap
    assert fused_argmax_available((1, 6, 8, 32), (32, 128))  # predictor 128²


def test_predictor_masks_path_uses_fused(monkeypatch):
    """model.argmax_backend: pallas (interpret on CPU) must agree with
    the XLA decode through the full Predictor path."""
    from seghiero_tpu.config import SegHieroConfig
    from seghiero_tpu.infer.predictor import Predictor

    classes = {
        "coarse_to_fine_map": [[0, 3], [4, 6], [7], [8]],
        "coarse_names": {0: "a", 1: "b", 2: "c", 3: "d"},
        "fine_names": {i: f"f{i}" for i in range(9)},
    }

    def _cfg(backend):
        return SegHieroConfig.from_dict(
            {
                "dataset": {"kind": "synthetic", "synthetic_size": 2},
                "classes": classes,
                "model": {"depth": 18, "dtype": "float32",
                          "argmax_backend": backend},
                "training": {"batch_size": 1},
                "transform": {"resize": [128, 128]},
                "output": {"checkpoint_dir": "/tmp/ua_ckpt",
                           "project_name": "ua"},
            }
        )

    cfg = _cfg("pallas")
    from seghiero_tpu.models.segmenter import build_model

    model = build_model(cfg)
    variables = model.init(
        jax.random.key(0), jnp.zeros((1, 128, 128, 3), jnp.float32),
        train=False,
    )
    images = np.asarray(
        np.random.default_rng(0).integers(0, 255, (1, 128, 128, 3)),
        np.uint8,
    )
    pred_fused = Predictor(cfg, variables)
    out_fused = pred_fused.predict_array(images)  # out_hw = 128 = 4×32
    pred_xla = Predictor(_cfg("xla"), variables)
    out_xla = pred_xla.predict_array(images)
    assert set(out_fused) == set(out_xla) == {"fine", "coarse"}
    for k in out_fused:
        np.testing.assert_array_equal(out_fused[k], out_xla[k])
