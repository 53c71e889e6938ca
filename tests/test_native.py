"""Native (C++) transform core: compiles, and matches the JAX/NumPy ops
exactly where exactness is specified."""

import numpy as np
import pytest

from seghiero_tpu.data import native


def test_native_compiles():
    assert native.native_available(), "g++ build of transform.cpp failed"


def test_nearest_matches_jax_op(rng):
    from seghiero_tpu.ops.resize import downsample_labels_nearest

    mask = rng.integers(0, 20, (33, 47)).astype(np.int32)
    ours = native.resize_nearest_i32(mask, (9, 12))
    ref = np.asarray(downsample_labels_nearest(mask[None], (9, 12)))[0]
    np.testing.assert_array_equal(ours, ref)


def test_bilinear_matches_torch_convention(rng):
    import torch
    import torch.nn.functional as F

    img = rng.integers(0, 255, (24, 31, 3), dtype=np.uint8)
    ours = native.resize_bilinear_u8(img, (48, 62)).astype(np.float32)
    t = torch.from_numpy(img.astype(np.float32)).permute(2, 0, 1)[None]
    ref = F.interpolate(t, size=(48, 62), mode="bilinear", align_corners=False)
    ref = ref[0].permute(1, 2, 0).numpy()
    # uint8 rounding: allow off-by-one after the float interp
    assert np.max(np.abs(ours - np.round(ref))) <= 1.0


def test_flips(rng):
    img = rng.integers(0, 255, (5, 7, 3), dtype=np.uint8)
    np.testing.assert_array_equal(native.hflip_u8(img), img[:, ::-1])
    mask = rng.integers(0, 9, (5, 7)).astype(np.int32)
    np.testing.assert_array_equal(native.hflip_i32(mask), mask[:, ::-1])


def test_lut_remap_255_safe():
    lut = np.array([5, 6, 7], np.int32)
    mask = np.array([[0, 1, 2], [255, -1, 1]], np.int32)
    out = native.lut_remap_i32(mask, lut)
    np.testing.assert_array_equal(out, [[5, 6, 7], [255, 255, 6]])


def test_numpy_fallbacks_match_native(rng, monkeypatch):
    if not native.native_available():
        pytest.skip("no native lib")
    img = rng.integers(0, 255, (20, 28, 3), dtype=np.uint8)
    mask = rng.integers(0, 9, (20, 28)).astype(np.int32)
    lut = np.arange(9, dtype=np.int32)[::-1].copy()

    got = {
        "bi": native.resize_bilinear_u8(img, (10, 14)),
        "ne": native.resize_nearest_i32(mask, (10, 14)),
        "fl": native.hflip_u8(img),
        "lu": native.lut_remap_i32(mask, lut),
    }
    monkeypatch.setattr(native, "_lib", None)
    monkeypatch.setattr(native, "_tried", True)  # force fallback path
    np.testing.assert_array_equal(native.resize_nearest_i32(mask, (10, 14)), got["ne"])
    np.testing.assert_array_equal(native.hflip_u8(img), got["fl"])
    np.testing.assert_array_equal(native.lut_remap_i32(mask, lut), got["lu"])
    # bilinear: float rounding may differ by 1 LSB
    assert (
        np.max(
            np.abs(
                native.resize_bilinear_u8(img, (10, 14)).astype(int)
                - got["bi"].astype(int)
            )
        )
        <= 1
    )
