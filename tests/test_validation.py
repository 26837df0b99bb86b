"""Public-API input validation (the reference silently invokes UB on these —
e.g. an even ksize overflows the C++ space-kernel buffer)."""

import numpy as np
import pytest

import various_image_processings_tpu as vip


def test_rejects_2d_image():
    with pytest.raises(ValueError, match="color image"):
        vip.bilateral_filter(np.zeros((8, 8), np.uint8))


def test_rejects_f32_image():
    with pytest.raises(TypeError, match="uint8"):
        vip.bilateral_filter(np.zeros((8, 8, 3), np.float32))


def test_rejects_even_ksize():
    with pytest.raises(ValueError, match="odd"):
        vip.bilateral_filter(np.zeros((8, 8, 3), np.uint8), ksize=8)
    with pytest.raises(ValueError, match="odd"):
        vip.adaptive_bilateral_filter(np.zeros((8, 8, 3), np.uint8), ksize=0)
    with pytest.raises(ValueError, match="odd"):
        vip.bilateral_texture_filter(np.zeros((8, 8, 3), np.uint8), ksize=4)


def test_rejects_mismatched_guide():
    with pytest.raises(ValueError, match="same shape"):
        vip.joint_bilateral_filter(np.zeros((8, 8, 3), np.uint8),
                                   np.zeros((9, 8, 3), np.uint8))


def test_rejects_bad_impl():
    with pytest.raises(ValueError, match="impl"):
        vip.bilateral_filter(np.zeros((8, 8, 3), np.uint8), impl="cuda")


def test_ksize_1_is_identity():
    src = np.arange(8 * 8 * 3, dtype=np.uint8).reshape(8, 8, 3)
    out = np.asarray(vip.bilateral_filter(src, ksize=1, impl="xla"))
    np.testing.assert_array_equal(out, src)
