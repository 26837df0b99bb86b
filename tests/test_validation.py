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


def test_degenerate_model_inputs_run_clean():
    """SLIC with S at/above the image size and Wexler with empty / 1-px masks
    must produce well-formed output, not crash (the reference exits or loops
    on some of these; we define graceful behavior)."""
    import numpy as np
    import various_image_processings_tpu as vip
    from various_image_processings_tpu.core.rng import random_image

    img = random_image(64, 48)
    res = vip.superpixel_slic(img, 200, 3, 20.0)
    labels = np.asarray(res[0] if isinstance(res, tuple) else res)
    assert labels.shape == (64, 48)

    out = np.asarray(vip.inpainting_wexler(img, np.zeros((64, 48), np.uint8)))
    np.testing.assert_array_equal(out, img)  # nothing to fill

    mask1 = (np.arange(64 * 48).reshape(64, 48) == 100).astype(np.uint8) * 255
    out1 = np.asarray(vip.inpainting_wexler(img, mask1))
    assert out1.shape == img.shape
    unmasked = mask1 == 0
    np.testing.assert_array_equal(out1[unmasked], img[unmasked])
