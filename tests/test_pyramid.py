"""Gaussian pyramid vs the OpenCV oracle (cv::pyrDown / cv::pyrUp are what
the reference's inpainting pyramid calls, include/cpp/wexler_inpainting.hpp:82-86).

The u8 path is a bit-exact twin of OpenCV's fixed-point pyramid, so these
tests assert EQUALITY, including odd dst sizes (the Wexler pyrUp case:
dstsize = the parent level's shape, which may be odd)."""

import numpy as np
import pytest

from various_image_processings_tpu.core.rng import random_image
from various_image_processings_tpu.ops.pyramid import pyr_down, pyr_up

cv2 = pytest.importorskip("cv2")


@pytest.mark.parametrize("shape", [(64, 64), (50, 70), (51, 71), (3, 5), (4, 4)])
def test_pyr_down_bit_exact_vs_opencv(shape):
    src = random_image(*shape)
    ours = np.asarray(pyr_down(src))
    ref = cv2.pyrDown(src)
    assert ours.shape == ref.shape
    np.testing.assert_array_equal(ours, ref)


@pytest.mark.parametrize("shape", [(32, 32), (25, 35), (3, 4)])
def test_pyr_up_bit_exact_vs_opencv(shape):
    src = random_image(*shape)
    ours = np.asarray(pyr_up(src))
    ref = cv2.pyrUp(src)
    assert ours.shape == ref.shape
    np.testing.assert_array_equal(ours, ref)


@pytest.mark.parametrize("shape", [(26, 18), (13, 27)])
def test_pyr_up_odd_dst_bit_exact(shape):
    """The Wexler case: pyrUp back to a (possibly odd) parent shape."""
    h, w = shape
    src = random_image(h, w)
    for oh, ow in [(2 * h - 1, 2 * w), (2 * h, 2 * w - 1), (2 * h - 1, 2 * w - 1)]:
        ours = np.asarray(pyr_up(src, out_shape=(oh, ow)))
        ref = cv2.pyrUp(src, dstsize=(ow, oh))
        np.testing.assert_array_equal(ours, ref)


@pytest.mark.parametrize("shape", [(13, 9), (8, 11), (3, 3)])
def test_pyr_up_odd_larger_dst_bit_exact(shape):
    """cv::pyrUp's other legal odd dst: 2n+1 (|dst − 2·src| == dst%2).
    OpenCV's extra trailing line duplicates row 2n−2 but col 2n−1 (the
    separable row-then-column asymmetry — see ops/pyramid.py _up_axis)."""
    h, w = shape
    src = random_image(h, w)
    for oh, ow in [(2 * h + 1, 2 * w), (2 * h, 2 * w + 1),
                   (2 * h + 1, 2 * w + 1), (2 * h - 1, 2 * w + 1),
                   (2 * h + 1, 2 * w - 1)]:
        ours = np.asarray(pyr_up(src, out_shape=(oh, ow)))
        ref = cv2.pyrUp(src, dstsize=(ow, oh))
        np.testing.assert_array_equal(ours, ref)


def test_pyr_up_odd_larger_dst_float():
    src = (np.random.RandomState(3).rand(9, 7, 3) * 255).astype(np.float32)
    for oh, ow in [(19, 14), (18, 15), (19, 15)]:
        ours = np.asarray(pyr_up(src, out_shape=(oh, ow)))
        ref = cv2.pyrUp(src, dstsize=(ow, oh))
        assert ours.shape == ref.shape
        np.testing.assert_allclose(ours, ref, atol=1e-3)


def test_pyr_up_dst_beyond_legal_range_raises():
    src = random_image(8, 8)
    with pytest.raises(ValueError, match="legal range"):
        pyr_up(src, out_shape=(18, 16))


def test_pyr_roundtrip_fuzz_bit_exact():
    rng = np.random.RandomState(42)
    for _ in range(6):
        h = int(rng.randint(3, 60))
        w = int(rng.randint(3, 60))
        img = rng.randint(0, 256, (h, w, 3), np.uint8)
        np.testing.assert_array_equal(np.asarray(pyr_down(img)), cv2.pyrDown(img))
        down = cv2.pyrDown(img)
        np.testing.assert_array_equal(
            np.asarray(pyr_up(down, out_shape=(h, w))),
            cv2.pyrUp(down, dstsize=(w, h)))


def test_pyr_up_crops_to_requested_shape():
    src = random_image(51, 35)
    out = np.asarray(pyr_up(src, out_shape=(101, 69)))
    assert out.shape == (101, 69, 3)


def test_pyr_down_gray():
    src = random_image(40, 40)[:, :, 0]
    ours = np.asarray(pyr_down(src))
    ref = cv2.pyrDown(src)
    np.testing.assert_array_equal(ours, ref)


def test_pyr_float_path_still_close():
    """Non-u8 inputs keep the separable float path."""
    src = random_image(20, 24).astype(np.float32)
    out = np.asarray(pyr_down(src))
    ref = cv2.pyrDown(src)
    assert out.shape == ref.shape
    assert np.abs(out - ref).max() < 1e-3
