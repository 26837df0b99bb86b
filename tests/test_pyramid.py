"""Gaussian pyramid vs the OpenCV oracle (cv::pyrDown / cv::pyrUp are what
the reference's inpainting pyramid calls, include/cpp/wexler_inpainting.hpp:82-86)."""

import numpy as np
import pytest

from various_image_processings_tpu.core.rng import random_image
from various_image_processings_tpu.ops.pyramid import pyr_down, pyr_up

cv2 = pytest.importorskip("cv2")


@pytest.mark.parametrize("shape", [(64, 64), (50, 70), (51, 71)])
def test_pyr_down_matches_opencv(shape):
    src = random_image(*shape)
    ours = np.asarray(pyr_down(src))
    ref = cv2.pyrDown(src)
    assert ours.shape == ref.shape
    diff = np.abs(ours.astype(int) - ref.astype(int))
    assert diff.max() <= 1


@pytest.mark.parametrize("shape", [(32, 32), (25, 35)])
def test_pyr_up_matches_opencv(shape):
    src = random_image(*shape)
    ours = np.asarray(pyr_up(src))
    ref = cv2.pyrUp(src)
    assert ours.shape == ref.shape
    diff = np.abs(ours.astype(int) - ref.astype(int))
    assert diff.max() <= 1


def test_pyr_up_crops_to_requested_shape():
    src = random_image(51, 35)
    out = np.asarray(pyr_up(src, out_shape=(101, 69)))
    assert out.shape == (101, 69, 3)


def test_pyr_down_gray():
    src = random_image(40, 40)[:, :, 0]
    ours = np.asarray(pyr_down(src))
    ref = cv2.pyrDown(src)
    assert np.abs(ours.astype(int) - ref.astype(int)).max() <= 1
