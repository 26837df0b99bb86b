"""Golden references vs OpenCV — replays the reference's oracle pattern #1
(test/bilateral_filter.cu:35-63: ±1 u8 vs cv::bilateralFilter with
BORDER_REPLICATE on a 50×50 seed-42 random image)."""

import numpy as np
import pytest

from various_image_processings_tpu import golden
from various_image_processings_tpu.core.rng import random_image

cv2 = pytest.importorskip("cv2")


def test_golden_bilateral_vs_opencv_random():
    src = random_image(50, 50)
    expected = cv2.bilateralFilter(src, 9, 30.0, 10.0, borderType=cv2.BORDER_REPLICATE)
    actual = golden.bilateral_filter(src, 9, 10.0, 30.0)
    diff = np.abs(actual.astype(np.int32) - expected.astype(np.int32))
    assert diff.max() <= 1


def test_golden_bilateral_vs_opencv_lenna(lenna):
    small = lenna[::4, ::4].copy()  # 128×128 crop keeps the golden ref quick
    expected = cv2.bilateralFilter(small, 9, 30.0, 10.0, borderType=cv2.BORDER_REPLICATE)
    actual = golden.bilateral_filter(small, 9, 10.0, 30.0)
    diff = np.abs(actual.astype(np.int32) - expected.astype(np.int32))
    assert diff.max() <= 1
