"""Border-replicated integral image — replays the reference's oracle pattern
#3 (test/border_replicated_integral_image.cpp:19-57): brute-force O(n⁴)
window sums over every (x0, y0, x1, y1) window of a 5×5 image, radius ∈
{1, 3, 5}; exact equality for integer accumulators, <1% relative error for
floats. Also covers the 3-channel case the reference's tests mislabel
(:69-95 actually run 2 channels)."""

import numpy as np
import pytest

from various_image_processings_tpu.core.rng import random_array
from various_image_processings_tpu.golden.integral_image import (
    BorderReplicatedIntegralImage as GoldenII,
)
from various_image_processings_tpu.ops.integral_image import integral_image, window_sums

SIZE = 5


def brute_force_sum(src, x0, y0, x1, y1):
    h, w = src.shape[:2]
    total = np.zeros(src.shape[2], np.float64)
    for y in range(y0, y1 + 1):
        for x in range(x0, x1 + 1):
            total += src[np.clip(y, 0, h - 1), np.clip(x, 0, w - 1)]
    return total


def all_windows(radius):
    for y0 in range(-radius, SIZE + radius):
        for x0 in range(-radius, SIZE + radius):
            for y1 in range(y0, min(y0 + 2 * radius + 1, SIZE + radius)):
                for x1 in range(x0, min(x0 + 2 * radius + 1, SIZE + radius)):
                    yield x0, y0, x1, y1


@pytest.mark.parametrize("radius", [1, 3, 5])
@pytest.mark.parametrize("channels", [1, 2, 3])
def test_golden_integral_u8_exact(radius, channels):
    src = random_array(SIZE * SIZE * channels).reshape(SIZE, SIZE, channels)
    ii = GoldenII(src, radius)
    for x0, y0, x1, y1 in all_windows(radius):
        expected = brute_force_sum(src, x0, y0, x1, y1)
        np.testing.assert_array_equal(ii.get(x0, y0, x1, y1), expected)


@pytest.mark.parametrize("radius", [1, 3])
def test_golden_integral_u16_exact(radius):
    # the reference instantiates SrcType=uint16_t too
    # (test/border_replicated_integral_image.cpp:75-83 — its "3ch" test that
    # actually runs 2 channels); u16 sources accumulate exactly in int32
    src = random_array(SIZE * SIZE * 2, 40000, np.uint16
                       ).reshape(SIZE, SIZE, 2)
    ii = GoldenII(src, radius)
    dev = np.asarray(integral_image(src.astype(np.int32), radius))
    for x0, y0, x1, y1 in all_windows(radius):
        expected = brute_force_sum(src, x0, y0, x1, y1)
        np.testing.assert_array_equal(ii.get(x0, y0, x1, y1), expected)
    assert dev.dtype == np.int32
    r = radius
    # 4-corner window sum from the device SAT equals brute force
    ws = np.asarray(window_sums(src.astype(np.int32), r))
    for y in range(SIZE):
        for x in range(SIZE):
            np.testing.assert_array_equal(
                ws[y, x], brute_force_sum(src, x - r, y - r, x + r, y + r))


@pytest.mark.parametrize("radius", [1, 3])
def test_golden_integral_f32_relative(radius):
    src = random_array(SIZE * SIZE * 3, 255.0, np.float32).reshape(SIZE, SIZE, 3)
    ii = GoldenII(src, radius)
    for x0, y0, x1, y1 in all_windows(radius):
        expected = brute_force_sum(src, x0, y0, x1, y1)
        got = ii.get(x0, y0, x1, y1)
        np.testing.assert_allclose(got, expected, rtol=1e-2)


@pytest.mark.parametrize("radius", [1, 4])
def test_ops_integral_matches_golden(radius):
    src = random_array(20 * 15 * 3).reshape(20, 15, 3)
    golden_ii = GoldenII(src, radius)
    got = np.asarray(integral_image(src, radius))
    np.testing.assert_array_equal(got, golden_ii.buffer)


@pytest.mark.parametrize("radius", [1, 4])
def test_ops_window_sums_match_golden(radius):
    src = random_array(20 * 15 * 3).reshape(20, 15, 3)
    golden_ii = GoldenII(src, radius)
    got = np.asarray(window_sums(src, radius))
    np.testing.assert_array_equal(got, golden_ii.window_sums(radius))
