"""Gradient parity — replays test/gradient.cu: hand-written clamped
central-difference scalar reference, exact f32 equality, parameterized over
1 and 3 channels and u8/f32 dtypes."""

import numpy as np
import pytest

from various_image_processings_tpu import golden
from various_image_processings_tpu.core.rng import random_array
from various_image_processings_tpu.ops.gradient import gradient


def scalar_ref(src):
    """Literal per-pixel transcription of internal::gradient_impl
    (reference: include/cpp/gradient.hpp:25-66)."""
    if src.ndim == 2:
        src = src[:, :, None]
    h, w, c = src.shape
    out = np.zeros((h, w), np.float32)
    s = src.astype(np.float32)
    for y in range(h):
        ym1, yp1 = max(y - 1, 0), min(y + 1, h - 1)
        for x in range(w):
            xm1, xp1 = max(x - 1, 0), min(x + 1, w - 1)
            total = np.float32(0)
            for ch in range(c):
                hd = s[y, xp1, ch] - s[y, xm1, ch]
                vd = s[yp1, x, ch] - s[ym1, x, ch]
                total += hd * hd + vd * vd
            out[y, x] = np.sqrt(total)
    return out


@pytest.mark.parametrize("channels", [1, 3])
@pytest.mark.parametrize("dtype", [np.uint8, np.float32])
def test_golden_gradient_exact(channels, dtype):
    if dtype is np.float32:
        src = random_array(20 * 17 * channels, 255.0, np.float32)
    else:
        src = random_array(20 * 17 * channels)
    src = src.reshape(20, 17, channels)
    np.testing.assert_array_equal(golden.gradient(src), scalar_ref(src))


@pytest.mark.parametrize("channels", [1, 3])
@pytest.mark.parametrize("dtype", [np.uint8, np.float32])
def test_ops_gradient_matches_golden(channels, dtype):
    if dtype is np.float32:
        src = random_array(50 * 50 * channels, 255.0, np.float32)
    else:
        src = random_array(50 * 50 * channels)
    src = src.reshape(50, 50, channels)
    got = np.asarray(gradient(src, impl="xla"))
    expected = golden.gradient(src)
    assert got.dtype == np.float32
    # EXPECT_FLOAT_EQ semantics (4 ulp): XLA's sqrt may differ from libm's
    # correctly-rounded result by 1 ulp even on exact integer sums.
    ulp = np.spacing(np.maximum(np.abs(got), np.abs(expected)))
    assert np.all(np.abs(got - expected) <= 4 * ulp)


def test_gradient_2d_input_supported():
    src = random_array(30 * 30).reshape(30, 30)
    got = np.asarray(gradient(src, impl="xla"))
    expected = golden.gradient(src)
    ulp = np.spacing(np.maximum(np.abs(got), np.abs(expected)))
    assert np.all(np.abs(got - expected) <= 4 * ulp)


def test_gradient_rejects_bad_dtype():
    with pytest.raises(TypeError):
        gradient(np.zeros((4, 4), np.int16))
