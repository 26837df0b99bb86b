"""Class-style API (DeviceImage + shape-specialized filters) parity with the
functional ops."""

import numpy as np
import pytest

from various_image_processings_tpu.core.device_image import DeviceImage
from various_image_processings_tpu.core.rng import random_image
from various_image_processings_tpu.models import (
    BilateralFilter, AdaptiveBilateralFilter, BilateralTextureFilter)
from various_image_processings_tpu.ops.bilateral import bilateral_filter
from various_image_processings_tpu.ops.adaptive_bilateral import adaptive_bilateral_filter
from various_image_processings_tpu.ops.bilateral_texture import bilateral_texture_filter


def test_device_image_roundtrip():
    src = random_image(20, 30)
    img = DeviceImage.from_array(src)
    np.testing.assert_array_equal(img.download(), src)
    assert img.get().shape == (20, 30, 3)
    with pytest.raises(ValueError, match="shape"):
        img.upload(np.zeros((21, 30, 3), np.uint8))


def test_bilateral_filter_class_matches_op():
    src = random_image(40, 40)
    f = BilateralFilter(40, 40, 9, 10.0, 30.0, impl="xla").warmup()
    out = np.asarray(f(src))
    np.testing.assert_array_equal(
        out, np.asarray(bilateral_filter(src, 9, 10.0, 30.0, impl="xla")))
    # device-image input
    out2 = np.asarray(f(DeviceImage.from_array(src).get()))
    np.testing.assert_array_equal(out, out2)


def test_class_shape_check():
    f = BilateralFilter(40, 40, impl="xla")
    with pytest.raises(ValueError, match="expected"):
        f(random_image(41, 40))


def test_adaptive_class_matches_op():
    src = random_image(40, 40)
    f = AdaptiveBilateralFilter(40, 40, 9, impl="xla")
    np.testing.assert_array_equal(
        np.asarray(f(src)),
        np.asarray(adaptive_bilateral_filter(src, 9, impl="xla")))


def test_btf_class_matches_op():
    src = random_image(32, 32)
    f = BilateralTextureFilter(32, 32, ksize=5, nitr=1, impl="xla")
    np.testing.assert_array_equal(
        np.asarray(f.execute(src)),
        np.asarray(bilateral_texture_filter(src, 5, 1, impl="xla")))
