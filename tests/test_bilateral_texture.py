"""Bilateral texture filter parity — replays test/bilateral_texture_filter.cu:
stage-level checks (blur+mRTV, guide) against the golden scalar semantics and
an end-to-end composition check."""

import numpy as np
import pytest

from various_image_processings_tpu import golden
from various_image_processings_tpu.core.rng import random_image
from various_image_processings_tpu.ops.bilateral_texture import (
    bilateral_texture_filter, _blur_and_rtv_math, _guide_math,
)
from various_image_processings_tpu.ops.gradient import gradient

import jax.numpy as jnp


@pytest.mark.parametrize("ksize", [3, 9])
def test_blur_and_rtv_vs_golden(ksize):
    src = random_image(50, 50)
    mag = golden.gradient(src)
    blurred_g, rtv_g = golden.compute_blur_and_rtv(src, mag, ksize)
    blurred, rtv = _blur_and_rtv_math(jnp.asarray(src).astype(jnp.float32),
                                      jnp.asarray(mag), ksize)
    # box blur is exact (integer sums in f32); rtv is a ratio of exact values
    np.testing.assert_allclose(np.asarray(blurred), blurred_g, rtol=0, atol=1e-4)
    np.testing.assert_allclose(np.asarray(rtv), rtv_g, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("ksize", [3, 9])
def test_guide_vs_golden(ksize):
    src = random_image(50, 50)
    mag = golden.gradient(src)
    blurred, rtv = golden.compute_blur_and_rtv(src, mag, ksize)
    expected = golden.compute_guide(blurred, rtv, ksize)
    actual = np.asarray(_guide_math(jnp.asarray(blurred), jnp.asarray(rtv), ksize))
    diff = np.abs(actual.astype(np.int32) - expected.astype(np.int32))
    assert diff.max() <= 1


def test_btf_end_to_end_vs_golden():
    src = random_image(40, 40)
    expected = golden.bilateral_texture_filter(src, ksize=5, nitr=2)
    actual = np.asarray(bilateral_texture_filter(src, ksize=5, nitr=2, impl="xla"))
    diff = np.abs(actual.astype(np.int32) - expected.astype(np.int32))
    # three cascaded ±1-tolerance stages; allow small drift on few pixels
    assert np.percentile(diff, 99.9) <= 2
    assert diff.max() <= 3
