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


@pytest.mark.parametrize("ksize", [3, 9])
def test_blur_and_rtv_bitexact_under_jit(ksize):
    """The JITTED stage must bit-equal the golden NumPy twin.

    XLA strength-reduces division by a literal (/3 intensity, /k² blur)
    into a reciprocal-multiply under jit — 1 ulp off the reference's TRUE
    division (include/cpp/bilateral_texture_filter.hpp:29, :57-60).  That
    ulp flips the guide stage's strict-less argmin at near-ties and moved
    the final cpp-variant output up to 52 u8 off the compiled reference
    (round-4 fuzz case100, 64×31 k=9 nitr=3).  The eager stage test above
    never sees it: eager per-op programs keep the true division.  The
    barriered divisors in _blur_and_rtv_math must hold bit-exactness
    under jit."""
    import jax
    src = random_image(64, 31)
    mag = golden.gradient(src)
    blurred_g, rtv_g = golden.compute_blur_and_rtv(src, mag, ksize)
    f = jax.jit(lambda s, m: _blur_and_rtv_math(s, m, ksize))
    blurred, rtv = f(jnp.asarray(src).astype(jnp.float32), jnp.asarray(mag))
    np.testing.assert_array_equal(np.asarray(blurred), blurred_g)
    np.testing.assert_array_equal(np.asarray(rtv), rtv_g)


@pytest.mark.parametrize("n,r", [(8, 8), (5, 12), (12, 8), (1, 4), (3, 3)])
def test_reflect101_indices_match_opencv(n, r):
    """cv::BORDER_REFLECT_101 multi-reflects when the pad exceeds the image
    (borderInterpolate folds repeatedly); jnp.pad(mode='reflect') raises
    there, so reflect101_pad switches to a static index gather — pin both
    regimes to cv2.copyMakeBorder."""
    cv2 = pytest.importorskip("cv2")
    from various_image_processings_tpu.core.pad import (reflect101_indices,
                                                       reflect101_pad)
    img = random_image(n, n)[:, :, 0]
    expected = cv2.copyMakeBorder(img, r, r, r, r, cv2.BORDER_REFLECT_101)
    rows = reflect101_indices(n, r, r)
    cols = reflect101_indices(n, r, r)
    np.testing.assert_array_equal(img[np.ix_(rows, cols)], expected)
    np.testing.assert_array_equal(np.asarray(reflect101_pad(jnp.asarray(img), r)),
                                  expected)


def test_btf_cpp_variant_small_image_and_pallas_parity():
    """variant='cpp' on an image SMALLER than the k=2k-1 JBF radius (the
    reflect-101 pad must multi-reflect, not raise), and the pallas path must
    match the xla path within the BTF end-to-end envelope — the oracle test
    pins xla; this transitively pins the pallas reflect101/rint pipeline
    (review finding: the cpp claim was only tested on xla)."""
    src = random_image(8, 60)   # JBF radius 8 >= H-1=7 -> multi-reflection
    xla = np.asarray(bilateral_texture_filter(src, ksize=5, nitr=2,
                                              impl="xla", variant="cpp"))
    pal = np.asarray(bilateral_texture_filter(src, ksize=5, nitr=2,
                                              impl="pallas", variant="cpp"))
    diff = np.abs(pal.astype(np.int32) - xla.astype(np.int32))
    assert np.percentile(diff, 99.9) <= 2
    assert diff.max() <= 3

    src = random_image(40, 40)
    xla = np.asarray(bilateral_texture_filter(src, ksize=5, nitr=2,
                                              impl="xla", variant="cpp"))
    pal = np.asarray(bilateral_texture_filter(src, ksize=5, nitr=2,
                                              impl="pallas", variant="cpp"))
    diff = np.abs(pal.astype(np.int32) - xla.astype(np.int32))
    assert np.percentile(diff, 99.9) <= 2
    assert diff.max() <= 3
