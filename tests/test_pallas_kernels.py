"""Pallas kernel parity (interpret mode on CPU; the same kernels compile to
Mosaic on TPU — validated by bench/verify runs on hardware)."""

import numpy as np
import pytest

from various_image_processings_tpu import golden
from various_image_processings_tpu.core.rng import random_image, random_array
from various_image_processings_tpu.ops.bilateral import (
    bilateral_filter, joint_bilateral_filter)
from various_image_processings_tpu.ops.adaptive_bilateral import adaptive_bilateral_filter
from various_image_processings_tpu.ops.gradient import gradient


def max_diff(a, b):
    return int(np.abs(np.asarray(a).astype(np.int64) - np.asarray(b).astype(np.int64)).max())


@pytest.mark.parametrize("shape", [(50, 50), (37, 61)])
def test_pallas_bilateral_vs_golden(shape):
    src = random_image(*shape)
    expected = golden.bilateral_filter(src, 9, 10.0, 30.0)
    actual = bilateral_filter(src, 9, 10.0, 30.0, impl="pallas")
    assert max_diff(actual, expected) <= 1


def test_pallas_joint_bilateral_vs_golden():
    src = random_image(50, 50)
    guide = random_image(50, 50)[::-1].copy()
    expected = golden.joint_bilateral_filter(src, guide, 9, 10.0, 30.0)
    actual = joint_bilateral_filter(src, guide, 9, 10.0, 30.0, impl="pallas")
    assert max_diff(actual, expected) <= 1


@pytest.mark.parametrize("ksize", [3, 5, 11])
def test_pallas_bilateral_pair_kernel_other_k(ksize):
    # the pair-symmetric full-unroll path at other odd k (different pair
    # sets, even/odd tap-row splits, asymmetric extended regions)
    src = random_image(41, 57)
    expected = golden.bilateral_filter(src, ksize, 10.0, 30.0)
    actual = bilateral_filter(src, ksize, 10.0, 30.0, impl="pallas")
    assert max_diff(actual, expected) <= 1


def test_pallas_joint_pair_kernel_k11():
    src = random_image(41, 57)
    guide = random_image(41, 57)[::-1].copy()
    expected = golden.joint_bilateral_filter(src, guide, 11, 10.0, 30.0)
    actual = joint_bilateral_filter(src, guide, 11, 10.0, 30.0, impl="pallas")
    assert max_diff(actual, expected) <= 1


def test_pallas_adaptive_bilateral_vs_golden():
    src = random_image(50, 50)
    expected = golden.adaptive_bilateral_filter(src, 9, 10.0, 30.0)
    actual = adaptive_bilateral_filter(src, 9, 10.0, 30.0, impl="pallas")
    assert max_diff(actual, expected) <= 1


def test_pallas_adaptive_bilateral_large_sigma_specialized_kernel():
    """σ_color ≳ 107 puts the LUT zero index past the reachable dist range
    (3·510), so the kernel drops the exact-zero cut at trace time
    (ops/pallas/adaptive_bilateral.py) — this pins the specialized kernel's
    parity on both sides of that threshold."""
    src = random_image(50, 50)
    for sc in (105.0, 150.0):
        expected = golden.adaptive_bilateral_filter(src, 9, 10.0, sc)
        actual = adaptive_bilateral_filter(src, 9, 10.0, sc, impl="pallas")
        assert max_diff(actual, expected) <= 1, sc


def test_pallas_large_ksize_falls_back_to_xla():
    # 17×17 (the BTF joint-bilateral size) exceeds the unroll budget and must
    # still produce parity output through the fallback
    src = random_image(40, 40)
    expected = golden.joint_bilateral_filter(src, src, 17, 8.0, 1.7320508)
    actual = joint_bilateral_filter(src, src, 17, 8.0, 1.7320508, impl="pallas")
    assert max_diff(actual, expected) <= 1


@pytest.mark.parametrize("channels", [1, 3])
def test_pallas_gradient_vs_golden(channels):
    src = random_array(50 * 50 * channels).reshape(50, 50, channels)
    expected = golden.gradient(src)
    got = np.asarray(gradient(src, impl="pallas"))
    ulp = np.spacing(np.maximum(np.abs(got), np.abs(expected)))
    assert np.all(np.abs(got - expected) <= 4 * ulp)


def test_pallas_btf_stages_vs_golden():
    import jax.numpy as jnp
    from various_image_processings_tpu.ops.pallas.bilateral_texture import (
        blur_and_rtv_pallas, guide_pallas)
    src = random_image(50, 50)
    mag = golden.gradient(src)
    blurred_g, rtv_g = golden.compute_blur_and_rtv(src, mag, 9)
    blurred, rtv = blur_and_rtv_pallas(jnp.asarray(src).astype(jnp.float32),
                                       jnp.asarray(mag), 9)
    np.testing.assert_allclose(np.asarray(blurred), blurred_g, atol=1e-3)
    np.testing.assert_allclose(np.asarray(rtv), rtv_g, rtol=1e-4, atol=1e-5)
    expected_guide = golden.compute_guide(blurred_g, rtv_g, 9)
    guide = np.asarray(guide_pallas(jnp.asarray(blurred_g), jnp.asarray(rtv_g), 9))
    assert max_diff(guide, expected_guide) <= 1


def test_pallas_btf_end_to_end():
    from various_image_processings_tpu.ops.bilateral_texture import bilateral_texture_filter
    src = random_image(40, 40)
    expected = golden.bilateral_texture_filter(src, ksize=5, nitr=2)
    actual = np.asarray(bilateral_texture_filter(src, ksize=5, nitr=2, impl="pallas"))
    diff = np.abs(actual.astype(np.int64) - expected.astype(np.int64))
    assert np.percentile(diff, 99.9) <= 2
    assert diff.max() <= 3


@pytest.mark.parametrize("ksize", [17, 21])
def test_pallas_chunked_self_bilateral(ksize):
    # self-guided large-k path (chunked kernel, single input stream)
    src = random_image(45, 70)
    expected = golden.bilateral_filter(src, ksize, 10.0, 30.0)
    actual = bilateral_filter(src, ksize, 10.0, 30.0, impl="pallas")
    assert max_diff(actual, expected) <= 1


def test_pallas_chunked_joint_rectangular():
    src = random_image(33, 90)
    guide = random_image(33, 90)[::-1].copy()
    expected = golden.joint_bilateral_filter(src, guide, 17, 8.0, 1.7320508)
    actual = joint_bilateral_filter(src, guide, 17, 8.0, 1.7320508, impl="pallas")
    assert max_diff(actual, expected) <= 1


@pytest.mark.parametrize("border,rounding", [("replicate", "trunc"),
                                             ("reflect101", "rint")])
def test_planar_joint_bilateral_matches_hwc(border, rounding):
    """The planar (3,H,W) entry the BTF pipeline uses must be bit-identical
    to the HWC path for both JBF semantics (reference-CUDA and
    cv::ximgproc); exercises pad_planar's replicate AND reflect-101
    borders and the planar split path at k=17."""
    import jax.numpy as jnp
    from various_image_processings_tpu.ops.pallas.bilateral import (
        joint_bilateral_pallas, joint_bilateral_pallas_planar)

    src = random_image(41, 57)
    guide = random_image(41, 57)[::-1].copy()
    hwc = joint_bilateral_pallas(jnp.asarray(src), jnp.asarray(guide), 17,
                                 8.0, float(np.sqrt(np.float32(3.0))),
                                 border=border, rounding=rounding)
    planar = joint_bilateral_pallas_planar(
        jnp.asarray(src).transpose(2, 0, 1),
        jnp.asarray(guide).astype(jnp.float32).transpose(2, 0, 1), 17,
        8.0, float(np.sqrt(np.float32(3.0))),
        border=border, rounding=rounding)
    assert max_diff(planar.transpose(1, 2, 0), hwc) == 0


# Deterministic odd-shape sweep: shapes drawn to stress the tiling machinery
# (heights below one (8,·) sublane tile, widths one past the 128-lane
# boundary, extreme aspect ratios).  Shapes cover the kernel families whose
# padding/blocking logic differs (full-unroll pair path at k=9,
# per-pixel-offset ABF, chunked split path at k=17); counts are trimmed to
# keep the interpret-mode suite cost ~1 min.
_SWEEP_SHAPES = [(7, 131), (9, 257), (83, 19)]


@pytest.mark.parametrize("shape", _SWEEP_SHAPES)
def test_odd_shape_sweep_bilateral(shape):
    src = random_image(*shape)
    expected = golden.bilateral_filter(src, 9, 10.0, 30.0)
    actual = bilateral_filter(src, 9, 10.0, 30.0, impl="pallas")
    assert max_diff(actual, expected) <= 1


def test_odd_shape_sweep_adaptive():
    src = random_image(7, 131)
    expected = golden.adaptive_bilateral_filter(src, 9, 10.0, 30.0)
    actual = adaptive_bilateral_filter(src, 9, 10.0, 30.0, impl="pallas")
    assert max_diff(actual, expected) <= 1


def test_odd_shape_sweep_chunked_joint():
    src = random_image(7, 131)
    guide = random_image(7, 131)[::-1].copy()
    expected = golden.joint_bilateral_filter(src, guide, 17, 8.0, 1.7320508)
    actual = joint_bilateral_filter(src, guide, 17, 8.0, 1.7320508,
                                    impl="pallas")
    assert max_diff(actual, expected) <= 1


@pytest.mark.parametrize("shape", [(1, 1), (2, 3), (5, 5)])
def test_sub_radius_images_match_golden(shape):
    """Images smaller than the kernel radius exercise the full replicate
    border machinery on every side simultaneously (reference clamps per-tap,
    include/cpp/bilateral_filter.hpp:89-90); all paths must stay exact."""
    from various_image_processings_tpu.ops.bilateral_texture import (
        bilateral_texture_filter)
    src = random_image(*shape)
    assert max_diff(bilateral_filter(src, 9, 10.0, 30.0, impl="pallas"),
                    golden.bilateral_filter(src, 9, 10.0, 30.0)) == 0
    assert max_diff(adaptive_bilateral_filter(src, 9, 10.0, 30.0, impl="xla"),
                    golden.adaptive_bilateral_filter(src, 9, 10.0, 30.0)) == 0
    assert max_diff(bilateral_texture_filter(src, ksize=5, nitr=1, impl="xla"),
                    golden.bilateral_texture_filter(src, ksize=5, nitr=1)) == 0
