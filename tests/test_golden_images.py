"""Golden-image regression tests on the reference's sample PNGs
(SURVEY.md §7 step 9: image-file tests the reference lacks)."""

import numpy as np
import pytest

from various_image_processings_tpu import golden
from various_image_processings_tpu.ops.bilateral import bilateral_filter
from various_image_processings_tpu.ops.gradient import gradient

cv2 = pytest.importorskip("cv2")

SAMPLES = "/root/reference/sample_image"


@pytest.fixture(scope="module")
def mosaic_cat_small():
    img = cv2.imread(f"{SAMPLES}/mosaic_cat_small.png", cv2.IMREAD_COLOR)
    if img is None:
        pytest.skip("mosaic_cat_small.png not available")
    return np.asarray(img)


def test_bilateral_mosaic_cat_vs_opencv(mosaic_cat_small):
    img = mosaic_cat_small
    expected = cv2.bilateralFilter(img, 9, 30.0, 10.0,
                                   borderType=cv2.BORDER_REPLICATE)
    actual = np.asarray(bilateral_filter(img, 9, 10.0, 30.0, impl="xla"))
    assert np.abs(actual.astype(int) - expected.astype(int)).max() <= 1


def test_gradient_lenna_matches_golden(lenna):
    crop = lenna[:128, :128]
    got = np.asarray(gradient(crop, impl="xla"))
    expected = golden.gradient(crop)
    ulp = np.spacing(np.maximum(np.abs(got), np.abs(expected)))
    assert np.all(np.abs(got - expected) <= 4 * ulp)


def test_bilateral_is_edge_preserving_smoothing(lenna):
    # functional sanity on a natural image: output is smoother than input
    # but retains edges (variance drops, gradient correlation stays high)
    crop = lenna[:128, :128]
    out = np.asarray(bilateral_filter(crop, 9, 10.0, 30.0, impl="xla"))
    assert out.astype(np.float64).var() < crop.astype(np.float64).var()
    g_in = golden.gradient(crop)
    g_out = golden.gradient(out)
    corr = np.corrcoef(g_in.reshape(-1), g_out.reshape(-1))[0, 1]
    assert corr > 0.8
