"""Golden layer vs the COMPILED reference C++ implementations.

Builds tests/tools/ref_oracle.cpp against the read-only reference headers
(-I /root/reference/include) and system OpenCV, then checks the golden NumPy
twins — and through them every device path — against the actual reference
outputs.  Skipped when the toolchain or reference mount is unavailable.
"""

import os
import subprocess
import tempfile

import numpy as np
import pytest

from various_image_processings_tpu import golden
from various_image_processings_tpu.core.rng import random_image, MT19937

REF_INCLUDE = "/root/reference/include"
TOOL = os.path.join(os.path.dirname(__file__), "tools", "ref_oracle.cpp")


@pytest.fixture(scope="module")
def oracle():
    if not os.path.isdir(REF_INCLUDE):
        pytest.skip("reference not mounted")
    exe = os.path.join(tempfile.gettempdir(), "vip_ref_oracle")
    if not os.path.exists(exe):
        cmd = ["g++", "-O2", "-std=c++20", "-w", f"-I{REF_INCLUDE}",
               "-I/usr/include/opencv4", TOOL, "-o", exe,
               "-lopencv_core", "-lopencv_imgproc", "-lopencv_ximgproc"]
        try:
            subprocess.run(cmd, check=True, capture_output=True, timeout=300)
        except Exception as e:
            pytest.skip(f"cannot build reference oracle: {e}")

    def run(op, data: np.ndarray, h, w, out_bytes, *args):
        with tempfile.TemporaryDirectory() as td:
            inp = os.path.join(td, "in.bin")
            outp = os.path.join(td, "out.bin")
            data.tofile(inp)
            subprocess.run([exe, op, inp, str(h), str(w), outp]
                           + [str(a) for a in args],
                           check=True, capture_output=True, timeout=300)
            raw = np.fromfile(outp, np.uint8)
            assert raw.size == out_bytes
            return raw

    return run


def test_golden_bilateral_exact_vs_reference(oracle):
    src = random_image(50, 50)
    ref = oracle("bilateral", src, 50, 50, 50 * 50 * 3, 9, 10.0, 30.0)
    ref = ref.reshape(50, 50, 3)
    ours = golden.bilateral_filter(src, 9, 10.0, 30.0)
    diff = np.abs(ours.astype(int) - ref.astype(int))
    # identical arithmetic up to compiler FMA contraction → ≤1 always, and
    # virtually all pixels exactly equal
    assert diff.max() <= 1
    assert (diff == 0).mean() > 0.999


def test_golden_joint_bilateral_vs_reference(oracle):
    raw = MT19937(42).raw(2 * 50 * 50 * 3)
    both = (raw % np.uint32(255)).astype(np.uint8)
    src = both[: 50 * 50 * 3].reshape(50, 50, 3)
    guide = both[50 * 50 * 3 :].reshape(50, 50, 3)
    ref = oracle("joint", both, 50, 50, 50 * 50 * 3, 9, 10.0, 30.0).reshape(50, 50, 3)
    ours = golden.joint_bilateral_filter(src, guide, 9, 10.0, 30.0)
    diff = np.abs(ours.astype(int) - ref.astype(int))
    assert diff.max() <= 1
    assert (diff == 0).mean() > 0.999


def test_golden_abf_vs_reference(oracle):
    src = random_image(50, 50)
    ref = oracle("abf", src, 50, 50, 50 * 50 * 3, 9, 10.0, 30.0).reshape(50, 50, 3)
    ours = golden.adaptive_bilateral_filter(src, 9, 10.0, 30.0)
    diff = np.abs(ours.astype(int) - ref.astype(int))
    assert diff.max() <= 1
    assert (diff == 0).mean() > 0.999


@pytest.mark.parametrize("op,channels", [("gradient", 3), ("gradient1", 1)])
def test_golden_gradient_vs_reference(oracle, op, channels):
    src = random_image(50, 50, channels)
    ref = oracle(op, src, 50, 50, 50 * 50 * 4).view(np.float32).reshape(50, 50)
    ours = golden.gradient(src if channels == 3 else src[:, :, 0])
    np.testing.assert_array_equal(ours, ref)


def test_golden_blur_rtv_guide_vs_reference(oracle):
    src = random_image(50, 50)
    out = oracle("blur_rtv", src, 50, 50, 50 * 50 * 3 * 4 + 50 * 50 * 4, 9)
    ref_blur = out[: 50 * 50 * 12].view(np.float32).reshape(50, 50, 3)
    ref_rtv = out[50 * 50 * 12 :].view(np.float32).reshape(50, 50)
    mag = golden.gradient(src)
    blurred, rtv = golden.compute_blur_and_rtv(src, mag, 9)
    np.testing.assert_allclose(blurred, ref_blur, atol=1e-4)
    np.testing.assert_allclose(rtv, ref_rtv, rtol=1e-5, atol=1e-6)

    # guide stage fed with the REFERENCE's own blurred/rtv
    both = np.concatenate([ref_blur.reshape(-1).view(np.uint8),
                           ref_rtv.reshape(-1).view(np.uint8)])
    ref_guide = oracle("guide", both, 50, 50, 50 * 50 * 3, 9).reshape(50, 50, 3)
    ours_guide = golden.compute_guide(ref_blur, ref_rtv, 9)
    diff = np.abs(ours_guide.astype(int) - ref_guide.astype(int))
    assert diff.max() <= 1
    assert (diff == 0).mean() > 0.999


def test_golden_integral_vs_reference(oracle):
    src = random_image(20, 17)
    ref = oracle("integral", src, 20, 17, 20 * 17 * 3 * 4, 4)
    ref = ref.view(np.int32).reshape(20, 17, 3)
    from various_image_processings_tpu.golden.integral_image import (
        BorderReplicatedIntegralImage)
    ii = BorderReplicatedIntegralImage(src, 4)
    np.testing.assert_array_equal(ii.window_sums(4), ref)


def test_slic_quality_vs_reference(oracle):
    """SLIC is quality-equivalence, not bit-exact (PARITY.md D3): compare
    segment statistics and boundary agreement on lenna."""
    cv2 = pytest.importorskip("cv2")
    img = cv2.imread("/root/reference/sample_image/lenna.png")
    if img is None:
        pytest.skip("lenna unavailable")
    img = np.ascontiguousarray(img[::2, ::2])  # 256² keeps the C++ run fast
    h, w = img.shape[:2]
    ref = oracle("slic", img, h, w, h * w * 4, 32, 10, 20.0).view(np.int32).reshape(h, w)
    from various_image_processings_tpu.ops.slic import superpixel_slic
    ours = np.asarray(superpixel_slic(img, 32, 10, 20.0))

    # the reference's post-merge label ids are sparse (relabeling leaves
    # gaps); count distinct labels
    n_ref = len(np.unique(ref))
    n_ours = len(np.unique(ours))
    assert abs(int(n_ours) - int(n_ref)) <= max(10, 0.35 * n_ref)

    def boundary(lbl):
        b = np.zeros(lbl.shape, bool)
        b[:, :-1] |= lbl[:, :-1] != lbl[:, 1:]
        b[:-1, :] |= lbl[:-1, :] != lbl[1:, :]
        return b

    b_ref = boundary(ref)
    b_ours = boundary(ours)
    # boundary recall within 2px: most reference boundaries near ours
    from scipy.ndimage import binary_dilation
    recall = (b_ref & binary_dilation(b_ours, iterations=2)).sum() / max(b_ref.sum(), 1)
    assert recall > 0.7


def test_slic_segment_statistics_vs_reference(oracle):
    """Partition-shape statistics vs the reference: mean segment size and
    size dispersion must be in the same regime.  (Under-segmentation error
    is NOT used — it needs ground-truth regions; two valid over-segmentations
    offset by half a cell score ~0.5 against each other.)"""
    cv2 = pytest.importorskip("cv2")
    img = cv2.imread("/root/reference/sample_image/lenna.png")
    if img is None:
        pytest.skip("lenna unavailable")
    img = np.ascontiguousarray(img[::2, ::2])
    h, w = img.shape[:2]
    ref = oracle("slic", img, h, w, h * w * 4, 32, 10, 20.0).view(np.int32).reshape(h, w)
    from various_image_processings_tpu.ops.slic import superpixel_slic
    ours = np.asarray(superpixel_slic(img, 32, 10, 20.0))

    def stats(lbl):
        _, counts = np.unique(lbl, return_counts=True)
        return counts.mean(), np.median(counts)

    ref_mean, ref_med = stats(ref)
    our_mean, our_med = stats(ours)
    assert 0.5 <= our_mean / ref_mean <= 2.0
    assert 0.4 <= our_med / max(ref_med, 1) <= 2.5
