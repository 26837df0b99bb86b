"""SLIC superpixels — functional tests.

The reference has NO SLIC tests (SURVEY.md §4 coverage gap); these validate
the vectorized reformulation on synthetic images with known-correct
segmentations plus structural invariants on a natural image.
"""

import numpy as np
import pytest

from various_image_processings_tpu.models.slic import (
    SuperpixelSLIC, enforce_connectivity, _components)
from various_image_processings_tpu.ops.slic import superpixel_slic


def quadrant_image(size=60):
    """4 uniform 30×30 color blocks aligned to the superpixel grid."""
    img = np.zeros((size, size, 3), np.uint8)
    half = size // 2
    img[:half, :half] = (255, 0, 0)
    img[:half, half:] = (0, 255, 0)
    img[half:, :half] = (0, 0, 255)
    img[half:, half:] = (255, 255, 0)
    return img


def test_quadrants_recovered_exactly():
    img = quadrant_image(60)
    labels = superpixel_slic(img, superpixel_size=30, num_iteration=10)
    assert labels.shape == (60, 60)
    # each quadrant must be a single uniform label, 4 distinct labels
    q = [labels[:30, :30], labels[:30, 30:], labels[30:, :30], labels[30:, 30:]]
    ids = []
    for quad in q:
        assert (quad == quad[0, 0]).all()
        ids.append(int(quad[0, 0]))
    assert len(set(ids)) == 4


def test_uniform_image_single_iteration_gives_grid():
    # After one association from grid seeds, a uniform image is an exact
    # grid (color distance is 0 everywhere, the spatial term decides).
    # Further iterations drift — the reference's snap-to-pixel quirk moves a
    # center to its segment's first raster pixel when all color distances
    # tie (include/cpp/slic.hpp:283-306), exactly as replicated here.
    img = np.full((64, 96, 3), 128, np.uint8)
    labels = superpixel_slic(img, superpixel_size=32, num_iteration=1)
    expected = (np.arange(64)[:, None] // 32) * 3 + (np.arange(96)[None, :] // 32)
    np.testing.assert_array_equal(labels, expected)


def test_uniform_image_many_iterations_invariants():
    img = np.full((64, 96, 3), 128, np.uint8)
    labels = superpixel_slic(img, superpixel_size=32, num_iteration=5)
    assert labels.min() == 0
    comp, sizes, ncomp = _components(labels)
    assert ncomp == labels.max() + 1
    assert sizes.min() >= (32 * 32) // 20
    assert ncomp <= 12


def test_labels_cover_all_pixels_and_are_connected(lenna):
    small = lenna[::4, ::4].copy()  # 128×128
    labels = superpixel_slic(small, superpixel_size=16, num_iteration=5)
    assert labels.min() >= 0
    n = labels.max() + 1
    # ~64 cells expected, merges/splits allowed; the reference itself
    # produces 131 on this config (ref_oracle slic, measured 2026-08-16)
    assert 30 <= n <= 150
    # connectivity: each label is one 4-connected component
    comp, sizes, ncomp = _components(labels)
    assert ncomp == n
    # no tiny fragments below the merge threshold
    assert sizes.min() >= (16 * 16) // 20


def test_enforce_connectivity_merges_small_island():
    labels = np.zeros((20, 20), np.int32)
    labels[5:15, 5:15] = 1
    labels[9:11, 9:11] = 2  # 4-pixel island inside label 1 (< 30²/20 = 45)
    lab = np.zeros((20, 20, 3), np.uint8)
    lab[labels == 1] = (100, 120, 130)
    lab[labels == 2] = (101, 121, 131)  # island color ≈ label 1
    out = enforce_connectivity(labels, lab, sp_size=30)
    # the island must be merged away; the big region must persist
    comp, sizes, ncomp = _components(out)
    assert sizes.min() >= 45 or ncomp <= 2


@pytest.mark.parametrize("path", ["live", "fallback"])
def test_bgr2lab_exact_matches_opencv_exhaustively(path, monkeypatch):
    """bgr2lab_u8_exact must equal cv2.cvtColor on ALL 2²⁴ BGR colors —
    SLIC's parity with the reference hinges on bit-exact Lab codes.  Both
    the native C++ loop and the NumPy int32 fallback are exercised
    regardless of which one is live in this environment."""
    cv2 = pytest.importorskip("cv2")
    from various_image_processings_tpu.core.colors import bgr2lab_u8_exact
    if path == "fallback":
        from various_image_processings_tpu.utils import native
        monkeypatch.setattr(native, "bgr2lab_u8", lambda *a, **k: None)
    all_colors = np.arange(1 << 24, dtype=np.uint32)
    img = np.stack([(all_colors & 255), (all_colors >> 8) & 255,
                    (all_colors >> 16) & 255],
                   axis=-1).astype(np.uint8).reshape(4096, 4096, 3)
    ref = cv2.cvtColor(img, cv2.COLOR_BGR2Lab)
    ours = bgr2lab_u8_exact(img)
    np.testing.assert_array_equal(ours, ref)


def test_slic_shape_validation():
    slic = SuperpixelSLIC(32, 32, 16)
    with pytest.raises(ValueError, match="does not match"):
        slic.apply(np.zeros((16, 32, 3), np.uint8))
    with pytest.raises(ValueError, match=">= 2"):
        SuperpixelSLIC(32, 32, 1)


def test_drift_guard_within_bound_on_natural_image(lenna):
    """The 5x5 gather's bounded-drift assumption, now measured on device:
    max center drift (Chebyshev cells from home) must stay <= 2 on a
    natural image (models/slic.py slic_device docstring)."""
    model = SuperpixelSLIC(*lenna.shape[:2], superpixel_size=26,
                           num_iteration=10)
    model.apply(lenna)
    assert model.last_max_drift_cells is not None
    assert model.last_max_drift_cells <= 2.0, model.last_max_drift_cells


def test_drift_guard_adversarial_gradient_images():
    """Adversarial drift attempts: strong large-scale smooth gradients and
    an off-grid high-contrast step, built to pull centers as far as the
    snap allows.  The snap-to-member-pixel step bounds drift structurally
    (a center can only move to a pixel it owns, and it owns pixels within
    +/-S of its position), so even these stay <= 2 cells -- and if a future
    change breaks that, the wrapper must WARN rather than silently clip."""
    import warnings

    h = w = 130  # 5x5 cells of S=26
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    cases = []
    # diagonal luminance ramp (pulls every mean toward the bright corner)
    ramp = np.clip((yy + xx) * (255.0 / (h + w)), 0, 255).astype(np.uint8)
    cases.append(np.stack([ramp] * 3, axis=-1))
    # steep off-grid step: flat dark field with one bright band whose edge
    # sits mid-cell (centers in the dark cells get dragged toward the band)
    step = np.full((h, w, 3), 10, np.uint8)
    step[:, 39:52] = 250
    cases.append(step)
    # radial gradient centered off-grid
    rad = np.sqrt((yy - 17.0) ** 2 + (xx - 111.0) ** 2)
    rad = np.clip(rad * (255.0 / rad.max()), 0, 255).astype(np.uint8)
    cases.append(np.stack([rad, rad[::-1], rad[:, ::-1]], axis=-1))
    for img in cases:
        model = SuperpixelSLIC(h, w, superpixel_size=26, num_iteration=10)
        with warnings.catch_warnings():
            warnings.simplefilter("error", RuntimeWarning)
            model.apply(img)  # would raise if the drift warning fired
        assert model.last_max_drift_cells <= 2.0, model.last_max_drift_cells


def test_drift_warning_fires_when_bound_exceeded(monkeypatch, lenna):
    """The guard is LOUD: force a >2 reading and check the warning path."""
    import various_image_processings_tpu.models.slic as slic_mod

    real = slic_mod.slic_device

    def fake(*args, **kwargs):
        labels, centers, dists, _ = real(*args, **kwargs)
        return labels, centers, dists, np.float32(3.0)

    monkeypatch.setattr(slic_mod, "slic_device", fake)
    model = SuperpixelSLIC(*lenna.shape[:2], superpixel_size=26,
                           num_iteration=2)
    with pytest.warns(RuntimeWarning, match="drift"):
        model.apply(lenna)
    assert model.last_max_drift_cells == 3.0
