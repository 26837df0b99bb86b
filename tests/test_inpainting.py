"""Wexler inpainting — functional tests.

The reference has NO inpainting tests (SURVEY.md §4 coverage gap).  These
check the sequential host pieces against hand-built cases and the end-to-end
fill on a synthetic periodic texture where the correct completion is known.
"""

import numpy as np
import pytest

from various_image_processings_tpu.models.inpainting import (
    WexlerInpainting, extract_mask_contour, calculate_weight,
    contour_with_priority)
from various_image_processings_tpu.ops.inpainting import inpainting_wexler


def square_mask(size, y0, y1, x0, x1):
    m = np.zeros((size, size), np.uint8)
    m[y0:y1, x0:x1] = 255
    return m


def test_contour_of_square():
    m = square_mask(20, 5, 10, 5, 10)  # 5×5 hole
    contour = extract_mask_contour(m, 5, 5)
    # boundary of a 5×5 square = 16 pixels
    assert len(contour) == 16
    assert set(contour) == {(x, y) for y in range(5, 10) for x in range(5, 10)
                            if y in (5, 9) or x in (5, 9)}


def test_contour_raises_on_isolated_pixel_mass():
    # single-pixel hole: the contour is that one pixel
    m = square_mask(10, 4, 5, 4, 5)
    contour = extract_mask_contour(m, 4, 4)
    assert contour == [(4, 4)]


def test_weight_decays_into_hole():
    m = square_mask(30, 10, 20, 10, 20)
    w = calculate_weight(m > 0)
    assert w[9, 15] == 0.0              # outside the hole
    assert w[10, 15] == 1.0             # on the contour: 1.2^0
    assert w[15, 15] < w[11, 15] <= 1.0  # decays toward the centre


def test_priority_prefers_known_surroundings():
    # L-shaped hole: the convex corner pixel has more known neighbours
    m = np.zeros((30, 30), np.uint8)
    m[10:20, 10:20] = 255
    ring = contour_with_priority(m)
    first_x, first_y = ring[0]
    # corners of the square have the most known pixels in their window
    assert (first_x in (10, 19)) and (first_y in (10, 19))


def test_inpaint_periodic_texture():
    # vertical stripes of period 8; a small hole must be filled with stripes
    size = 72
    img = np.zeros((size, size, 3), np.uint8)
    stripes = ((np.arange(size) // 4) % 2 * 180 + 40).astype(np.uint8)
    img[:, :, :] = stripes[None, :, None]
    mask = square_mask(size, 30, 38, 30, 38)
    out = inpainting_wexler(img, mask, verbose=False)
    assert out.shape == img.shape
    expected = img.copy()
    diff = np.abs(out.astype(int) - expected.astype(int))[30:38, 30:38]
    # exemplar fill on a perfectly periodic texture should be near-exact
    assert np.median(diff) <= 2
    assert diff.mean() <= 30


def test_inpaint_validates_shapes():
    with pytest.raises(ValueError, match="sizes differ"):
        WexlerInpainting().apply(np.zeros((10, 10, 3), np.uint8),
                                 np.zeros((9, 10), np.uint8))


def test_ring_search_energy_matches_bruteforce():
    """The single-conv masked-SSD scan (hi/lo integer split riding the same
    filters as the cross term) must reproduce the brute-force
    E[t] = min_c Σ_i m_ti (a_ci − b_ti)² over all candidates, including the
    first-minimum (raster) tie-break and the border in-range masks."""
    import jax.numpy as jnp
    from various_image_processings_tpu.models.inpainting import (
        _build_p117, _ring_targets_search, WHALF, WINDOW_SIZE)

    rng = np.random.default_rng(7)
    h, w = 33, 41
    img = rng.integers(0, 256, (h, w, 3)).astype(np.float32)
    rem = np.zeros((h, w), np.float32)
    rem[14:19, 20:25] = 1.0              # 5×5 hole
    # targets: the hole boundary AND a border-hugging pixel (partial mask)
    targets = [(14, 20), (14, 24), (18, 22), (3, 0)]
    rem[3, 0] = 1.0
    ty = np.array([t[0] for t in targets], np.int32)
    tx = np.array([t[1] for t in targets], np.int32)
    tvalid = np.ones(len(targets), bool)

    img_j = jnp.asarray(img)
    e, by, bx = _ring_targets_search(
        img_j, _build_p117(img_j, w), jnp.asarray(rem), jnp.asarray(ty),
        jnp.asarray(tx), jnp.asarray(tvalid), h, w, initial=False)
    e, by, bx = np.asarray(e), np.asarray(by), np.asarray(bx)

    # brute force
    pad = WHALF
    img_p = np.pad(img, [(pad, pad), (pad, pad), (0, 0)])
    rem_p = np.pad(rem, [(pad, pad), (pad, pad)])
    for i, (y, x) in enumerate(targets):
        b = img_p[y : y + WINDOW_SIZE, x : x + WINDOW_SIZE]
        m = np.zeros((WINDOW_SIZE, WINDOW_SIZE), np.float32)
        for ky in range(WINDOW_SIZE):
            for kx in range(WINDOW_SIZE):
                yy, xx = y + ky - pad, x + kx - pad
                m[ky, kx] = float(0 <= yy < h and 0 <= xx < w)
        best = (np.inf, -1, -1)
        for cy in range(pad, h - pad):
            for cx in range(pad, w - pad):
                if rem[cy - pad : cy + pad + 1, cx - pad : cx + pad + 1].any():
                    continue
                a = img[cy - pad : cy + pad + 1, cx - pad : cx + pad + 1]
                en = float((m[:, :, None] * (a - b) ** 2).sum())
                if en < best[0]:
                    best = (en, cy, cx)
        assert (by[i], bx[i]) == (best[1], best[2]), (i, targets[i])
        # f32/bf16-exact products, only the final Σ (≤3·10⁷) may round
        assert abs(e[i] - best[0]) <= max(4.0, 1e-6 * best[0]), (i, targets[i])


def test_wexler_bbox_bucketing_reuses_executable():
    """Two different masks with similar-size holes at different positions
    must NOT trigger a second while-loop compile: the static bbox size is
    bucketed to multiples of 64 and the origin is a traced scalar
    (each distinct static shape costs a full compile through the remote
    compiler — ADVICE r2 / VERDICT r2 item 7)."""
    from various_image_processings_tpu.models import inpainting as M
    from various_image_processings_tpu.ops.inpainting import inpainting_wexler

    if not hasattr(M._fill_pass_device, "_cache_size"):
        pytest.skip("jax.jit._cache_size private API unavailable in this "
                    "JAX version")
    size = 64
    img = np.tile(((np.arange(size) // 4) % 2 * 180 + 40)
                  .astype(np.uint8)[None, :, None], (size, 1, 3))
    m1 = np.zeros((size, size), np.uint8)
    m1[10:18, 12:20] = 255
    m2 = np.zeros((size, size), np.uint8)
    m2[34:40, 30:38] = 255

    inpainting_wexler(img, m1)
    n_fill = M._fill_pass_device._cache_size()
    n_loop = M._energy_loops_device._cache_size()
    inpainting_wexler(img, m2)
    assert M._fill_pass_device._cache_size() == n_fill
    assert M._energy_loops_device._cache_size() == n_loop


def test_p117_incremental_update_matches_rebuild():
    """The cached candidate planes must stay coherent: after mutating the
    image inside a bbox, _update_p117 must equal a from-scratch
    _build_p117 bit-for-bit (bf16 entries are exact integers <= 255), for
    boxes in the interior, flush on each border, and the full image."""
    import jax.numpy as jnp
    from various_image_processings_tpu.models.inpainting import (
        _build_p117, _update_p117)

    rng = np.random.default_rng(11)
    h, w = 40, 52
    for (by0, bx0, bh, bw) in [(10, 15, 8, 12), (0, 0, 6, 6),
                               (32, 40, 8, 12), (0, 40, 5, 12),
                               (0, 0, 40, 52)]:
        img = rng.integers(0, 256, (h, w, 3)).astype(np.float32)
        p117 = _build_p117(jnp.asarray(img), w)
        img2 = img.copy()
        img2[by0:by0 + bh, bx0:bx0 + bw] = rng.integers(
            0, 256, (bh, bw, 3)).astype(np.float32)
        upd = _update_p117(p117, jnp.asarray(img2), h, w, bh, bw,
                           jnp.int32(by0), jnp.int32(bx0))
        ref = _build_p117(jnp.asarray(img2), w)
        np.testing.assert_array_equal(np.asarray(upd), np.asarray(ref))


def test_pallas_search_matches_conv_path(monkeypatch):
    """The fused matmul+argmin kernel (interpret mode on CPU) must agree
    with the conv+argmin path: identical picks on unique minima and the
    same lexicographic (energy, raster index) tie rule; energies equal up
    to f32 summation order of exact products."""
    import jax.numpy as jnp
    from various_image_processings_tpu.models import inpainting as M

    rng = np.random.default_rng(3)
    h, w = 34, 45
    img = rng.integers(0, 256, (h, w, 3)).astype(np.float32)
    rem = np.zeros((h, w), np.float32)
    rem[15:20, 21:26] = 1.0
    targets = [(15, 21), (15, 25), (19, 23), (5, 1)]
    rem[5, 1] = 1.0
    ty = jnp.asarray(np.array([t[0] for t in targets], np.int32))
    tx = jnp.asarray(np.array([t[1] for t in targets], np.int32))
    tvalid = jnp.asarray(np.ones(len(targets), bool))
    img_j = jnp.asarray(img)
    p117 = M._build_p117(img_j, w)

    outs = {}
    for impl in ("conv", "pallas"):
        monkeypatch.setattr(M, "_search_impl", lambda impl=impl: impl)
        outs[impl] = [np.asarray(v) for v in M._ring_targets_search(
            img_j, p117, jnp.asarray(rem), ty, tx, tvalid, h, w,
            initial=False)]
    e_c, y_c, x_c = outs["conv"]
    e_p, y_p, x_p = outs["pallas"]
    np.testing.assert_array_equal(y_p, y_c)
    np.testing.assert_array_equal(x_p, x_c)
    np.testing.assert_allclose(e_p, e_c, rtol=1e-6, atol=4.0)


def test_pallas_search_end_to_end_fill(monkeypatch):
    """Full periodic-texture fill through the pallas search backend."""
    from various_image_processings_tpu.models import inpainting as M

    monkeypatch.setenv("VIP_WEXLER_SEARCH", "pallas")
    # the backend is chosen at trace time: drop any conv-traced executables
    # for these shapes (earlier tests share them), and drop ours afterwards
    M._fill_pass_device.clear_cache()
    M._energy_loops_device.clear_cache()
    try:
        size = 72
        img = np.zeros((size, size, 3), np.uint8)
        stripes = ((np.arange(size) // 4) % 2 * 180 + 40).astype(np.uint8)
        img[:, :, :] = stripes[None, :, None]
        mask = square_mask(size, 30, 38, 30, 38)
        out = inpainting_wexler(img, mask, verbose=False)
        diff = np.abs(out.astype(int) - img.astype(int))[30:38, 30:38]
        assert np.median(diff) <= 2
        assert diff.mean() <= 30
    finally:
        # don't leave pallas-traced executables for later conv-path tests
        M._fill_pass_device.clear_cache()
        M._energy_loops_device.clear_cache()


def test_pallas_search_failure_parity(monkeypatch):
    """When every candidate window touches the hole, both backends must
    report +inf energies (the search-failure path, PARITY.md D4)."""
    import jax.numpy as jnp
    from various_image_processings_tpu.models import inpainting as M

    h, w = 20, 20
    img = np.full((h, w, 3), 50, np.float32)
    rem = np.zeros((h, w), np.float32)
    rem[9, 9] = 1.0  # any 13x13 window inside a 20x20 image contains (9,9)
    ty = jnp.asarray(np.array([9], np.int32))
    tx = jnp.asarray(np.array([9], np.int32))
    tvalid = jnp.asarray(np.ones(1, bool))
    img_j = jnp.asarray(img)
    p117 = M._build_p117(img_j, w)
    for impl in ("conv", "pallas"):
        monkeypatch.setattr(M, "_search_impl", lambda impl=impl: impl)
        e, _, _ = M._ring_targets_search(img_j, p117, jnp.asarray(rem),
                                         ty, tx, tvalid, h, w, initial=False)
        assert not np.isfinite(np.asarray(e)[0]), impl
