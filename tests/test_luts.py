"""LUT builder parity (reference: include/cpp/bilateral_filter.hpp:12-37)."""

import numpy as np

from various_image_processings_tpu.core.luts import (
    space_kernel, color_table, gauss_coeff_f32,
    color_table_zero_index, product_zero_index,
    COLOR_TABLE_SIZE_BILATERAL, COLOR_TABLE_SIZE_ADAPTIVE,
)


def test_space_kernel_circular_mask():
    k = space_kernel(9, 10.0)
    assert k.shape == (9, 9)
    assert k.dtype == np.float32
    # corners lie outside the inscribed circle (r2 = 32 > 16) → exactly 0
    assert k[0, 0] == 0.0 and k[0, 8] == 0.0 and k[8, 0] == 0.0 and k[8, 8] == 0.0
    # centre is exp(0) = 1
    assert k[4, 4] == 1.0
    # on-axis extremes are inside (r2 = 16 ≤ 16)
    assert k[4, 0] > 0.0 and k[0, 4] > 0.0
    # count of non-zero taps for k=9 (|r|≤4 circle)
    assert int((k > 0).sum()) == 49


def test_color_table_values():
    t = color_table(30.0)
    assert t.shape == (COLOR_TABLE_SIZE_BILATERAL,)
    assert t[0] == 1.0
    # spot value computed like the C++ double path
    coeff = -1.0 / float(np.float32(np.float32(2.0 * np.float32(30.0)) * np.float32(30.0)))
    assert t[100] == np.float32(np.exp(100 * 100 * coeff))
    assert color_table(30.0, COLOR_TABLE_SIZE_ADAPTIVE).shape == (COLOR_TABLE_SIZE_ADAPTIVE,)


def test_exp_recompute_close_to_table():
    # The device kernels recompute exp(d² * coeff_f32) instead of gathering
    # from the f64-built table.  The relative error of the recompute grows as
    # d²·ulp(coeff) ≈ (d²/2σ²)·2⁻²³, while the weight itself shrinks as
    # exp(-d²/2σ²) — so the absolute output impact stays ≪ 1/255.  Check the
    # relative-error envelope for all weights that can matter.
    for sigma in (30.0, 10.0, float(np.sqrt(np.float32(3.0)))):
        t = color_table(sigma)
        d = np.arange(COLOR_TABLE_SIZE_BILATERAL, dtype=np.float32)
        recomputed = np.exp(d * d * gauss_coeff_f32(sigma)).astype(np.float32)
        significant = t > 1e-10
        rel = np.abs(recomputed[significant] - t[significant]) / t[significant]
        assert rel.max() < 1e-5
        dominant = t > 1e-2
        rel = np.abs(recomputed[dominant] - t[dominant]) / t[dominant]
        assert rel.max() < 1e-6


def test_product_zero_index_matches_f32_product():
    # The reference's per-tap weight is the f32 product ws·table[idx]
    # (include/cpp/adaptive_bilateral_filter.hpp:68); product_zero_index must
    # return its exact flush-to-zero boundary for any space weight, and it
    # can only be ≤ the table's own zero index (ws ≤ 1).
    for sc in (1.6, 5.14, 30.0, 107.0, 250.0):
        tab = color_table(sc, COLOR_TABLE_SIZE_ADAPTIVE)
        for ws in (1.0, 0.37, 1.3e-3, 7.2e-7, 1.5e-20, 1.1e-38):
            idx = product_zero_index(ws, sc, COLOR_TABLE_SIZE_ADAPTIVE)
            prod = (np.float32(ws) * tab).astype(np.float32)
            assert idx <= color_table_zero_index(sc, COLOR_TABLE_SIZE_ADAPTIVE)
            if idx < COLOR_TABLE_SIZE_ADAPTIVE:
                assert prod[idx] == np.float32(0.0), (sc, ws, idx)
            if idx > 0:
                assert prod[idx - 1] != np.float32(0.0), (sc, ws, idx)
            # sharp threshold: everything past idx is zero too
            assert not prod[idx:].any(), (sc, ws, idx)


def test_product_zero_index_below_table_zero_for_tiny_ws():
    # the round-4 fuzz-found class: tiny σ_space tap weights pull the
    # boundary well below the LUT's own zero index
    sc = 1.6
    tab_zero = color_table_zero_index(sc, COLOR_TABLE_SIZE_ADAPTIVE)
    assert product_zero_index(1e-30, sc, COLOR_TABLE_SIZE_ADAPTIVE) < tab_zero
