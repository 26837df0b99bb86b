"""Golden bilateral / joint bilateral references.

Twin of ``bilateral_filter`` / ``joint_bilateral_filter`` (reference:
include/cpp/bilateral_filter.hpp:41-207).  Vectorized over pixels but looping
taps in the same (ky, kx) order with f32 accumulation, identical LUT contents,
L1 u8 color distance, and ``u8(sum/sumk + 0.5f)`` truncation.
"""

from __future__ import annotations

import numpy as np

from ..core.luts import pre_compute_kernels, COLOR_TABLE_SIZE_BILATERAL


def _clamped(idx: int, lo: int, hi: int) -> int:
    return max(lo, min(idx, hi))


def _filter_core(src: np.ndarray, guide: np.ndarray, ksize: int,
                 sigma_space: float, sigma_color: float) -> np.ndarray:
    h, w, c = src.shape
    assert c == 3
    radius = ksize // 2
    kernel_space, color_tab = pre_compute_kernels(
        ksize, sigma_space, sigma_color, COLOR_TABLE_SIZE_BILATERAL)

    src_f = src.astype(np.float32)
    guide_i = guide.astype(np.int32)
    pad = [(radius, radius), (radius, radius), (0, 0)]
    src_p = np.pad(src_f, pad, mode="edge")
    guide_p = np.pad(guide_i, pad, mode="edge")

    sums = np.zeros((h, w, 3), np.float32)
    sumk = np.zeros((h, w), np.float32)
    for ky in range(-radius, radius + 1):
        for kx in range(-radius, radius + 1):
            ws = kernel_space[ky + radius, kx + radius]
            sp = src_p[ky + radius : ky + radius + h, kx + radius : kx + radius + w]
            gp = guide_p[ky + radius : ky + radius + h, kx + radius : kx + radius + w]
            dist = np.abs(gp - guide_i).sum(axis=2)  # L1, exact int
            wk = (np.float32(ws) * color_tab[dist]).astype(np.float32)
            sums += sp * wk[:, :, None]
            sumk += wk
    out = sums / sumk[:, :, None] + np.float32(0.5)
    return np.floor(out).astype(np.uint8)


def bilateral_filter(src: np.ndarray, ksize: int = 9, sigma_space: float = 10.0,
                     sigma_color: float = 30.0) -> np.ndarray:
    """(H, W, 3) u8 → (H, W, 3) u8. Reference: include/cpp/bilateral_filter.hpp:41."""
    return _filter_core(src, src, ksize, sigma_space, sigma_color)


def joint_bilateral_filter(src: np.ndarray, guide: np.ndarray, ksize: int = 9,
                           sigma_space: float = 10.0, sigma_color: float = 30.0) -> np.ndarray:
    """Range kernel keyed off `guide`. Reference: include/cpp/bilateral_filter.hpp:126."""
    return _filter_core(src, guide, ksize, sigma_space, sigma_color)
