"""Golden adaptive bilateral filter (Zhang–Allebach style).

Twin of ``adaptive_bilateral_filter`` (reference:
include/cpp/adaptive_bilateral_filter.hpp:13-104): per-pixel offset =
center − window box-mean (box sum from the border-replicated integral image),
range distance = |(src − center) − offset| summed L1, LUT index truncated to
int, 1536-entry range table.
"""

from __future__ import annotations

import numpy as np

from ..core.luts import pre_compute_kernels, COLOR_TABLE_SIZE_ADAPTIVE
from .integral_image import BorderReplicatedIntegralImage


def adaptive_bilateral_filter(src: np.ndarray, ksize: int = 9,
                              sigma_space: float = 10.0,
                              sigma_color: float = 30.0) -> np.ndarray:
    """(H, W, 3) u8 → (H, W, 3) u8."""
    h, w, c = src.shape
    assert c == 3
    radius = ksize // 2
    kernel_space, color_tab = pre_compute_kernels(
        ksize, sigma_space, sigma_color, COLOR_TABLE_SIZE_ADAPTIVE)

    integral = BorderReplicatedIntegralImage(src, radius)
    box_sum = integral.window_sums(radius).astype(np.float32)
    # offset = center − mean (f32 division by k², :54-56)
    src_i = src.astype(np.int32)
    src_f = src.astype(np.float32)
    offset = src_f - box_sum / np.float32(ksize * ksize)

    pad = [(radius, radius), (radius, radius), (0, 0)]
    src_p_f = np.pad(src_f, pad, mode="edge")
    src_p_i = np.pad(src_i, pad, mode="edge")

    sums = np.zeros((h, w, 3), np.float32)
    sumk = np.zeros((h, w), np.float32)
    for ky in range(-radius, radius + 1):
        for kx in range(-radius, radius + 1):
            ws = kernel_space[ky + radius, kx + radius]
            sp_f = src_p_f[ky + radius : ky + radius + h, kx + radius : kx + radius + w]
            sp_i = src_p_i[ky + radius : ky + radius + h, kx + radius : kx + radius + w]
            # diff = (src_pix − center) − offset, per channel in f32 (:41-43),
            # L1-summed then truncated to int for the LUT lookup (:44-45).
            diff = (sp_i - src_i).astype(np.float32) - offset
            dist = np.abs(diff).sum(axis=2, dtype=np.float32)
            idx = dist.astype(np.int32)  # static_cast<int> truncation
            wk = (np.float32(ws) * color_tab[idx]).astype(np.float32)
            sums += sp_f * wk[:, :, None]
            sumk += wk
    out = sums / sumk[:, :, None] + np.float32(0.5)
    return np.floor(out).astype(np.uint8)
