"""Golden gradient-magnitude reference.

Twin of ``gradient`` / ``internal::gradient_impl`` (reference:
include/cpp/gradient.hpp:14-108): central differences with one-sided forms at
the left/right columns and replicated rows at top/bottom, summed squared over
channels, sqrt → 1-channel f32.
"""

from __future__ import annotations

import numpy as np


def gradient(src: np.ndarray) -> np.ndarray:
    """src: (H, W) or (H, W, C) u8|f32 → (H, W) f32 gradient magnitude."""
    if src.ndim == 2:
        src = src[:, :, None]
    h, w, _ = src.shape
    s = src.astype(np.float32)

    # vertical: rows replicate at top/bottom (include/cpp/gradient.hpp:71-72)
    up = np.concatenate([s[:1], s[:-1]], axis=0)
    down = np.concatenate([s[1:], s[-1:]], axis=0)
    vdiff = down - up

    # horizontal: one-sided at x==0 and x==W-1 (:31-43, :56-65), central
    # elsewhere (:45-55). Note the one-sided forms are single differences
    # (NOT halved), which equals central difference on a replicate-padded
    # image, so edge padding reproduces them exactly.
    left = np.concatenate([s[:, :1], s[:, :-1]], axis=1)
    right = np.concatenate([s[:, 1:], s[:, -1:]], axis=1)
    hdiff = right - left

    total = np.sum(hdiff * hdiff + vdiff * vdiff, axis=2, dtype=np.float32)
    return np.sqrt(total, dtype=np.float32)
