"""Golden border-replicated integral image.

Twin of ``BorderReplicatedIntegralImage<SrcType, Channels>`` (reference:
include/cpp/border_replicated_integral_image.hpp:7-85): a summed-area table
over a virtually replicate-padded image with a leading zero row/column.
Integer sources accumulate in int32, floating sources in float32 (same
accumulation order: vertical prefix pass then horizontal).
"""

from __future__ import annotations

import numpy as np


class BorderReplicatedIntegralImage:
    def __init__(self, src: np.ndarray, radius: int):
        """src: (H, W) or (H, W, C); radius: replicate-pad margin."""
        if src.ndim == 2:
            src = src[:, :, None]
        h, w, c = src.shape
        self.radius = radius
        acc_dtype = np.float32 if np.issubdtype(src.dtype, np.floating) else np.int32

        # (H+2r+1, W+2r+1): row/col 0 stay zero (:14-15, :24).
        buf = np.zeros((h + 2 * radius + 1, w + 2 * radius + 1, c), acc_dtype)
        ys = np.clip(np.arange(1, h + 2 * radius + 1) - 1 - radius, 0, h - 1)
        xs = np.clip(np.arange(1, w + 2 * radius + 1) - 1 - radius, 0, w - 1)
        buf[1:, 1:] = src[np.ix_(ys, xs)].astype(acc_dtype)
        np.cumsum(buf, axis=0, out=buf)   # vertical pass (:63-69)
        np.cumsum(buf, axis=1, out=buf)   # horizontal pass (:71-77)
        self.buffer = buf

    def get(self, x0: int, y0: int, x1: int, y1: int) -> np.ndarray:
        """Inclusive window sum via 4-corner lookup (:34-47). Coordinates may
        extend up to `radius` beyond the image rect (virtual replicate pad)."""
        r = self.radius
        b = self.buffer
        return (b[y1 + r + 1, x1 + r + 1] - b[y1 + r + 1, x0 + r]
                - b[y0 + r, x1 + r + 1] + b[y0 + r, x0 + r])

    def window_sums(self, radius: int) -> np.ndarray:
        """(H, W, C) sums of the (2*radius+1)² window centred at each pixel."""
        r = self.radius
        b = self.buffer
        h = b.shape[0] - 2 * r - 1
        w = b.shape[1] - 2 * r - 1
        rr = radius
        ys = np.arange(h)
        xs = np.arange(w)
        y1 = ys + rr + r + 1
        y0 = ys - rr + r
        x1 = xs + rr + r + 1
        x0 = xs - rr + r
        return (b[np.ix_(y1, x1)] - b[np.ix_(y1, x0)]
                - b[np.ix_(y0, x1)] + b[np.ix_(y0, x0)])
