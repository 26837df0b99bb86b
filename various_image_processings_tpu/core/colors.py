"""Color conversions.

``bgr2lab_u8`` mirrors OpenCV's 8-bit BGR→Lab (D65, sRGB gamma, L scaled to
0..255, a/b offset by 128) used by the reference's SLIC init
(include/cpp/slic.hpp:166).  OpenCV's u8 path runs through fixed-point LUTs;
this float implementation agrees within ±1 code on almost all pixels (SLIC's
parity criterion is segmentation quality, not bit-exact Lab — SURVEY.md §7).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def _srgb_linearize(c):
    return jnp.where(c > 0.04045, ((c + 0.055) / 1.055) ** 2.4, c / 12.92)


def bgr2lab_u8(bgr_u8) -> jnp.ndarray:
    """(H, W, 3) u8 BGR → (H, W, 3) u8 Lab (OpenCV 8-bit convention)."""
    bgr = jnp.asarray(bgr_u8).astype(jnp.float32) / 255.0
    b, g, r = bgr[..., 0], bgr[..., 1], bgr[..., 2]
    r = _srgb_linearize(r)
    g = _srgb_linearize(g)
    b = _srgb_linearize(b)
    x = 0.412453 * r + 0.357580 * g + 0.180423 * b
    y = 0.212671 * r + 0.715160 * g + 0.072169 * b
    z = 0.019334 * r + 0.119193 * g + 0.950227 * b
    x = x / 0.950456
    z = z / 1.088754

    def f(t):
        return jnp.where(t > 0.008856, jnp.cbrt(t), 7.787 * t + 16.0 / 116.0)

    fx, fy, fz = f(x), f(y), f(z)
    L = jnp.where(y > 0.008856, 116.0 * fy - 16.0, 903.3 * y)
    a = 500.0 * (fx - fy) + 128.0
    bb = 200.0 * (fy - fz) + 128.0
    L = L * 255.0 / 100.0
    lab = jnp.stack([L, a, bb], axis=-1)
    return jnp.clip(jnp.round(lab), 0, 255).astype(jnp.uint8)


def bgr2lab_u8_np(bgr_u8: np.ndarray) -> np.ndarray:
    """NumPy twin (used by the golden SLIC replica)."""
    return np.asarray(bgr2lab_u8(bgr_u8))
