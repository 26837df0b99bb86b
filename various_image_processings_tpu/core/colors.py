"""Color conversions.

``bgr2lab_u8_exact`` is a bit-exact NumPy twin of OpenCV's fixed-point 8-bit
BGR→Lab (the conversion the reference's SLIC init calls,
include/cpp/slic.hpp:166): sRGB gamma and cube-root LUTs built in f32 with
round-half-to-even, 12-bit integer XYZ coefficients over the D65 white
point, and CV_DESCALE rounding shifts — verified equal to ``cv2.cvtColor``
on ALL 2²⁴ colors (tests/test_slic.py).

``bgr2lab_u8`` is the float/jax device variant (agrees within ±1 code);
kept for device-resident pipelines.
"""

from __future__ import annotations

import functools

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


_GAMMA_SHIFT = 3
_LAB_SHIFT = 12
_LAB_SHIFT2 = _LAB_SHIFT + _GAMMA_SHIFT


@functools.cache
def _lab_tables():
    """OpenCV initLabTabs() twin: tables built in float32 with
    round-half-to-even (cvRound), exactly like modules/imgproc/color_lab.cpp.

    int32 arithmetic throughout: every intermediate is bounded by
    max(gamma)·Σ|coeff| = 2040·4095 ≈ 8.4e6 ≪ 2³¹ (and the Lab linear
    combinations by 500·max(cbrt_tab) ≈ 1.9e7), so int32 equals the int64
    math bit-for-bit — and runs the NumPy path ~6× faster."""
    f32 = np.float32
    i = np.arange(256, dtype=np.float32)
    x = i * f32(1.0 / 255.0)
    g = np.where(x <= f32(0.04045), x / f32(12.92),
                 np.power((x + f32(0.055)) / f32(1.055), f32(2.4),
                          dtype=np.float32))
    gamma_tab = np.rint(f32(255.0 * (1 << _GAMMA_SHIFT)) * g).astype(np.int32)

    tab_len = 256 * 3 // 2 * (1 << _GAMMA_SHIFT)
    j = np.arange(tab_len, dtype=np.float32)
    xx = j * f32(1.0 / (255.0 * (1 << _GAMMA_SHIFT)))
    fv = np.where(xx < f32(0.008856),
                  xx * f32(7.787) + f32(0.13793103448275862),
                  np.cbrt(xx, dtype=np.float32))
    cbrt_tab = np.rint(f32(1 << _LAB_SHIFT2) * fv).astype(np.int32)

    d65 = np.array([0.950456, 1.0, 1.088754])
    m = np.array([[0.412453, 0.357580, 0.180423],
                  [0.212671, 0.715160, 0.072169],
                  [0.019334, 0.119193, 0.950227]])
    coeffs = np.rint(m * (1 << _LAB_SHIFT) / d65[:, None]).astype(np.int32)
    return gamma_tab, cbrt_tab, coeffs


def bgr2lab_u8_exact(bgr_u8: np.ndarray) -> np.ndarray:
    """(..., 3) u8 BGR → (..., 3) u8 Lab, bit-identical to
    ``cv2.cvtColor(img, cv2.COLOR_BGR2Lab)`` (verified on all 2²⁴ colors).
    Uses the native C++ loop (native/src/vip_native.cpp) when built; the
    NumPy int32 path below is the fallback."""
    gamma_tab, cbrt_tab, c = _lab_tables()
    img = np.asarray(bgr_u8)

    from ..utils import native
    got = native.bgr2lab_u8(img, gamma_tab, cbrt_tab, c)
    if got is not None:
        return got

    def descale(v, n):
        return (v + (1 << (n - 1))) >> n

    b = gamma_tab[img[..., 0].astype(np.int32)]
    g = gamma_tab[img[..., 1].astype(np.int32)]
    r = gamma_tab[img[..., 2].astype(np.int32)]
    fx = cbrt_tab[descale(r * c[0, 0] + g * c[0, 1] + b * c[0, 2], _LAB_SHIFT)]
    fy = cbrt_tab[descale(r * c[1, 0] + g * c[1, 1] + b * c[1, 2], _LAB_SHIFT)]
    fz = cbrt_tab[descale(r * c[2, 0] + g * c[2, 1] + b * c[2, 2], _LAB_SHIFT)]
    lscale = (116 * 255 + 50) // 100
    lshift = -((16 * 255 * (1 << _LAB_SHIFT2) + 50) // 100)
    lum = descale(lscale * fy + lshift, _LAB_SHIFT2)
    a = descale(500 * (fx - fy) + 128 * (1 << _LAB_SHIFT2), _LAB_SHIFT2)
    bb = descale(200 * (fy - fz) + 128 * (1 << _LAB_SHIFT2), _LAB_SHIFT2)
    out = np.stack([lum, a, bb], axis=-1)
    return np.clip(out, 0, 255).astype(np.uint8)
