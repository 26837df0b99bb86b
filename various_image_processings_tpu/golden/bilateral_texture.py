"""Golden bilateral texture filter (Cho et al. 2014) stages.

Twin of ``internal::ComputeBlurAndRTV`` / ``internal::ComputeGuide`` /
``BilateralTextureFilterImpl::execute`` (reference:
include/cpp/bilateral_texture_filter.hpp:17-171).

End-to-end note: the reference's CPU pipeline delegates the final joint
bilateral stage to ``cv::ximgproc::jointBilateralFilter`` (:162) while its
CUDA pipeline uses the in-repo joint bilateral with ksize=2k−1, σ_space=k−1,
σ_color=√3 (src/bilateral_texture_filter_impl.cu:188-210).  This golden path
follows the in-repo (CUDA) variant — the two differ slightly and the CUDA
variant is the one fully specified by in-repo code.
"""

from __future__ import annotations

import numpy as np

from .gradient import gradient
from .bilateral import joint_bilateral_filter

EPSILON = np.float32(1e-9)  # include/cpp/bilateral_texture_filter.hpp:15


def compute_blur_and_rtv(image: np.ndarray, magnitude: np.ndarray, ksize: int):
    """(H,W,3) u8 image + (H,W) f32 magnitude → ((H,W,3) f32 blurred, (H,W) f32 rtv).

    Per pixel over the ksize² clamped window: box blur of the image, and
    mRTV = (I_max − I_min) * G_max / (ΣG + ε)  (:41-60).
    """
    h, w, _ = image.shape
    radius = ksize // 2
    img_f = image.astype(np.float32)
    # intensity = (b + g + r) / 3.f with an exact int sum (:27-30)
    intensity = (image[:, :, 0].astype(np.int32) + image[:, :, 1]
                 + image[:, :, 2]).astype(np.float32) / np.float32(3.0)

    pad2 = [(radius, radius), (radius, radius)]
    img_p = np.pad(img_f, pad2 + [(0, 0)], mode="edge")
    int_p = np.pad(intensity, pad2, mode="edge")
    mag_p = np.pad(magnitude.astype(np.float32), pad2, mode="edge")

    b_sum = np.zeros((h, w, 3), np.float32)
    i_max = np.full((h, w), 0.0, np.float32)
    i_min = np.full((h, w), 256.0, np.float32)
    m_max = np.zeros((h, w), np.float32)
    m_sum = np.zeros((h, w), np.float32)
    for ky in range(ksize):
        for kx in range(ksize):
            b_sum += img_p[ky : ky + h, kx : kx + w]
            iw = int_p[ky : ky + h, kx : kx + w]
            mw = mag_p[ky : ky + h, kx : kx + w]
            i_max = np.maximum(i_max, iw)
            i_min = np.minimum(i_min, iw)
            m_max = np.maximum(m_max, mw)
            m_sum += mw
    blurred = b_sum / np.float32(ksize * ksize)
    rtv = (i_max - i_min) * m_max / (m_sum + EPSILON)
    return blurred, rtv


def compute_guide(blurred: np.ndarray, rtv: np.ndarray, ksize: int) -> np.ndarray:
    """((H,W,3) f32, (H,W) f32) → (H,W,3) u8 guide.

    Window argmin of rtv with first-minimum tie-break in (ky, kx) scan order
    (:101-112), α-blend of blurred[argmin] vs blurred[center] (:114-124).
    """
    h, w, _ = blurred.shape
    radius = ksize // 2
    sigma_alpha = np.float32(1.0) / np.float32(5 * ksize)

    pad2 = [(radius, radius), (radius, radius)]
    rtv_p = np.pad(rtv, pad2, mode="edge")
    blur_p = np.pad(blurred, pad2 + [(0, 0)], mode="edge")

    taps = ksize * ksize
    rtv_stack = np.empty((taps, h, w), np.float32)
    blur_stack = np.empty((taps, h, w, 3), np.float32)
    t = 0
    for ky in range(ksize):
        for kx in range(ksize):
            rtv_stack[t] = rtv_p[ky : ky + h, kx : kx + w]
            blur_stack[t] = blur_p[ky : ky + h, kx : kx + w]
            t += 1
    # strict-less scan keeps the FIRST occurrence of the minimum; np.argmin
    # returns the first occurrence along axis 0 — same tie-break.
    amin = np.argmin(rtv_stack, axis=0)
    yy, xx = np.mgrid[0:h, 0:w]
    rtv_min = rtv_stack[amin, yy, xx]
    blur_min = blur_stack[amin, yy, xx]

    alpha = (np.float32(2.0) / (np.float32(1.0)
             + np.exp(sigma_alpha * (rtv - rtv_min)).astype(np.float32))
             - np.float32(1.0)).astype(np.float32)
    guide = (alpha[:, :, None] * blur_min
             + (np.float32(1.0) - alpha)[:, :, None] * blurred
             + np.float32(0.5))
    return np.clip(np.trunc(guide), 0, 255).astype(np.uint8)


def bilateral_texture_filter(src: np.ndarray, ksize: int = 9, nitr: int = 3) -> np.ndarray:
    """(H,W,3) u8 → (H,W,3) u8. Reference: include/cpp/bilateral_texture_filter.hpp:153-164."""
    dst = src.copy()
    for _ in range(nitr):
        src_n = dst.copy()
        magnitude = gradient(src_n)
        blurred, rtv = compute_blur_and_rtv(src_n, magnitude, ksize)
        guide = compute_guide(blurred, rtv, ksize)
        dst = joint_bilateral_filter(src_n, guide, 2 * ksize - 1,
                                     float(ksize - 1), float(np.sqrt(np.float32(3.0))))
    return dst
