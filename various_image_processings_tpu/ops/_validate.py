"""Input validation for the public op wrappers.

The reference takes ``cv::Mat3b`` (u8 BGR) everywhere and silently invokes UB
on malformed parameters (an even ksize overflows the space-kernel buffer in
``pre_compute_kernels``, include/cpp/bilateral_filter.hpp:18-29); we validate
and raise instead.
"""

from __future__ import annotations

import jax.numpy as jnp


def check_u8_color(name: str, img) -> None:
    if img.ndim != 3 or img.shape[-1] != 3:
        raise ValueError(
            f"{name} must be an (H, W, 3) color image, got shape {tuple(img.shape)}")
    if img.dtype != jnp.uint8:
        raise TypeError(f"{name} must be uint8 (u8 BGR), got {img.dtype}")


def check_ksize(ksize: int) -> None:
    if ksize < 1 or ksize % 2 == 0:
        raise ValueError(f"ksize must be a positive odd integer, got {ksize}")
