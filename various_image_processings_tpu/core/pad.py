"""Padding / alignment helpers shared by the XLA and Pallas paths.

The reference clamps window coordinates to the image rect everywhere
(``std::clamp(x + kx, 0, width - 1)``, e.g. include/cpp/bilateral_filter.hpp:89-90),
which is exactly replicate ("edge") padding.  On TPU we pre-pad once and turn
every clamped gather into a static slice, which XLA/Mosaic fuse for free.
"""

from __future__ import annotations

import numpy as np


def round_up(x: int, multiple: int) -> int:
    return -(-x // multiple) * multiple


def cdiv(a: int, b: int) -> int:
    return -(-a // b)


def replicate_pad_np(img: np.ndarray, radius: int) -> np.ndarray:
    """Edge-pad the two leading spatial dims of an HW[C] numpy array."""
    pad = [(radius, radius), (radius, radius)] + [(0, 0)] * (img.ndim - 2)
    return np.pad(img, pad, mode="edge")


def replicate_pad(img, pad_top: int, pad_bottom: int, pad_left: int, pad_right: int):
    """Edge-pad the two leading spatial dims of an HW[C] jax array.

    Implemented with concatenations of edge slices (jnp.pad(mode='edge')
    also works; this form keeps the trace tiny for large radii).
    """
    import jax.numpy as jnp

    if pad_top or pad_bottom:
        parts = []
        if pad_top:
            parts.append(jnp.broadcast_to(img[:1], (pad_top,) + img.shape[1:]))
        parts.append(img)
        if pad_bottom:
            parts.append(jnp.broadcast_to(img[-1:], (pad_bottom,) + img.shape[1:]))
        img = jnp.concatenate(parts, axis=0)
    if pad_left or pad_right:
        parts = []
        if pad_left:
            parts.append(jnp.broadcast_to(img[:, :1], (img.shape[0], pad_left) + img.shape[2:]))
        parts.append(img)
        if pad_right:
            parts.append(jnp.broadcast_to(img[:, -1:], (img.shape[0], pad_right) + img.shape[2:]))
        img = jnp.concatenate(parts, axis=1)
    return img
