"""Gaussian pyramid ops (pyrDown / pyrUp).

TPU-native equivalents of the cv::pyrDown / cv::pyrUp calls the reference's
inpainting pyramid uses (include/cpp/wexler_inpainting.hpp:68-91, :52-57):
5-tap binomial kernel [1 4 6 4 1]/16 separably in both axes,
BORDER_REFLECT_101, decimate/inject by 2; u8 outputs round half-up like
OpenCV's fixed-point path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

_K5 = jnp.array([1.0, 4.0, 6.0, 4.0, 1.0], jnp.float32) / 16.0


def _sep_blur(img_f: jax.Array, kernel: jax.Array) -> jax.Array:
    """(H, W, C) f32 separable blur with BORDER_REFLECT_101."""
    r = (kernel.shape[0] - 1) // 2
    p = jnp.pad(img_f, [(r, r), (0, 0), (0, 0)], mode="reflect")
    out = jnp.zeros_like(img_f)
    h = img_f.shape[0]
    for i in range(kernel.shape[0]):
        out = out + kernel[i] * p[i : i + h]
    p = jnp.pad(out, [(0, 0), (r, r), (0, 0)], mode="reflect")
    out = jnp.zeros_like(img_f)
    w = img_f.shape[1]
    for i in range(kernel.shape[0]):
        out = out + kernel[i] * p[:, i : i + w]
    return out


@jax.jit
def _pyr_down_f(img_f: jax.Array) -> jax.Array:
    return _sep_blur(img_f, _K5)[::2, ::2]


@functools.partial(jax.jit, static_argnames=("out_h", "out_w"))
def _pyr_up_f(img_f: jax.Array, out_h: int, out_w: int) -> jax.Array:
    h, w, c = img_f.shape
    up = jnp.zeros((2 * h, 2 * w, c), img_f.dtype)
    up = up.at[::2, ::2].set(img_f)
    up = _sep_blur(up, _K5 * 2.0)[:out_h, :out_w]
    return up


def pyr_down(img) -> jax.Array:
    """(H, W[, C]) u8|f32 → (ceil(H/2), ceil(W/2)[, C]) same dtype.

    Matches cv::pyrDown's default output size ((H+1)/2, (W+1)/2)."""
    img = jnp.asarray(img)
    squeeze = img.ndim == 2
    if squeeze:
        img = img[:, :, None]
    out = _pyr_down_f(img.astype(jnp.float32))
    if img.dtype == jnp.uint8:
        out = jnp.clip(jnp.floor(out + 0.5), 0, 255).astype(jnp.uint8)
    else:
        out = out.astype(img.dtype)
    return out[:, :, 0] if squeeze else out


def pyr_up(img, out_shape=None) -> jax.Array:
    """(H, W[, C]) → (2H, 2W[, C]) (or `out_shape`), cv::pyrUp semantics."""
    img = jnp.asarray(img)
    squeeze = img.ndim == 2
    if squeeze:
        img = img[:, :, None]
    h, w, _ = img.shape
    out_h, out_w = out_shape if out_shape is not None else (2 * h, 2 * w)
    out = _pyr_up_f(img.astype(jnp.float32), out_h, out_w)
    if img.dtype == jnp.uint8:
        out = jnp.clip(jnp.floor(out + 0.5), 0, 255).astype(jnp.uint8)
    else:
        out = out.astype(img.dtype)
    return out[:, :, 0] if squeeze else out
