"""Adaptive bilateral filter (Zhang–Allebach style).

TPU-native counterpart of ``adaptive_bilateral_filter`` (reference:
include/cpp/adaptive_bilateral_filter.hpp:13-104) and the CUDA kernel
(reference: src/adaptive_bilateral_filter_impl.cu:7-152).

Per-pixel offset = center − box-mean of the window; range distance =
``| (src − center) − offset |`` summed L1, truncated to int before the range
Gaussian (the truncation is replicated with ``floor`` — required for ±1
parity).  The box sums come from the border-replicated integral image on the
XLA path (like the CPU reference); the Pallas path fuses a first box-mean
pass over the same VMEM tile (like the CUDA kernel,
src/adaptive_bilateral_filter_impl.cu:79-110) — both produce identical sums.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..core.luts import (gauss_coeff_f32, color_table_zero_index,
                         COLOR_TABLE_SIZE_ADAPTIVE)
from ..core.pad import replicate_pad
from . import _validate
from ._dispatch import resolve_impl
from .bilateral import nonzero_taps
from .integral_image import window_sums


def _abf_math(src_u8: jax.Array, ksize: int, sigma_space: float,
              sigma_color: float) -> jax.Array:
    h, w, _ = src_u8.shape
    radius = ksize // 2
    k2 = ksize * ksize
    coeff = gauss_coeff_f32(sigma_color)

    src_f = src_u8.astype(jnp.float32)
    src_i = src_u8.astype(jnp.int32)
    box = window_sums(src_i, radius)  # exact int32 window sums

    # The C++ range index is int(Σ_ch |(p−c) − (c − box/k²)|) with f32
    # rounding at every step (:41-45).  We compute the mathematically exact
    # value instead, scaled by k² so everything stays integer:
    #   idx = floor( Σ_ch |(p−c)·k² − (c·k² − box)| / k² )
    # This is deterministic across platforms (XLA's division-by-constant
    # rounding differs between backends) and diverges from the C++ f32
    # sequence only where that sequence lands within ~1 ulp of an integer
    # boundary — inside the reference's own CPU-vs-CUDA divergence class
    # (the CUDA kernel recomputes the box mean in f32 and already flips the
    # same boundary cases, src/adaptive_bilateral_filter_impl.cu:79-110).
    center_scaled = src_i * k2 - box  # (H, W, 3) exact

    src_p_f = replicate_pad(src_f, radius, radius, radius, radius)
    src_p_i = replicate_pad(src_i, radius, radius, radius, radius)

    # The reference's 1536-entry LUT (f64-built, f32-stored) fades through
    # the f32 subnormal range before hitting exact 0, while in-register f32
    # exp flushes that band to 0.  ABF's center-tap distance is the box-mean
    # offset (unbounded), so with small σ_color ALL taps of a pixel can land
    # in the band and a flushed recompute divides 0/0 where the reference
    # returns a meaningful value.  Scaling every weight by 2⁶⁴ (exact; the
    # sums/sumk ratio is invariant under a power-of-two scale) keeps the
    # band in normal f32 range; distances at/past the table's exact-zero
    # index stay hard 0 (core/luts.py color_table_zero_index).
    cut = jnp.float32(color_table_zero_index(sigma_color,
                                             COLOR_TABLE_SIZE_ADAPTIVE))
    lg_coeff = jnp.float32(float(coeff) * np.log2(np.e))
    sums = jnp.zeros((h, w, 3), jnp.float32)
    sumk = jnp.zeros((h, w), jnp.float32)
    for dy, dx, ws in nonzero_taps(ksize, sigma_space):
        sp_f = src_p_f[dy : dy + h, dx : dx + w]
        sp_i = src_p_i[dy : dy + h, dx : dx + w]
        t = jnp.abs((sp_i - src_i) * k2 - center_scaled).sum(axis=2)
        d = (t // k2).astype(jnp.float32)  # exact truncation (:45)
        wk = jnp.where(d < cut,
                       jnp.exp2(d * d * lg_coeff
                                + jnp.float32(np.log2(ws) + 64.0)),
                       jnp.float32(0.0))
        sums = sums + sp_f * wk[:, :, None]
        sumk = sumk + wk
    out = sums / sumk[:, :, None] + jnp.float32(0.5)
    return jnp.floor(out).astype(jnp.uint8)


@functools.partial(jax.jit, static_argnames=("ksize", "sigma_space", "sigma_color", "impl"))
def _abf_jit(src: jax.Array, ksize: int, sigma_space: float, sigma_color: float,
             impl: str) -> jax.Array:
    if impl == "pallas":
        from .pallas.adaptive_bilateral import adaptive_bilateral_pallas
        return adaptive_bilateral_pallas(src, ksize, sigma_space, sigma_color)
    return _abf_math(src, ksize, sigma_space, sigma_color)


def adaptive_bilateral_filter(src, ksize: int = 9, sigma_space: float = 10.0,
                              sigma_color: float = 30.0, impl: str = "auto") -> jax.Array:
    """(H, W, 3) u8 → (H, W, 3) u8."""
    src = jnp.asarray(src)
    _validate.check_u8_color("src", src)
    _validate.check_ksize(ksize)
    return _abf_jit(src, int(ksize), float(sigma_space), float(sigma_color),
                    resolve_impl(impl))
