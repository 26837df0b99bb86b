"""Pallas TPU kernel: adaptive bilateral filter.

TPU-native counterpart of ``adaptive_bilateral_filter_kernel`` (reference:
src/adaptive_bilateral_filter_impl.cu:7-152).  The window box means are
precomputed by XLA's integral-image op (exact int32 window sums — identical
values to the CUDA kernel's in-tile f32 summation) and enter the kernel as a
per-tile ``center_scaled = center·k² − box`` plane, so the kernel itself is
a single unrolled stencil pass like the bilateral kernel.

The range index uses the exact-integer formulation (see
ops/adaptive_bilateral.py): idx = floor(Σ|Δ·k² − center_scaled| / k²), with
every term exactly representable in f32 and the floor-division made
boundary-safe by a +0.5 offset — deterministic across platforms.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...core.luts import gauss_coeff_f32
from ..bilateral import nonzero_taps
from ..integral_image import window_sums
from ._stencil import (plan_tiles, to_planar_padded, from_planar,
                       halo_in_spec, tile_out_spec, stencil_call)

# measured: the ABF kernel's live-temp footprint is ~5 tile-values per tap;
# (32, 384) tiles compile and give 633 MP/s at 4K vs 557 at (32, 256)
_VALS_PER_TAP = 5.0
_VMEM_TEMP_BUDGET = 13 * 1024 * 1024
MAX_UNROLL_TAPS = 120


def _pick_tile(n_taps: int):
    budget_elems = _VMEM_TEMP_BUDGET / (4.0 * _VALS_PER_TAP * n_taps)
    for th, tw in ((64, 512), (32, 512), (32, 384), (32, 256), (32, 128)):
        if th * tw <= budget_elems:
            return th, tw
    return None


def _make_kernel(plan, taps, ksize, coeff):
    import numpy as np
    th, tw = plan.th, plan.tw
    # NB: np scalars, not jnp — jnp scalars become captured device constants,
    # which pallas kernels reject
    inv_k2 = np.float32(1.0) / np.float32(ksize * ksize)

    def kernel(srck_ref, d_ref, out_ref):
        # srck = src·k² (exact f32 ints ≤ 255·k² ≪ 2²⁴);
        # d = 2·center·k² − box, so |p·k² − (c·k² − box) − c·k²| = |srck − d|
        # per channel — two VPU ops per channel per tap.
        d0, d1, d2 = d_ref[0], d_ref[1], d_ref[2]
        a0 = jnp.zeros((th, tw), jnp.float32)
        a1 = jnp.zeros((th, tw), jnp.float32)
        a2 = jnp.zeros((th, tw), jnp.float32)
        ak = jnp.zeros((th, tw), jnp.float32)
        for dy, dx, ws in taps:
            p0 = srck_ref[0, dy : dy + th, dx : dx + tw]
            p1 = srck_ref[1, dy : dy + th, dx : dx + tw]
            p2 = srck_ref[2, dy : dy + th, dx : dx + tw]
            t = jnp.abs(p0 - d0) + jnp.abs(p1 - d1) + jnp.abs(p2 - d2)
            # exact floor(t/k²): t is an exact integer; +0.5 keeps the
            # reciprocal-multiply rounding away from integer boundaries
            dist = jnp.floor((t + jnp.float32(0.5)) * inv_k2)
            wk = ws * jnp.exp(dist * dist * coeff)
            a0 = a0 + p0 * wk  # accumulates src·k²·wk — folded out below
            a1 = a1 + p1 * wk
            a2 = a2 + p2 * wk
            ak = ak + wk
        # out = Σ src·wk / Σ wk = (Σ src·k²·wk) / (k²·Σ wk)
        inv = jnp.float32(1.0) / ak * inv_k2
        half = jnp.float32(0.5)
        out_ref[0] = jnp.floor(a0 * inv + half).astype(jnp.int32).astype(jnp.uint8)
        out_ref[1] = jnp.floor(a1 * inv + half).astype(jnp.int32).astype(jnp.uint8)
        out_ref[2] = jnp.floor(a2 * inv + half).astype(jnp.int32).astype(jnp.uint8)

    return kernel


def adaptive_bilateral_pallas(src_u8: jax.Array, ksize: int, sigma_space: float,
                              sigma_color: float) -> jax.Array:
    """(H, W, 3) u8 → (H, W, 3) u8."""
    h, w, _ = src_u8.shape
    radius = ksize // 2
    taps = nonzero_taps(ksize, sigma_space)
    tile = _pick_tile(len(taps))
    if tile is None or len(taps) > MAX_UNROLL_TAPS:
        from ..adaptive_bilateral import _abf_math
        return _abf_math(src_u8, ksize, sigma_space, sigma_color)

    plan = plan_tiles(h, w, radius, th=tile[0], tw=tile[1])
    coeff = gauss_coeff_f32(sigma_color)
    k2 = ksize * ksize

    src_i = src_u8.astype(jnp.int32)
    box = window_sums(src_i, radius)
    d_plane = (2 * src_i * k2 - box).astype(jnp.float32)  # exact ints in f32

    src_p = to_planar_padded(src_u8, plan) * jnp.float32(k2)  # src·k², exact
    # pad D (no halo needed — it is read at the output tile only)
    cs_full = jnp.zeros((3, plan.out_rows, plan.out_cols), jnp.float32)
    cs_full = cs_full.at[:, :h, :w].set(d_plane.transpose(2, 0, 1))

    cost = pl.CostEstimate(
        flops=len(taps) * 22 * plan.out_rows * plan.out_cols,
        bytes_accessed=4 * plan.padded_rows * plan.padded_cols * 4,
        transcendentals=len(taps) * plan.out_rows * plan.out_cols,
    )
    out_shape = jax.ShapeDtypeStruct((3, plan.out_rows, plan.out_cols), jnp.uint8)
    cs_spec = pl.BlockSpec((3, plan.th, plan.tw), lambda i, j: (0, i, j),
                           memory_space=pltpu.VMEM)
    out = stencil_call(_make_kernel(plan, taps, ksize, coeff), plan,
                       [halo_in_spec(plan), cs_spec],
                       tile_out_spec(plan), out_shape, cost)(src_p, cs_full)
    return from_planar(out, plan)
