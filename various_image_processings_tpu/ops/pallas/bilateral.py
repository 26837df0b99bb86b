"""Pallas TPU kernel: bilateral / joint bilateral filter.

TPU-native redesign of the CUDA kernels ``bilateral_filter_kernel`` /
``joint_bilateral_filter_kernel`` (reference: src/bilateral_filter_impl.cu:7-96,
:98-202).  Differences from the CUDA design, on purpose:

- the shared-memory halo tile becomes a VMEM halo block (`pl.Element`
  window, offsets 8/128-aligned) with Mosaic pipelining the HBM→VMEM
  copies across grid steps;
- the 768-entry range-LUT gather becomes an in-register ``exp(d²·coeff)``
  recompute — gathers serialize on the VPU, exp is one transcendental per
  tap (within 1 ulp of the f64-built table, see tests/test_luts.py);
- taps outside the inscribed circle (zero spatial weight) are dropped at
  trace time instead of multiplied by zero;
- the tap loop is fully unrolled with *static* window slices (constant
  lane/sublane offsets — Mosaic cannot prove alignment for dynamic vector
  loads).  Mosaic materializes every unrolled temporary, so the tile size
  is scaled down with the tap count to stay inside the ~16 MB VMEM budget
  (measured ≈4.5 live (th·tw) f32 values per tap).  Beyond
  ``MAX_UNROLL_TAPS`` even the minimum tile overflows and the op falls back
  to the fused-XLA formulation (still sub-linear in taps thanks to XLA
  fusion).

Measured on TPU v5e: 4K bilateral k=9 ≈ 840 MP/s (unrolled pallas) vs
365 MP/s (XLA) — both ≥ the reference's parity tolerance vs
cv::bilateralFilter (±1 u8).

Accumulation is f32 in the reference's (ky, kx) tap order; the final store
reproduces ``u8(sum/sumk + 0.5f)`` truncation.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from ...core.luts import gauss_coeff_f32
from ..bilateral import nonzero_taps
from ._stencil import (plan_tiles, to_planar_padded, from_planar,
                       halo_in_spec, tile_out_spec, stencil_call)

# beyond this tap count even a (32, 128) tile overflows the VMEM temp budget
MAX_UNROLL_TAPS = 120

# ~4.5 live f32 tile-values per unrolled tap (measured via Mosaic's scoped
# vmem estimates), self variant; the joint variant doubles the slice streams
_VALS_PER_TAP_SELF = 5.0
_VALS_PER_TAP_JOINT = 8.0
# k=9 self at (32, 384) measures 12.05 MB scoped and compiles with ~840 MP/s
# at 4K — 13 MB leaves ~3 MB for in/out blocks inside the 16 MB VMEM
_VMEM_TEMP_BUDGET = 13 * 1024 * 1024


def pick_tile(n_taps: int, joint: bool):
    """Largest (th, tw) whose unrolled temporaries fit the VMEM budget."""
    per_tap = _VALS_PER_TAP_JOINT if joint else _VALS_PER_TAP_SELF
    budget_elems = _VMEM_TEMP_BUDGET / (4.0 * per_tap * n_taps)
    for th, tw in ((64, 512), (32, 512), (32, 384), (32, 256), (32, 128)):
        if th * tw <= budget_elems:
            return th, tw
    return None


def _make_kernel(plan, taps, coeff, joint: bool):
    th, tw, r = plan.th, plan.tw, plan.radius

    def compute(src_ref, guide_ref, out_ref):
        gc0 = guide_ref[0, r : r + th, r : r + tw]
        gc1 = guide_ref[1, r : r + th, r : r + tw]
        gc2 = guide_ref[2, r : r + th, r : r + tw]
        a0 = jnp.zeros((th, tw), jnp.float32)
        a1 = jnp.zeros((th, tw), jnp.float32)
        a2 = jnp.zeros((th, tw), jnp.float32)
        ak = jnp.zeros((th, tw), jnp.float32)
        for dy, dx, ws in taps:
            g0 = guide_ref[0, dy : dy + th, dx : dx + tw]
            g1 = guide_ref[1, dy : dy + th, dx : dx + tw]
            g2 = guide_ref[2, dy : dy + th, dx : dx + tw]
            dist = jnp.abs(g0 - gc0) + jnp.abs(g1 - gc1) + jnp.abs(g2 - gc2)
            wk = ws * jnp.exp(dist * dist * coeff)
            if joint:
                s0 = src_ref[0, dy : dy + th, dx : dx + tw]
                s1 = src_ref[1, dy : dy + th, dx : dx + tw]
                s2 = src_ref[2, dy : dy + th, dx : dx + tw]
            else:
                s0, s1, s2 = g0, g1, g2
            a0 = a0 + s0 * wk
            a1 = a1 + s1 * wk
            a2 = a2 + s2 * wk
            ak = ak + wk
        inv = jnp.float32(1.0) / ak
        half = jnp.float32(0.5)
        # Mosaic has no direct f32→u8 cast; go through int32.
        out_ref[0] = jnp.floor(a0 * inv + half).astype(jnp.int32).astype(jnp.uint8)
        out_ref[1] = jnp.floor(a1 * inv + half).astype(jnp.int32).astype(jnp.uint8)
        out_ref[2] = jnp.floor(a2 * inv + half).astype(jnp.int32).astype(jnp.uint8)

    if joint:
        return compute

    def compute_self(src_ref, out_ref):
        return compute(src_ref, src_ref, out_ref)

    return compute_self


def _run(src_u8, guide_u8, ksize, sigma_space, sigma_color, joint: bool):
    h, w, _ = src_u8.shape
    radius = ksize // 2
    taps = nonzero_taps(ksize, sigma_space)
    tile = pick_tile(len(taps), joint)
    if tile is None or len(taps) > MAX_UNROLL_TAPS:
        # large stencil: fall back to the fused-XLA formulation
        from ..bilateral import _bilateral_math
        g = guide_u8 if joint else src_u8
        return _bilateral_math(src_u8.astype(jnp.float32),
                               g.astype(jnp.float32),
                               ksize, sigma_space, sigma_color)

    plan = plan_tiles(h, w, radius, th=tile[0], tw=tile[1])
    coeff = gauss_coeff_f32(sigma_color)
    src_p = to_planar_padded(src_u8, plan)
    cost = pl.CostEstimate(
        flops=len(taps) * 14 * plan.out_rows * plan.out_cols,
        bytes_accessed=(2 if joint else 1) * 3 * plan.padded_rows * plan.padded_cols * 4,
        transcendentals=len(taps) * plan.out_rows * plan.out_cols,
    )
    kernel = _make_kernel(plan, taps, coeff, joint)
    out_shape = jax.ShapeDtypeStruct((3, plan.out_rows, plan.out_cols), jnp.uint8)
    if joint:
        guide_p = to_planar_padded(guide_u8, plan)
        out = stencil_call(kernel, plan,
                           [halo_in_spec(plan), halo_in_spec(plan)],
                           tile_out_spec(plan), out_shape, cost)(src_p, guide_p)
    else:
        out = stencil_call(kernel, plan, [halo_in_spec(plan)],
                           tile_out_spec(plan), out_shape, cost)(src_p)
    return from_planar(out, plan)


def joint_bilateral_pallas(src_u8: jax.Array, guide_u8: jax.Array, ksize: int,
                           sigma_space: float, sigma_color: float) -> jax.Array:
    """(H, W, 3) u8 src + guide → (H, W, 3) u8."""
    return _run(src_u8, guide_u8, ksize, sigma_space, sigma_color, joint=True)


def bilateral_pallas(src_u8: jax.Array, ksize: int, sigma_space: float,
                     sigma_color: float) -> jax.Array:
    """(H, W, 3) u8 → (H, W, 3) u8 (range kernel keyed off src itself;
    single VMEM stream, no duplicated guide traffic)."""
    return _run(src_u8, None, ksize, sigma_space, sigma_color, joint=False)
