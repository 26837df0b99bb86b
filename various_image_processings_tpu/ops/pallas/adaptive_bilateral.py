"""Pallas TPU kernel: adaptive bilateral filter.

TPU-native counterpart of ``adaptive_bilateral_filter_kernel`` (reference:
src/adaptive_bilateral_filter_impl.cu:7-152).  Like the CUDA kernel — and
unlike the reference's CPU integral-image path — the window box means are
computed IN the tile from the same VMEM halo block the stencil reads
(the CUDA kernel's first smem pass, :79-93), so the op is a single Pallas
pass over one input stream: no XLA integral images, no second per-tile
plane, half the HBM traffic.  The in-tile box sum is separable (k row adds
+ k column adds instead of k² adds), exact in f32 (all intermediates are
integers < 2²⁴).

The range index uses the exact-integer formulation (see
ops/adaptive_bilateral.py): idx = floor(Σ_c |p·k² + (box − 2c·k²)| / k²),
with every term exactly representable in f32 and the floor-division made
boundary-safe by a +0.5 offset — deterministic across platforms.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from ...core.luts import (gauss_coeff_f32, color_table_zero_index,
                          COLOR_TABLE_SIZE_ADAPTIVE)
from ..bilateral import nonzero_taps
from ._stencil import (plan_tiles, to_planar_padded, from_planar,
                       halo_in_spec, tile_out_spec, stencil_call)

# compile-limit estimate: (32,512) at k=9 (69 taps) compiles on hardware,
# so ~2.9 live tile-values per tap bounds what Mosaic actually materializes
_VALS_PER_TAP = 2.9
_VMEM_TEMP_BUDGET = 13 * 1024 * 1024
MAX_UNROLL_TAPS = 120


def _pick_tile(n_taps: int, width: int):
    """Width-aware tile choice, measured on hardware (k=9, chain-slope):
    whole-width tiles kill the halo/alignment padding waste on narrow
    images (lenna 512²: (32,512) → 931 MP/s vs ~360 with a 384 tile that
    pads 512→768 columns); at 4K (32,640) measures 962 MP/s vs ~857 for
    (32,384/512) (same-process interleaved)."""
    from ...core.pad import round_up
    budget_elems = _VMEM_TEMP_BUDGET / (4.0 * _VALS_PER_TAP * n_taps)
    w128 = round_up(width, 128)
    cands = ([(32, w128)] if w128 <= 512 else []) + [(32, 640), (32, 512),
                                                     (32, 384), (32, 256),
                                                     (32, 128)]
    for th, tw in cands:
        if th * tw <= budget_elems:
            return th, tw
    return None


def _make_kernel(plan, taps, ksize, coeff, zero_cut):
    import numpy as np
    th, tw, r = plan.th, plan.tw, plan.radius
    # NB: np scalars, not jnp — jnp scalars become captured device constants,
    # which pallas kernels reject
    k2f = np.float32(ksize * ksize)
    two_k2 = np.float32(2 * ksize * ksize)
    inv_k2 = np.float32(1.0) / np.float32(ksize * ksize)
    # +0.5 boundary guard folded into the reciprocal-multiply as an fma
    # addend: floor(t·inv_k2 + 0.5·inv_k2) — one op instead of add+mul.
    # Exact: t is an exact integer ≤ 510·k², the fma rounds once, and the
    # total error ~v·2⁻²³ stays far inside the 0.5/k² boundary margin.
    half_inv = np.float32(0.5) * inv_k2
    lg_coeff = np.float32(coeff) * np.float32(np.log2(np.e))
    # the exact-zero cutoff (D2b) costs cmp+select per tap; dist ≤ 3·510
    # always, so a zero index past 1530 makes the cut unreachable and the
    # two ops drop at trace time (σ_color ≳ 107)
    MAX_DIST = 3 * 510
    cut = np.float32(zero_cut) if zero_cut <= MAX_DIST else None
    bh = th + 2 * r  # rows covered by the horizontal box strips

    def kernel(src_ref, out_ref):
        # in-tile separable box sums (exact f32 integers ≤ 255·k² ≪ 2²⁴) —
        # the CUDA kernel's first smem pass, done in k+k adds per channel
        def box(c):
            hs = src_ref[c, 0:bh, 0:tw]
            for dx in range(1, ksize):
                hs = hs + src_ref[c, 0:bh, dx : dx + tw]
            b = hs[0:th, :]
            for dy in range(1, ksize):
                b = b + hs[dy : dy + th, :]
            return b

        c0 = src_ref[0, r : r + th, r : r + tw]
        c1 = src_ref[1, r : r + th, r : r + tw]
        c2 = src_ref[2, r : r + th, r : r + tw]
        # e = box − 2c·k²  ⇒  per tap  |Δ·k² − (c·k² − box)| = |p·k² + e|
        e0 = box(0) - c0 * two_k2
        e1 = box(1) - c1 * two_k2
        e2 = box(2) - c2 * two_k2

        a0 = jnp.zeros((th, tw), jnp.float32)
        a1 = jnp.zeros((th, tw), jnp.float32)
        a2 = jnp.zeros((th, tw), jnp.float32)
        ak = jnp.zeros((th, tw), jnp.float32)
        for dy, dx, ws in taps:
            p0 = src_ref[0, dy : dy + th, dx : dx + tw]
            p1 = src_ref[1, dy : dy + th, dx : dx + tw]
            p2 = src_ref[2, dy : dy + th, dx : dx + tw]
            t = (jnp.abs(p0 * k2f + e0) + jnp.abs(p1 * k2f + e1)
                 + jnp.abs(p2 * k2f + e2))
            # exact floor(t/k²): t is an exact integer; the folded-in
            # half_inv keeps the rounding away from integer boundaries
            dist = jnp.floor(t * inv_k2 + half_inv)
            # ws·exp(d²·coeff)·2⁶⁴ folded into one exp2 fma (≤2 ulp vs the
            # factored form — inside the ±1 u8 contract; see
            # ops/pallas/bilateral.py _make_kernel).  The 2⁶⁴ bias keeps the
            # reference LUT's f32-subnormal weight band in normal range (the
            # a/ak ratio is bit-invariant under a power-of-two scale) and
            # the cut select pins the LUT's exact-zero region to hard 0 —
            # see ops/adaptive_bilateral.py and core/luts.py
            # color_table_zero_index for the full story.
            wk = jnp.exp2(dist * dist * lg_coeff
                          + np.float32(np.log2(ws) + 64.0))
            if cut is not None:
                wk = jnp.where(dist < cut, wk, np.float32(0.0))
            a0 = a0 + p0 * wk
            a1 = a1 + p1 * wk
            a2 = a2 + p2 * wk
            ak = ak + wk
        inv = jnp.float32(1.0) / ak
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
    tile = _pick_tile(len(taps), w)
    if tile is None or len(taps) > MAX_UNROLL_TAPS:
        from ..adaptive_bilateral import _abf_math
        return _abf_math(src_u8, ksize, sigma_space, sigma_color)

    plan = plan_tiles(h, w, radius, th=tile[0], tw=tile[1])
    coeff = gauss_coeff_f32(sigma_color)
    zero_cut = color_table_zero_index(sigma_color, COLOR_TABLE_SIZE_ADAPTIVE)

    src_p = to_planar_padded(src_u8, plan)
    cost = pl.CostEstimate(
        flops=(len(taps) * 21 + 6 * ksize) * plan.out_rows * plan.out_cols,
        bytes_accessed=2 * 3 * plan.padded_rows * plan.padded_cols * 4,
        transcendentals=len(taps) * plan.out_rows * plan.out_cols,
    )
    out_shape = jax.ShapeDtypeStruct((3, plan.out_rows, plan.out_cols), jnp.uint8)
    out = stencil_call(_make_kernel(plan, taps, ksize, coeff, zero_cut), plan,
                       [halo_in_spec(plan)],
                       tile_out_spec(plan), out_shape, cost)(src_p)
    return from_planar(out, plan)
