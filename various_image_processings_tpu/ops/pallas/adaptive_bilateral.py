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

The range index is a bit-exact twin of the C++ f32 sequence ON HOSTS
WITH AN IEEE f32 DIVIDER (include/cpp/adaptive_bilateral_filter.hpp:41-45,
:54-56): offset = c − fl(box/k²) per pixel, per tap |((p−c) − offset)|
L1-summed in the C++ order and truncated.  Every op is IEEE-RN f32 except
— on the TPU itself — the box/k² division: the chip has no IEEE divider,
and the measured envelope (PARITY.md D2c, benchmarks/diag_tpu_division.py
2026-08-19) is quotients ≤2 ulp off IEEE-RN, XLA and Mosaic bit-identical
to each other, composed-index flips ≤2e-3 with |Δidx| ≤ 1 — end-to-end
inside the documented u8 envelopes (benchmarks/hw_parity.py asserts
exactly these bounds on-chip).  See ops/adaptive_bilateral.py for why the
cheaper exact-integer index was abandoned (truncation-boundary flips ×
steep small-σ_color Gaussians).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from ...core.luts import gauss_coeff_f32
from ..bilateral import nonzero_taps
from ._stencil import (plan_tiles, to_planar_padded, from_planar,
                       halo_in_spec, tile_out_spec, stencil_call,
                       consts_in_spec)

# compile-limit estimate, measured on hardware (2026-08-19): the D2/D2b
# bit-exact-twin kernel's (32,640)×49-tap program allocates 16.49 MiB of
# scoped VMEM (4.31 live tile-values/tap — the double-rounding temps stay
# live), 0.5 MiB over Mosaic's 16 MiB stack limit; (32,512)×49 (13.8 MiB
# = 4.51 vals/tap, the WORST measured per-tap ratio) compiles and passes
# parity.  Calibrating the linear model to that worst ratio guarantees
# every tile the 15.5 MiB budget admits stays under the 16 MiB limit for
# the whole reachable tap range (at 4.35 a 45-tap case could admit
# (32,640) and land within rounding error of the limit — ADVICE r4).
_VALS_PER_TAP = 4.51
_VMEM_TEMP_BUDGET = int(15.5 * 1024 * 1024)
MAX_UNROLL_TAPS = 120


def _pick_tile(n_taps: int, width: int):
    """Width-aware tile choice, measured on hardware (k=9, chain-slope):
    whole-width tiles kill the halo/alignment padding waste on narrow
    images (lenna 512²: (32,512) → 931 MP/s vs ~360 with a 384 tile that
    pads 512→768 columns).  NB the 4K k=9 numbers predate the D2/D2b
    VMEM budget: (32,640) measured 962 MP/s vs ~857 for (32,384/512) on
    the pre-rework 21-op kernel, but at 49 taps × 24 ops the budget now
    admits at most (32,512) — benchmarks/revalidate_abf.py records the
    throughput of the tile actually selected."""
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


def _make_kernel(plan, taps, ksize, coeff):
    import numpy as np
    th, tw, r = plan.th, plan.tw, plan.radius
    # NB: np scalars, not jnp — jnp scalars become captured device constants,
    # which pallas kernels reject
    lg_coeff = np.float32(coeff) * np.float32(np.log2(np.e))
    bias = np.float32(64.0)
    bh = th + 2 * r  # rows covered by the horizontal box strips

    def kernel(src_ref, consts_ref, out_ref):
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
        # Per-pixel offset c − box/k² with the C++'s f32 rounding sequence
        # (include/cpp/adaptive_bilateral_filter.hpp:54-56).  TRUE division
        # only — the COMPILE-TIME reciprocal-multiply strength-reduction
        # (1 ulp off, flips u8 parity — CLAUDE.md) must stay blocked; the
        # HARDWARE itself then evaluates the divide within the measured
        # ≤2-ulp D2c envelope (no IEEE divider on TPU; bit-exact on
        # IEEE-divider hosts — hw_parity.py asserts the on-chip bounds).
        # The constants arrive as an SMEM OPERAND (barriered in the
        # wrapper): as runtime data neither XLA nor Mosaic can
        # strength-reduce the divide into a reciprocal-multiply (literal
        # divisors measured 1-ulp-off on XLA-CPU) or fold the
        # subnormal-grid add-subtract pairs below ((v + C) − C → v for
        # literal C, which would silently delete the grid rounding).
        # jax.lax.optimization_barrier INSIDE the kernel is not an option:
        # Mosaic has no lowering rule for it (NotImplementedError at
        # jax.export time — tests/test_tpu_lowering.py pins this).
        kb = consts_ref[0, 0]
        subn_cb = consts_ref[0, 1]
        subn_cb128 = consts_ref[0, 2]
        o0 = c0 - box(0) / kb
        o1 = c1 - box(1) / kb
        o2 = c2 - box(2) / kb

        a0 = jnp.zeros((th, tw), jnp.float32)
        a1 = jnp.zeros((th, tw), jnp.float32)
        a2 = jnp.zeros((th, tw), jnp.float32)
        ak = jnp.zeros((th, tw), jnp.float32)
        for dy, dx, ws in taps:
            p0 = src_ref[0, dy : dy + th, dx : dx + tw]
            p1 = src_ref[1, dy : dy + th, dx : dx + tw]
            p2 = src_ref[2, dy : dy + th, dx : dx + tw]
            # BIT-EXACT twin of the C++ index sequence (:41-45): (p−c) is
            # exact (f32 integers ≤ 255), the −offset sub and the L1 adds
            # round once each in the C++ order.  An earlier revision used
            # an exact-integer |p·k²+e| form instead — cheaper by 2 ops/tap
            # but its truncation-boundary flips change single weights ~4×
            # at small σ_color (tens of u8; round-4 fuzz) — see
            # ops/adaptive_bilateral.py.
            t = (jnp.abs((p0 - c0) - o0) + jnp.abs((p1 - c1) - o1)
                 ) + jnp.abs((p2 - c2) - o2)
            dist = jnp.floor(t)  # static_cast<int>, t ≥ 0
            # DOUBLE-rounded weight twin (D2b, see ops/adaptive_bilateral.py
            # for the full derivation): the reference's f64 exp rounds to
            # the stored f32 table entry — subnormal in the deep band —
            # and the ws·table[idx] product rounds again.  Everything rides
            # a 2⁶⁴ bias (ratio-invariant, keeps the band in normal f32
            # range); each add-subtract pair rounds values below 2⁻⁶² to
            # the reference's 2⁻⁸⁵-biased subnormal grid (identity above,
            # hard 0 below half a quantum — the same flush boundary).
            e = jnp.exp2(dist * dist * lg_coeff + bias)
            e = (e + subn_cb) - subn_cb
            if ws >= 2.0 ** -126:
                wk = np.float32(ws) * e
                wk = (wk + subn_cb) - subn_cb
            else:
                # subnormal space weight: XLA/TPU flush subnormal OPERANDS
                # (DAZ) — ride a 2¹²⁸ bias for this tap (grid 2⁻²¹, C=4.0)
                # and rescale; see ops/adaptive_bilateral.py
                wk = np.float32(float(ws) * 2.0 ** 64) * e
                wk = (wk + subn_cb128) - subn_cb128
                wk = wk * np.float32(2.0 ** -64)
            a0 = a0 + p0 * wk
            a1 = a1 + p1 * wk
            a2 = a2 + p2 * wk
            ak = ak + wk
        inv = jnp.float32(1.0) / ak
        half = jnp.float32(0.5)
        # all-zero window ⇒ reference divides 0/0 and its NaN casts to u8 0
        # (ops/adaptive_bilateral.py) — replicate with a per-pixel select
        zero = ak == np.float32(0.0)
        z = np.float32(0.0)
        o0 = jnp.where(zero, z, jnp.floor(a0 * inv + half))
        o1 = jnp.where(zero, z, jnp.floor(a1 * inv + half))
        o2 = jnp.where(zero, z, jnp.floor(a2 * inv + half))
        out_ref[0] = o0.astype(jnp.int32).astype(jnp.uint8)
        out_ref[1] = o1.astype(jnp.int32).astype(jnp.uint8)
        out_ref[2] = o2.astype(jnp.int32).astype(jnp.uint8)

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

    src_p = to_planar_padded(src_u8, plan)
    # opaque-constant operand: k², the 2⁻⁶² subnormal-grid constant and the
    # 2¹²⁸-band grid constant ride SMEM so no compiler stage ever sees them
    # as literals (see the kernel comment; barrier here is XLA HLO — fully
    # supported — and keeps XLA itself from constant-folding the operand)
    consts = jax.lax.optimization_barrier(
        jnp.array([[ksize * ksize, 2.0 ** -62, 4.0]], jnp.float32))
    cost = pl.CostEstimate(
        flops=(len(taps) * 26 + 6 * ksize) * plan.out_rows * plan.out_cols,
        bytes_accessed=2 * 3 * plan.padded_rows * plan.padded_cols * 4,
        transcendentals=len(taps) * plan.out_rows * plan.out_cols,
    )
    out_shape = jax.ShapeDtypeStruct((3, plan.out_rows, plan.out_cols), jnp.uint8)
    out = stencil_call(_make_kernel(plan, taps, ksize, coeff), plan,
                       [halo_in_spec(plan), consts_in_spec()],
                       tile_out_spec(plan), out_shape, cost)(src_p, consts)
    return from_planar(out, plan)
