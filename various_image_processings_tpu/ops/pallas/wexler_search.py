"""Pallas TPU kernel: Wexler exemplar search with FUSED candidate argmin.

The conv formulation (models/inpainting.py _ring_targets_search) computes
the (ncand, T) energy matrix with one channel-packed conv at ~83% of bf16
MXU peak — but XLA materializes that matrix in HBM and the argmin reads it
back: at 700×402/T=1024 that is ~2 GB of HBM traffic per dispatch, the
dominant fixed cost of the search (reference scan being replaced:
include/cpp/wexler_inpainting.hpp:220-269).

This kernel never materializes the energy matrix: a (16-row × 128-col)
candidate block's energies live in VMEM, are reduced to a per-target
(min, first-raster-flat-index) pair on the spot, and blocks combine by
lexicographic (energy, flat index) min INSIDE the kernel across grid
steps (all (i, j) steps revisit one (1, 1, T) output block that stays
resident in VMEM — the Pallas reduction-revisit pattern; Mosaic rejects
a (1, 1, T) block over an (nh, nw, T) array because the middle block dim
is neither 8-divisible nor the full dim, which is how round 4's
per-block-minima layout died on hardware).  The combine is
order-independent and identical to the conv path's first-minimum raster
tie-break (the reference's ascending y/x scan); only the final (1, 1, T)
pair ever goes to HBM.

Candidate VALIDITY (window must not touch the hole) rides the contraction:
the 117 packed channels are padded to 128 and channel 117 carries a 1e30
penalty at each invalid candidate's (row, col), with a matching all-ones
filter row at ky=0 — invalid candidates surface as energies ≥ 1e29, mapped
back to +inf outside.  Valid candidates see exact zeros there, so the
energies are bit-identical to an unpadded contraction, and the kernel body
is nothing but dots and min/argmin updates.

Selected by ``models/inpainting.py _search_impl`` (env VIP_WEXLER_SEARCH),
DEFAULT on TPU since the round-5 on-chip adjudication
(benchmarks/validate_wexler_search.py, v5e 2026-08-19): picks equal to the
conv path at T=256/1024, dispatch 4.49→1.67 ms (T=256) and 18.98→6.96 ms
(T=1024), end-to-end mosaic_dog 0.52→0.44 s with a bit-identical fill.
Divergence class (possible in principle, not observed): bit-level energy
sums can differ from the conv path by f32 summation order (both are
exact-product bf16→f32 schemes; sums > 2²⁴ round), so picks may differ on
exact-tie candidates — the same class as conv-vs-reference (PARITY.md D4).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...core.pad import cdiv
from .._dispatch import pallas_interpret

ROW_BLK = 16    # candidate rows per block (bf16 sublane tile alignment)
COL_BLK = 128   # candidate cols per block (lane tile)
T_BLK = 256     # targets per block (lane dim of the per-block outputs)
K_PAD = 128     # packed channels 117 → 128 (lane-aligned contraction)
_BIG_I = np.int32(2**30)
_PENALTY = np.float32(1e30)   # invalid-candidate energy (valid ≤ ~3.3e7)


def _make_kernel(window: int, n_cx: int):
    k = window

    def kernel(p_ref, f_ref, eout_ref, iout_ref):
        i = pl.program_id(1)
        j = pl.program_id(2)

        # every (i, j) grid step revisits the SAME output block (index map
        # depends only on the target-block id): initialize it on the first
        # visit, then fold this block's minima in lexicographically
        @pl.when((i == 0) & (j == 0))
        def _init():
            eout_ref[...] = jnp.full(eout_ref.shape, _PENALTY, jnp.float32)
            iout_ref[...] = jnp.full(iout_ref.shape, _BIG_I, jnp.int32)

        # global raster flat index of candidate (row ROW_BLK·i+by, col
        # COL_BLK·j+x) in the TRUE candidate grid — the tie-break key
        base = (i * ROW_BLK) * n_cx + j * COL_BLK
        col_iota = jax.lax.broadcasted_iota(jnp.int32, (COL_BLK, T_BLK), 0)

        run_e = jnp.full((1, T_BLK), _PENALTY, jnp.float32)
        run_i = jnp.full((1, T_BLK), _BIG_I, jnp.int32)
        for by in range(ROW_BLK):
            acc = jnp.zeros((COL_BLK, T_BLK), jnp.float32)
            for ky in range(k):
                a = p_ref[by + ky]          # (COL_BLK, K_PAD) bf16
                f = f_ref[ky]               # (K_PAD, T_BLK) bf16
                acc = acc + jax.lax.dot_general(
                    a, f, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
            rmin = jnp.min(acc, axis=0, keepdims=True)          # (1, T)
            idx = jnp.where(acc == rmin, col_iota + (base + by * n_cx),
                            _BIG_I)
            rarg = jnp.min(idx, axis=0, keepdims=True)          # (1, T)
            better = (rmin < run_e) | ((rmin == run_e) & (rarg < run_i))
            run_e = jnp.where(better, rmin, run_e)
            run_i = jnp.where(better, rarg, run_i)
        cur_e = eout_ref[0, 0, :]
        cur_i = iout_ref[0, 0, :]
        better = (run_e[0] < cur_e) | ((run_e[0] == cur_e)
                                       & (run_i[0] < cur_i))
        eout_ref[0, 0, :] = jnp.where(better, run_e[0], cur_e)
        iout_ref[0, 0, :] = jnp.where(better, run_i[0], cur_i)

    return kernel


@functools.partial(jax.jit, static_argnames=("window", "height", "width"))
def search_min_pallas(p117, f13, valid, window: int, height: int, width: int):
    """Fused candidate scan: per-target (min energy, argmin flat index).

    p117: (H, n_cx, 117) bf16 kx-packed candidate planes
    (models/inpainting.py _build_p117); f13: (k, k·9, T) bf16 per-target
    filters; valid: (n_cy, n_cx) bool — candidate windows not touching the
    hole.  Returns (emin (T,) f32 with +inf where no candidate,
    flat_idx (T,) i32 raster index into the true candidate grid,
    clamped to 0 when emin is inf).
    """
    k = window
    kc = f13.shape[1]              # 117 packed channels
    n_cy = height - (k - 1)
    n_cx = width - (k - 1)
    t = f13.shape[2]
    nh = cdiv(n_cy, ROW_BLK)
    nw = cdiv(n_cx, COL_BLK)
    nt = cdiv(t, T_BLK)
    tp = nt * T_BLK

    # pad rows so every block's k-row window exists, cols to the block
    # grid, channels 117 → K_PAD with channel `kc` carrying the validity
    # penalty (1e30 at invalid/padded candidates, exact 0 at valid ones),
    # targets to T_BLK (padded targets see penalty-only filters)
    hp = nh * ROW_BLK + (k - 1)
    wp = nw * COL_BLK
    p117p = jnp.pad(p117, [(0, hp - height), (0, wp - n_cx),
                           (0, K_PAD - kc)])
    penalty = jnp.full((hp, wp), _PENALTY, jnp.bfloat16)
    penalty = jax.lax.dynamic_update_slice(
        penalty,
        jnp.where(valid, jnp.bfloat16(0.0), jnp.bfloat16(_PENALTY)),
        (0, 0))
    p117p = p117p.at[:, :, kc].set(penalty)
    f13p = jnp.pad(f13, [(0, 0), (0, K_PAD - kc), (0, tp - t)])
    # the ky=0 filter row of the penalty channel is 1 for every target, so
    # each candidate accumulates its own (row, col) penalty exactly once
    f13p = f13p.at[0, kc, :].set(jnp.bfloat16(1.0))

    grid = (nt, nh, nw)
    blk_rows = ROW_BLK + (k - 1)
    cost = pl.CostEstimate(
        flops=2 * k * K_PAD * tp * nh * ROW_BLK * nw * COL_BLK,
        bytes_accessed=nt * hp * wp * K_PAD * 2 + tp * 8,
        transcendentals=0,
    )
    e_blk, i_blk = pl.pallas_call(
        _make_kernel(k, n_cx),
        grid=grid,
        in_specs=[
            pl.BlockSpec((pl.Element(blk_rows), pl.Element(COL_BLK),
                          pl.Element(K_PAD)),
                         lambda tb, i, j: (i * ROW_BLK, j * COL_BLK, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, K_PAD, T_BLK),
                         lambda tb, i, j: (0, 0, tb),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            # one (1, 1, T_BLK) block per target-block, revisited by every
            # (i, j) step — last two dims (1, T_BLK) match (1, tp) under
            # Mosaic's (8, 128)-divisible-or-full rule
            pl.BlockSpec((1, 1, T_BLK), lambda tb, i, j: (0, 0, tb),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, T_BLK), lambda tb, i, j: (0, 0, tb),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((1, 1, tp), jnp.float32),
            jax.ShapeDtypeStruct((1, 1, tp), jnp.int32),
        ],
        interpret=pallas_interpret(),
        cost_estimate=cost,
    )(p117p, f13p)

    # Energies ≥ 1e29 are penalty hits (no valid candidate) → +inf.
    emin = e_blk[0, 0, :t]
    idx = i_blk[0, 0, :t]
    emin = jnp.where(emin >= np.float32(1e29), jnp.float32(np.inf), emin)
    return emin, jnp.clip(idx, 0, n_cy * n_cx - 1)
