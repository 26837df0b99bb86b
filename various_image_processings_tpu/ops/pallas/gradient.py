"""Pallas TPU kernel: gradient magnitude.

TPU-native counterpart of the CUDA ``compute_gradient_kernel_core``
(reference: src/gradient_impl.cu:8-66): replicate-clamped central
differences, squared-summed over channels, sqrt.  The 3×3 stencil has only
4 distinct taps, so static slices of the halo block suffice (no roll loop).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ._stencil import (plan_tiles, to_planar_padded, pad_planar, halo_in_spec,
                       stencil_call)


def _make_kernel(plan, channels, in_dtype):
    th, tw = plan.th, plan.tw

    def kernel(x_ref, o_ref):
        # The kernel is VPU-cast-bound, not memory-bound: the static audit is
        # ~12 vector ops per pixel-channel + sqrt.  For u8 inputs, subtract
        # in int32 and cast the DIFFERENCE once (i32 sub → f32 is exact for
        # u8-range ints) — one f32 cast per diff instead of two per tap.
        total = jnp.zeros((th, tw), jnp.float32)
        for c in range(channels):
            if in_dtype == jnp.float32:
                up = x_ref[c, 0:th, 1 : 1 + tw]
                down = x_ref[c, 2 : 2 + th, 1 : 1 + tw]
                left = x_ref[c, 1 : 1 + th, 0:tw]
                right = x_ref[c, 1 : 1 + th, 2 : 2 + tw]
                hd = right - left
                vd = down - up
            else:
                up = x_ref[c, 0:th, 1 : 1 + tw].astype(jnp.int32)
                down = x_ref[c, 2 : 2 + th, 1 : 1 + tw].astype(jnp.int32)
                left = x_ref[c, 1 : 1 + th, 0:tw].astype(jnp.int32)
                right = x_ref[c, 1 : 1 + th, 2 : 2 + tw].astype(jnp.int32)
                hd = (right - left).astype(jnp.float32)
                vd = (down - up).astype(jnp.float32)
            total = total + (hd * hd + vd * vd)
        o_ref[0] = jnp.sqrt(total)

    return kernel


def gradient_pallas(src: jax.Array, planar: bool = False) -> jax.Array:
    """(H, W, C) u8|f32 → (H, W) f32 gradient magnitude.  u8 inputs stay u8
    through HBM→VMEM (4× less input traffic than pre-converting to f32 —
    the 3×3 stencil is memory-bound) and convert in-register.
    planar=True: input is (C, H, W) (no HWC relayout — BTF pipeline)."""
    if planar:
        channels, h, w = src.shape
    else:
        h, w, channels = src.shape
    in_dtype = src.dtype
    # (128, 2048) measured ~1.5× faster than (128, 1024) on 4K v5e (the
    # 3×3 halo DMA amortizes over wider blocks); (256, 2048) OOMs the
    # 16 MB scoped vmem (~4 f32 temps per channel per tile element).
    # Absolute cost: the full jitted 4K step (incl. HWC glue) is ~0.15 ms
    # ≈ 55 GP/s (benchmarks/diag_gradient.py) — ~58 MB of true traffic at
    # ~385 GB/s, near the measured achievable copy bandwidth.  (The earlier
    # 0.44 ms version cast every tap u8→i32→f32; subtracting in i32 and
    # casting only the differences was a 2.9× win.)
    plan = plan_tiles(h, w, radius=1, th=128, tw=2048)
    prep = pad_planar if planar else to_planar_padded
    src_p = prep(src, plan, dtype=in_dtype)
    out_shape = jax.ShapeDtypeStruct((1, plan.out_rows, plan.out_cols), jnp.float32)
    isz = jnp.dtype(in_dtype).itemsize
    cost = pl.CostEstimate(
        flops=channels * 6 * plan.out_rows * plan.out_cols,
        bytes_accessed=channels * plan.padded_rows * plan.padded_cols * isz
        + plan.out_rows * plan.out_cols * 4,
        transcendentals=plan.out_rows * plan.out_cols,
    )
    out = stencil_call(_make_kernel(plan, channels, in_dtype), plan,
                       [halo_in_spec(plan, channels)],
                       pl.BlockSpec((1, plan.th, plan.tw), lambda i, j: (0, i, j),
                                    memory_space=pltpu.VMEM),
                       out_shape, cost)(src_p)
    return out[0, :h, :w]
