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

from ._stencil import (plan_tiles, to_planar_padded, halo_in_spec,
                       stencil_call)


def _make_kernel(plan, channels):
    th, tw = plan.th, plan.tw

    def kernel(x_ref, o_ref):
        total = jnp.zeros((th, tw), jnp.float32)
        for c in range(channels):
            up = x_ref[c, 0:th, 1 : 1 + tw]
            down = x_ref[c, 2 : 2 + th, 1 : 1 + tw]
            left = x_ref[c, 1 : 1 + th, 0:tw]
            right = x_ref[c, 1 : 1 + th, 2 : 2 + tw]
            hd = right - left
            vd = down - up
            total = total + (hd * hd + vd * vd)
        o_ref[0] = jnp.sqrt(total)

    return kernel


def gradient_pallas(src_f32: jax.Array) -> jax.Array:
    """(H, W, C) f32 → (H, W) f32 gradient magnitude."""
    h, w, channels = src_f32.shape
    plan = plan_tiles(h, w, radius=1)
    src_p = to_planar_padded(src_f32, plan)
    out_shape = jax.ShapeDtypeStruct((1, plan.out_rows, plan.out_cols), jnp.float32)
    cost = pl.CostEstimate(
        flops=channels * 6 * plan.out_rows * plan.out_cols,
        bytes_accessed=channels * plan.padded_rows * plan.padded_cols * 4
        + plan.out_rows * plan.out_cols * 4,
        transcendentals=plan.out_rows * plan.out_cols,
    )
    out = stencil_call(_make_kernel(plan, channels), plan,
                       [halo_in_spec(plan, channels)],
                       pl.BlockSpec((1, plan.th, plan.tw), lambda i, j: (0, i, j),
                                    memory_space=pltpu.VMEM),
                       out_shape, cost)(src_p)
    return out[0, :h, :w]
