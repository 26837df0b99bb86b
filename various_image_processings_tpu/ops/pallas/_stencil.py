"""Shared tiling harness for halo-stencil Pallas kernels.

Layout: images move through the kernels as planar ``(C, H, W)`` float32 (the
TPU wants ≥128 lanes in the last dim; HWC with C=3 wastes the vector unit).
The harness

- picks a (TH, TW) output tile that fits VMEM,
- replicate-pads the image so every halo window read is in bounds and the
  block shapes satisfy Mosaic's (8, 128) alignment rules,
- builds the `pl.Element` in-specs / `Blocked` out-specs.

This is the TPU analog of the reference's cooperative shared-memory halo
tiles (src/bilateral_filter_impl.cu:47-56).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...core.pad import replicate_pad, reflect101_pad, round_up, cdiv
from .._dispatch import pallas_interpret


@dataclasses.dataclass(frozen=True)
class TilePlan:
    height: int
    width: int
    radius: int
    th: int          # output tile rows
    tw: int          # output tile cols
    nh: int          # grid rows
    nw: int          # grid cols
    halo_h: int      # extra block rows beyond th (≥ 2*radius, 8-aligned)
    halo_w: int      # extra block cols beyond tw (≥ 2*radius, 128-aligned)

    @property
    def grid(self):
        return (self.nh, self.nw)

    @property
    def padded_rows(self):
        return self.nh * self.th + self.halo_h

    @property
    def padded_cols(self):
        return self.nw * self.tw + self.halo_w

    @property
    def out_rows(self):
        return self.nh * self.th

    @property
    def out_cols(self):
        return self.nw * self.tw


def plan_tiles(height: int, width: int, radius: int,
               th: int = 128, tw: int = 1024) -> TilePlan:
    """Choose output tiles. th must be a multiple of 32 (u8 output tiling),
    tw a multiple of 128."""
    tw = min(tw, round_up(width, 128))
    th = min(th, round_up(height, 32))
    return TilePlan(
        height=height, width=width, radius=radius,
        th=th, tw=tw,
        nh=cdiv(height, th), nw=cdiv(width, tw),
        halo_h=round_up(2 * radius, 8),
        halo_w=round_up(2 * radius, 128) if radius > 0 else 0,
    )


def to_planar_padded(img_hwc: jax.Array, plan: TilePlan,
                     dtype=jnp.float32, border: str = "replicate") -> jax.Array:
    """(H, W[, C]) → (C, padded_rows, padded_cols) planar, halo-padded with
    ``border`` semantics (replicate, or reflect-101 for the
    cv::ximgproc-compatible variant) plus replicate alignment padding on the
    bottom/right (those rows/cols only feed outputs that are cropped)."""
    if img_hwc.ndim == 2:
        img_hwc = img_hwc[:, :, None]
    r = plan.radius
    img = img_hwc.astype(dtype)
    if border == "reflect101" and r > 0:
        img = reflect101_pad(img, r, 0, 1)  # multi-reflects when r > dim-1
        padded = replicate_pad(
            img,
            0, plan.padded_rows - img.shape[0],
            0, plan.padded_cols - img.shape[1],
        )
    else:
        padded = replicate_pad(
            img,
            r, plan.padded_rows - r - plan.height,
            r, plan.padded_cols - r - plan.width,
        )
    return padded.transpose(2, 0, 1)


def pad_planar(img_chw: jax.Array, plan: TilePlan,
               dtype=jnp.float32, border: str = "replicate") -> jax.Array:
    """(C, H, W) planar → (C, padded_rows, padded_cols), same halo semantics
    as ``to_planar_padded`` but without the HWC↔planar relayout — staying
    planar between pipeline stages (BTF) saves ~0.06 ms per transpose on a
    600×900 f32 image (the 3-wide channel axis in the 128-lane dim makes
    HWC↔CHW pathologically slow on TPU)."""
    r = plan.radius
    img = img_chw.astype(dtype)

    if border == "reflect101" and r > 0:
        img = reflect101_pad(img, r, 1, 2)  # multi-reflects when r > dim-1
        return replicate_pad(img, 0, plan.padded_rows - img.shape[1],
                             0, plan.padded_cols - img.shape[2], axis=1)
    return replicate_pad(img, r, plan.padded_rows - r - plan.height,
                         r, plan.padded_cols - r - plan.width, axis=1)


def from_planar(out_planar: jax.Array, plan: TilePlan) -> jax.Array:
    """(C, out_rows, out_cols) → (H, W, C) cropped."""
    return out_planar[:, : plan.height, : plan.width].transpose(1, 2, 0)


def halo_in_spec(plan: TilePlan, channels: int = 3):
    """BlockSpec reading the (channels, th+halo_h, tw+halo_w) halo window
    whose top-left element is (i*th, j*tw) of the padded planar array."""
    th, tw = plan.th, plan.tw
    # Mosaic requires all-or-none Element dims in a block spec.
    return pl.BlockSpec(
        (pl.Element(channels), pl.Element(th + plan.halo_h),
         pl.Element(tw + plan.halo_w)),
        lambda i, j: (0, i * th, j * tw),
        memory_space=pltpu.VMEM,
    )


def consts_in_spec(n: int | None = None):
    """BlockSpec for a (1, n) f32 opaque-constant operand in SMEM.

    Kernels that need true IEEE division / unfolded add-subtract pairs take
    their constants as runtime SMEM scalars instead of captured literals:
    Mosaic has NO lowering rule for ``jax.lax.optimization_barrier`` (a
    kernel-side barrier fails at lowering, tests/test_tpu_lowering.py), so
    the wrapper barriers the operand OUTSIDE the kernel (plain XLA HLO) and
    the kernel reads ``consts_ref[0, i]``.  Scalars must be 2D in SMEM.
    """
    shape = (1, n) if n is not None else None
    return pl.BlockSpec(shape, (lambda *_: (0, 0)) if n is not None else None,
                        memory_space=pltpu.SMEM)


def tile_out_spec(plan: TilePlan, channels: int = 3):
    return pl.BlockSpec((channels, plan.th, plan.tw), lambda i, j: (0, i, j),
                        memory_space=pltpu.VMEM)


def stencil_call(kernel, plan: TilePlan, in_specs, out_specs, out_shapes,
                 cost_estimate=None):
    """pallas_call wrapper with the grid/interpret boilerplate."""
    return pl.pallas_call(
        kernel,
        grid=plan.grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        interpret=pallas_interpret(),
        cost_estimate=cost_estimate,
    )
