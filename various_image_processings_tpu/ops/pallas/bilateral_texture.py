"""Pallas TPU kernels: bilateral texture filter stages.

TPU-native counterparts of ``compute_blur_and_rtv_kernel`` and
``compute_guide_kernel`` (reference: src/bilateral_texture_filter_impl.cu:10-104,
:106-182), composed with the gradient and joint-bilateral kernels into one
iteration of ``CudaBilateralTextureFilter::Impl::execute`` (:199-214).

Stage fusion: blur + mRTV statistics (box sums, intensity min/max, magnitude
max/sum) are one kernel pass over a shared VMEM halo block — the north-star
"integral-image mRTV path" fused the way the CUDA kernel fuses its smem
tile.  The window reductions are SEPARABLE (2k taps instead of k²) wherever
that is value-exact: box sums of u8-valued integers are exact in f32 in any
order, and min/max are associative; only the magnitude box sum (f32,
order-sensitive rounding) keeps the reference's (ky, kx) scan order so the
mRTV stays within the golden tolerance contract.  The guide's window argmin
is also separable EXACTLY: a first-minimum row pass then a first-minimum
column pass selects the lexicographically-first (ky, kx) minimum — the
reference's scan-order tie-break (include/cpp/bilateral_texture_filter.hpp:
101-112) — with identical results.  The closing joint-bilateral stage has
2k−1 = 17 → ~225 circle taps, beyond the unroll budget, so it automatically
takes the tap-row-chunked kernel.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

from ._stencil import (plan_tiles, to_planar_padded, pad_planar, halo_in_spec,
                       tile_out_spec, stencil_call, consts_in_spec)
from .bilateral import joint_bilateral_pallas_planar
from .gradient import gradient_pallas

EPSILON = np.float32(1e-9)


def _make_blur_rtv_kernel(plan, ksize):
    th, tw, r = plan.th, plan.tw, plan.radius
    bh = th + 2 * r

    def kernel(img_ref, mag_ref, consts_ref, blurred_ref, rtv_ref):
        # TRUE division only: the compiler strength-reduces division by a
        # literal into a reciprocal-multiply (1 ulp off), which can flip
        # the guide stage's strict-less argmin at near-ties (round-4 fuzz
        # case100: tens of u8 downstream).  The divisors arrive as SMEM
        # runtime scalars (barriered in the wrapper — Mosaic cannot lower
        # a kernel-side optimization_barrier, tests/test_tpu_lowering.py),
        # same pattern as adaptive_bilateral.py's index twin.
        threeb = consts_ref[0, 0]
        k2b = consts_ref[0, 1]
        # separable row→column reductions (2k taps): box sums of u8-valued
        # integers are exact in f32 in any order; min/max are associative
        ip = (img_ref[0] + img_ref[1] + img_ref[2]) / threeb  # intensity
        hb0 = img_ref[0, 0:bh, 0:tw]
        hb1 = img_ref[1, 0:bh, 0:tw]
        hb2 = img_ref[2, 0:bh, 0:tw]
        himx = ip[0:bh, 0:tw]
        himn = ip[0:bh, 0:tw]
        hmmx = mag_ref[0, 0:bh, 0:tw]
        for dx in range(1, ksize):
            hb0 = hb0 + img_ref[0, 0:bh, dx : dx + tw]
            hb1 = hb1 + img_ref[1, 0:bh, dx : dx + tw]
            hb2 = hb2 + img_ref[2, 0:bh, dx : dx + tw]
            iw = ip[0:bh, dx : dx + tw]
            himx = jnp.maximum(himx, iw)
            himn = jnp.minimum(himn, iw)
            hmmx = jnp.maximum(hmmx, mag_ref[0, 0:bh, dx : dx + tw])
        b0 = hb0[0:th, :]
        b1 = hb1[0:th, :]
        b2 = hb2[0:th, :]
        imx = himx[0:th, :]
        imn = himn[0:th, :]
        mmx = hmmx[0:th, :]
        for dy in range(1, ksize):
            b0 = b0 + hb0[dy : dy + th, :]
            b1 = b1 + hb1[dy : dy + th, :]
            b2 = b2 + hb2[dy : dy + th, :]
            imx = jnp.maximum(imx, himx[dy : dy + th, :])
            imn = jnp.minimum(imn, himn[dy : dy + th, :])
            mmx = jnp.maximum(mmx, hmmx[dy : dy + th, :])
        # magnitude box sum: f32 rounding is order-sensitive — keep the
        # reference's (ky, kx) scan order (golden tolerance contract)
        msm = jnp.zeros((th, tw), jnp.float32)
        for dy in range(ksize):
            for dx in range(ksize):
                msm = msm + mag_ref[0, dy : dy + th, dx : dx + tw]
        blurred_ref[0] = b0 / k2b
        blurred_ref[1] = b1 / k2b
        blurred_ref[2] = b2 / k2b
        rtv_ref[0] = (imx - imn) * mmx / (msm + EPSILON)

    return kernel


def blur_and_rtv_pallas_planar(img_p3: jax.Array, magnitude: jax.Array,
                               ksize: int, tile=(32, 512)):
    """(3,H,W) f32 u8-valued image + (H,W) f32 magnitude →
    ((3,H,W) f32 blurred, (H,W) f32 rtv) — planar in/out (no relayouts)."""
    _, h, w = img_p3.shape
    radius = ksize // 2
    plan = plan_tiles(h, w, radius, th=tile[0], tw=tile[1])
    img_p = pad_planar(img_p3, plan)
    mag_p = pad_planar(magnitude[None], plan)
    out_shapes = (
        jax.ShapeDtypeStruct((3, plan.out_rows, plan.out_cols), jnp.float32),
        jax.ShapeDtypeStruct((1, plan.out_rows, plan.out_cols), jnp.float32),
    )
    n_taps = ksize * ksize
    cost = pl.CostEstimate(
        flops=n_taps * 10 * plan.out_rows * plan.out_cols,
        bytes_accessed=4 * plan.padded_rows * plan.padded_cols * 4,
        transcendentals=0,
    )
    # opaque divisors (/3 intensity, /k² blur) as an SMEM operand — the
    # barrier is plain XLA HLO outside the kernel (see _make_blur_rtv_kernel)
    consts = jax.lax.optimization_barrier(
        jnp.array([[3.0, ksize * ksize]], jnp.float32))
    blurred, rtv = stencil_call(
        _make_blur_rtv_kernel(plan, ksize), plan,
        [halo_in_spec(plan, 3), halo_in_spec(plan, 1), consts_in_spec()],
        (tile_out_spec(plan, 3), tile_out_spec(plan, 1)),
        out_shapes, cost)(img_p, mag_p, consts)
    return (blurred[:, :h, :w], rtv[0, :h, :w])


def blur_and_rtv_pallas(img_f32: jax.Array, magnitude: jax.Array, ksize: int,
                        tile=(32, 512)):
    """(H,W,3) f32 u8-valued image + (H,W) f32 magnitude →
    ((H,W,3) f32 blurred, (H,W) f32 rtv)."""
    blurred, rtv = blur_and_rtv_pallas_planar(img_f32.transpose(2, 0, 1),
                                              magnitude, ksize, tile)
    return blurred.transpose(1, 2, 0), rtv


def _make_guide_kernel(plan, ksize):
    th, tw, r = plan.th, plan.tw, plan.radius
    sigma_alpha = np.float32(1.0) / np.float32(5 * ksize)

    bh = th + 2 * r

    def kernel(blur_ref, rtv_ref, guide_ref):
        rtv_center = rtv_ref[0, r : r + th, r : r + tw]
        bc0 = blur_ref[0, r : r + th, r : r + tw]
        bc1 = blur_ref[1, r : r + th, r : r + tw]
        bc2 = blur_ref[2, r : r + th, r : r + tw]

        # separable first-minimum argmin (2k taps): a strict-less row pass
        # then a strict-less column pass selects the lexicographically-first
        # (ky, kx) minimum — exactly the reference's row-major scan-order
        # tie-break, with identical values (no arithmetic, only selects)
        hm = rtv_ref[0, 0:bh, 0:tw]
        hg0 = blur_ref[0, 0:bh, 0:tw]
        hg1 = blur_ref[1, 0:bh, 0:tw]
        hg2 = blur_ref[2, 0:bh, 0:tw]
        for dx in range(1, ksize):
            rv = rtv_ref[0, 0:bh, dx : dx + tw]
            m = rv < hm  # strict: keeps the FIRST minimum in dx order
            hm = jnp.where(m, rv, hm)
            hg0 = jnp.where(m, blur_ref[0, 0:bh, dx : dx + tw], hg0)
            hg1 = jnp.where(m, blur_ref[1, 0:bh, dx : dx + tw], hg1)
            hg2 = jnp.where(m, blur_ref[2, 0:bh, dx : dx + tw], hg2)
        bm = hm[0:th, :]
        g0 = hg0[0:th, :]
        g1 = hg1[0:th, :]
        g2 = hg2[0:th, :]
        for dy in range(1, ksize):
            rv = hm[dy : dy + th, :]
            m = rv < bm  # strict: keeps the FIRST minimum in dy order
            bm = jnp.where(m, rv, bm)
            g0 = jnp.where(m, hg0[dy : dy + th, :], g0)
            g1 = jnp.where(m, hg1[dy : dy + th, :], g1)
            g2 = jnp.where(m, hg2[dy : dy + th, :], g2)

        alpha = (jnp.float32(2.0)
                 / (jnp.float32(1.0) + jnp.exp(sigma_alpha * (rtv_center - bm)))
                 - jnp.float32(1.0))
        one_m = jnp.float32(1.0) - alpha
        half = jnp.float32(0.5)

        def blend(bmin, bctr):
            v = alpha * bmin + one_m * bctr + half
            # static_cast<int> truncation-toward-zero, then clamp 0..255;
            # stored as f32 (u8 tiles need th%32, f32 tiles only th%8)
            return jnp.clip(v.astype(jnp.int32), 0, 255).astype(jnp.float32)

        guide_ref[0] = blend(g0, bc0)
        guide_ref[1] = blend(g1, bc1)
        guide_ref[2] = blend(g2, bc2)

    return kernel


def guide_pallas_planar(blurred_p3: jax.Array, rtv: jax.Array, ksize: int,
                        tile=(32, 512)) -> jax.Array:
    """((3,H,W) f32, (H,W) f32) → (3,H,W) f32 u8-valued guide — planar
    in/out (stays f32: the downstream planar JBF pads to f32 anyway)."""
    _, h, w = blurred_p3.shape
    radius = ksize // 2
    plan = plan_tiles(h, w, radius, th=tile[0], tw=tile[1])
    blur_p = pad_planar(blurred_p3, plan)
    rtv_p = pad_planar(rtv[None], plan)
    out_shape = jax.ShapeDtypeStruct((3, plan.out_rows, plan.out_cols), jnp.float32)
    n_taps = ksize * ksize
    cost = pl.CostEstimate(
        flops=n_taps * 8 * plan.out_rows * plan.out_cols,
        bytes_accessed=4 * plan.padded_rows * plan.padded_cols * 4,
        transcendentals=plan.out_rows * plan.out_cols,
    )
    out = stencil_call(_make_guide_kernel(plan, ksize), plan,
                       [halo_in_spec(plan, 3), halo_in_spec(plan, 1)],
                       tile_out_spec(plan, 3), out_shape, cost)(blur_p, rtv_p)
    return out[:, :h, :w]


def guide_pallas(blurred: jax.Array, rtv: jax.Array, ksize: int,
                 tile=(32, 512)) -> jax.Array:
    """((H,W,3) f32, (H,W) f32) → (H,W,3) u8 guide."""
    out = guide_pallas_planar(blurred.transpose(2, 0, 1), rtv, ksize, tile)
    return out.transpose(1, 2, 0).astype(jnp.uint8)


def btf_iteration_pallas(img_p3: jax.Array, ksize: int,
                         border: str = "replicate",
                         rounding: str = "trunc") -> jax.Array:
    """One BTF iteration (gradient → blur+mRTV → guide → JBF), the hot
    stages as Pallas kernels, PLANAR (3,H,W) u8 in/out — the pipeline never
    leaves planar layout (each HWC↔CHW relayout costs ~0.06 ms at 600×900
    on v5e; the old HWC-interfaced pipeline paid ~7 per iteration).
    Counterpart of the loop body at
    src/bilateral_texture_filter_impl.cu:205-211.  border/rounding configure
    the final JBF stage (variant="cpp" → reflect101/rint, matching
    cv::ximgproc::jointBilateralFilter)."""
    img_f = img_p3.astype(jnp.float32)
    magnitude = gradient_pallas(img_p3, planar=True)
    blurred, rtv = blur_and_rtv_pallas_planar(img_f, magnitude, ksize)
    guide = guide_pallas_planar(blurred, rtv, ksize)
    sigma_color = float(np.sqrt(np.float32(3.0), dtype=np.float32))
    return joint_bilateral_pallas_planar(img_p3, guide, 2 * ksize - 1,
                                         float(ksize - 1), sigma_color,
                                         border=border, rounding=rounding)
