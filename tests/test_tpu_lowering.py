"""AOT Pallas→Mosaic TPU lowering for every kernel, on the CPU host.

``jax.export(..., platforms=['tpu'])`` runs the real Pallas→Mosaic lowering
pass (primitive support, block-shape and memory-space rules) without a chip
— the only hardware-free guard against kernels that interpret-mode tests
accept but the TPU toolchain rejects at the first lowering stage.

Round 4 caught exactly that class: Mosaic has NO lowering rule for
``jax.lax.optimization_barrier``, so the ABF/BTF opaque-constant kernels
(true-division twins, PARITY.md D2/D1b) would have raised
NotImplementedError on first hardware contact despite a fully green CPU
suite.  The constants now ride SMEM operands barriered OUTSIDE the kernel
(ops/pallas/_stencil.py::consts_in_spec); these tests pin that every
kernel keeps lowering.

What this cannot catch: Mosaic COMPILE-time failures (VMEM overflow,
register pressure) — those still need the chip (benchmarks/hw_parity.py,
revalidate_abf.py).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


@pytest.fixture(autouse=True)
def _force_compile(monkeypatch):
    """interpret=False during export so the Mosaic lowering actually runs
    (tests otherwise run Pallas in interpreter mode on the CPU backend)."""
    monkeypatch.setenv("VIP_PALLAS_FORCE_COMPILE", "1")


def _lower_tpu(fn, *args):
    """Trace + lower for the TPU target; raises on unsupported kernels."""
    return jax.export.export(jax.jit(fn), platforms=["tpu"])(*args)


U8_HWC = jnp.zeros((64, 256, 3), jnp.uint8)


@pytest.mark.parametrize("ksize", [3, 9])
def test_bilateral_lowers(ksize):
    from various_image_processings_tpu.ops.pallas.bilateral import (
        bilateral_pallas)
    _lower_tpu(lambda s: bilateral_pallas(s, ksize, 10.0, 30.0), U8_HWC)


def test_joint_bilateral_k17_cpp_semantics_lowers():
    """k=17 → the tap-row-chunked kernel (3rd grid dim), reflect101/rint —
    the BTF cpp-variant JBF regime."""
    from various_image_processings_tpu.ops.pallas.bilateral import (
        joint_bilateral_pallas)
    _lower_tpu(lambda s, g: joint_bilateral_pallas(
        s, g, 17, 8.0, float(np.sqrt(np.float32(3.0))),
        border="reflect101", rounding="rint"), U8_HWC, U8_HWC)


def test_adaptive_bilateral_lowers():
    """The D2/D2b bit-exact twin: SMEM consts operand, exp2 grid rounding,
    sumk==0 select — the kernel that motivated this test file."""
    from various_image_processings_tpu.ops.pallas.adaptive_bilateral import (
        adaptive_bilateral_pallas)
    _lower_tpu(lambda s: adaptive_bilateral_pallas(s, 9, 10.0, 30.0), U8_HWC)


@pytest.mark.parametrize("dtype,channels", [(jnp.uint8, 3), (jnp.float32, 1)])
def test_gradient_lowers(dtype, channels):
    from various_image_processings_tpu.ops.pallas.gradient import (
        gradient_pallas)
    x = jnp.zeros((64, 256, channels), dtype)
    _lower_tpu(lambda s: gradient_pallas(s), x)


@pytest.mark.parametrize("border,rounding", [("replicate", "trunc"),
                                             ("reflect101", "rint")])
def test_btf_iteration_lowers(border, rounding):
    """Full BTF iteration (gradient → blur+mRTV w/ SMEM divisors → guide →
    k=17 JBF) in one program, both variants' border/rounding."""
    from various_image_processings_tpu.ops.pallas.bilateral_texture import (
        btf_iteration_pallas)
    x = jnp.zeros((3, 64, 256), jnp.uint8)
    _lower_tpu(lambda s: btf_iteration_pallas(s, 9, border=border,
                                              rounding=rounding), x)


def test_wexler_search_lowers():
    """The fused matmul+argmin search kernel (flag-gated VIP_WEXLER_SEARCH).

    The shape MUST give a multi-block candidate grid (nh > 1 AND nw > 1):
    round 4's kernel lowered fine at nw == 1 (block dim == array dim) but
    was rejected on hardware at mosaic_dog's nw == 6 — the per-block-minima
    output layout violated Mosaic's (8, 128)-divisible-or-full rule."""
    from various_image_processings_tpu.ops.pallas.wexler_search import (
        search_min_pallas)
    h, w = 48, 192
    k = 13
    n_cy, n_cx = h - (k - 1), w - (k - 1)   # 36, 180 → nh=3, nw=2
    t = 64
    p117 = jnp.zeros((h, n_cx, 117), jnp.bfloat16)
    f13 = jnp.zeros((k, 117, t), jnp.bfloat16)
    valid = jnp.zeros((n_cy, n_cx), jnp.bool_)
    _lower_tpu(lambda p, f, v: search_min_pallas(p, f, v, k, h, w),
               p117, f13, valid)


def test_batched_shardmap_pallas_lowers():
    """8-way batch shard_map with the Mosaic bilateral kernel INSIDE lowers
    for an 8-TPU mesh — multi-chip lowering evidence beyond the CPU-device
    dryrun (__graft_entry__.dryrun_multichip executes on CPU devices, which
    never exercises the Mosaic path)."""
    from jax.sharding import Mesh
    from various_image_processings_tpu.parallel.batch import (
        bilateral_filter_batched)
    mesh = Mesh(np.array(jax.devices()).reshape(8), ("batch",))
    x = jnp.zeros((8, 64, 128, 3), jnp.uint8)
    with mesh:
        _lower_tpu(lambda b: bilateral_filter_batched(
            b, 9, 10.0, 30.0, mesh=mesh, impl="pallas"), x)


def test_spatial_shardmap_pallas_lowers():
    """Spatially-sharded bilateral (ppermute halo exchange around the
    Mosaic kernel) lowers for an 8-TPU mesh."""
    from jax.sharding import Mesh
    from various_image_processings_tpu.parallel.spatial import (
        bilateral_filter_sharded)
    mesh = Mesh(np.array(jax.devices()).reshape(8), ("y",))
    y = jnp.zeros((256, 128, 3), jnp.uint8)
    with mesh:
        _lower_tpu(lambda im: bilateral_filter_sharded(
            im, 9, 10.0, 30.0, mesh=mesh, impl="pallas"), y)


def test_optimization_barrier_unsupported_in_mosaic():
    """Pin the REASON this file exists: a kernel-side optimization_barrier
    fails Mosaic lowering.  If JAX ever adds the rule, this test failing is
    the signal that the SMEM-consts workaround can be simplified."""
    from jax.experimental import pallas as pl

    def kern(x_ref, o_ref):
        kb = jax.lax.optimization_barrier(
            np.float32(81.0) * jnp.ones((1, 1), jnp.float32))
        o_ref[...] = x_ref[...] / kb

    def f(x):
        return pl.pallas_call(
            kern, out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32))(x)

    with pytest.raises(Exception, match="optimization_barrier"):
        _lower_tpu(f, jnp.zeros((8, 128), jnp.float32))
