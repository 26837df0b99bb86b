"""Hardware parity regression harness (VERDICT r2 item 9).

Asserts — on the REAL device — that every op's divergence envelope vs the
golden CPU twins stays inside the documented PARITY.md bounds, so silent
numeric regressions (new kernel, new runtime, new XLA) fail loudly instead
of waiting for a human to read the benchmark matrix.

Run: `python benchmarks/hw_parity.py`  (exit 0 = all envelopes hold).
"""

from __future__ import annotations

import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import jax
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])

SAMPLES = "/root/reference/sample_image"


def check(name, cond, detail):
    status = "OK " if cond else "FAIL"
    print(f"{status} {name}: {detail}", flush=True)
    return cond


def main() -> int:
    import cv2
    import various_image_processings_tpu as vip
    from various_image_processings_tpu import golden

    print("device:", jax.devices()[0], flush=True)
    ok = True

    lenna = cv2.imread(f"{SAMPLES}/lenna.png", cv2.IMREAD_COLOR)
    cat = cv2.imread(f"{SAMPLES}/mosaic_cat.png", cv2.IMREAD_COLOR)

    # bilateral family: ≤1 u8 vs golden (PARITY.md per-op table)
    out = np.asarray(vip.bilateral_filter(lenna, 9, 10.0, 30.0))
    g = golden.bilateral_filter(lenna, 9, 10.0, 30.0)
    d = np.abs(out.astype(int) - g.astype(int)).max()
    ok &= check("bilateral_512", d <= 1, f"max {d} (bound 1)")

    out = np.asarray(vip.adaptive_bilateral_filter(lenna, 9, 10.0, 30.0))
    g = golden.adaptive_bilateral_filter(lenna, 9, 10.0, 30.0)
    d = np.abs(out.astype(int) - g.astype(int)).max()
    ok &= check("abf_512", d <= 1, f"max {d} (bound 1)")

    # ABF index twin, TPU scope (PARITY.md D2c): the chip has NO IEEE f32
    # divider (Newton-refined reciprocal-multiply), so fl(box/k²) is NOT
    # bit-equal to the host's IEEE-RN quotient on hardware — the measured
    # envelope (2026-08-19, benchmarks/diag_tpu_division.py) is what this
    # asserts for EVERY reachable box value, through BOTH the XLA graph
    # and the compiled Mosaic kernel: quotients within 2 ulp of IEEE-RN,
    # XLA and Mosaic bit-identical to each other (same hardware op — the
    # two device paths cannot diverge), and zero direct int-cast flips.
    # (The bit-exact D2 claim holds on IEEE-divider hosts, where the
    # golden suite verifies it exhaustively — tests/test_bilateral.py.)
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    def ulp_diff(a, b):
        ai = a.view(np.int32).astype(np.int64)
        bi = b.view(np.int32).astype(np.int64)
        ai = np.where(ai < 0, np.int64(-0x80000000) - ai, ai)
        bi = np.where(bi < 0, np.int64(-0x80000000) - bi, bi)
        return np.abs(ai - bi)

    div_ok = True
    detail = []
    for k in (3, 9, 15):
        k2 = np.float32(k * k)
        box = np.arange(0, 255 * k * k + 1, dtype=np.float32)
        want = (box / k2).astype(np.float32)

        @jax.jit
        def xla_div(x, kk=float(k2)):
            kb = jax.lax.optimization_barrier(jnp.float32(kk))
            return x / kb

        got = np.asarray(xla_div(jnp.asarray(box)))

        # the divisor rides an SMEM operand barriered OUTSIDE the kernel —
        # Mosaic cannot lower a kernel-side optimization_barrier
        # (tests/test_tpu_lowering.py); this mirrors the shipped kernels
        # (ops/pallas/_stencil.py::consts_in_spec)
        from jax.experimental.pallas import tpu as pltpu

        def kern(x_ref, k_ref, o_ref):
            o_ref[...] = x_ref[...] / k_ref[0, 0]

        pad = (-box.size) % 128
        boxp = np.pad(box, (0, pad)).reshape(-1, 128)
        kop = jax.lax.optimization_barrier(
            jnp.full((1, 1), k2, jnp.float32))
        got_p = np.asarray(pl.pallas_call(
            kern,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.SMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct(boxp.shape, jnp.float32),
        )(jnp.asarray(boxp), kop)).reshape(-1)[: box.size]

        u_x = int(ulp_diff(want, got).max())
        u_p = int(ulp_diff(want, got_p).max())
        agree = np.array_equal(got.view(np.int32), got_p.view(np.int32))
        flips = int((want.astype(np.int32) != got.astype(np.int32)).sum())
        div_ok &= u_x <= 2 and u_p <= 2 and agree and flips == 0
        detail.append(f"k={k} ulp x/p {u_x}/{u_p} agree={agree} "
                      f"flips={flips}")
    ok &= check("abf_division_envelope_d2c", div_ok, "; ".join(detail))

    # D2b grid rounding must survive compilation on-chip (the simplifier
    # folds (v+C)−C → v for literal C; the kernels barrier C)
    C = np.float32(2.0 ** -62)
    v = np.float32(1.7e-26)
    want_q = np.float32(np.float32(v + C) - C)

    @jax.jit
    def quant(x):
        c = jax.lax.optimization_barrier(jnp.float32(C))
        return (x + c) - c

    got_q = np.asarray(quant(jnp.float32(v)))
    ok &= check("abf_grid_rounding", got_q == want_q,
                f"got {got_q:.6e} want {want_q:.6e}")

    # ABF pathological-regime parity (PARITY.md D2/D2b): the round-4 fuzz
    # failure parameter points — subnormal weight windows, index-boundary
    # flips, subnormal space weights — must stay within a few u8 of golden
    # on the real chip (CPU measures bit-exact; TPU exp2 near-tie quantum
    # flips are the only allowed wiggle)
    import warnings
    worst = 0
    for i, (k, ss, sc, h, w) in enumerate([(13, 1.13, 1.6, 50, 50),
                                           (9, 38.58, 7.58, 64, 31),
                                           (13, 6.6, 11.18, 48, 48),
                                           (15, 0.47, 3.49, 31, 64)]):
        img = np.random.default_rng(777 + i).integers(
            0, 256, (h, w, 3), np.uint8)
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            ge = golden.adaptive_bilateral_filter(img, k, ss, sc)
        for impl in ("xla", "pallas"):
            got = np.asarray(vip.adaptive_bilateral_filter(
                img, k, ss, sc, impl=impl))
            worst = max(worst, int(np.abs(got.astype(int)
                                          - ge.astype(int)).max()))
    ok &= check("abf_subnormal_band", worst <= 4,
                f"worst {worst} u8 over 4 regimes × 2 impls (bound 4)")

    out = np.asarray(vip.gradient(lenna))
    g = golden.gradient(lenna)
    rel = np.abs(out - g) / np.maximum(np.abs(g), 1e-3)
    ok &= check("gradient_512", rel.max() <= 1e-4, f"max rel {rel.max():.2e}")

    # BTF end-to-end on hardware: the documented envelope is p99.9 ≤5 and
    # max ≤46 u8 vs golden (tie-flip amplification of TPU transcendental
    # ulps across nitr iterations, PARITY.md BTF row)
    # SLIC on hardware: the bounded-drift assumption behind the 5x5 cell
    # gather (models/slic.py) must hold on the real chip too, and the
    # segment count stays in the bench-scale envelope
    from various_image_processings_tpu.models.slic import SuperpixelSLIC
    slic = SuperpixelSLIC(*lenna.shape[:2], superpixel_size=26,
                          num_iteration=10)
    labels = slic.apply(lenna)
    nseg = int(labels.max()) + 1
    ok &= check("slic_drift_512", slic.last_max_drift_cells <= 2.0,
                f"max center drift {slic.last_max_drift_cells:.1f} cells "
                f"(bound 2); {nseg} segments")

    # u8 pyramid: the round-4 integer twins must stay BIT-EXACT vs cv2 on
    # the real chip (pure int32 adds/shifts — any divergence is a compiler
    # or layout bug, not a numerics tolerance)
    from various_image_processings_tpu.ops.pyramid import pyr_down, pyr_up
    down = np.asarray(pyr_down(lenna))
    up = np.asarray(pyr_up(down, lenna.shape[:2]))
    d_down = int(np.abs(down.astype(int)
                        - cv2.pyrDown(lenna).astype(int)).max())
    d_up = int(np.abs(up.astype(int)
                      - cv2.pyrUp(cv2.pyrDown(lenna),
                                  dstsize=(lenna.shape[1],
                                           lenna.shape[0])).astype(int)).max())
    ok &= check("pyramid_512", d_down == 0 and d_up == 0,
                f"pyrDown max {d_down}, pyrUp max {d_up} (bound 0)")

    out = np.asarray(vip.bilateral_texture_filter(cat, 9, 3))
    g = golden.bilateral_texture_filter(cat, 9, 3)
    d = np.abs(out.astype(int) - g.astype(int))
    p999 = float(np.percentile(d, 99.9))
    ok &= check("btf_mosaic_cat", p999 <= 5 and d.max() <= 46,
                f"max {d.max()} (bound 46), p99.9 {p999:.1f} (bound 5), "
                f"exact {(d == 0).mean():.4f}")

    # BTF stage true-division twin on-chip (PARITY.md D1b + D2c, fuzz case
    # 100): the jitted xla stage's barriered /3 and /k² divisions keep the
    # box blur bit-exact ON IEEE-DIVIDER HOSTS; on the chip the blur sits
    # inside the D2c division envelope (integer sums / k², quotient ≤2 ulp
    # — blur values ≤255, so ≤2 ulp ≈ 6.1e-5 abs) and rtv within the
    # hardware envelope (≤2e-6 rel per the parity table).  The barrier is
    # still load-bearing on-chip: it blocks the COMPILE-TIME
    # reciprocal-multiply strength-reduction, which measured far worse
    # (systematic 1-ulp skew flipping guide argmins, D1b).
    from various_image_processings_tpu.ops.bilateral_texture import (
        _blur_and_rtv_math)
    case = np.load(os.path.join(os.path.dirname(__file__), "..", "tests",
                                "data", "btf_fuzz_case100.npz"))
    img100 = case["src"]
    mag_g = golden.gradient(img100)
    blur_g, rtv_g = golden.compute_blur_and_rtv(img100, mag_g, 9)
    blur_t, rtv_t = jax.jit(lambda s, m: _blur_and_rtv_math(s, m, 9))(
        jnp.asarray(img100, jnp.float32), jnp.asarray(mag_g))
    blur_ulp = int(ulp_diff(blur_g, np.asarray(blur_t)).max())
    rtv_rel = float(np.abs(np.asarray(rtv_t) - rtv_g).max()
                    / max(np.abs(rtv_g).max(), 1e-12))
    ok &= check("btf_stage_division", blur_ulp <= 2 and rtv_rel <= 2e-6,
                f"blur ulp {blur_ulp} (bound 2, D2c), "
                f"rtv rel {rtv_rel:.2e} (bound 2e-6)")

    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
