"""Quantify the TPU's f32 division rounding vs IEEE-RN (host).

Round-4 hardware finding: hw_parity's strict division twins (ABF
fl(box/k²) exhaustive, BTF blur stage) FAIL on the real chip even with
barriered divisors — the TPU has no IEEE f32 divider; XLA lowers true
division as a Newton-refined reciprocal-multiply whose result is not
always the correctly-rounded quotient.  This probe measures, exhaustively
over every reachable (box, k²) pair and a random dividend sweep:

  * how many quotients differ from IEEE-RN, and by how many ulp;
  * whether the XLA graph and the Mosaic kernel agree with each other;
  * the DIRECT int-cast flip count of the raw quotient — a LOWER bound
    on downstream index flips (the real ABF consumer floors an L1 sum of
    |(p−c) − (c − box/k²)| terms, where a 1-ulp quotient error can flip
    the truncated index even when the direct cast does not);
  * the COMPOSED-expression flip rate: the full D2 index sequence
    (offset subtraction → per-tap L1 sum → floor) evaluated on-device
    with the device quotient vs on-host with the IEEE-RN quotient, over
    random u8 neighborhoods — the downstream effect itself.

Output feeds the PARITY.md D2c envelope and the re-scoped hw_parity
bounds.  Run (exclusive TPU client): python benchmarks/diag_tpu_division.py
"""

import os

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])


def ulp_diff(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Unsigned ulp distance between two f32 arrays (monotone int map)."""
    ai = a.view(np.int32).astype(np.int64)
    bi = b.view(np.int32).astype(np.int64)
    # map sign-magnitude to a monotone lattice
    ai = np.where(ai < 0, np.int64(-0x80000000) - ai, ai)
    bi = np.where(bi < 0, np.int64(-0x80000000) - bi, bi)
    return np.abs(ai - bi)


def main() -> int:
    print("device:", jax.devices()[0], flush=True)

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    for k in (3, 9, 15):
        k2 = np.float32(k * k)
        box = np.arange(0, 255 * k * k + 1, dtype=np.float32)
        want = (box / k2).astype(np.float32)

        @jax.jit
        def xla_div(x, kk=float(k2)):
            kb = jax.lax.optimization_barrier(jnp.float32(kk))
            return x / kb

        got_x = np.asarray(xla_div(jnp.asarray(box)))

        def kern(x_ref, k_ref, o_ref):
            o_ref[...] = x_ref[...] / k_ref[0, 0]

        pad = (-box.size) % 128
        boxp = np.pad(box, (0, pad)).reshape(-1, 128)
        kop = jax.lax.optimization_barrier(jnp.full((1, 1), k2, jnp.float32))
        got_p = np.asarray(pl.pallas_call(
            kern,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.SMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct(boxp.shape, jnp.float32),
        )(jnp.asarray(boxp), kop)).reshape(-1)[: box.size]

        for name, got in (("xla", got_x), ("pallas", got_p)):
            u = ulp_diff(want, got)
            n_bad = int((u > 0).sum())
            # the ABF consumer: the quotient feeds |…| sums then an int
            # truncation — check the direct int-cast flip worst case
            flips = int((want.astype(np.int32) != got.astype(np.int32)).sum())
            print(f"k={k:2d} {name:6s}: {n_bad}/{box.size} off "
                  f"(max {int(u.max())} ulp); int-cast flips {flips}",
                  flush=True)
        agree = int((got_x.view(np.int32) != got_p.view(np.int32)).sum())
        print(f"k={k:2d} xla-vs-pallas disagreement: {agree}/{box.size}",
              flush=True)

    # COMPOSED D2 index sequence (ADVICE r4): offset subtraction → L1 sum
    # → floor, with random u8 (p, c) neighborhoods and every box reachable
    # — the quantity the ABF kernel actually consumes.  Host = IEEE-RN
    # division; device = the hardware quotient; every other op in the
    # chain is exact-or-identically-rounded IEEE on the VPU, so any floor
    # flip here is the division's downstream effect.
    for k in (3, 9, 15):
        k2 = np.float32(k * k)
        n = 1 << 20
        rng = np.random.default_rng(k)
        p = rng.integers(0, 256, (3, n)).astype(np.float32)
        c = rng.integers(0, 256, (3, n)).astype(np.float32)
        box = rng.integers(0, int(255 * k * k) + 1, (3, n)).astype(np.float32)

        def host_idx():
            o = c - (box / k2).astype(np.float32)  # numpy f32 div is IEEE-RN
            t = (np.abs((p[0] - c[0]) - o[0])
                 + np.abs((p[1] - c[1]) - o[1])).astype(np.float32)
            t = (t + np.abs((p[2] - c[2]) - o[2])).astype(np.float32)
            return t.astype(np.int32)

        @jax.jit
        def dev_idx(pj, cj, bj, kk=float(k2)):
            kb = jax.lax.optimization_barrier(jnp.float32(kk))
            o = cj - bj / kb
            t = (jnp.abs((pj[0] - cj[0]) - o[0])
                 + jnp.abs((pj[1] - cj[1]) - o[1]))
            t = t + jnp.abs((pj[2] - cj[2]) - o[2])
            return t.astype(jnp.int32)

        want_i = host_idx()
        got_i = np.asarray(dev_idx(jnp.asarray(p), jnp.asarray(c),
                                   jnp.asarray(box)))
        flips = int((want_i != got_i).sum())
        print(f"k={k:2d} composed-index flips: {flips}/{n} "
              f"({flips / n:.2e}; max |Δidx| "
              f"{int(np.abs(want_i - got_i).max())})", flush=True)

    # random-dividend sweep at full f32 dynamic range of the BTF stage
    # divisors (3 and k² ≤ 441): how big can the quotient error get?
    rng = np.random.default_rng(0)
    a = rng.uniform(0, 255.0 * 441, 1 << 20).astype(np.float32)
    worst = 0
    for d in (3.0, 9.0, 81.0, 225.0, 441.0):
        want = (a / np.float32(d)).astype(np.float32)

        @jax.jit
        def f(x, dd=d):
            db = jax.lax.optimization_barrier(jnp.float32(dd))
            return x / db

        got = np.asarray(f(jnp.asarray(a)))
        u = ulp_diff(want, got)
        worst = max(worst, int(u.max()))
        print(f"random/{d:>5.0f}: {(u > 0).sum()}/{a.size} off "
              f"(max {int(u.max())} ulp)", flush=True)
    print(f"WORST ulp anywhere: {worst}")
    return 0


if __name__ == "__main__":
    import sys
    sys.exit(main())
