"""VPU micro-roofline: measured add/fma/exp issue rates on large tiles, to
bound what the pair-symmetric bilateral kernels can possibly reach
(VERDICT r2 item 5: push past "~55%" or prove the ceiling).

Result on TPU v5e (axon, 2026-08-17): ~0.9-1.0 T vector-op/s for EVERY
variant — dependent chain, 4/8 independent chains (ILP), and bf16 — i.e.
the VPU as driven by Mosaic sustains ~one (8,128) f32 vector op per cycle
(8*128*0.94 GHz = 0.96 T elem-op/s), with no multi-issue and no packed-bf16
speedup.  exp measures ~1.17 T/s (the EUP pipelines transcendentals at
full vector rate; exp costs ~1 op, not 7-10).

Implication (see DESIGN.md "VPU ceiling"): the pair kernel's measured
36 ps/pair/pixel is ~35.6 static vector-ops per pair — the kernel is at
~97% of the machine's measured issue rate, and the earlier "55% of
roofline" figure assumed a 2x-issue VPU that this hardware does not have.

Run on the real TPU: `python benchmarks/vpu_roofline.py`.
"""

import os

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])

from various_image_processings_tpu.utils.profiling import measure_chained


def rate(kind: str, n_ops: int, nchains: int = 1, dtype=jnp.float32,
         th=256, tw=1024, rows=4096, cols=4096):
    """ms for an n_ops-deep elementwise kernel over a rows x cols array.

    nchains > 1 splits the op chain into independent accumulators to expose
    ILP — if the VPU multi-issued, these would run faster than the
    dependent chain (measured: they do not)."""
    def kernel(x_ref, o_ref):
        a = x_ref[...]
        accs = [a * dtype(1.0 + i) for i in range(nchains)]
        for _ in range(n_ops // nchains):
            for i in range(nchains):
                if kind == "exp":
                    accs[i] = jnp.exp(accs[i] * dtype(-1e-6))
                elif kind == "fma":
                    accs[i] = accs[i] * dtype(0.9999) + a
                elif kind == "add":
                    accs[i] = accs[i] + a
        acc = accs[0]
        for i in range(1, nchains):
            acc = acc + accs[i]
        o_ref[...] = acc

    @jax.jit
    def run(x):
        return pl.pallas_call(
            kernel,
            grid=(rows // th, cols // tw),
            in_specs=[pl.BlockSpec((th, tw), lambda i, j: (i, j),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((th, tw), lambda i, j: (i, j),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((rows, cols), dtype),
        )(x)

    x = jnp.ones((rows, cols), dtype) * dtype(0.5)
    return measure_chained(run, x, iters=16)


def slope_tput(kind, nchains=1, dtype=jnp.float32):
    # two op counts: the slope removes the fixed memory-traffic cost.
    # Counts are large so the slope is multi-ms (sub-ms timings carry
    # ±35% tunnel variance — CLAUDE.md)
    ms_lo = rate(kind, 64, nchains, dtype)
    ms_hi = rate(kind, 256, nchains, dtype)
    slope_ms = (ms_hi - ms_lo) / 192.0   # ms per op-pass over the array
    n = 4096 * 4096
    return n / (slope_ms * 1e-3) / 1e12, ms_lo, ms_hi


def main():
    print("device:", jax.devices()[0], flush=True)
    for kind in ("add", "fma", "exp"):
        tput, lo, hi = slope_tput(kind)
        print(f"{kind:>4} x1 f32 : {tput:6.2f} T op/s  "
              f"(64-op {lo:.2f} ms, 256-op {hi:.2f} ms)", flush=True)
    # ILP probe: independent chains would beat the dependent chain on a
    # multi-issue VPU (v5e measured: they do not — ~1 vop/cycle issue rate)
    for nchains in (4, 8):
        tput, lo, hi = slope_tput("add", nchains)
        print(f" add x{nchains} f32 : {tput:6.2f} T op/s", flush=True)
    # packed-bf16 probe (v5e measured: ~1.1x, no 2x packing on the VPU)
    tput, lo, hi = slope_tput("add", 4, jnp.bfloat16)
    print(f" add x4 bf16: {tput:6.2f} T op/s", flush=True)


if __name__ == "__main__":
    main()
