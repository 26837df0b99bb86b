"""VPU micro-roofline: measured exp and FMA rates on the actual tile shapes
the bilateral kernels use, to bound what the pair-symmetric kernel can
possibly reach (VERDICT r2 item 5: push past ~55% or prove the ceiling).

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


def rate(kind: str, n_ops: int, th=256, tw=1024, rows=4096, cols=4096):
    def kernel(x_ref, o_ref):
        a = x_ref[...]
        acc = a
        for _ in range(n_ops):
            if kind == "exp":
                acc = jnp.exp(acc * np.float32(-1e-6))
            elif kind == "fma":
                acc = acc * np.float32(0.9999) + a
            elif kind == "add":
                acc = acc + a
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
            out_shape=jax.ShapeDtypeStruct((rows, cols), jnp.float32),
        )(x)

    x = jnp.ones((rows, cols), jnp.float32) * 0.5
    ms = measure_chained(run, x, iters=16)
    per_elem_ops = n_ops
    total = rows * cols * per_elem_ops
    return ms, total / (ms * 1e-3) / 1e12


def main():
    print("device:", jax.devices()[0], flush=True)
    for kind in ("add", "fma", "exp"):
        # two op counts: the slope removes the fixed memory-traffic cost.
        # Counts are large so the slope is multi-ms (sub-ms timings carry
        # ±35% tunnel variance — CLAUDE.md)
        ms_lo, _ = rate(kind, 64)
        ms_hi, _ = rate(kind, 256)
        slope_ms = (ms_hi - ms_lo) / 192.0   # ms per op-pass over the array
        n = 4096 * 4096
        tput = n / (slope_ms * 1e-3) / 1e12
        print(f"{kind:>4}: {tput:6.2f} T op/s  "
              f"(64-op {ms_lo:.2f} ms, 256-op {ms_hi:.2f} ms)", flush=True)


if __name__ == "__main__":
    main()
