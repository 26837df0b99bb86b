"""Headline benchmark: bilateral filter throughput at 4K on one TPU chip.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.
vs_baseline is measured against the north-star target of 500 MP/s/chip for
bilateral-family filters at 4K (BASELINE.md).  The timed region excludes
host↔device transfers (device-resident input, block_until_ready fencing),
mirroring the reference benchmark's exclusion of cudaMemcpy from its MEASURE
loops (sample/benchmark/main.cpp:105-201).
"""

import json
import os
import time

# persist compiles across processes (the TPU tunnel compiler is slow)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])


def main():
    from various_image_processings_tpu.core.rng import random_image
    from various_image_processings_tpu.ops.bilateral import bilateral_filter

    h, w = 2160, 3840
    img = random_image(h, w)
    d = jax.device_put(jnp.asarray(img))

    def chain(n):
        # data-dependent chain fenced by a scalar readback: dispatch is fully
        # async on this runtime and block_until_ready alone does not fence,
        # so per-kernel time is the slope between two chain lengths (the
        # intercept is the host↔device round-trip latency)
        out = d
        for _ in range(n):
            out = bilateral_filter(out, 9, 10.0, 30.0)
        return int(jnp.sum(out.astype(jnp.int32)))

    chain(2)  # warmup/compile
    k = 31
    t0 = time.perf_counter()
    chain(1)
    t1 = time.perf_counter()
    chain(k)
    t2 = time.perf_counter()
    dt = ((t2 - t1) - (t1 - t0)) / (k - 1)

    mps = h * w / dt / 1e6
    print(json.dumps({
        "metric": "bilateral_filter_4k_throughput",
        "value": round(mps, 1),
        "unit": "MP/s/chip",
        "vs_baseline": round(mps / 500.0, 3),
    }))


if __name__ == "__main__":
    main()
