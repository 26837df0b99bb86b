"""Headline benchmark: bilateral filter throughput at 4K on one TPU chip.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.
vs_baseline is measured against the north-star target of 500 MP/s/chip for
bilateral-family filters at 4K (BASELINE.md).  The timed region excludes
host↔device transfers (device-resident input, block_until_ready fencing),
mirroring the reference benchmark's exclusion of cudaMemcpy from its MEASURE
loops (sample/benchmark/main.cpp:105-201).
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from various_image_processings_tpu.core.rng import random_image
    from various_image_processings_tpu.ops.bilateral import bilateral_filter

    h, w = 2160, 3840
    img = random_image(h, w)
    d = jax.device_put(jnp.asarray(img))

    bilateral_filter(d, 9, 10.0, 30.0).block_until_ready()  # warmup/compile
    iters = 30
    t0 = time.perf_counter()
    for _ in range(iters):
        out = bilateral_filter(d, 9, 10.0, 30.0)
    out.block_until_ready()
    dt = (time.perf_counter() - t0) / iters

    mps = h * w / dt / 1e6
    print(json.dumps({
        "metric": "bilateral_filter_4k_throughput",
        "value": round(mps, 1),
        "unit": "MP/s/chip",
        "vs_baseline": round(mps / 500.0, 3),
    }))


if __name__ == "__main__":
    main()
