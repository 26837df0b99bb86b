"""On-chip revalidation for the ABF bit-exact twin (PARITY.md D2/D2b).

Run after any change to the ABF index/weight path: checks Mosaic still
compiles the kernel, parity holds on hardware (±1 vs golden at standard σ,
a few-u8 TPU-exp2 wiggle on the adversarial small-σ fuzz cases — CPU
measures bit-exact there), and re-measures 4K throughput.  The round-4
fidelity rework pays 24 ops/tap (bit-exact C++ f32 index sequence +
double-rounded weight twin, DESIGN.md "VPU ceiling"); measured 2026-08-19
at the recalibrated (32,512) tile: **13.07 ms = 634 MP/s at 4K** (vs the
pre-rework 21-op kernel's ~980 — the fidelity cost, accepted; the
σc-gated fast path was evaluated and rejected, DESIGN.md).

Run: `python benchmarks/revalidate_abf.py`  (exit 0 = all checks hold).
"""

import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])


def main() -> int:
    import warnings

    from various_image_processings_tpu import golden
    from various_image_processings_tpu.core.rng import random_image
    from various_image_processings_tpu.ops.adaptive_bilateral import (
        adaptive_bilateral_filter)
    from various_image_processings_tpu.utils.profiling import measure_chained

    print("device:", jax.devices()[0], flush=True)
    ok = True

    # standard-σ parity on hardware (the hw_parity.py envelope).  NB: a
    # natural image, not noise — at 512² pure noise even σc=30 puts a few
    # pixels fully into the D2b subnormal band (±few-u8 wobble class), so
    # the ≤1 bound only applies off-band.
    import cv2
    img = cv2.imread("/root/reference/sample_image/lenna.png", cv2.IMREAD_COLOR)
    out = np.asarray(adaptive_bilateral_filter(img, 9, 10.0, 30.0))
    exp = golden.adaptive_bilateral_filter(img, 9, 10.0, 30.0)
    d = np.abs(out.astype(int) - exp.astype(int)).max()
    print(f"{'OK ' if d <= 1 else 'FAIL'} abf_512_std: max {d} (bound 1)")
    ok &= d <= 1

    # D2/D2b adversarial cases: the round-4 fuzz failure parameter points
    # (subnormal windows, index-boundary flips, subnormal space weights).
    # The twin measures bit-exact on CPU; allow a few u8 for TPU exp2
    # near-tie quantum flips (same envelope as hw_parity.py).
    worst = 0
    for i, (k, ss, sc, h, w) in enumerate([(15, 22.8, 11.5, 45, 13),
                                           (13, 1.13, 1.6, 50, 50),
                                           (9, 38.58, 7.58, 64, 31),
                                           (15, 0.47, 3.49, 31, 64)]):
        img2 = (random_image(h, w) if i == 0 else
                np.random.default_rng(777 + i).integers(
                    0, 256, (h, w, 3), np.uint8))
        out2 = np.asarray(adaptive_bilateral_filter(img2, k, ss, sc))
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            exp2 = golden.adaptive_bilateral_filter(img2, k, ss, sc)
        worst = max(worst, int(np.abs(out2.astype(int)
                                      - exp2.astype(int)).max()))
    print(f"{'OK ' if worst <= 4 else 'FAIL'} abf_twin_adversarial: "
          f"worst {worst} u8 over 4 regimes (bound 4)")
    ok &= worst <= 4

    # 4K throughput
    big = jax.device_put(jnp.asarray(random_image(2160, 3840)))
    t = measure_chained(
        lambda x: adaptive_bilateral_filter(x, 9, 10.0, 30.0), big,
        iters=16, repeats=4)  # msec
    mps = 2160 * 3840 / t / 1e3
    print(f"abf_4k: {t:.2f} ms = {mps:.0f} MP/s")

    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
