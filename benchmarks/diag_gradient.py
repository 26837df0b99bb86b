"""Diagnose where gradient() time goes at 4K: HWC->planar relayout vs the
Pallas stencil vs an achievable-HBM-bandwidth reference probe.

Run on TPU: `python benchmarks/diag_gradient.py`
"""

import os

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])

from various_image_processings_tpu.core.rng import random_image
from various_image_processings_tpu.ops.gradient import gradient
from various_image_processings_tpu.ops.pallas.gradient import gradient_pallas
from various_image_processings_tpu.utils.profiling import measure_chained


def main():
    h, w = 2160, 3840
    img = jax.device_put(jnp.asarray(random_image(h, w)))
    img_planar = jax.device_put(
        jnp.asarray(random_image(h, w)).transpose(2, 0, 1).copy())

    # full op from HWC u8 (what the bench measures), chained via u8 round-trip
    @jax.jit
    def full_step(x):
        g = gradient(x)
        return jnp.clip(g[:, :, None], 0, 255).astype(jnp.uint8).repeat(3, 2)

    # planar-entry kernel only (no HWC->CHW relayout)
    @jax.jit
    def planar_step(x):
        g = gradient_pallas(x, planar=True)
        return jnp.clip(g, 0, 255).astype(jnp.uint8)[None].repeat(3, 0)

    # relayout only: HWC u8 -> planar u8 (the prep gradient() pays); the
    # optimization_barrier forces the planar intermediate to materialize so
    # XLA cannot cancel the two transposes
    @jax.jit
    def relayout_step(x):
        p = jax.lax.optimization_barrier(x.transpose(2, 0, 1))
        return p.transpose(1, 2, 0)

    # achievable-BW probe: f32 copy with a trivial compute (reads+writes
    # 2 x HW f32 = 66 MB at 4K)
    big = jax.device_put(jnp.ones((h, w), jnp.float32))

    @jax.jit
    def copy_step(x):
        return x + 1.0

    for name, step, arg, traffic_mb in [
        ("full_hwc_u8", full_step, img, (h * w * 3 + h * w * 3) / 1e6),
        ("planar_kernel", planar_step, img_planar, (h * w * 3 * 2) / 1e6),
        ("relayout_roundtrip", relayout_step, img, (h * w * 3 * 2 * 2) / 1e6),
        ("f32_copy_probe", copy_step, big, (h * w * 4 * 2) / 1e6),
    ]:
        t = measure_chained(step, arg, iters=96, repeats=4)  # returns msec
        print(f"{name:20s} {t:8.3f} ms   ~{traffic_mb/t:7.1f} GB/s "
              f"(traffic {traffic_mb:.0f} MB)")


if __name__ == "__main__":
    main()
