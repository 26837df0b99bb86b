"""Run the five BASELINE.md benchmark configs on the current device, print a
JSON report, and write it to BENCH_DETAILS.json at the repo root (bench.py is
the one-line headline; this is the full matrix for the judge / round-over-
round regression diffing).

Configs (BASELINE.json):
1. bilateral filter, lenna.png 512², radius 9
2. gradient + adaptive bilateral, lenna.png
3. bilateral texture filter, 3 iters, mosaic_cat.png 900×600 (+ batched)
4. SLIC k≈400 (S=26 on 512²), lenna.png, 10 iterations
5. Wexler inpainting mosaic_dog.png (synthetic 64×64 hole — the repo ships
   no mask) + batched 64×4K bilateral throughput (the full BASELINE.md
   config: ~1.6 GB in + out, built on-device so it never crosses the host
   link)
"""

from __future__ import annotations

import json
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])

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


def timed_chain(step, init, iters=16, repeats=3):
    from various_image_processings_tpu.utils.profiling import measure_chained
    return measure_chained(step, init, iters, repeats=repeats) / 1e3


def _build_ref_oracle():
    """Compile tests/tools/ref_oracle.cpp (own binary path — the pytest
    fixture and the fuzz campaign each build their own to avoid ETXTBSY
    races between concurrent g++ -o's of one file)."""
    import subprocess
    import tempfile

    root = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
    tool = os.path.join(root, "tests", "tools", "ref_oracle.cpp")
    exe = os.path.join(tempfile.gettempdir(), "vip_ref_oracle_bench")
    if not os.path.exists(exe) or os.path.getmtime(exe) < os.path.getmtime(tool):
        tmp = exe + f".build{os.getpid()}"
        subprocess.run(["g++", "-O2", "-std=c++20", "-w",
                        "-I/root/reference/include", "-I/usr/include/opencv4",
                        tool, "-o", tmp, "-lopencv_core", "-lopencv_imgproc",
                        "-lopencv_ximgproc"],
                       check=True, capture_output=True, timeout=300)
        os.replace(tmp, exe)
    return exe


def _slic_quality_vs_reference(img, ours, S=26, nitr=10, m=20.0):
    """Boundary recall (2 px) and under-segmentation leakage of our labels
    against the compiled reference's labels on the same image/params, plus
    both final segment counts.  Leakage = Σ_sp (|sp| − max overlap with one
    reference segment) / N — the fraction of pixels each of our superpixels
    spills outside its dominant reference segment (0 = identical
    partitions)."""
    import subprocess
    import tempfile

    h, w = img.shape[:2]
    exe = _build_ref_oracle()
    with tempfile.TemporaryDirectory() as td:
        inp, outp = os.path.join(td, "in.bin"), os.path.join(td, "out.bin")
        np.ascontiguousarray(img).tofile(inp)
        subprocess.run([exe, "slic", inp, str(h), str(w), outp,
                        str(S), str(nitr), str(m)],
                       check=True, capture_output=True, timeout=600)
        ref = np.fromfile(outp, np.int32).reshape(h, w)

    def boundary(lbl):
        b = np.zeros(lbl.shape, bool)
        b[:, :-1] |= lbl[:, :-1] != lbl[:, 1:]
        b[:-1, :] |= lbl[:-1, :] != lbl[1:, :]
        return b

    def dilate(b, iters=2):  # 4-connected dilation, scipy-free
        for _ in range(iters):
            g = b.copy()
            g[1:] |= b[:-1]
            g[:-1] |= b[1:]
            g[:, 1:] |= b[:, :-1]
            g[:, :-1] |= b[:, 1:]
            b = g
        return b

    b_ref = boundary(ref)
    recall = float((b_ref & dilate(boundary(ours))).sum() / max(b_ref.sum(), 1))

    _, ref_inv = np.unique(ref, return_inverse=True)
    n_ref = int(ref_inv.max()) + 1
    n_ours = int(ours.max()) + 1
    overlap = np.bincount(ours.reshape(-1).astype(np.int64) * n_ref
                          + ref_inv.reshape(-1),
                          minlength=n_ours * n_ref).reshape(n_ours, n_ref)
    leakage = float((overlap.sum(1) - overlap.max(1)).sum() / (h * w))

    import math
    return {
        "seed_cells": math.ceil(h / S) * math.ceil(w / S),
        "superpixels_ref": n_ref,
        "boundary_recall_2px_vs_ref": round(recall, 3),
        "underseg_leakage_vs_ref": round(leakage, 4),
    }


def main():
    import cv2
    import various_image_processings_tpu as vip
    from various_image_processings_tpu.parallel import make_mesh, bilateral_filter_batched

    report = {"device": str(jax.devices()[0])}

    lenna = cv2.imread(f"{SAMPLES}/lenna.png", cv2.IMREAD_COLOR)
    dl = jax.device_put(jnp.asarray(lenna))
    px = lenna.shape[0] * lenna.shape[1]

    # 512² ops are ~0.2-0.7 ms/call: chains must be long enough that the
    # slope dwarfs the tunnel round-trip variance (±1-2 ms per timing)
    dt = timed_chain(lambda x: vip.bilateral_filter(x, 9, 10.0, 30.0), dl,
                     iters=256, repeats=8)
    oracle = cv2.bilateralFilter(lenna, 9, 30.0, 10.0, borderType=cv2.BORDER_REPLICATE)
    out = np.asarray(vip.bilateral_filter(dl, 9, 10.0, 30.0))
    report["config1_bilateral_lenna"] = {
        "msec": round(dt * 1e3, 3), "mps": round(px / dt / 1e6, 1),
        "max_err_vs_opencv": int(np.abs(out.astype(int) - oracle.astype(int)).max()),
    }

    # chain gradient through a u8 round-trip so the slope method applies;
    # the whole step must be ONE jitted program — eager clip/cast/repeat ops
    # each dispatch separately and cost ~5 ms/step through the tunnel
    @jax.jit
    def grad_step(x):
        g = vip.gradient(x)
        return jnp.clip(g[:, :, None], 0, 255).astype(jnp.uint8).repeat(3, 2)

    dt_g = timed_chain(grad_step, dl, iters=256, repeats=8)
    dt_a = timed_chain(lambda x: vip.adaptive_bilateral_filter(x, 9, 10.0, 30.0),
                       dl, iters=256, repeats=8)
    # ABF at 4K (VERDICT-r4 item 2): the bit-exact D2/D2b twin with the
    # recalibrated (32,512)-tile VMEM budget; first measured 2026-08-19 at
    # 13.07 ms = 634 MP/s (benchmarks/revalidate_abf.py)
    # gradient at 4K — the 512² row is fixed-overhead-dominated, this is the
    # real rate; image tiled from lenna on device (never crosses the host link)
    d4k = jax.jit(lambda x: jnp.tile(x, (5, 8, 1))[:2160, :3840])(dl)
    dt_g4 = timed_chain(grad_step, d4k, iters=64, repeats=6)
    dt_a4 = timed_chain(lambda x: vip.adaptive_bilateral_filter(x, 9, 10.0, 30.0),
                        d4k, iters=16, repeats=4)
    report["config2_gradient_abf_lenna"] = {
        "gradient_msec": round(dt_g * 1e3, 3),
        "gradient_4k_msec": round(dt_g4 * 1e3, 3),
        "gradient_4k_gps": round(2160 * 3840 / dt_g4 / 1e9, 1),
        "abf_msec": round(dt_a * 1e3, 3),
        "abf_mps": round(px / dt_a / 1e6, 1),
        "abf_4k_msec": round(dt_a4 * 1e3, 2),
        "abf_4k_mps": round(2160 * 3840 / dt_a4 / 1e6, 1),
    }

    cat = cv2.imread(f"{SAMPLES}/mosaic_cat.png", cv2.IMREAD_COLOR)
    dc = jax.device_put(jnp.asarray(cat))
    dt = timed_chain(lambda x: vip.bilateral_texture_filter(x, 9, 3), dc, iters=8)
    report["config3_btf_mosaic_cat"] = {
        "msec": round(dt * 1e3, 1),
        "mps": round(cat.shape[0] * cat.shape[1] / dt / 1e6, 1),
    }

    # cpp-path variant (cv::ximgproc::jointBilateralFilter final stage,
    # bit-exact vs the compiled cpp reference — PARITY.md D1)
    dt = timed_chain(lambda x: vip.bilateral_texture_filter(x, 9, 3,
                                                            variant="cpp"),
                     dc, iters=8)
    report["config3c_btf_cpp_variant_mosaic_cat"] = {
        "msec": round(dt * 1e3, 1),
        "mps": round(cat.shape[0] * cat.shape[1] / dt / 1e6, 1),
    }

    # BTF at 4K — the VERDICT-r4 ask: the 65 MP/s class is the measured
    # one-core VPU speed of light for exact parity (see the roofline note
    # in BENCH_DETAILS.md / benchmarks/vpu_roofline.py); this row shows the
    # rate is scale-independent, i.e. a ceiling, not 900×600 overhead
    cat4k = jax.jit(lambda x: jnp.tile(x, (3, 7, 1))[:2160, :3840])(dc)
    dt = timed_chain(lambda x: vip.bilateral_texture_filter(x, 9, 3), cat4k,
                     iters=3, repeats=3)
    report["config3d_btf_4k"] = {
        "msec": round(dt * 1e3, 1),
        "mps": round(2160 * 3840 / dt / 1e6, 1),
    }

    # batched BTF (8× mosaic_cat on one chip)
    from various_image_processings_tpu.parallel import bilateral_texture_filter_batched
    cat8 = jnp.tile(dc[None], (8, 1, 1, 1))
    mesh1 = make_mesh(batch=1, spatial=1)
    dt = timed_chain(
        lambda b: bilateral_texture_filter_batched(b, 9, 3, mesh=mesh1),
        cat8, iters=4)
    report["config3b_batched_btf_8x_mosaic_cat"] = {
        "batch": 8, "msec_per_batch": round(dt * 1e3, 1),
        "mps": round(8 * cat.shape[0] * cat.shape[1] / dt / 1e6, 1),
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
    vip.inpainting_wexler(dog, mask)  # warmup (compile/cache-load), like
    # the reference benchmark's discarded first MEASURE run
    t0 = time.perf_counter()
    vip.inpainting_wexler(dog, mask)
    report["config5a_wexler_mosaic_dog_64sq"] = {
        "sec": round(time.perf_counter() - t0, 1)}

    # irregular multi-component mask (the reference sample takes an
    # arbitrary user mask, sample/wexler_inpainting/main.cpp:10-15): an
    # L-shaped hole + a detached blob + a thin bar, exercising the
    # simultaneous-component peeling and RING_CAP-overflow divergences
    # (PARITY.md D4) under benchmark conditions
    mask2 = np.zeros(dog.shape[:2], np.uint8)
    mask2[cy - 40 : cy + 8, cx - 50 : cx - 30] = 255   # vertical limb
    mask2[cy - 8 : cy + 8, cx - 50 : cx + 10] = 255    # horizontal limb (L)
    yy, xx = np.mgrid[: dog.shape[0], : dog.shape[1]]
    mask2[(yy - (cy + 60)) ** 2 + (xx - (cx + 80)) ** 2 <= 18 ** 2] = 255
    mask2[cy + 100 : cy + 104, cx - 60 : cx + 60] = 255  # thin bar
    vip.inpainting_wexler(dog, mask2)  # warmup
    t0 = time.perf_counter()
    vip.inpainting_wexler(dog, mask2)
    report["config5c_wexler_mosaic_dog_irregular_mask"] = {
        "sec": round(time.perf_counter() - t0, 1),
        "mask_pixels": int((mask2 > 0).sum()), "components": 3}

    # the FULL BASELINE.md config: 64×4K u8 (~1.6 GB in + 1.6 GB out, fits
    # one v5e's HBM).  Built on-device from one 4K tile so the batch never
    # crosses the host link.
    tile4k = jax.device_put(
        jnp.asarray(np.tile(lenna, (5, 8, 1))[:2160, :3840]))
    batch64 = jnp.tile(tile4k[None], (64, 1, 1, 1))
    batch64.block_until_ready()
    mesh = make_mesh(batch=1, spatial=1)
    dt = timed_chain(lambda b: bilateral_filter_batched(b, 9, 10.0, 30.0, mesh=mesh),
                     batch64, iters=3)
    report["config5b_batched_64x4k_bilateral"] = {
        "batch": 64, "msec_per_batch": round(dt * 1e3, 1),
        "mps": round(64 * 2160 * 3840 / dt / 1e6, 1),
    }

    # SLIC quality scoreboard (VERDICT-r4 item 4): boundary recall +
    # under-segmentation leakage vs the COMPILED reference at the config-4
    # operating point, plus the reference's own final segment count (the
    # 731-vs-"k≈400" question: ⌈512/26⌉² = 400 seed cells, and BOTH
    # implementations inflate the final count by splitting non-contiguous
    # basins in enforce_connectivity — slic.hpp:386-458).  Runs LAST so the
    # g++ build / C++ run never contends with the TPU timings above.
    try:
        report["config4_slic_lenna_k400"].update(
            _slic_quality_vs_reference(lenna, np.asarray(labels)))
    except Exception as e:  # oracle toolchain unavailable → record why
        report["config4_slic_lenna_k400"]["quality"] = f"unavailable: {e}"

    # adversarial second image (VERDICT-r4 item 4): a high-frequency mosaic
    # texture crop — the worst case for boundary agreement since basin
    # boundaries are weakly determined there
    try:
        crop = np.ascontiguousarray(cat[:512, :512])
        ours_crop = np.asarray(vip.superpixel_slic(
            crop, superpixel_size=26, num_iteration=10))
        q = _slic_quality_vs_reference(crop, ours_crop)
        q["superpixels"] = int(ours_crop.max() + 1)
        report["config4b_slic_quality_mosaic_cat_crop"] = q
    except Exception as e:
        report["config4b_slic_quality_mosaic_cat_crop"] = {
            "quality": f"unavailable: {e}"}

    print(json.dumps(report, indent=2))
    root = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
    paths = [os.path.join(root, "BENCH_DETAILS.json")]
    rnd = os.environ.get("VIP_ROUND")  # e.g. "03" → per-round snapshot for
    if rnd:                            # round-over-round regression diffing
        paths.append(os.path.join(root, f"BENCH_DETAILS_r{rnd}.json"))
    for p in paths:
        with open(p, "w") as f:
            json.dump(report, f, indent=2)
            f.write("\n")


if __name__ == "__main__":
    main()
