"""Head-to-head: the reference benchmarked on its OWN harness workloads vs
this framework on one TPU v5e chip.

The reference publishes no numbers (BASELINE.md), so this measures them: the
compiled reference cpp paths (tests/tools/ref_oracle.cpp `bench` op — our
timing loop around the reference's real functions, MEASURE-macro semantics:
N+1 runs, first discarded, mean msec; full cv::parallel_for_ threading) on
this host's CPU, against the same ops here, same images, same parameters.

Workloads:
  W1  100×100 u8 randu [100,120) — the reference harness default
      (sample/benchmark/main.cpp:210-213), config.toml parameters
      (execute_times=10; BF/ABF k=9; BTF k=9 nitr=3; SLIC S=10 itr=10).
  W2  lenna.png 512² — production scale, same parameters (SLIC S=26 = the
      BASELINE.md k≈400 config).
  W3  4K (3840×2160, tiled lenna) — bilateral only (the north-star size).
  WX  Wexler 48² lenna crop, 12×10 hole — extra; NOT in the reference's
      benchmark list (it has no CUDA version either).

Honesty notes, also embedded in the JSON:
  - cpp runs on THIS container (nproc is typically 1 here): the per-pixel
    filters use cv::parallel_for_, so on an N-core workstation the cpp side
    scales ≈N× — divide the speedups accordingly; the production-size rows
    stay 2-4 orders of magnitude apart.  SLIC and Wexler are
    single-threaded in the reference regardless of cores.
  - the reference's CUDA paths need an NVIDIA GPU (absent here); its own
    tests hold CUDA to ±1 of the cpp paths, so cpp is the semantics anchor.
  - TPU per-call numbers for the stateless filters are chain-slope device
    times (utils/profiling.measure_chained — tunnel round-trips cancel);
    SLIC and Wexler are warm end-to-end wall clock INCLUDING host
    orchestration and the axon tunnel's ~80 ms round-trip tax.

Writes HEADTOHEAD.json at the repo root.  Run on a QUIET host (no pytest /
fuzz campaign) with the tunnel up; cpp timings run first, then one TPU
process — never concurrently.
"""

from __future__ import annotations

import json
import os
import subprocess
import tempfile
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import numpy as np

SAMPLES = "/root/reference/sample_image"
ROOT = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
TOOL = os.path.join(ROOT, "tests", "tools", "ref_oracle.cpp")


def build_oracle():
    exe = os.path.join(tempfile.gettempdir(), "vip_ref_oracle_bench")
    if not os.path.exists(exe) or os.path.getmtime(exe) < os.path.getmtime(TOOL):
        tmp = exe + f".build{os.getpid()}"
        subprocess.run(["g++", "-O2", "-std=c++20", "-w",
                        "-I/root/reference/include", "-I/usr/include/opencv4",
                        TOOL, "-o", tmp, "-lopencv_core", "-lopencv_imgproc",
                        "-lopencv_ximgproc"],
                       check=True, capture_output=True, timeout=300)
        os.replace(tmp, exe)
    return exe


def cpp_bench(exe, img, algo, n, *params, mask=None, timeout=1800):
    h, w = img.shape[:2]
    with tempfile.TemporaryDirectory() as td:
        inp = os.path.join(td, "in.bin")
        outp = os.path.join(td, "out.txt")
        buf = img.reshape(-1)
        if mask is not None:
            buf = np.concatenate([buf, mask.reshape(-1)])
        buf.tofile(inp)
        subprocess.run([exe, "bench", inp, str(h), str(w), outp, algo, str(n)]
                       + [str(p) for p in params],
                       check=True, capture_output=True, timeout=timeout)
        return float(open(outp).read())


def main():
    import cv2

    report = {
        "notes": [
            "cpp = compiled reference (tests/tools/ref_oracle.cpp bench op), "
            f"this host ({os.cpu_count()} vCPU; per-pixel filters use "
            "cv::parallel_for_ and scale with cores — SLIC/Wexler are "
            "single-threaded in the reference)",
            "tpu = one TPU v5e chip; filters are chain-slope device times, "
            "SLIC/Wexler warm wall-clock e2e incl. the axon tunnel's ~80 ms "
            "round-trip tax",
            "reference CUDA paths need an NVIDIA GPU (absent here); the "
            "reference's tests pin CUDA to ±1 u8 of these cpp paths",
        ],
        "host_cpus": os.cpu_count(),
    }
    exe = build_oracle()

    rng = np.random.default_rng(42)
    w1 = rng.integers(100, 120, (100, 100, 3)).astype(np.uint8)
    lenna = cv2.imread(f"{SAMPLES}/lenna.png", cv2.IMREAD_COLOR)

    # ---- cpp side first (quiet CPU, no TPU process alive) ----
    cpp = {}
    t0 = time.time()
    cpp["w1_gradient"] = cpp_bench(exe, w1, "gradient", 10)
    cpp["w1_bilateral"] = cpp_bench(exe, w1, "bilateral", 10, 9, 10.0, 30.0)
    cpp["w1_abf"] = cpp_bench(exe, w1, "abf", 10, 9, 10.0, 30.0)
    cpp["w1_btf"] = cpp_bench(exe, w1, "btf", 10, 9, 3)
    cpp["w1_slic"] = cpp_bench(exe, w1, "slic", 10, 10, 10, 20.0)
    print(f"cpp W1 done ({time.time() - t0:.0f}s): "
          + json.dumps({k: round(v, 2) for k, v in cpp.items()}), flush=True)

    cpp["w2_gradient"] = cpp_bench(exe, lenna, "gradient", 5)
    cpp["w2_bilateral"] = cpp_bench(exe, lenna, "bilateral", 3, 9, 10.0, 30.0)
    cpp["w2_abf"] = cpp_bench(exe, lenna, "abf", 3, 9, 10.0, 30.0)
    cpp["w2_btf"] = cpp_bench(exe, lenna, "btf", 2, 9, 3)
    cpp["w2_slic"] = cpp_bench(exe, lenna, "slic", 3, 26, 10, 20.0)
    print(f"cpp W2 done ({time.time() - t0:.0f}s)", flush=True)

    img4k = np.tile(lenna, (5, 8, 1))[:2160, :3840]
    cpp["w3_bilateral_4k"] = cpp_bench(exe, img4k, "bilateral", 1, 9, 10.0,
                                       30.0, timeout=3600)
    crop = np.ascontiguousarray(lenna[200:248, 200:248])
    wx_mask = np.zeros((48, 48), np.uint8)
    wx_mask[18:30, 20:30] = 255
    cpp["wx_wexler_48"] = cpp_bench(exe, crop, "wexler", 1, mask=wx_mask,
                                    timeout=3600)
    print(f"cpp done ({time.time() - t0:.0f}s)", flush=True)
    report["cpp_msec"] = {k: round(v, 3) for k, v in cpp.items()}

    # ---- TPU side (one process, serial) ----
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])
    from baseline_configs import timed_chain
    import various_image_processings_tpu as vip

    report["device"] = str(jax.devices()[0])
    tpu = {}

    @jax.jit
    def grad_step(x):
        g = vip.gradient(x)
        return jnp.clip(g[:, :, None], 0, 255).astype(jnp.uint8).repeat(3, 2)

    for tag, img, iters in (("w1", w1, 512), ("w2", lenna, 256)):
        d = jax.device_put(jnp.asarray(img))
        tpu[f"{tag}_gradient"] = timed_chain(grad_step, d, iters=iters,
                                             repeats=8) * 1e3
        tpu[f"{tag}_bilateral"] = timed_chain(
            lambda x: vip.bilateral_filter(x, 9, 10.0, 30.0), d,
            iters=iters, repeats=8) * 1e3
        tpu[f"{tag}_abf"] = timed_chain(
            lambda x: vip.adaptive_bilateral_filter(x, 9, 10.0, 30.0), d,
            iters=iters, repeats=8) * 1e3
        tpu[f"{tag}_btf"] = timed_chain(
            lambda x: vip.bilateral_texture_filter(x, 9, 3), d,
            iters=max(iters // 16, 8), repeats=4) * 1e3
        S = 10 if tag == "w1" else 26
        vip.superpixel_slic(img, superpixel_size=S, num_iteration=10)  # warm
        t0 = time.perf_counter()
        vip.superpixel_slic(img, superpixel_size=S, num_iteration=10)
        tpu[f"{tag}_slic"] = (time.perf_counter() - t0) * 1e3
        print(f"tpu {tag} done", flush=True)

    d4k = jax.device_put(jnp.asarray(img4k))
    tpu["w3_bilateral_4k"] = timed_chain(
        lambda x: vip.bilateral_filter(x, 9, 10.0, 30.0), d4k,
        iters=32, repeats=6) * 1e3
    vip.inpainting_wexler(crop, wx_mask)  # warm
    t0 = time.perf_counter()
    vip.inpainting_wexler(crop, wx_mask)
    tpu["wx_wexler_48"] = (time.perf_counter() - t0) * 1e3
    report["tpu_msec"] = {k: round(v, 4) for k, v in tpu.items()}
    report["speedup_tpu_over_cpp"] = {
        k: round(cpp[k] / tpu[k], 1) for k in cpp if k in tpu}

    print(json.dumps(report, indent=2))
    with open(os.path.join(ROOT, "HEADTOHEAD.json"), "w") as f:
        json.dump(report, f, indent=2)
        f.write("\n")


if __name__ == "__main__":
    main()
