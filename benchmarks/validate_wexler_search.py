"""On-chip validation + A/B for the fused Wexler search kernel
(ops/pallas/wexler_search.py, VIP_WEXLER_SEARCH=pallas).

Checks, on the real device:
1. Mosaic compiles the kernel (the interpret-mode tests can't prove this);
2. picks match the conv path on a real search instance (same (y, x) for
   every valid target; energies within f32-summation tolerance);
3. A/B times one T=256 and one T=1024 search dispatch (chain-slope), and
   the end-to-end mosaic_dog fill both ways.

Run: `python benchmarks/validate_wexler_search.py`  (exit 0 = parity holds
and the kernel compiled).  Flip the _search_impl default only after this
is green AND faster.
"""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])

SAMPLES = "/root/reference/sample_image"


def main() -> int:
    import cv2

    from various_image_processings_tpu.models import inpainting as M
    from various_image_processings_tpu.utils.profiling import measure_chained

    print("device:", jax.devices()[0], flush=True)
    ok = True

    img = cv2.imread(f"{SAMPLES}/mosaic_dog.png", cv2.IMREAD_COLOR)
    h, w = img.shape[:2]
    img_f = jnp.asarray(img.astype(np.float32))
    p117 = M._build_p117(img_f, w)

    rng = np.random.default_rng(0)
    rem = np.zeros((h, w), np.float32)
    rem[150:214, 300:364] = 1.0  # 64^2 hole like the bench config
    ring_y, ring_x = np.nonzero(
        (rem > 0) & ~np.pad(rem, 1)[2:, 1:-1].astype(bool))

    for cap in (256, 1024):
        ty = np.zeros(cap, np.int32)
        tx = np.zeros(cap, np.int32)
        n = min(cap, len(ring_y))
        sel = rng.choice(len(ring_y), n, replace=False)
        ty[:n] = ring_y[sel]
        tx[:n] = ring_x[sel]
        tvalid = np.arange(cap) < n
        args = (img_f, p117, jnp.asarray(rem), jnp.asarray(ty),
                jnp.asarray(tx), jnp.asarray(tvalid), h, w)

        outs = {}
        times = {}
        for impl in ("conv", "pallas"):
            M._search_impl = lambda impl=impl: impl

            @jax.jit
            def run(im, _rest=args[1:]):
                return M._ring_targets_search(im, *_rest, initial=False)

            @jax.jit
            def step(im, _rest=args[1:]):
                # chainable: image out, data-dependent on the search energy
                e, _, _ = M._ring_targets_search(im, *_rest, initial=False)
                return im + e[0] * jnp.float32(0)

            try:
                outs[impl] = [np.asarray(v) for v in run(img_f)]
            except Exception as e:  # Mosaic rejection shows up here
                print(f"FAIL {impl} cap={cap}: {type(e).__name__}: "
                      f"{str(e)[:300]}")
                return 1
            times[impl] = measure_chained(step, img_f, iters=8, repeats=3)
        e_c, y_c, x_c = outs["conv"]
        e_p, y_p, x_p = outs["pallas"]
        v = tvalid
        picks_eq = (y_p[v] == y_c[v]).all() and (x_p[v] == x_c[v]).all()
        e_close = np.allclose(e_p[v], e_c[v], rtol=1e-6, atol=8.0)
        print(f"{'OK ' if picks_eq and e_close else 'FAIL'} cap={cap}: "
              f"picks_eq={picks_eq} e_close={e_close} "
              f"conv {times['conv']:.2f} ms vs pallas "
              f"{times['pallas']:.2f} ms", flush=True)
        ok &= picks_eq and e_close

    # end-to-end A/B (fresh processes would be cleaner; clear_cache works)
    mask = (rem > 0).astype(np.uint8) * 255
    for impl in ("conv", "pallas"):
        os.environ["VIP_WEXLER_SEARCH"] = impl
        M._search_impl = lambda impl=impl: impl
        M._fill_pass_device.clear_cache()
        M._energy_loops_device.clear_cache()
        from various_image_processings_tpu.ops.inpainting import (
            inpainting_wexler)
        t0 = time.perf_counter()
        inpainting_wexler(img, mask)
        warm = time.perf_counter()
        out = inpainting_wexler(img, mask)
        t1 = time.perf_counter()
        print(f"e2e {impl}: warm {t1 - warm:.2f} s (first "
              f"{warm - t0:.1f} s) sum {int(out.astype(np.int64).sum())}",
              flush=True)

    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
