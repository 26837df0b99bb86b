"""Diagnose the shard_map x Pallas overhead (VERDICT r2 item 1).

Round 2 measured ~40x slowdown wrapping Pallas calls in shard_map on this
runtime and took it as fate; this isolates where the cost sits:
  A. plain jit(pallas bf) at 4K                      (baseline)
  B. jit(shard_map(pallas bf)) 1-device mesh, replicated spec
  C. batch 8x512^2 unrolled loop: plain jit vs jit(shard_map) batch-sharded
  D. jit with NamedSharding in_shardings (GSPMD) over the batch
Run on the real TPU: `python benchmarks/diag_shardmap.py`.
"""

import os

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import functools

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])

from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from various_image_processings_tpu.core.rng import random_image
from various_image_processings_tpu.ops.pallas.bilateral import bilateral_pallas
from various_image_processings_tpu.utils.profiling import measure_chained


def main():
    print("devices:", jax.devices())
    bf = lambda x: bilateral_pallas(x, 9, 10.0, 30.0)
    mesh = Mesh(np.array(jax.devices()[:1]), ("batch",))

    # --- A/B: single 4K image --------------------------------------------
    img = jax.device_put(jnp.asarray(random_image(2160, 3840)))
    mp = 2160 * 3840 / 1e6

    ms = measure_chained(jax.jit(bf), img, iters=16)
    print(f"A  plain jit 4K:              {ms:7.2f} ms  {mp/ms*1e3:7.1f} MP/s")

    smf = jax.jit(shard_map(bf, mesh=mesh, in_specs=P(), out_specs=P(),
                            check_vma=False))
    ms = measure_chained(smf, img, iters=16)
    print(f"B  jit(shard_map) 4K repl:    {ms:7.2f} ms  {mp/ms*1e3:7.1f} MP/s")

    # --- C: batch 8 x 512^2 ----------------------------------------------
    batch = jax.device_put(jnp.asarray(
        np.stack([random_image(512, 512) for _ in range(8)])))
    bmp = 8 * 512 * 512 / 1e6

    def loop(local):
        return jnp.stack([bf(local[i]) for i in range(local.shape[0])])

    ms = measure_chained(jax.jit(loop), batch, iters=16)
    print(f"C1 plain jit batch loop:      {ms:7.2f} ms  {bmp/ms*1e3:7.1f} MP/s")

    smb = jax.jit(shard_map(loop, mesh=mesh, in_specs=P("batch"),
                            out_specs=P("batch"), check_vma=False))
    ms = measure_chained(smb, batch, iters=16)
    print(f"C2 shard_map batch loop:      {ms:7.2f} ms  {bmp/ms*1e3:7.1f} MP/s")

    # --- D: GSPMD NamedSharding on the batch axis ------------------------
    sh = NamedSharding(mesh, P("batch"))
    batch_sh = jax.device_put(batch, sh)
    gf = jax.jit(loop, in_shardings=sh, out_shardings=sh)
    ms = measure_chained(gf, batch_sh, iters=16)
    print(f"D  GSPMD in_shardings loop:   {ms:7.2f} ms  {bmp/ms*1e3:7.1f} MP/s")


if __name__ == "__main__":
    main()
