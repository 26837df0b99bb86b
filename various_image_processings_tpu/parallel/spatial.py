"""Spatial sharding with ICI halo exchange.

For single images too large for one chip, rows shard across the mesh's
spatial axis and each stencil pulls its halo rows from the ring neighbours
via ``jax.lax.ppermute`` — the TPU-native analog of the reference's
shared-memory halo tiles, lifted from intra-chip to inter-chip (SURVEY.md §5
"long-context" equivalence).

Global-boundary devices replicate their own edge rows, preserving the
reference's BORDER_REPLICATE semantics exactly, so the sharded result is
bit-identical to the single-device op.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from .mesh import SPATIAL_AXIS


def halo_exchange_rows(block: jax.Array, radius: int, axis_name: str,
                       num_devices: int) -> jax.Array:
    """(Hl, W, C) local rows → (Hl + 2r, W, C) with halo rows from ring
    neighbours; edge devices replicate their own boundary rows."""
    if num_devices == 1:
        top = jnp.broadcast_to(block[:1], (radius,) + block.shape[1:])
        bot = jnp.broadcast_to(block[-1:], (radius,) + block.shape[1:])
        return jnp.concatenate([top, block, bot], axis=0)

    idx = jax.lax.axis_index(axis_name)
    down = [(i, (i + 1) % num_devices) for i in range(num_devices)]
    up = [(i, (i - 1) % num_devices) for i in range(num_devices)]
    # my bottom rows → next device's top halo; my top rows → prev's bottom halo
    from_prev = jax.lax.ppermute(block[-radius:], axis_name, down)
    from_next = jax.lax.ppermute(block[:radius], axis_name, up)
    top_rep = jnp.broadcast_to(block[:1], (radius,) + block.shape[1:])
    bot_rep = jnp.broadcast_to(block[-1:], (radius,) + block.shape[1:])
    top = jnp.where(idx == 0, top_rep, from_prev)
    bot = jnp.where(idx == num_devices - 1, bot_rep, from_next)
    return jnp.concatenate([top, block, bot], axis=0)


def stencil_apply_sharded(fn_full, image, radius: int, mesh: Mesh,
                          out_dtype=None):
    """Run a replicate-padded stencil op on a row-sharded image.

    fn_full: the single-device op ((H', W, C) → (H', W, C)-shaped output with
    its own internal replicate padding).  Each device receives its rows plus
    exchanged halos, runs fn_full on the extended block, and crops the halo
    back off — exact for any op whose output pixel depends only on the
    (2r+1)² window.
    """
    d = mesh.shape[SPATIAL_AXIS]
    h = image.shape[0]
    if h % d != 0:
        raise ValueError(f"image rows {h} not divisible by spatial axis {d}")
    spec = P(SPATIAL_AXIS, *([None] * (image.ndim - 1)))

    @functools.partial(shard_map, mesh=mesh, in_specs=(spec,),
                       out_specs=spec, check_vma=False)
    def run(local):
        padded = halo_exchange_rows(local, radius, SPATIAL_AXIS, d)
        out = fn_full(padded)
        return out[radius : radius + local.shape[0]]

    return run(image)


def bilateral_filter_sharded(image, ksize: int = 9, sigma_space: float = 10.0,
                             sigma_color: float = 30.0, mesh: Mesh | None = None,
                             impl: str = "auto"):
    """(H, W, 3) u8 → (H, W, 3) u8, rows sharded over the mesh's spatial
    axis with ppermute halo exchange. Bit-identical to the single-device op."""
    from ..ops.bilateral import _bf_jit
    from ..ops._dispatch import resolve_impl
    if mesh is None:
        from .mesh import make_mesh
        mesh = make_mesh(batch=1, spatial=len(jax.devices()))
    impl = resolve_impl(impl)
    radius = ksize // 2
    fn = lambda blk: _bf_jit(blk, int(ksize), float(sigma_space),
                             float(sigma_color), impl)
    return stencil_apply_sharded(fn, image, radius, mesh)
