"""Tile binning: gaussian -> (tile, depth)-sorted instance list, static shapes.

TPU re-design of the CUDA pipeline in rasterizer_impl.cu:
- CUB InclusiveSum of tiles_touched   (:277)        -> jnp.cumsum
- duplicateWithKeys 64-bit keys       (:70-111)     -> segmented expansion via
  scatter + cumulative max (no per-thread loops, no dynamic allocation)
- CUB DeviceRadixSort on [tile|depth] (:300-308)    -> jax.lax.sort with two
  keys (tile id, depth float) — stable, so emission order breaks ties exactly
  like the radix sort over bit-packed keys
- identifyTileRanges                  (:116-138)    -> jnp.searchsorted

The CUDA version allocates `num_rendered` dynamically per frame; here the
instance list has a *static* capacity and the true required size is returned so
overflow can be surfaced (never silently ignored) — SURVEY.md section 7.1 item 1.
Instances that do not fit are dropped deterministically from the end of the
emission order.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class Binning(NamedTuple):
    gid: jnp.ndarray  # (K,) int32 gaussian index per instance, sorted
    tile_of: jnp.ndarray  # (K,) int32 tile id per instance, sorted; num_tiles = invalid
    tile_start: jnp.ndarray  # (T,) int32 first instance of each tile
    tile_count: jnp.ndarray  # (T,) int32 instances in each tile
    num_instances: jnp.ndarray  # () int32 — instances actually emitted (<= K)
    required: jnp.ndarray  # () int32 — instances needed; > K means overflow


def bin_gaussians(
    tiles_touched: jnp.ndarray,
    rect: jnp.ndarray,
    depths: jnp.ndarray,
    *,
    grid_x: int,
    grid_y: int,
    capacity: int,
) -> Binning:
    """Expand each visible gaussian into one instance per touched tile and sort.

    Args:
      tiles_touched: (P,) int32 — 0 for culled gaussians.
      rect: (P, 4) int32 tile rect [x0, y0, x1, y1).
      depths: (P,) float32 view-space z (all > 0.2 for visible gaussians).
      grid_x, grid_y: static tile grid dims.
      capacity: static instance capacity K.
    """
    P = tiles_touched.shape[0]
    K = capacity
    num_tiles = grid_x * grid_y

    t = tiles_touched.astype(jnp.int32)
    offsets = jnp.cumsum(t) - t  # exclusive prefix sum
    required = offsets[-1] + t[-1] if P > 0 else jnp.int32(0)

    # Scatter gaussian index at its first instance slot; forward-fill with a
    # cumulative max.  Offsets are strictly increasing over emitting gaussians,
    # so slots are unique; `drop` discards emitters at/after the capacity edge.
    emit = t > 0
    slot = jnp.where(emit, offsets, K)
    seed = jnp.zeros((K,), jnp.int32).at[slot].max(
        jnp.arange(P, dtype=jnp.int32) + 1, mode="drop"
    )
    gid = jax.lax.cummax(seed) - 1  # -1 before the first emitter
    pos = jnp.arange(K, dtype=jnp.int32)
    safe_gid = jnp.maximum(gid, 0)
    rank = pos - offsets[safe_gid]
    valid = (gid >= 0) & (rank < t[safe_gid])

    # duplicateWithKeys iterates y-outer / x-inner (rasterizer_impl.cu:89-103).
    r = rect[safe_gid]
    w = jnp.maximum(r[:, 2] - r[:, 0], 1)
    tx = r[:, 0] + rank % w
    ty = r[:, 1] + rank // w
    tile_id = jnp.where(valid, ty * grid_x + tx, num_tiles).astype(jnp.int32)
    depth_key = jnp.where(valid, depths[safe_gid], jnp.inf).astype(jnp.float32)

    tile_sorted, _, gid_sorted = jax.lax.sort(
        (tile_id, depth_key, safe_gid.astype(jnp.int32)), num_keys=2, is_stable=True
    )

    tile_range = jnp.arange(num_tiles + 1, dtype=jnp.int32)
    bounds = jnp.searchsorted(tile_sorted, tile_range, side="left").astype(jnp.int32)
    tile_start = bounds[:-1]
    tile_count = bounds[1:] - bounds[:-1]

    num_instances = jnp.minimum(required, K).astype(jnp.int32)
    return Binning(
        gid=gid_sorted,
        tile_of=tile_sorted,
        tile_start=tile_start,
        tile_count=tile_count,
        num_instances=num_instances,
        required=required.astype(jnp.int32),
    )
