"""Tile binning: gaussian -> (tile, depth)-sorted instance list, static shapes.

TPU re-design of the CUDA pipeline in rasterizer_impl.cu:
- CUB InclusiveSum of tiles_touched   (:277)        -> jnp.cumsum
- duplicateWithKeys 64-bit keys       (:70-111)     -> segmented expansion via
  jnp.repeat with a static total length (no per-thread loops, no dynamic
  allocation)
- CUB DeviceRadixSort on [tile|depth] (:300-308)    -> jax.lax.sort with two
  keys (tile id, depth float) — stable, so emission order breaks ties exactly
  like the radix sort over bit-packed keys
- identifyTileRanges                  (:116-138)    -> jnp.searchsorted

Two TPU-specific deltas from the CUDA version:

1. The instance list has a *static* capacity; the true required size is
   returned so overflow is surfaced (never silent) — SURVEY.md section 7.1.
   Overflowing instances drop deterministically from the end of emission order.
2. Each tile's range is *aligned to the kernel chunk size* (128 = the TPU lane
   width): after sorting, instances are scattered into a padded layout where
   tile t owns rows [chunk_start[t]*chunk, +ceil(count/chunk)*chunk).  This is
   what lets the Pallas kernels stream each tile's splats with lane-aligned
   DMA slices, and gives the backward kernel an exclusive, disjoint slice of
   gradient rows per tile (the no-atomics design).  Padding rows inside a
   tile's last chunk point at gaussian 0 but are masked by the per-tile count.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class Binning(NamedTuple):
    gid: jnp.ndarray  # (Kp,) int32 gaussian index per aligned instance slot
    tile_chunk_start: jnp.ndarray  # (T,) int32 — first chunk index of each tile
    tile_count: jnp.ndarray  # (T,) int32 instances in each tile (un-padded)
    num_instances: jnp.ndarray  # () int32 — instances actually emitted (<= K)
    required: jnp.ndarray  # () int32 — instances needed; > K means overflow
    total_aligned: jnp.ndarray  # () int32 — rows in use incl. padding (<= Kp)


def aligned_capacity(capacity: int, num_tiles: int, chunk: int) -> int:
    """Static padded capacity: every tile can waste < chunk rows."""
    return ((capacity + chunk - 1) // chunk) * chunk + num_tiles * chunk


def bin_gaussians(
    tiles_touched: jnp.ndarray,
    rect: jnp.ndarray,
    depths: jnp.ndarray,
    *,
    grid_x: int,
    grid_y: int,
    capacity: int,
    chunk: int,
    sort_mode: str = "exact",
) -> Binning:
    """Expand each visible gaussian into one instance per touched tile, sort by
    (tile, depth), and lay the result out chunk-aligned per tile.

    Args:
      tiles_touched: (P,) int32 — 0 for culled gaussians.
      rect: (P, 4) int32 tile rect [x0, y0, x1, y1).
      depths: (P,) float32 view-space z (all > 0.2 for visible gaussians).
      grid_x, grid_y, capacity, chunk: static geometry.
    """
    P = tiles_touched.shape[0]
    K = capacity
    num_tiles = grid_x * grid_y
    Kp = aligned_capacity(K, num_tiles, chunk)

    t = tiles_touched.astype(jnp.int32)
    cum = jnp.cumsum(t)  # inclusive prefix sum
    offsets = cum - t  # exclusive
    required = cum[-1] if P > 0 else jnp.int32(0)

    # Segmented expansion: instance slot -> owning gaussian via jnp.repeat
    # (static total length; the tail repeats the last id and is masked).
    # Per-gaussian fields are packed into ONE int32 row so the K-sized
    # expansion needs only two gathers (a searchsorted formulation measured
    # 3-4x slower on TPU: XLA lowers it to per-step gather loops).
    safe_gid = jnp.repeat(
        jnp.arange(P, dtype=jnp.int32), t, total_repeat_length=K
    )
    pos = jnp.arange(K, dtype=jnp.int32)
    valid = pos < jnp.minimum(required, K)

    packed = jnp.stack(
        [offsets, rect[:, 0], rect[:, 1],
         jnp.maximum(rect[:, 2] - rect[:, 0], 1)],
        axis=1,
    )  # (P, 4) int32
    # Optimization barriers pin stage boundaries: without them XLA fuses the
    # expansion/sort/gather producers into each other's consumers and the
    # fused pipeline measures ~2x slower than its parts (profiled on v5e).
    safe_gid, packed = jax.lax.optimization_barrier((safe_gid, packed))
    pk = packed[safe_gid]  # (K, 4)
    rank = pos - pk[:, 0]
    # duplicateWithKeys iterates y-outer / x-inner (rasterizer_impl.cu:89-103).
    w = pk[:, 3]
    tx = pk[:, 1] + rank % w
    ty = pk[:, 2] + rank // w
    tile_id = jnp.where(valid, ty * grid_x + tx, num_tiles).astype(jnp.int32)
    depth_key = jnp.where(valid, depths[safe_gid], jnp.inf).astype(jnp.float32)
    tile_id, depth_key = jax.lax.optimization_barrier((tile_id, depth_key))

    if sort_mode == "packed":
        # Single uint32 key: [tile:13 | float-depth-top-bits:19].  Positive
        # float32 bit patterns are monotone, so truncating the mantissa keeps
        # the order except for sub-0.1%-relative-depth ties (stable by
        # emission order, like the CUB radix sort's tiebreak).
        assert num_tiles < (1 << 13), "packed sort supports < 8192 tiles"
        dbits = (depth_key.view(jnp.uint32) >> 13) & jnp.uint32(0x7FFFF)
        key = (tile_id.astype(jnp.uint32) << 19) | dbits
        key_sorted, gid_sorted = jax.lax.sort(
            (key, safe_gid.astype(jnp.int32)), num_keys=1, is_stable=True
        )
        tile_sorted = (key_sorted >> 19).astype(jnp.int32)
        tile_range = jnp.arange(num_tiles + 1, dtype=jnp.int32)
        bounds = jnp.searchsorted(
            key_sorted, (tile_range.astype(jnp.uint32) << 19), side="left"
        ).astype(jnp.int32)
    else:
        tile_sorted, _, gid_sorted = jax.lax.sort(
            (tile_id, depth_key, safe_gid.astype(jnp.int32)), num_keys=2,
            is_stable=True,
        )
        tile_range = jnp.arange(num_tiles + 1, dtype=jnp.int32)
        bounds = jnp.searchsorted(tile_sorted, tile_range, side="left").astype(
            jnp.int32
        )
    tile_start = bounds[:-1]
    tile_count = bounds[1:] - bounds[:-1]
    num_instances = jnp.minimum(required, K).astype(jnp.int32)

    # Chunk-aligned re-layout: tile t's instances move to
    # chunk_start[t]*chunk + within-tile rank.
    chunks_per_tile = (tile_count + chunk - 1) // chunk
    chunk_start = jnp.cumsum(chunks_per_tile) - chunks_per_tile  # exclusive
    total_aligned = (chunk_start[-1] + chunks_per_tile[-1]) * chunk

    in_tile = tile_sorted < num_tiles
    safe_tile = jnp.minimum(tile_sorted, num_tiles - 1)
    rank_in_tile = pos - tile_start[safe_tile]
    new_pos = jnp.where(
        in_tile, chunk_start[safe_tile] * chunk + rank_in_tile, Kp
    )
    gid_aligned = jnp.zeros((Kp,), jnp.int32).at[new_pos].set(
        gid_sorted, mode="drop"
    )
    gid_aligned = jax.lax.optimization_barrier(gid_aligned)

    return Binning(
        gid=gid_aligned,
        tile_chunk_start=chunk_start,
        tile_count=tile_count,
        num_instances=num_instances,
        required=required.astype(jnp.int32),
        total_aligned=total_aligned,
    )
