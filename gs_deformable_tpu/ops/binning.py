"""Tile binning: gaussian -> (tile, depth)-sorted instance list, static shapes.

TPU re-design of the CUDA pipeline in rasterizer_impl.cu:
- CUB InclusiveSum of tiles_touched   (:277)        -> blocked MXU cumsum
- duplicateWithKeys 64-bit keys       (:70-111)     -> scatter-at-segment-start
  + blocked cummax fill (monotone gaussian ids), static total length
- CUB DeviceRadixSort on [tile|depth] (:300-308)    -> jax.lax.sort with two
  keys (tile id, depth float) or a packed single uint32 key — stable, so
  emission order breaks ties exactly like the radix sort over bit-packed keys
- identifyTileRanges                  (:116-138)    -> explicit vectorized
  binary search (jnp.take per round) over the sorted keys

Two TPU-specific deltas from the CUDA version:

1. The instance list has a *static* capacity; the true required size is
   returned so overflow is surfaced (never silent) — SURVEY.md section 7.1.
   Overflowing instances drop deterministically from the end of the emission
   order; exact/radix modes emit rank-major (depth-sorted), so the DEEPEST
   instances — the least visible — drop first.
2. Each tile's range is *aligned to the kernel chunk size* (128 = the TPU lane
   width): after sorting, instances are scattered into a padded layout where
   tile t owns rows [chunk_start[t]*chunk, +ceil(count/chunk)*chunk).  This is
   what lets the Pallas kernels stream each tile's splats with lane-aligned
   DMA slices, and gives the backward kernel an exclusive, disjoint slice of
   gradient rows per tile (the no-atomics design).  Padding rows inside a
   tile's last chunk point at gaussian 0 but are masked by the per-tile count.

Performance notes (profiled on v5e at 1M instances — tools/profile_binning.py):
XLA's generic gather/scatter/scan lower to ~2.4G elements/s on TPU, so the
v1 pipeline (jnp.repeat + 4-wide packed gather + searchsorted + rank gathers)
spent ~36ms outside the sort.  v2 replaces them with:
- ops/scan_utils blocked cumsum (MXU triangular matmuls) instead of XLA's
  scan lowering;
- delta-cumsum segment fills (_delta_fills) instead of K-sized gathers or
  cummax wherever the per-instance value is a per-segment constant that is
  monotone across segments (owner id, segment start, tile start, chunk base);
- one int32 rect-code gather + one depth gather (the only K-sized gathers
  left before the sort);
- tile bounds from one boundary-row scatter + (T,) suffix-min backfill
  (tile_bounds_from_sorted) instead of binary search or jnp.searchsorted
  (6ms lowering; the 20-round take-search was ~1.2ms).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .scan_utils import (
    counting_sort_dest,
    cummax_i32,
    cumsum_cols_f32,
    cumsum_i32,
    radix_sort_u32,
)


class Binning(NamedTuple):
    gid: jnp.ndarray  # (Kp,) int32 gaussian index per aligned instance slot
    tile_chunk_start: jnp.ndarray  # (T,) int32 — first chunk index of each tile
    tile_count: jnp.ndarray  # (T,) int32 instances in each tile (un-padded)
    num_instances: jnp.ndarray  # () int32 — instances actually emitted (<= K)
    required: jnp.ndarray  # () int32 — instances needed; > K means overflow
    total_aligned: jnp.ndarray  # () int32 — rows in use incl. padding (<= Kp)


def aligned_capacity(
    capacity: int, num_tiles: int, chunk: int, slack: int = -1
) -> int:
    """Static padded capacity for the chunk-aligned layout.

    ``slack`` bounds the total per-tile padding (each non-empty tile wastes
    < chunk rows in its final chunk).  -1 = the exact worst case
    (num_tiles*chunk, every tile padded) — never overflows but typically ~2x
    oversized; a tighter budget shrinks every Kp-proportional cost (relayout
    scatter, splat gather + its transpose, kernel sentinel sweep).  With a
    finite budget the layout can overflow; Binning.total_aligned surfaces the
    true need so callers can grow (never a silent drop without a counter).
    """
    base = ((capacity + chunk - 1) // chunk) * chunk
    if slack < 0:
        slack = num_tiles * chunk
    slack = ((slack + chunk - 1) // chunk) * chunk
    return base + slack


def take_searchsorted(sorted_arr: jnp.ndarray, queries: jnp.ndarray):
    """bisect_left via explicit vectorized binary search (jnp.take rounds).

    jnp.searchsorted's TPU lowering measured ~6ms for 8k queries into a 1M
    table; ceil(log2(K)) rounds of a (Q,)-sized take are ~10x faster.
    """
    n = sorted_arr.shape[0]
    lo = jnp.zeros(queries.shape, jnp.int32)
    hi = jnp.full(queries.shape, n, jnp.int32)
    # The search interval [lo, hi] starts n+1 wide, so n.bit_length() rounds.
    rounds = max(1, n.bit_length())
    for _ in range(rounds):
        live = lo < hi
        mid = (lo + hi) // 2
        v = jnp.take(sorted_arr, jnp.minimum(mid, n - 1))
        go_right = live & (v < queries)
        lo = jnp.where(go_right, mid + 1, lo)
        hi = jnp.where(live & jnp.logical_not(go_right), mid, hi)
    return lo


def tile_bounds_from_sorted(tile_sorted: jnp.ndarray, num_tiles: int):
    """identifyTileRanges (rasterizer_impl.cu:116-138) over a sorted stream.

    Returns (T+1,) bounds with bounds[t] = first index whose tile >= t —
    identical to bisect_left for every t.  One boundary-row scatter (each
    present tile has exactly ONE boundary, so indices are unique — a plain
    .set) plus a (T+1,)-sized reverse cummin backfill for absent tiles;
    replaces the 20-round take_searchsorted binary search (~1.2 ms at 590k
    keys on v5e) with ~0.2 ms of scatter+scan.
    """
    K = tile_sorted.shape[0]
    prev = jnp.concatenate(
        [jnp.full((1,), -1, jnp.int32), tile_sorted[:-1]]
    )
    pos = jnp.arange(K, dtype=jnp.int32)
    is_b = tile_sorted != prev
    # Distinct ascending OOB sentinels (num_tiles+1+pos) keep the index set
    # genuinely unique, unlocking XLA's fast scatter path (TPU scatters with
    # potentially-duplicate indices lower to a serialized update loop —
    # measured ~2.7 ms for this one boundary scatter at 590k keys).
    idx = jnp.where(is_b, tile_sorted, num_tiles + 1 + pos)
    starts = jnp.full((num_tiles + 1,), K, jnp.int32).at[idx].set(
        pos, mode="drop", unique_indices=True
    )
    # Absent tiles take the next present tile's start: suffix min == reversed
    # cummax of the negation.
    bounds = -cummax_i32(-starts[::-1])[::-1]
    return bounds


def tile_bounds_via_sort(tile_sorted: jnp.ndarray, num_tiles: int):
    """tile_bounds_from_sorted with the K-update scatter replaced by a sort.

    This environment's XLA scatters run ~210M updates/s while lax.sort runs
    ~1.4G elem/s (tools/profile_r5/r6): the 590k-row boundary scatter costs
    ~2.8 ms, so instead the ~T boundary rows are COMPACTED to the front with
    one single-key (K, 2) sort and scattered from there (<= T+1 updates).
    Bitwise-identical bounds.
    """
    K = tile_sorted.shape[0]
    T1 = min(num_tiles + 1, K)
    pos = jnp.arange(K, dtype=jnp.int32)
    prev = jnp.concatenate([jnp.full((1,), -1, jnp.int32), tile_sorted[:-1]])
    is_b = tile_sorted != prev
    # Boundary rows keep their tile (the num_tiles sentinel of invalid slots
    # is a real "tile": its boundary is the end of the valid stream, exactly
    # bounds[num_tiles]); non-boundaries sort to the back.
    bkey = jnp.where(is_b, tile_sorted, num_tiles + 1)
    bkey_s, bpos_s = jax.lax.sort((bkey, pos), num_keys=1, is_stable=True)
    head_key = bkey_s[:T1]
    head_pos = bpos_s[:T1]
    live = head_key <= num_tiles
    idx = jnp.where(live, head_key, num_tiles + 1 + jnp.arange(T1, dtype=jnp.int32))
    starts = jnp.full((num_tiles + 1,), K, jnp.int32).at[idx].set(
        head_pos, mode="drop", unique_indices=True, indices_are_sorted=True
    )
    bounds = -cummax_i32(-starts[::-1])[::-1]
    return bounds


def _delta_fills(values_list, active, positions, K: int, widths=None,
                 fill_mode: str = "scatter"):
    """Segment-fill (K,) arrays with per-segment constants via delta cumsum.

    Each ``values_list[i]`` is an (N,)-sized array of per-segment values; the
    segments start at ``positions`` (active segments selected by ``active``).
    The fill telescopes: scatter each segment's delta vs. the previous active
    segment at its start position and take one MXU-blocked cumsum.  Scatters
    are ~10x cheaper than gathers on TPU (XLA gathers run at ~140M elements/s
    — tools/profile_bin3.py), so this replaces every "value[owner]" gather
    whose value is constant per segment.

    The blocked cumsum accumulates in fp32, which is exact only while every
    partial delta sum stays under 2^24 in magnitude; any prefix of deltas
    telescopes to (some value) - (some earlier value), so non-negative values
    below 2^22 are exact directly.  ``widths[i]`` declares the bit width of
    values_list[i]: entries <= 22 fill directly, wider ones (up to 31 bits)
    split into a >>15 half and a 15-bit half, filled separately and
    recombined.  Positions before the first active segment fill with 0.
    """
    n = active.shape[0]
    npos = jnp.arange(n, dtype=jnp.int32)
    arank = cumsum_i32(active.astype(jnp.int32)) - 1
    # Distinct OOB sentinels (n+pos) make every scatter index UNIQUE, which
    # unlocks XLA's vectorized scatter path (duplicate-capable scatters
    # serialize on TPU; measured 5.2 ms for the batched fill scatter alone
    # at bench scale).  The inactive sentinels interleave with active ranks,
    # so this index set is unique but NOT sorted.
    slot = jnp.where(active, arank, n + npos)
    # Compacted segment-start positions (inactive tail slots scatter OOB and
    # drop).  Deltas are formed in compact space with a shift — gathers are
    # ~10x costlier than scatters on TPU, so no vals[prev] lookup.
    # Init with ascending OOB sentinels K+j: after the active positions
    # (ascending; overflow positions >= K clamp into the OOB band to keep
    # global order) land in the prefix, pos_compact is ascending AND unique —
    # the downstream (K, C) fill scatter can claim both indices_are_sorted
    # and unique_indices.
    pos_compact = (K + npos).at[slot].set(
        jnp.minimum(positions, K + arank), mode="drop", unique_indices=True
    )
    if widths is None:
        widths = [22] * len(values_list)

    # All fills share the same scatter indices, so they batch into ONE row
    # scatter of a (n, C) value block, ONE (K, C) row scatter of the deltas,
    # and ONE column-batched MXU cumsum — profiled 7 serial one-column fills
    # cost ~9.4 ms at K=590k on v5e (each pays its own K-sized zeros +
    # scatter + cumsum pass); the batched form makes one pass over each
    # buffer.  Values wider than 22 bits split into (>>15, &0x7FFF) column
    # pairs so every fp32-carried partial sum stays exact below 2^24.
    cols = []  # (value index, kind) with kind in {"all", "hi", "lo"}
    stacked = []
    for i, (vals, wbits) in enumerate(zip(values_list, widths)):
        if wbits <= 23:
            # exact: any partial delta sum telescopes to v_a - v_b with
            # v in [0, 2^wbits), so |partial| < 2^23 <= fp32's 2^24 window
            cols.append((i, "all"))
            stacked.append(vals)
        else:
            assert wbits <= 31, "split fill supports < 2^31"
            cols.append((i, "hi"))
            stacked.append(vals >> 15)
            cols.append((i, "lo"))
            stacked.append(vals & 0x7FFF)
    vblock = jnp.stack(stacked, axis=1).astype(jnp.float32)  # (n, C)
    C = vblock.shape[1]
    compact = jnp.zeros((n, C), jnp.float32).at[slot].set(
        vblock, mode="drop", unique_indices=True
    )
    prev = jnp.concatenate([jnp.zeros((1, C), jnp.float32), compact[:-1]])
    delta = compact - prev
    if fill_mode in ("pallas", "pallas_all"):
        # pos_compact is ascending-unique (active positions in the prefix,
        # K+j OOB sentinels in the tail), so the two-level fill kernel
        # applies; the (K, C) scatter+cumsum it replaces pays the blocked
        # cumsum's 128-lane padding on narrow C (~0.6 ms at bench scale for
        # the 2-column relayout tables — tools/probe_r04 cost model).
        from .pallas.ordered_fill import ordered_prefix_fill

        ck = ordered_prefix_fill(pos_compact, delta, K).astype(jnp.int32)

        def col(j):
            return ck[j]
    else:
        seg = jnp.zeros((K, C), jnp.float32).at[pos_compact].set(
            delta, mode="drop", unique_indices=True, indices_are_sorted=True
        )
        cs = cumsum_cols_f32(seg).astype(jnp.int32)

        def col(j):
            return cs[:, j]

    parts = {}
    for j, (i, kind) in enumerate(cols):
        parts.setdefault(i, {})[kind] = col(j)
    fills = []
    for i in range(len(values_list)):
        p = parts[i]
        if "all" in p:
            fills.append(p["all"])
        else:
            fills.append((p["hi"] << 15) | p["lo"])
    return fills


def _prefix_fills(values_list, active, positions, K: int, widths=None,
                  fill_mode: str = "scatter"):
    """_delta_fills for inputs whose active rows form a FRONT PREFIX.

    The exact-mode front-end sort compacts emitting gaussians to the front,
    so the compaction scatters of _delta_fills vanish: deltas come from a
    plain row shift, and the single remaining scatter (segment deltas into
    (K, C)) has genuinely sorted, unique indices (positions ascend over the
    active prefix; distinct ascending OOB sentinels pad the tail).
    """
    n = active.shape[0]
    npos = jnp.arange(n, dtype=jnp.int32)
    # Positions >= K (overflow truncation) drop; clamping them into the
    # ascending OOB band keeps the index array globally sorted even then.
    pos_compact = jnp.where(
        active, jnp.minimum(positions, K + npos), K + npos
    )
    if widths is None:
        widths = [22] * len(values_list)

    cols = []
    stacked = []
    for i, (vals, wbits) in enumerate(zip(values_list, widths)):
        if wbits <= 23:
            # exact: any partial delta sum telescopes to v_a - v_b with
            # v in [0, 2^wbits), so |partial| < 2^23 <= fp32's 2^24 window
            cols.append((i, "all"))
            stacked.append(vals)
        else:
            assert wbits <= 31, "split fill supports < 2^31"
            cols.append((i, "hi"))
            stacked.append(vals >> 15)
            cols.append((i, "lo"))
            stacked.append(vals & 0x7FFF)
    vblock = jnp.stack(stacked, axis=1).astype(jnp.float32)  # (n, C)
    C = vblock.shape[1]
    prev = jnp.concatenate([jnp.zeros((1, C), jnp.float32), vblock[:-1]])
    delta = vblock - prev  # rows past the prefix scatter OOB and drop
    if fill_mode in ("pallas", "pallas_all"):
        # Streamed placement+prefix kernel — XLA's scatter costs ~40ns/row
        # here (the whole fill scatter ~5.2 ms at bench scale); the kernel
        # is bit-identical (integer values < 2^24 in fp32 are exact under
        # any accumulation order).  Returns field-major (C, K); consume
        # rows.  Opt-in: see RasterizeConfig.fill_mode.
        from .pallas.ordered_fill import ordered_prefix_fill

        cs = ordered_prefix_fill(pos_compact, delta, K).astype(jnp.int32)

        def col(j):
            return cs[j]
    else:
        # XLA scatter path: indices are sorted AND unique (ascending active
        # prefix + ascending OOB sentinels), so both fast-path hints hold.
        seg = jnp.zeros((K, C), jnp.float32).at[pos_compact].set(
            delta, mode="drop", unique_indices=True, indices_are_sorted=True
        )
        cs = cumsum_cols_f32(seg).astype(jnp.int32)

        def col(j):
            return cs[:, j]

    parts = {}
    for j, (i, kind) in enumerate(cols):
        parts.setdefault(i, {})[kind] = col(j)
    fills = []
    for i in range(len(values_list)):
        p = parts[i]
        if "all" in p:
            fills.append(p["all"])
        else:
            fills.append((p["hi"] << 15) | p["lo"])
    return fills


def _kth_set_bit(mask: jnp.ndarray, rank: jnp.ndarray) -> jnp.ndarray:
    """Position of the rank-th (0-based) set bit of a 16-bit mask.

    Four popcount-bisection rounds, vectorized over the instance stream —
    remaps a survivor rank back to its original rect slot when a tile-cull
    mask (ops/projection.tile_ellipse_mask) filtered the emission.
    """
    bit = jnp.zeros_like(mask)
    r = rank
    for half in (8, 4, 2, 1):
        low = (mask >> bit) & ((1 << half) - 1)
        c = jax.lax.population_count(low)
        go_high = r >= c
        bit = bit + jnp.where(go_high, half, 0)
        r = r - jnp.where(go_high, c, 0)
    return bit


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
    aligned_slack: int = -1,
    tile_mask: jnp.ndarray | None = None,
    fill_mode: str = "scatter",
) -> Binning:
    """Expand each visible gaussian into one instance per touched tile, sort by
    (tile, depth), and lay the result out chunk-aligned per tile.

    Args:
      tiles_touched: (P,) int32 — 0 for culled gaussians.
      rect: (P, 4) int32 tile rect [x0, y0, x1, y1).
      depths: (P,) float32 view-space z (all > 0.2 for visible gaussians).
      grid_x, grid_y, capacity, chunk: static geometry.
      sort_mode: "exact" | "packed" | "radix" | "auto" (see config.py;
        "auto" resolves by backend — radix under remote-AOT compilation).
      tile_mask: optional (P,) int32 from projection.tile_ellipse_mask —
        bit 16 set means bits 0..15 select the surviving rect slots and
        ``tiles_touched`` already counts only survivors.
    """
    if sort_mode == "auto":
        sort_mode = "radix" if jax.default_backend() == "axon" else "exact"
    P = tiles_touched.shape[0]
    K = capacity
    num_tiles = grid_x * grid_y
    Kp = aligned_capacity(K, num_tiles, chunk, aligned_slack)

    t = tiles_touched.astype(jnp.int32)
    ids = jnp.arange(P, dtype=jnp.int32)
    w_t = jnp.maximum(rect[:, 2] - rect[:, 0], 1)
    # Rect code: [base_tile | width] in 23 bits when the grid is small enough
    # (one fill column; exact because every partial delta sum telescopes to a
    # difference of two values in [0, 2^23) — inside fp32's 2^24 window),
    # otherwise the generic [x0 | y0 | w] 30-bit form (two fill columns).
    small_grid = num_tiles < (1 << 13) and grid_x <= (1 << 10)
    if small_grid:
        code = ((rect[:, 1] * grid_x + rect[:, 0]) << 10) | w_t
        code_bits = 23
    else:
        code = (rect[:, 0] << 20) | (rect[:, 1] << 10) | w_t
        code_bits = 30

    if sort_mode == "radix":
        # Depth leaves the instance sort entirely: rank the P gaussians by
        # their float-depth bits once (stable LSD radix, so equal depths rank
        # in gaussian-index order — exactly the CUB tiebreak), then emit the
        # instance stream in rank-major order.  A stable partition of that
        # stream by tile id alone reproduces the (tile, depth, emission)
        # order of rasterizer_impl.cu:300-308 bit-for-bit.  Everything is
        # counting-sort scatters + MXU cumsums: unlike jax.lax.sort (whose
        # compiled TPU code grows with the input length — it alone overflows
        # the 2 GiB remote-AOT executable cap at ~1M instances), the compiled
        # code is input-size-independent, and there is no O(K log K) factor.
        dbits = jax.lax.bitcast_convert_type(depths, jnp.uint32)
        _, (perm,) = radix_sort_u32(dbits, (ids,), bits=32, digit_bits=8)
        rank = jnp.zeros((P,), jnp.int32).at[perm].set(ids, mode="drop")
        t = jnp.zeros((P,), jnp.int32).at[rank].set(t, mode="drop")
        code = jnp.zeros((P,), jnp.int32).at[rank].set(code, mode="drop")
        if tile_mask is not None:
            tile_mask = (
                jnp.zeros((P,), jnp.int32).at[rank].set(tile_mask, mode="drop")
            )
        ids = perm  # original gaussian index, in rank order
    elif sort_mode == "exact":
        # Rank-major front-end, ONE multi-payload P-sort: keys are
        # (not-emitting, depth) so the emitting gaussians compact to the
        # FRONT in depth order (stable — equal depths keep gaussian-index
        # order, the CUB tiebreak).  Emitting the instance stream in this
        # rank-major order lets the instance sort use the tile id ALONE
        # (stability supplies the depth/emission order within each tile,
        # reproducing rasterizer_impl.cu:300-308 bit-for-bit), and the
        # front-compaction feeds _prefix_fills, whose only scatter is the
        # (K, C) segment-delta write.  This environment's scatters run
        # ~210M updates/s while lax.sort runs ~1.4G elem/s (profile_r5/r6),
        # so the sort-based front-end replaces ~6 ms of scatters.
        inactive = (t <= 0).astype(jnp.int32)
        ops = [inactive, depths, ids, t, code]
        if tile_mask is not None:
            ops.append(tile_mask)
        s = jax.lax.sort(tuple(ops), num_keys=2, is_stable=True)
        ids, t, code = s[2], s[3], s[4]
        if tile_mask is not None:
            tile_mask = s[5]

    cum = cumsum_i32(t)  # inclusive prefix sum (MXU-blocked)
    offsets = cum - t  # exclusive
    required = cum[-1] if P > 0 else jnp.int32(0)

    # --- segmented expansion -------------------------------------------
    # Emitting gaussians (t > 0) each own the contiguous instance segment
    # [offsets, offsets + t).  Every per-instance quantity needed for the
    # keys is constant within a segment, so ALL of them come from delta-
    # cumsum fills — zero K-sized gathers (a 1M-element XLA gather costs
    # ~7.5ms on v5e; six fills cost ~1ms total).  The rect is packed as
    # x0/y0/width in 10 bits each (grids up to 1023x1023 tiles = 16k x 16k
    # pixels); the depth's positive-float bits are order-preserving as int.
    if sort_mode in ("radix", "exact"):
        vals = [ids, offsets, code]
        widths = [22, 22, code_bits]
    else:
        dbits = depths.view(jnp.int32)
        vals = [ids, offsets, code, dbits]
        widths = [22, 22, code_bits, 31]
    if tile_mask is not None:
        vals.append(tile_mask)
        widths.append(17)
    if sort_mode == "exact":
        fills = _prefix_fills(
            vals, t > 0, offsets, K, widths=widths, fill_mode=fill_mode
        )
    else:
        fills = _delta_fills(
            vals, t > 0, offsets, K, widths=widths, fill_mode=fill_mode
        )
    safe_gid, offs, ic = fills[:3]
    idb = None if sort_mode in ("radix", "exact") else fills[3]
    pos = jnp.arange(K, dtype=jnp.int32)
    valid = pos < jnp.minimum(required, K)
    rank = pos - offs
    if tile_mask is not None:
        imask = fills[-1]
        flagged = (imask >> 16) > 0
        slot = _kth_set_bit(imask & 0xFFFF, rank)
        rank = jnp.where(flagged, slot, rank)

    # duplicateWithKeys iterates y-outer / x-inner (rasterizer_impl.cu:89-103).
    iw = ic & 0x3FF
    if small_grid:
        btile = ic >> 10  # y0 * grid_x + x0
        tile_id = btile + (rank // iw) * grid_x + rank % iw
    else:
        iy0 = (ic >> 10) & 0x3FF
        ix0 = ic >> 20
        tile_id = (iy0 + rank // iw) * grid_x + (ix0 + rank % iw)
    tile_id = jnp.where(valid, tile_id, num_tiles).astype(jnp.int32)

    if sort_mode == "radix":
        # Stable tile partition of the rank-major stream: LSD counting
        # passes over the tile id's bits (the num_tiles sentinel of invalid
        # slots partitions last, like the +inf depth key of the sort path).
        tile_id = jax.lax.optimization_barrier(tile_id)
        tid, gid_s = tile_id, safe_gid
        nbits = max(1, int(num_tiles).bit_length())
        shift = 0
        while shift < nbits:
            d = min(7, nbits - shift)
            digits = (tid >> shift) & ((1 << d) - 1)
            dest = counting_sort_dest(digits, 1 << d)
            tid = jnp.zeros_like(tid).at[dest].set(tid, mode="drop")
            gid_s = jnp.zeros_like(gid_s).at[dest].set(gid_s, mode="drop")
            shift += d
        tile_sorted, gid_sorted = tid, gid_s
        bounds = tile_bounds_from_sorted(tile_sorted, num_tiles)
        depth_key = None
    elif sort_mode == "exact":
        # Stable single-key sort on the tile id of the rank-major stream —
        # bit-exact CUB order, one key fewer than the old (tile, depth)
        # 2-key sort, no depth fill columns.
        tile_id = jax.lax.optimization_barrier(tile_id)
        tile_sorted, gid_sorted = jax.lax.sort(
            (tile_id, safe_gid), num_keys=1, is_stable=True
        )
        bounds = tile_bounds_via_sort(tile_sorted, num_tiles)
    else:
        depth_key = jnp.where(
            valid, idb.view(jnp.float32), jnp.inf
        ).astype(jnp.float32)
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
            (key, safe_gid), num_keys=1, is_stable=True
        )
        tile_sorted = (key_sorted >> 19).astype(jnp.int32)
        bounds = tile_bounds_via_sort(tile_sorted, num_tiles)
    tile_start = bounds[:-1]
    tile_count = bounds[1:] - bounds[:-1]
    num_instances = jnp.minimum(required, K).astype(jnp.int32)

    # --- chunk-aligned re-layout ----------------------------------------
    # Tile t's instances move to chunk_start[t]*chunk + within-tile rank.
    # Rank and chunk base come from segment fills on the sorted stream
    # itself (no (T,)-table gathers): a segment starts where the sorted tile
    # id changes; the chunk base is the running count of chunks consumed by
    # all previously *closed* tiles, which is segment-constant.
    chunks_per_tile = (tile_count + chunk - 1) // chunk
    chunk_start = cumsum_i32(chunks_per_tile) - chunks_per_tile  # exclusive
    total_aligned = (chunk_start[-1] + chunks_per_tile[-1]) * chunk

    # Both fills are per-tile constants, non-decreasing in tile order, with
    # known segment starts (tile_start): two delta-cumsum fills over the
    # sorted stream, scattered from (T,)-sized deltas.
    start_fill, chunk_base = _delta_fills(
        [tile_start, chunk_start], tile_count > 0, tile_start, K,
        fill_mode=fill_mode,
    )
    rank_in_tile = pos - start_fill

    in_tile = tile_sorted < num_tiles
    # Valid rows (sorted by tile, ranked within) produce strictly increasing
    # positions; distinct ascending OOB sentinels (Kp+pos) keep the whole
    # index array sorted AND unique — both scatter fast-path flags hold.
    # Aligned-overflow positions >= Kp clamp into the OOB band (they drop
    # either way; total_aligned surfaces the true need).
    new_pos = jnp.where(
        in_tile,
        jnp.minimum(chunk_base * chunk + rank_in_tile, Kp + pos),
        Kp + pos,
    )
    new_pos, gid_sorted = jax.lax.optimization_barrier((new_pos, gid_sorted))
    if fill_mode == "pallas_all":
        # Streamed placement kernel for the relayout too.  Measured on-chip
        # (tools/binstages_r03.py): the place kernel costs ~4.1 ms at
        # Kp=1.18M (its VPU mask build dominates and Kp has 2x the K
        # blocks) while the sorted-unique XLA scatter costs ~2.4 ms — so
        # the default "pallas" mode uses the KERNEL only for the K-sized
        # prefix fills (where it wins 5.8 -> 2.6 ms) and the SCATTER here.
        from .pallas.ordered_fill import ordered_place_i32

        gid_aligned = ordered_place_i32(new_pos, gid_sorted, Kp)
    else:
        gid_aligned = jnp.zeros((Kp,), jnp.int32).at[new_pos].set(
            gid_sorted, mode="drop", unique_indices=True,
            indices_are_sorted=True,
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
