"""Sorted-splat gather with a sort-based per-gaussian gradient reduction.

The tile composite consumes the (P, 16) screen-space splat table through the
field-major sorted layout ``splats[gid].T`` (rasterize.py); its VJP is the
per-gaussian sum of each aligned instance slot's gradient row — the TPU
replacement for the CUDA backward's atomicAdd scatter (backward.cu:401-560).
XLA lowers that transpose as a scatter-ADD with *duplicate* indices, and this
environment's TPU scatters run at ~13 ns per 16-wide row regardless of mode
or hints (round-4 probe: 4.6 ms for the 342k-row add at the 800px train
scale) — dwarfing the composite kernels themselves.  lax.sort runs ~1.4G
elem/s here, so the "sort" reduction regroups the gradient rows by gaussian
with one single-key sort and reduces contiguous segments:

    sort (gid, slot) -> gather rows by slot -> SEGMENTED two-level scan ->
    per-gaussian totals at segment end rows (segment bounds via the same
    boundary-compaction sort as binning.tile_bounds_via_sort).

Numerics (round-4 redesign): round 3's version reduced segments as
differences of a GLOBAL inclusive prefix, whose cancellation error grows as
O(eps * |global running sum|) — it exceeded the committed rtol-1e-4
gradient-parity bar and kept this path opt-in.  The segmented scan sums each
gaussian's rows with no cross-segment terms at all: a 7-pass Hillis-Steele
segmented scan local to 128-row blocks (shifts never cross a block or
segment boundary), then a segment-aware carry chain over per-block partials
(itself a small segmented scan over block summaries).  Every per-gaussian
total is an fp32 sum of ONLY its own rows — deterministic, and no less
accurate than the scatter-add's unspecified accumulation order.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _segmented_scan_rows(vals: jnp.ndarray, flags: jnp.ndarray, passes: int):
    """Inclusive segmented sum scan along axis 0 (Hillis-Steele).

    ``flags`` marks segment STARTS.  ``passes`` must be >= log2(max segment
    length) for exactness — callers bound segment length structurally.
    """
    v, f = vals, flags
    n = vals.shape[0]
    s = 1
    for _ in range(passes):
        pad_v = jnp.zeros((s,) + v.shape[1:], v.dtype)
        pad_f = jnp.ones((s,), jnp.bool_)
        v_prev = jnp.concatenate([pad_v, v[: n - s]], axis=0)
        f_prev = jnp.concatenate([pad_f, f[: n - s]], axis=0)
        v = v + jnp.where(f[:, None] if v.ndim == 2 else f, 0.0, v_prev)
        f = f | f_prev
        s *= 2
    return v


def segment_sum_rows(rows: jnp.ndarray, gid: jnp.ndarray, P: int) -> jnp.ndarray:
    """Sum (Kp, C) rows into (P, C) by gaussian id, sort-based (see module).

    Exact-by-construction per-segment fp32 sums: block-local segmented scan
    (7 passes, 128-row blocks) + segment-aware carry chain over block
    summaries.  No global-prefix cancellation.
    """
    Kp, C = rows.shape
    B = 128
    pos = jnp.arange(Kp, dtype=jnp.int32)
    gs, ps = jax.lax.sort((gid, pos), num_keys=1, is_stable=True)
    rs = jax.lax.optimization_barrier(rows[ps])

    # Pad to a block multiple; the pad sentinel is gaussian id P exactly, so
    # the pad rows form the "gaussian P" segment and tile_bounds_via_sort's
    # bounds[P] lands on the first pad row (any other sentinel would leave
    # the LAST real gaussian's end row pointing into the pad zeros).
    pad = (-Kp) % B
    if pad:
        gs = jnp.concatenate([gs, jnp.full((pad,), jnp.int32(P))])
        rs = jnp.concatenate([rs, jnp.zeros((pad, C), rs.dtype)])
    n = gs.shape[0]
    nb = n // B

    # Segment boundaries: gid change, plus forced breaks at block starts so
    # the 7-pass scan is exactly local to each 128-row block.
    prev_g = jnp.concatenate([jnp.full((1,), -1, jnp.int32), gs[:-1]])
    at_block = (jnp.arange(n, dtype=jnp.int32) % B) == 0
    flags = (gs != prev_g) | at_block
    local = _segmented_scan_rows(rs, flags, passes=7)  # (n, C)

    # Block summaries: the open tail segment's in-block sum is the local
    # value at the block's last row; chain it backwards while each earlier
    # block (a) is entirely one segment AND (b) actually links (its first
    # gid equals the previous block's last gid — a segment can end exactly
    # on a block boundary, which must break the chain).
    lastv = local[B - 1 :: B]  # (nb, C)
    first_g = gs[0::B]  # (nb,)
    last_g = gs[B - 1 :: B]
    link = jnp.concatenate(
        [jnp.zeros((1,), jnp.bool_), first_g[1:] == last_g[:-1]])
    chain_break = (first_g != last_g) | jnp.logical_not(link)
    acc = _segmented_scan_rows(
        lastv, chain_break, passes=max(1, max(nb - 1, 1).bit_length())
    )  # (nb, C): open-tail sum over this block and chained previous blocks
    carry = jnp.where(
        link[:, None],
        jnp.concatenate([jnp.zeros((1, C), local.dtype), acc[:-1]], axis=0),
        0.0,
    )  # (nb, C) carried into each block's leading run

    # Add the carry to rows of each block's LEADING run (gid == first_g);
    # broadcast-reshape, not jnp.repeat (repeat lowers to a gather on TPU).
    in_lead = gs.reshape(nb, B) == first_g[:, None]  # (nb, B)
    carry_rows = jnp.broadcast_to(carry[:, None, :], (nb, B, C))
    full = (
        local.reshape(nb, B, C)
        + jnp.where(in_lead[:, :, None], carry_rows, 0.0)
    ).reshape(n, C)

    # Per-gaussian totals at global segment end rows.
    from .binning import tile_bounds_via_sort

    bounds = tile_bounds_via_sort(gs, P)  # (P+1,)
    ends = jnp.maximum(bounds[1:] - 1, 0)
    vals = full[ends]
    nonempty = bounds[1:] > bounds[:-1]
    return jnp.where(nonempty[:, None], vals, 0.0)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def gather_splats_t(splats: jnp.ndarray, gid: jnp.ndarray, grad_reduce: str):
    """(P, 16) splats -> field-major (16, Kp) sorted layout; VJP per config.

    ``grad_reduce``: "sort" (single-key gid sort + block-local segmented
    scan + carry chain — exact per-segment fp32 sums, ~5x cheaper than the
    scatter-add under this environment's serialized scatters) or "scatter"
    (XLA's native gather transpose, kept as the always-working fallback and
    for A/B).  Barriers keep the gather/transpose standalone: XLA fusing
    them into surrounding producers measured far slower (round-1 notes).
    """
    splats = jax.lax.optimization_barrier(splats)
    sorted_splats = jax.lax.optimization_barrier(splats[gid])
    return jax.lax.optimization_barrier(sorted_splats.T)


def _fwd(splats, gid, grad_reduce):
    return gather_splats_t(splats, gid, grad_reduce), (gid, splats.shape[0])


def _bwd(grad_reduce, res, ct):
    gid, P = res
    rows_ct = jax.lax.optimization_barrier(ct.T)  # (Kp, 16)
    if grad_reduce == "scatter":
        dsplats = jnp.zeros((P, rows_ct.shape[1]), jnp.float32).at[gid].add(
            rows_ct
        )
    else:
        dsplats = segment_sum_rows(rows_ct, gid, P)
    return (dsplats, None)


gather_splats_t.defvjp(_fwd, _bwd)
