"""Sorted-splat gather with a sort-based per-gaussian gradient reduction.

The tile composite consumes the (P, 16) screen-space splat table through the
field-major sorted layout ``splats[gid].T`` (rasterize.py); its VJP is the
per-gaussian sum of each aligned instance slot's gradient row — the TPU
replacement for the CUDA backward's atomicAdd scatter (backward.cu:401-560).
XLA lowers that transpose as a scatter-ADD with *duplicate* indices, and this
environment's TPU scatters run at ~210M updates/s regardless of mode or
hints (tools/profile_r5/r8) — ~7M scattered elements at the 800px train
scale, dwarfing the composite kernels themselves.  lax.sort runs ~1.4G
elem/s here, so the "sort" reduction regroups the gradient rows by gaussian
with one single-key sort and reduces contiguous segments with an MXU-blocked
column cumsum:

    sort (gid, slot) -> gather rows by slot -> cumsum_cols -> per-gaussian
    boundary differences (segment bounds via the same boundary-compaction
    sort as binning.tile_bounds_via_sort).

Numerics: each gaussian's gradient is a difference of two inclusive-prefix
values of an fp32 running sum (HIGHEST-precision MXU cumsum).  Like the
scatter-add (whose accumulation order XLA leaves unspecified), this
reassociates the per-gaussian sum; the long-range cancellation adds
O(eps * |global running sum|) absolute error.  That error grows with the
global stream, and at round-2 HEAD it exceeded the committed rtol-1e-4
gradient parity bar on one element of the exact-culling comparison
(tests/test_rasterize.py) — which is why grad_reduce defaults to "scatter"
and this path is opt-in A/B material until the reduction is made
segment-local.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .scan_utils import cumsum_cols_f32


def segment_sum_rows(rows: jnp.ndarray, gid: jnp.ndarray, P: int) -> jnp.ndarray:
    """Sum (Kp, C) rows into (P, C) by gaussian id, sort-based (see module)."""
    Kp, C = rows.shape
    pos = jnp.arange(Kp, dtype=jnp.int32)
    gs, ps = jax.lax.sort((gid, pos), num_keys=1, is_stable=True)
    rs = jax.lax.optimization_barrier(rows[ps])
    cs = cumsum_cols_f32(rs)
    csz = jnp.concatenate([jnp.zeros((1, C), jnp.float32), cs], axis=0)
    # Segment bounds over the gid-sorted stream: compact the <= P boundary
    # rows to the front with one (Kp, 2) sort, scatter those (unique, sorted
    # indices), backfill absent gaussians with the next present start.
    from .binning import tile_bounds_via_sort

    bounds = tile_bounds_via_sort(gs, P)  # (P+1,)
    return csz[bounds[1:]] - csz[bounds[:-1]]


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def gather_splats_t(splats: jnp.ndarray, gid: jnp.ndarray, grad_reduce: str):
    """(P, 16) splats -> field-major (16, Kp) sorted layout; VJP per config.

    ``grad_reduce``: "scatter" (default; XLA's native gather transpose —
    meets the committed gradient tolerances exactly) or "sort" (see module
    docstring; faster under this environment's serialized scatters but its
    global-prefix boundary diffs reassociate each per-gaussian sum with
    O(eps * |running sum|) error — kept for A/B until that is fixed).
    Barriers keep the gather/transpose standalone: XLA fusing them into
    surrounding producers measured far slower (round-1 notes).
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
