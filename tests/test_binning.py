"""Direct tests of the binning pipeline against a numpy oracle.

bin_gaussians is also covered end-to-end by the rasterizer parity tests; this
file checks the bookkeeping itself (segment expansion, sort order, chunk
alignment, overflow truncation) against a straightforward numpy reimplementation
of the CUDA semantics (rasterizer_impl.cu:70-138).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from gs_deformable_tpu.ops.binning import (
    aligned_capacity,
    bin_gaussians,
    take_searchsorted,
)
from gs_deformable_tpu.ops.scan_utils import cumsum_i32, cumsum_f32, cummax_i32


def numpy_binning(tiles_touched, rect, depths, grid_x, grid_y, capacity, chunk,
                  rank_major=False):
    """Oracle: emission order y-outer/x-inner, stable (tile, depth) sort,
    chunk-aligned per-tile layout.  ``rank_major`` enumerates gaussians in
    (depth, index) order — the exact/radix modes' emission, which governs
    which instances overflow truncation drops (the deepest ones).  Without
    overflow, both enumerations sort to the identical stream."""
    P = len(tiles_touched)
    num_tiles = grid_x * grid_y
    inst = []  # (tile, depth, emission_index, gid)
    k = 0
    order = (sorted(range(P), key=lambda g: (depths[g], g))
             if rank_major else range(P))
    for g in order:
        if tiles_touched[g] == 0:
            continue
        x0, y0, x1, _ = rect[g]
        w = max(x1 - x0, 1)
        for j in range(tiles_touched[g]):
            if k < capacity:
                tx = x0 + j % w
                ty = y0 + j // w
                inst.append((ty * grid_x + tx, depths[g], k, g))
            k += 1
    required = k
    inst.sort(key=lambda r: (r[0], r[1], r[2]))  # stable by emission
    counts = np.zeros(num_tiles, np.int32)
    for tile, _, _, _ in inst:
        counts[tile] += 1
    cpt = (counts + chunk - 1) // chunk
    chunk_start = np.cumsum(cpt) - cpt
    Kp = aligned_capacity(capacity, num_tiles, chunk)
    gid_aligned = np.zeros(Kp, np.int32)
    cursor = np.zeros(num_tiles, np.int32)
    for tile, _, _, g in inst:
        gid_aligned[chunk_start[tile] * chunk + cursor[tile]] = g
        cursor[tile] += 1
    return gid_aligned, chunk_start.astype(np.int32), counts, required


def make_inputs(rng, P, grid_x, grid_y, zero_run=False, ties=False):
    x0 = rng.integers(0, grid_x, P)
    y0 = rng.integers(0, grid_y, P)
    w = rng.integers(1, 4, P)
    h = rng.integers(1, 4, P)
    x1 = np.minimum(x0 + w, grid_x)
    y1 = np.minimum(y0 + h, grid_y)
    tt = ((x1 - x0) * (y1 - y0)).astype(np.int32)
    culled = rng.random(P) < 0.3
    if zero_run:
        culled[P // 4 : P // 2] = True  # a long run of non-emitting gaussians
        culled[:2] = True  # leading non-emitters
    tt = np.where(culled, 0, tt).astype(np.int32)
    rect = np.stack([x0, y0, x1, y1], -1).astype(np.int32)
    depths = rng.uniform(0.3, 10.0, P).astype(np.float32)
    if ties:
        depths[::3] = 2.5  # exact depth ties -> emission-order tiebreak
    return tt, rect, depths


@pytest.mark.parametrize("zero_run,ties", [(False, False), (True, False),
                                           (False, True), (True, True)])
def test_binning_matches_numpy_oracle(rng, zero_run, ties):
    grid_x, grid_y, chunk, cap = 7, 5, 8, 1024
    tt, rect, depths = make_inputs(rng, 300, grid_x, grid_y, zero_run, ties)
    b = bin_gaussians(
        jnp.asarray(tt), jnp.asarray(rect), jnp.asarray(depths),
        grid_x=grid_x, grid_y=grid_y, capacity=cap, chunk=chunk,
    )
    gid_ref, cs_ref, cnt_ref, req_ref = numpy_binning(
        tt, rect, depths, grid_x, grid_y, cap, chunk)
    assert int(b.required) == req_ref
    np.testing.assert_array_equal(np.asarray(b.tile_count), cnt_ref)
    np.testing.assert_array_equal(np.asarray(b.tile_chunk_start), cs_ref)
    # compare only slots owned by some tile (padding rows are masked by count)
    mask = np.zeros(len(gid_ref), bool)
    for t in range(grid_x * grid_y):
        s = cs_ref[t] * chunk
        mask[s : s + cnt_ref[t]] = True
    np.testing.assert_array_equal(np.asarray(b.gid)[mask], gid_ref[mask])


def test_binning_overflow_truncates_from_emission_end(rng):
    grid_x, grid_y, chunk = 6, 4, 8
    tt, rect, depths = make_inputs(rng, 200, grid_x, grid_y)
    small = 64
    b = bin_gaussians(
        jnp.asarray(tt), jnp.asarray(rect), jnp.asarray(depths),
        grid_x=grid_x, grid_y=grid_y, capacity=small, chunk=chunk,
    )
    # Truncation drops from the end of the rank-major (depth-sorted)
    # emission order: the DEEPEST instances overflow first.
    gid_ref, cs_ref, cnt_ref, req_ref = numpy_binning(
        tt, rect, depths, grid_x, grid_y, small, chunk, rank_major=True)
    assert int(b.required) == req_ref > small  # overflow surfaced
    assert int(b.num_instances) == small
    np.testing.assert_array_equal(np.asarray(b.tile_count), cnt_ref)


def test_binning_packed_mode_agrees_without_ties(rng):
    grid_x, grid_y, chunk, cap = 7, 5, 8, 1024
    tt, rect, _ = make_inputs(rng, 250, grid_x, grid_y)
    # packed mode keeps the top 19 float bits (~0.05% depth resolution);
    # give depths >0.3% relative spacing so the truncation cannot tie them
    depths = (0.3 * 1.003 ** np.arange(250)).astype(np.float32)
    rng.shuffle(depths)
    outs = [
        bin_gaussians(
            jnp.asarray(tt), jnp.asarray(rect), jnp.asarray(depths),
            grid_x=grid_x, grid_y=grid_y, capacity=cap, chunk=chunk,
            sort_mode=mode,
        )
        for mode in ("exact", "packed")
    ]
    np.testing.assert_array_equal(np.asarray(outs[0].gid), np.asarray(outs[1].gid))
    np.testing.assert_array_equal(
        np.asarray(outs[0].tile_count), np.asarray(outs[1].tile_count))


@pytest.mark.parametrize("zero_run,ties", [(False, False), (True, True)])
def test_binning_radix_mode_bitwise_matches_exact(rng, zero_run, ties):
    # The counting-sort path (no lax.sort; compile-size-safe under the
    # remote-AOT executable cap) must reproduce the exact CUB order
    # bit-for-bit, including emission-order tiebreaks on equal depths.
    grid_x, grid_y, chunk, cap = 7, 5, 8, 1024
    tt, rect, depths = make_inputs(rng, 300, grid_x, grid_y, zero_run, ties)
    outs = [
        bin_gaussians(
            jnp.asarray(tt), jnp.asarray(rect), jnp.asarray(depths),
            grid_x=grid_x, grid_y=grid_y, capacity=cap, chunk=chunk,
            sort_mode=mode,
        )
        for mode in ("exact", "radix")
    ]
    gid_ref, cs_ref, cnt_ref, req_ref = numpy_binning(
        tt, rect, depths, grid_x, grid_y, cap, chunk)
    for b in outs:
        assert int(b.required) == req_ref
        np.testing.assert_array_equal(np.asarray(b.tile_count), cnt_ref)
        np.testing.assert_array_equal(np.asarray(b.tile_chunk_start), cs_ref)
    mask = np.zeros(len(gid_ref), bool)
    for t in range(grid_x * grid_y):
        s = cs_ref[t] * chunk
        mask[s : s + cnt_ref[t]] = True
    np.testing.assert_array_equal(
        np.asarray(outs[0].gid)[mask], np.asarray(outs[1].gid)[mask])


def test_binning_fill_mode_pallas_bitwise_matches_scatter(rng):
    # fill_mode="pallas" routes the segment fills and the chunk-aligned
    # relayout through the ordered_fill kernels (interpret mode on CPU);
    # it must be bit-identical to the default XLA scatter path.
    grid_x, grid_y, chunk, cap = 7, 5, 8, 1024
    tt, rect, depths = make_inputs(rng, 300, grid_x, grid_y, True, True)
    outs = [
        bin_gaussians(
            jnp.asarray(tt), jnp.asarray(rect), jnp.asarray(depths),
            grid_x=grid_x, grid_y=grid_y, capacity=cap, chunk=chunk,
            fill_mode=mode,
        )
        for mode in ("scatter", "pallas", "pallas_all")
    ]
    for other in outs[1:]:
        for a, b in zip(outs[0], other):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_radix_sort_u32_stable(rng):
    from gs_deformable_tpu.ops.scan_utils import radix_sort_u32

    n = 5000
    keys = rng.integers(0, 1 << 32, n, dtype=np.uint64).astype(np.uint32)
    keys[:: 7] = 12345  # duplicates -> stability check via payload order
    idx = np.arange(n, dtype=np.int32)
    ks, (ps,) = radix_sort_u32(
        jnp.asarray(keys), (jnp.asarray(idx),), bits=32, digit_bits=8)
    order = np.argsort(keys, kind="stable")
    np.testing.assert_array_equal(np.asarray(ks), keys[order])
    np.testing.assert_array_equal(np.asarray(ps), idx[order])


def test_take_searchsorted_matches_numpy(rng):
    for n, q in [(1, 5), (100, 17), (4096, 4097), (100000, 3)]:
        table = np.sort(rng.integers(0, 1 << 30, n).astype(np.uint32))
        queries = rng.integers(0, 1 << 30, q).astype(np.uint32)
        got = np.asarray(take_searchsorted(jnp.asarray(table), jnp.asarray(queries)))
        np.testing.assert_array_equal(got, np.searchsorted(table, queries, "left"))


def test_blocked_scans_match_numpy(rng):
    # cumsum precondition: running total < 2^24 (binning counts are ~2^21)
    for n in [5, 128, 129, 1000, 131072 + 7, 1 << 20]:
        x = rng.integers(0, 8, n).astype(np.int32)
        np.testing.assert_array_equal(
            np.asarray(cumsum_i32(jnp.asarray(x))), np.cumsum(x))
        y = rng.integers(-(1 << 20), 1 << 20, n).astype(np.int32)
        np.testing.assert_array_equal(
            np.asarray(cummax_i32(jnp.asarray(y))), np.maximum.accumulate(y))
    xf = rng.normal(size=1000).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(cumsum_f32(jnp.asarray(xf))), np.cumsum(xf),
        rtol=1e-5, atol=1e-4)
