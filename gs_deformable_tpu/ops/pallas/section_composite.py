"""Sectioned-stream compositing kernels: F-way interleaved chunk sweeps.

Third schedule for the same tile-composite math (see composite.py for the
semantics, stream_composite.py for the single-stream variant).  Profiling on
v5e showed both earlier schedules are bound by the *serial instruction
latency* of one chunk's composite step (~0.9us): the batched kernel hides it
across 4 tiles of one group, the single stream not at all.  This schedule
splits the chunk-aligned instance stream into F sections cut at tile
boundaries (chosen in XLA to be near-equal in chunks) and advances all F
sections by S chunks per grid step:

- F independent dependency chains interleave in the instruction stream, so
  the VPU/MXU pipelines stay full;
- input is contiguous double-buffered DMA per section (S*chunk splats per
  step), no per-tile waves;
- per-tile state/flush logic is the stream kernel's, replicated per section;
- the grid is sized for the worst case (one section owning every chunk);
  sections that finish early skip their remaining steps with one scalar
  compare, so imbalance costs idle micro-steps, never correctness.

The backward writes each section's per-instance gradient rows in place for
every full step; each section's *final* step (possibly partial) is redirected
to a private S*chunk tail slot past the main region so the kernel always
writes full blocks without clobbering the next section.  The output buffer is
zero-initialized via input/output aliasing (gaps stay zero) and the wrapper
adds each tail slot back at its true offset (F small dynamic-slice updates).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .composite import (
    SPLAT_WIDTH,
    _chunk_geometry,
    _composite_step,
    _dot32,
    _instance_grads,
    _tril,
)
from .stream_composite import (
    _chunk_tables,
    _default_rows,
    _tile_pixel_coords,
)
from ..binning import take_searchsorted
from ..scan_utils import cumsum_i32


def _section_forward_kernel(
    sec_chunk0_ref,  # (F,) int32: first global chunk of each section
    sec_nchunks_ref,  # (F,) int32: chunks in each section
    owner_ref,    # (C,) int32 global chunk -> tile
    inbase_ref,   # (C,) int32 global chunk -> in-tile instance base
    ccount_ref,   # (C,) int32 global chunk -> tile instance count
    splats_hbm,   # (16, kp_padded) HBM
    out_ref,      # (T, 8, npix) HBM — manual flush DMA
    buf,          # (2, F, 16, S*chunk) VMEM: input double buffer
    acc,          # (F, 8, npix) VMEM: per-section open-tile state
    staging,      # (F, 2, 8, npix) VMEM: per-section flush double buffer
    fmeta,        # (F, 4) SMEM: [flush_ctr, owner_slot0, owner_slot1, -]
    dsem,         # (2, F) DMA sems: input
    fsem,         # (F, 2) DMA sems: flush
    *,
    grid_x: int,
    tile_x: int,
    tile_y: int,
    chunk: int,
    s_chunks: int,
    f_sections: int,
    num_tiles: int,
    num_steps: int,
    alpha_max: float,
    alpha_min: float,
    eps: float,
    scan_mode: str,
):
    npix = tile_x * tile_y
    S = s_chunks
    F = f_sections
    i = pl.program_id(0)
    tril = _tril(chunk) if scan_mode == "log" else None

    def in_dma(slot, f, step):
        return pltpu.make_async_copy(
            splats_hbm.at[
                :,
                pl.ds(
                    pl.multiple_of(
                        (sec_chunk0_ref[f] + step * S) * chunk, chunk
                    ),
                    S * chunk,
                ),
            ],
            buf.at[slot, f],
            dsem.at[slot, f],
        )

    def flush_dma(f, slot, owner):
        return pltpu.make_async_copy(
            staging.at[f, slot], out_ref.at[owner], fsem.at[f, slot]
        )

    @pl.when(i == 0)
    def _():
        for f in range(F):
            fmeta[f, 0] = 0

            @pl.when(sec_nchunks_ref[f] > 0)
            def _():
                in_dma(0, f, 0).start()

    for f in range(F):
        n_f = sec_nchunks_ref[f]

        @pl.when(i * S < n_f)
        def _():
            @pl.when((i + 1) * S < n_f)
            def _():
                in_dma((i + 1) % 2, f, i + 1).start()

            in_dma(i % 2, f, i).wait()
            for j in range(S):
                c_local = i * S + j
                c = sec_chunk0_ref[f] + c_local
                owner = owner_ref[c]
                inbase = inbase_ref[c]
                cnt = ccount_ref[c]

                @pl.when(c_local < n_f)
                def _():
                    @pl.when(inbase == 0)
                    def _():
                        acc[f, 0:3, :] = jnp.zeros((3, npix), jnp.float32)
                        acc[f, 3:4, :] = jnp.ones((1, npix), jnp.float32)
                        acc[f, 4:5, :] = jnp.zeros((1, npix), jnp.float32)
                        acc[f, 5:6, :] = jnp.ones((1, npix), jnp.float32)

                    saturated = jnp.max(acc[f, 5:6, :]) < eps

                    @pl.when(jnp.logical_not(saturated))
                    def _():
                        rows = jnp.transpose(
                            buf[i % 2, f, :, j * chunk : (j + 1) * chunk]
                        )
                        px, py = _tile_pixel_coords(
                            owner, grid_x, tile_x, tile_y
                        )
                        a_hat, skip, _, _, _, row = _chunk_geometry(
                            rows, px, py, inbase, cnt,
                            alpha_max, alpha_min, chunk,
                        )
                        contrib, t_g, t_out, probe_out = _composite_step(
                            a_hat, skip, acc[f, 3:4, :], acc[f, 5:6, :],
                            eps, tril,
                        )
                        # one MXU matmul for all three weighted color
                        # sums; sanitization per composite.py
                        in_range = (inbase + row) < cnt  # (chunk, 1)
                        col_safe = jnp.where(in_range, rows[:, 6:9], 0.0)
                        wmask = jnp.where(contrib, a_hat * t_g, 0.0)
                        acc[f, 0:3, :] += _dot32(
                            jnp.transpose(col_safe), wmask)
                        gidx = (inbase + row + 1).astype(jnp.float32)
                        acc[f, 4:5, :] = jnp.maximum(
                            acc[f, 4:5, :],
                            jnp.max(jnp.where(contrib, gidx, 0.0),
                                    0, keepdims=True),
                        )
                        acc[f, 3:4, :] = t_out
                        acc[f, 5:6, :] = probe_out

                    @pl.when(inbase + chunk >= cnt)
                    def _():  # tile closes: flush
                        ctr = fmeta[f, 0]
                        slot = jax.lax.rem(ctr, 2)

                        @pl.when(ctr >= 2)
                        def _():
                            flush_dma(f, slot, fmeta[f, 1 + slot]).wait()

                        staging[f, slot, 0:5, :] = acc[f, 0:5, :]
                        staging[f, slot, 5:8, :] = jnp.zeros(
                            (3, npix), jnp.float32)
                        flush_dma(f, slot, owner).start()
                        fmeta[f, 1 + slot] = owner
                        fmeta[f, 0] = ctr + 1

    @pl.when(i == num_steps - 1)
    def _():  # drain all in-flight flushes
        for f in range(F):
            ctr = fmeta[f, 0]
            for back in range(2):
                @pl.when(ctr >= back + 1)
                def _():
                    slot = jax.lax.rem(ctr - 1 - back, 2)
                    flush_dma(f, slot, fmeta[f, 1 + slot]).wait()


def _section_backward_kernel(
    sec_chunk0_ref,
    sec_nchunks_ref,
    sec_open0_ref,   # (F,) int32: global open-ordinal at section start
    sec_nopen_ref,   # (F,) int32: number of tile-opens in the section
    owner_ref,
    inbase_ref,
    ccount_ref,
    openidx_ref,     # (C,) int32 global open ordinal per chunk
    openseq_ref,     # (C+pad,) int32 tile of the k-th open (global)
    splats_hbm,      # (16, kp_in) HBM
    meta_hbm,        # (T, 16, npix) HBM: fwd out rows 0:8, grads 8:16
    zeros_hbm,       # (16, kp_bwd) HBM zeros, aliased to the output
    dsplat_hbm,      # (16, kp_bwd) HBM: gradient rows + F tail slots
    buf,             # (2, F, 16, S*chunk) VMEM input
    gstage,          # (2, F, 16, S*chunk) VMEM output staging
    state,           # (F, 8, npix) VMEM: [T,done,p0,p1,p2,-,-,-]
    ring,            # (F, 4, 16, npix) VMEM tile-meta ring
    dsem,            # (2, F)
    gsem,            # (2, F)
    rsem,            # (F, 4)
    *,
    grid_x: int,
    tile_x: int,
    tile_y: int,
    chunk: int,
    s_chunks: int,
    f_sections: int,
    num_tiles: int,
    num_steps: int,
    alpha_max: float,
    alpha_min: float,
    eps: float,
    kp_main_cols: int,
    scan_mode: str = "log",
    lookahead: int = 2,
):
    npix = tile_x * tile_y
    S = s_chunks
    F = f_sections
    i = pl.program_id(0)
    # pcc prefix always on the MXU; transmittance scan is mode-selected.
    tril = _tril(chunk)
    step_tril = tril if scan_mode == "log" else None

    def in_dma(slot, f, step):
        return pltpu.make_async_copy(
            splats_hbm.at[
                :,
                pl.ds(
                    pl.multiple_of(
                        (sec_chunk0_ref[f] + step * S) * chunk, chunk
                    ),
                    S * chunk,
                ),
            ],
            buf.at[slot, f],
            dsem.at[slot, f],
        )

    def out_dma(slot, f, step):
        # In-place for full steps; the section's last step redirects to its
        # private tail slot (added back at its true offset by the wrapper).
        n_f = sec_nchunks_ref[f]
        last = (n_f + S - 1) // S - 1
        in_place = (sec_chunk0_ref[f] + step * S) * chunk
        tail = kp_main_cols + f * S * chunk
        off = pl.multiple_of(
            jax.lax.select(step == last, tail, in_place), chunk
        )
        return pltpu.make_async_copy(
            gstage.at[slot, f],
            dsplat_hbm.at[:, pl.ds(off, S * chunk)],
            gsem.at[slot, f],
        )

    def ring_dma(f, k_local, tile):
        slot = jax.lax.rem(k_local, 4)
        return pltpu.make_async_copy(
            meta_hbm.at[tile], ring.at[f, slot], rsem.at[f, slot]
        )

    @pl.when(i == 0)
    def _():
        for f in range(F):
            @pl.when(sec_nchunks_ref[f] > 0)
            def _():
                in_dma(0, f, 0).start()
                for k in range(lookahead):
                    @pl.when(k < sec_nopen_ref[f])
                    def _():
                        ring_dma(f, k, openseq_ref[sec_open0_ref[f] + k]).start()

    for f in range(F):
        n_f = sec_nchunks_ref[f]

        @pl.when(i * S < n_f)
        def _():
            @pl.when((i + 1) * S < n_f)
            def _():
                in_dma((i + 1) % 2, f, i + 1).start()

            in_dma(i % 2, f, i).wait()

            @pl.when(i >= 2)
            def _():  # reclaim the output staging slot
                out_dma(i % 2, f, i - 2).wait()

            gstage[i % 2, f] = jnp.zeros_like(gstage[i % 2, f])

            for j in range(S):
                c_local = i * S + j
                c = sec_chunk0_ref[f] + c_local
                owner = owner_ref[c]
                inbase = inbase_ref[c]
                cnt = ccount_ref[c]
                k_local = openidx_ref[c] - sec_open0_ref[f]

                @pl.when(c_local < n_f)
                def _():
                    @pl.when(inbase == 0)
                    def _():  # tile open: receive meta, prefetch ahead
                        ring_dma(f, k_local, owner).wait()

                        @pl.when(k_local + lookahead < sec_nopen_ref[f])
                        def _():
                            nxt = openseq_ref[
                                sec_open0_ref[f] + k_local + lookahead
                            ]
                            ring_dma(f, k_local + lookahead, nxt).start()

                        state[f, 0:2, :] = jnp.ones((2, npix), jnp.float32)
                        state[f, 2:3, :] = jnp.zeros((1, npix), jnp.float32)

                    saturated = jnp.max(state[f, 1:2, :]) < eps

                    @pl.when(jnp.logical_not(saturated))
                    def _():
                        slot = jax.lax.rem(k_local, 4)
                        rows = jnp.transpose(
                            buf[i % 2, f, :, j * chunk : (j + 1) * chunk]
                        )
                        px, py = _tile_pixel_coords(
                            owner, grid_x, tile_x, tile_y
                        )
                        t_final = ring[f, slot, 3:4, :]
                        gc0 = ring[f, slot, 8:9, :]
                        gc1 = ring[f, slot, 9:10, :]
                        gc2 = ring[f, slot, 10:11, :]
                        gt = ring[f, slot, 11:12, :]
                        # combined gc-weighted totals: one prefix replaces
                        # three (see composite.py backward)
                        gtotal = (
                            gc0 * ring[f, slot, 0:1, :]
                            + gc1 * ring[f, slot, 1:2, :]
                            + gc2 * ring[f, slot, 2:3, :]
                            + gt * t_final
                        )

                        a_hat, skip, g_exp, dx, dy, row = _chunk_geometry(
                            rows, px, py, inbase, cnt,
                            alpha_max, alpha_min, chunk,
                        )
                        contrib, t_g, t_out, probe_out = _composite_step(
                            a_hat, skip, state[f, 0:1, :], state[f, 1:2, :],
                            eps, step_tril,
                        )
                        in_range = (inbase + row) < cnt
                        grads, pcc_out = _instance_grads(
                            rows, dx, dy, in_range, contrib, a_hat, t_g,
                            g_exp, skip, gc0, gc1, gc2, gtotal,
                            state[f, 2:3, :], tril, chunk,
                        )
                        gstage[
                            i % 2, f, :, j * chunk : (j + 1) * chunk
                        ] = jnp.transpose(grads)
                        state[f, 0:1, :] = t_out
                        state[f, 1:2, :] = probe_out
                        state[f, 2:3, :] = pcc_out

            out_dma(i % 2, f, i).start()

    @pl.when(i == num_steps - 1)
    def _():  # drain output DMAs of every section
        for f in range(F):
            n_f = sec_nchunks_ref[f]
            last = (n_f + S - 1) // S - 1  # last active step of section f

            @pl.when(n_f > 0)
            def _():
                out_dma(last % 2, f, last).wait()

                @pl.when(last >= 1)
                def _():
                    out_dma((last - 1) % 2, f, last - 1).wait()



@functools.lru_cache(maxsize=None)
def make_section_calls(
    *,
    grid_x: int,
    grid_y: int,
    tile_x: int,
    tile_y: int,
    chunk: int,
    padded_capacity: int,
    stream_chunks: int = 8,
    sections: int = 8,
    alpha_max: float = 0.99,
    alpha_min: float = 1.0 / 255.0,
    eps: float = 1e-4,
    scan_mode: str = "log",
    interpret: bool = False,
):
    """Raw forward/backward pallas_calls of the sectioned schedule.

    Returns (fwd_call, bwd_call, c_total, kp_in, kp_bwd, S, F).
    fwd_call(sec_chunk0, sec_nchunks, owner, inbase, ccount, splats_in)
      -> (T, 8, npix)
    bwd_call(sec_chunk0, sec_nchunks, sec_open0, sec_nopen, owner, inbase,
             ccount, openidx, openseq, splats_in, meta, zeros_base)
      -> (16, kp_bwd) aliased with zeros_base
    """
    num_tiles = grid_x * grid_y
    npix = tile_x * tile_y
    Kp = padded_capacity
    assert Kp % chunk == 0
    c_total = Kp // chunk
    S = max(1, min(stream_chunks, c_total))
    F = max(1, min(sections, c_total))
    num_steps = (c_total + S - 1) // S  # worst case: one section owns it all
    # Input padded so any section's final full-S-block read stays in bounds.
    kp_in = (c_total + S) * chunk
    # Backward output: main region + one S*chunk tail slot per section.
    kp_bwd = Kp + F * S * chunk
    kw = dict(
        grid_x=grid_x,
        tile_x=tile_x,
        tile_y=tile_y,
        chunk=chunk,
        s_chunks=S,
        f_sections=F,
        num_tiles=num_tiles,
        num_steps=num_steps,
        alpha_max=alpha_max,
        alpha_min=alpha_min,
        eps=eps,
        scan_mode=scan_mode,
    )

    fwd_call = pl.pallas_call(
        functools.partial(_section_forward_kernel, **kw),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=5,
            grid=(num_steps,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],  # splats
            out_specs=pl.BlockSpec(memory_space=pl.ANY),
            scratch_shapes=[
                pltpu.VMEM((2, F, SPLAT_WIDTH, S * chunk), jnp.float32),
                pltpu.VMEM((F, 8, npix), jnp.float32),
                pltpu.VMEM((F, 2, 8, npix), jnp.float32),
                pltpu.SMEM((F, 4), jnp.int32),
                pltpu.SemaphoreType.DMA((2, F)),
                pltpu.SemaphoreType.DMA((F, 2)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((num_tiles, 8, npix), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )

    bwd_call = pl.pallas_call(
        functools.partial(
            _section_backward_kernel, kp_main_cols=Kp, **kw
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=9,
            grid=(num_steps,),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),  # splats (16, kp_in)
                pl.BlockSpec(memory_space=pl.ANY),  # meta (T, 16, npix)
                pl.BlockSpec(memory_space=pl.ANY),  # zeros base (aliased)
            ],
            out_specs=pl.BlockSpec(memory_space=pl.ANY),
            scratch_shapes=[
                pltpu.VMEM((2, F, SPLAT_WIDTH, S * chunk), jnp.float32),
                pltpu.VMEM((2, F, SPLAT_WIDTH, S * chunk), jnp.float32),
                pltpu.VMEM((F, 8, npix), jnp.float32),
                pltpu.VMEM((F, 4, 16, npix), jnp.float32),
                pltpu.SemaphoreType.DMA((2, F)),
                pltpu.SemaphoreType.DMA((2, F)),
                pltpu.SemaphoreType.DMA((F, 4)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((SPLAT_WIDTH, kp_bwd), jnp.float32),
        # zeros base -> output (gaps stay zero); flat input indices include
        # the 9 scalar-prefetch operands, so the third tensor input is 11.
        input_output_aliases={11: 0},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )
    return fwd_call, bwd_call, c_total, kp_in, kp_bwd, S, F


@functools.lru_cache(maxsize=None)
def make_section_composite(
    *,
    grid_x: int,
    grid_y: int,
    tile_x: int,
    tile_y: int,
    chunk: int,
    padded_capacity: int,
    stream_chunks: int = 8,
    sections: int = 8,
    alpha_max: float = 0.99,
    alpha_min: float = 1.0 / 255.0,
    eps: float = 1e-4,
    scan_mode: str = "log",
    interpret: bool = False,
):
    """Build the sectioned differentiable tile-compositing op.

    Same contract as composite.make_tile_composite: returns
    comp(splats_T (16, Kp), tile_chunk_start (T,), tile_count (T,)) ->
    (T, 8, npix) rows [r, g, b, final_T, n_contrib, 0, 0, 0].
    """
    num_tiles = grid_x * grid_y
    npix = tile_x * tile_y
    Kp = padded_capacity
    fwd_call, bwd_call, c_total, kp_in, kp_bwd, S, F = make_section_calls(
        grid_x=grid_x, grid_y=grid_y, tile_x=tile_x, tile_y=tile_y,
        chunk=chunk, padded_capacity=padded_capacity,
        stream_chunks=stream_chunks, sections=sections,
        alpha_max=alpha_max, alpha_min=alpha_min, eps=eps,
        scan_mode=scan_mode, interpret=interpret,
    )

    def _tables(tile_chunk_start, tile_count):
        owner, inbase, ccount, openidx, openseq = _chunk_tables(
            tile_chunk_start, tile_count, chunk=chunk, c_padded=c_total
        )
        cpt = (tile_count + chunk - 1) // chunk
        total_chunks = (tile_chunk_start[-1] + cpt[-1]).astype(jnp.int32)
        # Section boundaries: tile starts nearest the equal-chunk splits.
        targets = (
            jnp.arange(F, dtype=jnp.int32) * total_chunks
        ) // jnp.int32(F)
        sec_tile = jnp.minimum(
            take_searchsorted(tile_chunk_start, targets), num_tiles - 1
        )
        sec_chunk0 = jnp.where(
            jnp.arange(F) == 0,
            jnp.int32(0),
            tile_chunk_start[sec_tile].astype(jnp.int32),
        )
        sec_chunk0 = jax.lax.cummax(sec_chunk0)  # degenerate-scene safety
        ends = jnp.concatenate([sec_chunk0[1:], total_chunks[None]])
        sec_nchunks = (ends - sec_chunk0).astype(jnp.int32)
        # Open ordinal at each section boundary: the number of tile-opens in
        # chunks strictly before the boundary.  Works uniformly for empty
        # sections (equal boundaries -> zero opens).
        valid_c = owner < num_tiles
        is_open_c = (valid_c & (inbase == 0)).astype(jnp.int32)
        opens_incl = cumsum_i32(is_open_c)
        opens_excl = opens_incl - is_open_c
        nopen_total = opens_incl[-1]
        bound = jnp.where(
            sec_chunk0 >= c_total,
            nopen_total,
            jnp.take(opens_excl, jnp.minimum(sec_chunk0, c_total - 1)),
        ).astype(jnp.int32)
        sec_open0 = bound
        open_ends = jnp.concatenate([bound[1:], nopen_total[None]])
        sec_nopen = (open_ends - sec_open0).astype(jnp.int32)
        return (sec_chunk0, sec_nchunks, sec_open0, sec_nopen,
                owner, inbase, ccount, openidx, openseq)

    def _pad_in(splats_t):
        return jnp.pad(splats_t, ((0, 0), (0, kp_in - Kp)))

    def _fwd_impl(splats_t, tile_chunk_start, tile_count):
        tables = _tables(tile_chunk_start, tile_count)
        sec_chunk0, sec_nchunks = tables[0], tables[1]
        owner, inbase, ccount = tables[4], tables[5], tables[6]
        raw = fwd_call(
            sec_chunk0, sec_nchunks, owner, inbase, ccount,
            _pad_in(splats_t),
        )
        empty = (tile_count == 0)[:, None, None]
        out = jnp.where(empty, _default_rows(npix), raw)
        return out, tables

    @jax.custom_vjp
    def comp(splats_t, tile_chunk_start, tile_count):
        out, _ = _fwd_impl(splats_t, tile_chunk_start, tile_count)
        return out

    def comp_fwd(splats_t, tile_chunk_start, tile_count):
        out, tables = _fwd_impl(splats_t, tile_chunk_start, tile_count)
        return out, (splats_t, tables, out)

    def comp_bwd(res, g):
        splats_t, tables, out = res
        (sec_chunk0, sec_nchunks, sec_open0, sec_nopen,
         owner, inbase, ccount, openidx, openseq) = tables
        meta = jnp.concatenate([out, g], axis=1)  # (T, 16, npix)
        base = jnp.zeros((SPLAT_WIDTH, kp_bwd), jnp.float32)
        shifted = bwd_call(
            sec_chunk0, sec_nchunks, sec_open0, sec_nopen,
            owner, inbase, ccount, openidx, openseq,
            _pad_in(splats_t), meta, base,
        )
        # Add each section's tail slot back at its true offset.  Tail columns
        # past the section's real length were zeroed by the kernel, so the
        # add is a no-op beyond the section boundary.
        for f in range(F):
            last = jnp.maximum((sec_nchunks[f] + S - 1) // S - 1, 0)
            off = (sec_chunk0[f] + last * S) * chunk
            tail = jax.lax.dynamic_slice(
                shifted, (0, Kp + f * S * chunk), (SPLAT_WIDTH, S * chunk)
            )
            cur = jax.lax.dynamic_slice(
                shifted, (0, off), (SPLAT_WIDTH, S * chunk)
            )
            shifted = jax.lax.dynamic_update_slice(
                shifted, cur + tail, (0, off)
            )
        dsplats = shifted[:, :Kp]
        zi_t = np.zeros((num_tiles,), jax.dtypes.float0)
        return (dsplats, zi_t, zi_t)

    comp.defvjp(comp_fwd, comp_bwd)
    return comp
