"""Streaming tile-compositing kernels: flat chunk-stream re-design.

Same math as ops/pallas/composite.py (renderCUDA semantics, forward.cu:261-374
and backward.cu:401-560) but a different schedule.  The batched kernel walks
tiles and issues one manual DMA wave per (tile, chunk); at ~1 chunk per tile
(typical at 1080p) the per-grid-step fixed cost dominates.  Here the grid
walks the chunk-aligned instance stream itself:

- The binning layout (ops/binning.py) is *tile-major*: tile t owns chunk slots
  [chunk_start[t], chunk_start[t] + ceil(count[t]/chunk)).  So a linear sweep
  over chunk slots visits each tile's chunks contiguously and in depth order.
- The splat stream is fed by Pallas' automatic block pipeline — one contiguous
  (16, S*chunk) block per grid step, double-buffered by the runtime.  No
  per-tile DMA waves, no dynamic-trip-count while loops.
- Per-tile composite state (accumulated color, transmittance, done flags,
  n_contrib) lives in VMEM scratch that persists across grid steps; it is
  reset when a chunk opens a new tile (in-tile base == 0) and flushed to the
  per-tile output row by a double-buffered DMA when the tile's last chunk
  retires.
- Chunk -> tile ownership is delivered as scalar-prefetch arrays computed
  once per frame in XLA from the binning (owner / in-tile base / tile count
  per chunk slot).
- The backward additionally needs each tile's forward totals and upstream
  pixel gradients; those stream through a 4-slot DMA ring with a 2-tile
  lookahead (the open sequence is known ahead of time from the same prefetch
  arrays), so tile-boundary loads overlap compositing.

Empty tiles never appear in the chunk stream; the wrapper fills their output
rows (T=1, colors 0 — the init state of the batched kernel) with one fused
jnp.where outside the kernel.
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


def _tile_pixel_coords(owner, grid_x: int, tile_x: int, tile_y: int):
    """Pixel coords of a *dynamic* tile index, shape (1, tile_x*tile_y)."""
    npix = tile_x * tile_y
    tile_col = owner % grid_x
    tile_row = owner // grid_x
    p = jax.lax.broadcasted_iota(jnp.int32, (1, npix), 1)
    px = (tile_col * tile_x + p % tile_x).astype(jnp.float32)
    py = (tile_row * tile_y + p // tile_x).astype(jnp.float32)
    return px, py


def _stream_forward_kernel(
    owner_ref,   # (C,) int32 scalar-prefetch: owning tile per chunk slot
    inbase_ref,  # (C,) int32: instance base within the tile
    ccount_ref,  # (C,) int32: instance count of the owning tile
    splat_ref,   # (16, S*chunk) VMEM block — this step's slice of the stream
    out_ref,     # (T, 8, npix) HBM — written by manual flush DMA
    acc,         # (8, npix) VMEM scratch: [c0,c1,c2,T,nc,probe,-,-]
    staging,     # (2, 8, npix) VMEM scratch: flush double buffer
    fmeta,       # (4,) SMEM scratch: [flush_ctr, owner_slot0, owner_slot1, -]
    fsem,        # (2,) DMA semaphores for flushes
    *,
    grid_x: int,
    tile_x: int,
    tile_y: int,
    chunk: int,
    s_chunks: int,
    num_tiles: int,
    num_steps: int,
    alpha_max: float,
    alpha_min: float,
    eps: float,
    scan_mode: str,
):
    npix = tile_x * tile_y
    i = pl.program_id(0)
    tril = _tril(chunk) if scan_mode == "log" else None

    @pl.when(i == 0)
    def _():
        fmeta[0] = 0

    def flush_dma(slot, owner):
        return pltpu.make_async_copy(
            staging.at[slot], out_ref.at[owner], fsem.at[slot]
        )

    for j in range(s_chunks):
        c = i * s_chunks + j
        owner = owner_ref[c]
        inbase = inbase_ref[c]
        cnt = ccount_ref[c]

        @pl.when(owner < num_tiles)
        def _():
            @pl.when(inbase == 0)
            def _():
                acc[0:3, :] = jnp.zeros((3, npix), jnp.float32)
                acc[3:4, :] = jnp.ones((1, npix), jnp.float32)
                acc[4:5, :] = jnp.zeros((1, npix), jnp.float32)
                acc[5:6, :] = jnp.ones((1, npix), jnp.float32)  # probe

            saturated = jnp.max(acc[5:6, :]) < eps

            @pl.when(jnp.logical_not(saturated))
            def _():
                rows = jnp.transpose(
                    splat_ref[:, j * chunk : (j + 1) * chunk]
                )  # (chunk, 16)
                px, py = _tile_pixel_coords(owner, grid_x, tile_x, tile_y)
                a_hat, skip, _, _, _, row = _chunk_geometry(
                    rows, px, py, inbase, cnt, alpha_max, alpha_min, chunk
                )
                contrib, t_g, t_out, probe_out = _composite_step(
                    a_hat, skip, acc[3:4, :], acc[5:6, :], eps, tril
                )
                # One (3, chunk) @ (chunk, npix) MXU matmul for all three
                # weighted color sums; sanitization per composite.py.
                in_range = (inbase + row) < cnt  # (chunk, 1)
                col_safe = jnp.where(in_range, rows[:, 6:9], 0.0)
                wmask = jnp.where(contrib, a_hat * t_g, 0.0)
                acc[0:3, :] += _dot32(jnp.transpose(col_safe), wmask)
                gidx = (inbase + row + 1).astype(jnp.float32)
                acc[4:5, :] = jnp.maximum(
                    acc[4:5, :],
                    jnp.max(jnp.where(contrib, gidx, 0.0), 0, keepdims=True),
                )
                acc[3:4, :] = t_out
                acc[5:6, :] = probe_out

            @pl.when(inbase + chunk >= cnt)  # last chunk: flush the tile
            def _():
                ctr = fmeta[0]
                slot = jax.lax.rem(ctr, 2)

                @pl.when(ctr >= 2)
                def _():  # reclaim the staging slot
                    flush_dma(slot, fmeta[1 + slot]).wait()

                staging[slot, 0:5, :] = acc[0:5, :]
                staging[slot, 5:8, :] = jnp.zeros((3, npix), jnp.float32)
                flush_dma(slot, owner).start()
                fmeta[1 + slot] = owner
                fmeta[0] = ctr + 1

    @pl.when(i == num_steps - 1)
    def _():  # drain in-flight flushes
        ctr = fmeta[0]
        for back in range(2):
            @pl.when(ctr >= back + 1)
            def _():
                slot = jax.lax.rem(ctr - 1 - back, 2)
                flush_dma(slot, fmeta[1 + slot]).wait()


def _stream_backward_kernel(
    owner_ref,    # (C,) int32
    inbase_ref,   # (C,) int32
    ccount_ref,   # (C,) int32
    openidx_ref,  # (C,) int32: ordinal of the tile-open at this chunk (if any)
    openseq_ref,  # (C+pad,) int32: tile id of the k-th open (sentinel-padded)
    splat_ref,    # (16, S*chunk) VMEM block
    meta_hbm,     # (T, 16, npix) HBM: rows 0:8 fwd out, 8:16 upstream grads
    dsplat_ref,   # (16, S*chunk) VMEM out block
    state,        # (8, npix) VMEM scratch: [T,probe,pcc,-,-,-,-,-]
    ring,         # (4, 16, npix) VMEM scratch: tile-meta DMA ring
    rsem,         # (4,) DMA semaphores for the ring
    *,
    grid_x: int,
    tile_x: int,
    tile_y: int,
    chunk: int,
    s_chunks: int,
    num_tiles: int,
    num_steps: int,
    alpha_max: float,
    alpha_min: float,
    eps: float,
    scan_mode: str,
    lookahead: int = 2,
):
    npix = tile_x * tile_y
    i = pl.program_id(0)
    # pcc prefix always on the MXU; transmittance scan is mode-selected.
    tril = _tril(chunk)
    step_tril = tril if scan_mode == "log" else None

    def ring_dma(k, tile):
        slot = jax.lax.rem(k, 4)
        return pltpu.make_async_copy(
            meta_hbm.at[tile], ring.at[slot], rsem.at[slot]
        )

    @pl.when(i == 0)
    def _():  # warm the ring with the first `lookahead` opens
        for k in range(lookahead):
            tile = openseq_ref[k]

            @pl.when(tile < num_tiles)
            def _():
                ring_dma(k, tile).start()

    dsplat_ref[:, :] = jnp.zeros_like(dsplat_ref)

    for j in range(s_chunks):
        c = i * s_chunks + j
        owner = owner_ref[c]
        inbase = inbase_ref[c]
        cnt = ccount_ref[c]
        kopen = openidx_ref[c]

        @pl.when(owner < num_tiles)
        def _():
            @pl.when(inbase == 0)
            def _():  # tile open: receive this tile's meta, prefetch ahead
                ring_dma(kopen, owner).wait()
                nxt = openseq_ref[kopen + lookahead]

                @pl.when(nxt < num_tiles)
                def _():
                    ring_dma(kopen + lookahead, nxt).start()

                state[1:2, :] = jnp.ones((1, npix), jnp.float32)  # probe
                state[2:3, :] = jnp.zeros((1, npix), jnp.float32)

            saturated = jnp.max(state[1:2, :]) < eps

            @pl.when(jnp.logical_not(saturated))
            def _():
                slot = jax.lax.rem(kopen, 4)
                rows = jnp.transpose(
                    splat_ref[:, j * chunk : (j + 1) * chunk]
                )  # (chunk, 16)
                px, py = _tile_pixel_coords(owner, grid_x, tile_x, tile_y)
                t_final = ring[slot, 3:4, :]
                gc0 = ring[slot, 8:9, :]
                gc1 = ring[slot, 9:10, :]
                gc2 = ring[slot, 10:11, :]
                gt = ring[slot, 11:12, :]
                # combined gc-weighted totals: one prefix replaces three
                # (see composite.py backward)
                gtotal = (
                    gc0 * ring[slot, 0:1, :]
                    + gc1 * ring[slot, 1:2, :]
                    + gc2 * ring[slot, 2:3, :]
                    + gt * t_final
                )

                a_hat, skip, g_exp, dx, dy, row = _chunk_geometry(
                    rows, px, py, inbase, cnt, alpha_max, alpha_min, chunk
                )
                # reduce_t=False: the backward never consumes the running T
                # (final_T arrives via the forward outputs in the meta ring);
                # its per-chunk min-reduction was dead work.  state row 0 is
                # unused and kept only for the scratch layout.
                contrib, t_g, _, probe_out = _composite_step(
                    a_hat, skip, None, state[1:2, :], eps, step_tril,
                    reduce_t=False,
                )
                in_range = (inbase + row) < cnt
                grads, pcc_out = _instance_grads(
                    rows, dx, dy, in_range, contrib, a_hat, t_g, g_exp,
                    skip, gc0, gc1, gc2, gtotal, state[2:3, :], tril, chunk,
                )
                dsplat_ref[:, j * chunk : (j + 1) * chunk] = jnp.transpose(grads)
                state[1:2, :] = probe_out
                state[2:3, :] = pcc_out


def _chunk_tables(tile_chunk_start, tile_count, *, chunk: int, c_padded: int):
    """XLA-side scalar-prefetch tables: per-chunk-slot owner / in-tile base /
    tile count, plus the tile-open sequence for the backward's meta ring.

    Built from delta-cumsum segment fills (ops/binning._delta_fills) — the
    owner, chunk base, and count are per-tile constants over each tile's
    chunk range, so no repeat/gather lowering is needed.
    """
    from ..binning import _delta_fills
    from ..scan_utils import cumsum_i32

    T = tile_count.shape[0]
    cpt = (tile_count + chunk - 1) // chunk  # chunks per tile
    total_chunks = tile_chunk_start[-1] + cpt[-1]
    slot = jnp.arange(c_padded, dtype=jnp.int32)
    active = cpt > 0
    owner_f, cs_f, cnt_f = _delta_fills(
        [jnp.arange(T, dtype=jnp.int32), tile_chunk_start, tile_count],
        active,
        tile_chunk_start,
        c_padded,
        widths=[22, 22, 22],
    )
    valid = slot < total_chunks
    owner = jnp.where(valid, owner_f, T).astype(jnp.int32)
    inbase = jnp.where(valid, (slot - cs_f) * chunk, 0).astype(jnp.int32)
    ccount = jnp.where(valid, cnt_f, 0).astype(jnp.int32)

    is_open = valid & (inbase == 0)
    openidx = cumsum_i32(is_open.astype(jnp.int32)) - 1
    openidx = jnp.maximum(openidx, 0)
    # open_seq[k] = tile id of the k-th open; sentinel-padded (ring lookahead
    # reads up to `lookahead` past the final open).
    openseq = jnp.full((c_padded + 8,), T, jnp.int32)
    openseq = openseq.at[jnp.where(is_open, openidx, c_padded)].set(
        owner, mode="drop"
    )
    return owner, inbase, ccount, openidx, openseq


@functools.lru_cache(maxsize=None)
def make_stream_calls(
    *,
    grid_x: int,
    grid_y: int,
    tile_x: int,
    tile_y: int,
    chunk: int,
    padded_capacity: int,
    stream_chunks: int = 8,
    alpha_max: float = 0.99,
    alpha_min: float = 1.0 / 255.0,
    eps: float = 1e-4,
    scan_mode: str = "log",
    interpret: bool = False,
):
    """Raw forward/backward pallas_calls of the stream schedule.

    Returns (fwd_call, bwd_call, c_padded, kp_padded).
    """
    num_tiles = grid_x * grid_y
    npix = tile_x * tile_y
    Kp = padded_capacity
    assert Kp % chunk == 0
    c_total = Kp // chunk
    S = max(1, min(stream_chunks, c_total))
    num_steps = (c_total + S - 1) // S
    c_padded = num_steps * S
    kw = dict(
        grid_x=grid_x,
        tile_x=tile_x,
        tile_y=tile_y,
        chunk=chunk,
        s_chunks=S,
        num_tiles=num_tiles,
        num_steps=num_steps,
        alpha_max=alpha_max,
        alpha_min=alpha_min,
        eps=eps,
        scan_mode=scan_mode,
    )
    kp_padded = c_padded * chunk

    fwd_call = pl.pallas_call(
        functools.partial(_stream_forward_kernel, **kw),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(num_steps,),
            in_specs=[
                pl.BlockSpec(
                    (SPLAT_WIDTH, S * chunk),
                    lambda i, *_: (0, i),
                    memory_space=pltpu.VMEM,
                ),
            ],
            out_specs=pl.BlockSpec(memory_space=pl.ANY),
            scratch_shapes=[
                pltpu.VMEM((8, npix), jnp.float32),
                pltpu.VMEM((2, 8, npix), jnp.float32),
                pltpu.SMEM((4,), jnp.int32),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((num_tiles, 8, npix), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )

    bwd_call = pl.pallas_call(
        functools.partial(_stream_backward_kernel, **kw),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=5,
            grid=(num_steps,),
            in_specs=[
                pl.BlockSpec(
                    (SPLAT_WIDTH, S * chunk),
                    lambda i, *_: (0, i),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(memory_space=pl.ANY),  # meta (T, 16, npix)
            ],
            out_specs=pl.BlockSpec(
                (SPLAT_WIDTH, S * chunk),
                lambda i, *_: (0, i),
                memory_space=pltpu.VMEM,
            ),
            scratch_shapes=[
                pltpu.VMEM((8, npix), jnp.float32),
                pltpu.VMEM((4, 16, npix), jnp.float32),
                pltpu.SemaphoreType.DMA((4,)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((SPLAT_WIDTH, kp_padded), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )
    return fwd_call, bwd_call, c_padded, kp_padded


def _pad_stream(splats_t, kp_padded: int):
    Kp = splats_t.shape[1]
    if kp_padded == Kp:
        return splats_t
    return jnp.pad(splats_t, ((0, 0), (0, kp_padded - Kp)))


def _default_rows(npix: int):
    # Init state of a tile no instance touched: colors 0, T=1, nc=0.
    d = np.zeros((1, 8, npix), np.float32)
    d[0, 3, :] = 1.0
    return jnp.asarray(d)


@functools.lru_cache(maxsize=None)
def make_stream_composite(
    *,
    grid_x: int,
    grid_y: int,
    tile_x: int,
    tile_y: int,
    chunk: int,
    padded_capacity: int,
    stream_chunks: int = 8,
    alpha_max: float = 0.99,
    alpha_min: float = 1.0 / 255.0,
    eps: float = 1e-4,
    scan_mode: str = "log",
    interpret: bool = False,
):
    """Build the streaming differentiable tile-compositing op.

    Same contract as composite.make_tile_composite: returns
    comp(splats_T (16, Kp), tile_chunk_start (T,), tile_count (T,)) ->
    (T, 8, npix) rows [r, g, b, final_T, n_contrib, 0, 0, 0].
    """
    num_tiles = grid_x * grid_y
    npix = tile_x * tile_y
    Kp = padded_capacity
    fwd_call, bwd_call, c_padded, kp_padded = make_stream_calls(
        grid_x=grid_x, grid_y=grid_y, tile_x=tile_x, tile_y=tile_y,
        chunk=chunk, padded_capacity=padded_capacity,
        stream_chunks=stream_chunks, alpha_max=alpha_max, alpha_min=alpha_min,
        eps=eps, scan_mode=scan_mode, interpret=interpret,
    )

    def _fwd_impl(splats_t, tile_chunk_start, tile_count):
        owner, inbase, ccount, openidx, openseq = _chunk_tables(
            tile_chunk_start, tile_count, chunk=chunk, c_padded=c_padded
        )
        raw = fwd_call(owner, inbase, ccount, _pad_stream(splats_t, kp_padded))
        empty = (tile_count == 0)[:, None, None]
        out = jnp.where(empty, _default_rows(npix), raw)
        return out, (owner, inbase, ccount, openidx, openseq)

    @jax.custom_vjp
    def comp(splats_t, tile_chunk_start, tile_count):
        out, _ = _fwd_impl(splats_t, tile_chunk_start, tile_count)
        return out

    def comp_fwd(splats_t, tile_chunk_start, tile_count):
        out, tables = _fwd_impl(splats_t, tile_chunk_start, tile_count)
        return out, (splats_t, tables, out)

    def comp_bwd(res, g):
        splats_t, tables, out = res
        owner, inbase, ccount, openidx, openseq = tables
        meta = jnp.concatenate([out, g], axis=1)  # (T, 16, npix)
        dsplats = bwd_call(
            owner, inbase, ccount, openidx, openseq,
            _pad_stream(splats_t, kp_padded), meta
        )[:, :Kp]
        zi = np.zeros(owner.shape, jax.dtypes.float0)
        zi_t = np.zeros((num_tiles,), jax.dtypes.float0)
        return (dsplats, zi_t, zi_t)

    comp.defvjp(comp_fwd, comp_bwd)
    return comp


@functools.lru_cache(maxsize=None)
def make_mixed_composite(
    *,
    grid_x: int,
    grid_y: int,
    tile_x: int,
    tile_y: int,
    chunk: int,
    padded_capacity: int,
    tile_batch: int = 4,
    stream_chunks: int = 8,
    alpha_max: float = 0.99,
    alpha_min: float = 1.0 / 255.0,
    eps: float = 1e-4,
    scan_mode: str = "log",
    defer_reductions: bool = True,
    interpret: bool = False,
):
    """Tile-batched forward paired with the stream-schedule backward.

    The two schedules produce bit-identical numerics (verified on chip); on
    v5e the batched forward and the stream backward are each the faster of
    their pair, so training uses this combination.  Same contract as
    make_tile_composite (output is (T, 8, npix), already sliced).
    """
    from .composite import make_batch_calls

    num_tiles = grid_x * grid_y
    Kp = padded_capacity
    b_fwd, _, _ = make_batch_calls(
        grid_x=grid_x, grid_y=grid_y, tile_x=tile_x, tile_y=tile_y,
        chunk=chunk, padded_capacity=padded_capacity, tile_batch=tile_batch,
        alpha_max=alpha_max, alpha_min=alpha_min, eps=eps,
        scan_mode=scan_mode, defer_reductions=defer_reductions,
        interpret=interpret,
    )
    _, s_bwd, c_padded, kp_padded = make_stream_calls(
        grid_x=grid_x, grid_y=grid_y, tile_x=tile_x, tile_y=tile_y,
        chunk=chunk, padded_capacity=padded_capacity,
        stream_chunks=stream_chunks, alpha_max=alpha_max, alpha_min=alpha_min,
        eps=eps, scan_mode=scan_mode, interpret=interpret,
    )

    @jax.custom_vjp
    def comp(splats_t, tile_chunk_start, tile_count):
        return b_fwd(tile_chunk_start, tile_count, splats_t)[:num_tiles]

    def comp_fwd(splats_t, tile_chunk_start, tile_count):
        out = b_fwd(tile_chunk_start, tile_count, splats_t)[:num_tiles]
        tables = _chunk_tables(
            tile_chunk_start, tile_count, chunk=chunk, c_padded=c_padded
        )
        return out, (splats_t, tables, out)

    def comp_bwd(res, g):
        splats_t, tables, out = res
        owner, inbase, ccount, openidx, openseq = tables
        meta = jnp.concatenate([out, g[:num_tiles]], axis=1)
        dsplats = s_bwd(
            owner, inbase, ccount, openidx, openseq,
            _pad_stream(splats_t, kp_padded), meta
        )[:, :Kp]
        zi_t = np.zeros((num_tiles,), jax.dtypes.float0)
        return (dsplats, zi_t, zi_t)

    comp.defvjp(comp_fwd, comp_bwd)
    return comp
