"""Packed-stream compositing kernels: sub-chunk-aligned layout, segmented scan.

Fourth schedule for the tile-composite math (semantics: composite.py; CUDA
reference renderCUDA, forward.cu:261-374 / backward.cu:401-560).  Motivation:
the 128-lane DMA alignment forces the chunk-aligned binning layout to pad
every tile to a 128-row multiple; at 1080p bench scale that is 1.21M aligned
rows for 538k instances (+124%).  Every Kp-proportional cost — the splat
gather, the kernel's chunk sweep, the backward's gradient rows and their
segment-sum — pays for the padding.

This schedule keeps 128-wide DMA chunks but aligns *tiles* to a finer
``sub`` boundary (default 32): aligned rows drop to ~660k (+23%).  A DMA
chunk may then span up to chunk/sub tiles, so the kernel:

- computes splat geometry chunk-wide with per-row tile origins (the origin
  subtraction folds into the per-instance center, so per-pixel FLOPs are
  unchanged);
- runs the log-space transmittance scan chunk-wide as a *segmented* prefix:
  the triangular matmul's mask is ANDed with a same-owner mask, so each
  tile's rows scan over their own segment only; carried state (probe / T /
  gc-weighted prefix) applies only to rows continuing the open tile —
  selected by one (chunk,1) mask.  Saturation ("done") needs no branch: a
  carried probe < eps forces contrib=False for continuation rows by math;
- accumulates/flushes per sub-block (each sub-block is tile-pure by
  construction), reusing the stream kernel's open/close state machine at
  sub granularity.

The backward writes full 128-chunk gradient blocks (tiles inside a chunk are
all processed in that grid step, so the chunk is still an exclusive write
slice — the no-atomics contract holds at chunk granularity even though tile
regions are only sub-aligned).

Scan mode: log only (the segmented prefix rides the same triangular matmul;
a segmented Hillis-Steele linear scan would need carried flag lanes).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .composite import SPLAT_WIDTH, _dot32, _tril
from .stream_composite import _chunk_tables, _default_rows, _pad_stream

_BIG = 1e9


def _row_select(rowq, vals, chunk: int):
    """(chunk, 1) array holding vals[q] on rows of sub-block q."""
    out = jnp.zeros((chunk, 1), jnp.float32)
    for q, v in enumerate(vals):
        out = jnp.where(rowq == q, v.astype(jnp.float32), out)
    return out


def _pixel_patterns(tile_x: int, tile_y: int):
    npix = tile_x * tile_y
    p = jax.lax.broadcasted_iota(jnp.int32, (1, npix), 1)
    pxpat = (p % tile_x).astype(jnp.float32)
    pypat = (p // tile_x).astype(jnp.float32)
    return pxpat, pypat


def _packed_chunk(
    rows, pxpat, pypat, ox, oy, ib_row, cnt_row, owner_row, contin_row,
    probe_carry, tril, alpha_max, alpha_min, eps,
):
    """Chunk-wide geometry + segmented scan for one (chunk, npix) block.

    Returns (a_hat, skip, g_exp, dx, dy, contrib, t_g, probe) — all
    per-row/per-pixel; carried-state application and per-tile reductions are
    the caller's per-sub-block work.
    """
    xg = rows[:, 0:1]
    yg = rows[:, 1:2]
    ca = rows[:, 2:3]
    cb = rows[:, 3:4]
    cc = rows[:, 4:5]
    op = rows[:, 5:6]

    dx = (xg - ox) - pxpat  # (chunk, npix); per-row origin folds into center
    dy = (yg - oy) - pypat
    power = -0.5 * (ca * dx * dx + cc * dy * dy) - cb * dx * dy
    g_exp = jnp.exp(power)
    alpha = jnp.minimum(alpha_max, op * g_exp)
    in_range = ib_row < cnt_row  # (chunk, 1)
    skip = (power > 0.0) | (alpha < alpha_min) | jnp.logical_not(in_range)
    a_hat = jnp.where(skip, 0.0, alpha)

    # Segmented inclusive prefix of log1p(-alpha): rows only see their own
    # tile's earlier rows (same-owner mask ANDed into the triangular mask).
    same = (owner_row == jnp.transpose(owner_row)).astype(jnp.float32)
    log_om = jnp.log1p(-a_hat)
    csum = _dot32(tril * same, log_om)
    base = jnp.where(contin_row, probe_carry, 1.0)  # (chunk,1)x(1,npix)
    probe = base * jnp.exp(csum)  # inclusive prefix product per segment
    om = 1.0 - a_hat
    t_g = probe / om  # exclusive (om >= 1 - alpha_max)
    contrib = jnp.logical_not(skip) & (probe >= eps)
    return a_hat, skip, g_exp, dx, dy, contrib, t_g, probe, log_om


def _packed_forward_kernel(
    owner_ref,   # (Q,) int32 scalar-prefetch: owner tile per SUB slot
    inbase_ref,  # (Q,) int32: instance base within the tile at sub start
    scount_ref,  # (Q,) int32: owning tile's instance count
    splat_ref,   # (16, S*chunk) VMEM block
    out_ref,     # (T, 8, npix) HBM — manual flush DMA
    acc,         # (8, npix) VMEM scratch: [c0,c1,c2,T,nc,probe,-,-]
    staging,     # (2, 8, npix) VMEM scratch: flush double buffer
    fmeta,       # (4,) SMEM: [flush_ctr, owner_slot0, owner_slot1, -]
    fsem,        # (2,) DMA semaphores
    *,
    grid_x: int,
    tile_x: int,
    tile_y: int,
    chunk: int,
    sub: int,
    s_chunks: int,
    num_tiles: int,
    num_steps: int,
    alpha_max: float,
    alpha_min: float,
    eps: float,
):
    npix = tile_x * tile_y
    ns = chunk // sub
    i = pl.program_id(0)
    tril = _tril(chunk)
    pxpat, pypat = _pixel_patterns(tile_x, tile_y)
    rowq = jax.lax.broadcasted_iota(jnp.int32, (chunk, 1), 0) // sub
    rowin = jax.lax.broadcasted_iota(jnp.int32, (chunk, 1), 0) % sub

    @pl.when(i == 0)
    def _():
        fmeta[0] = 0

    def flush_dma(slot, owner):
        return pltpu.make_async_copy(
            staging.at[slot], out_ref.at[owner], fsem.at[slot]
        )

    def do_flush(owner):
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

    for j in range(s_chunks):
        c0 = (i * s_chunks + j) * ns
        owners = [owner_ref[c0 + q] for q in range(ns)]
        inbases = [inbase_ref[c0 + q] for q in range(ns)]
        cnts = [scount_ref[c0 + q] for q in range(ns)]

        # Whole chunk past the stream end, or fully inside an already-
        # saturated open tile: skip.  (Fresh opens can never be saturated.)
        any_live = owners[0] < num_tiles
        all_contin = (owners[0] >= 0) & (inbases[0] > 0)
        for q in range(1, ns):
            any_live = any_live | (owners[q] < num_tiles)
            all_contin = all_contin & (owners[q] == owners[0])
        saturated = (jnp.max(acc[5:6, :]) < eps) & all_contin

        @pl.when(any_live & jnp.logical_not(saturated))
        def _():
            rows = jnp.transpose(
                splat_ref[:, j * chunk : (j + 1) * chunk]
            )  # (chunk, 16)
            owner_row = _row_select(rowq, owners, chunk)
            ox = _row_select(
                rowq, [(o % grid_x) * tile_x for o in owners], chunk)
            oy = _row_select(
                rowq, [(o // grid_x) * tile_y for o in owners], chunk)
            ib_row = _row_select(rowq, inbases, chunk) + rowin.astype(
                jnp.float32)
            cnt_row = _row_select(rowq, cnts, chunk)
            contin_row = (owner_row == owners[0].astype(jnp.float32)) & (
                inbases[0] > 0)

            a_hat, skip, _, _, _, contrib, t_g, probe, _ = _packed_chunk(
                rows, pxpat, pypat, ox, oy, ib_row, cnt_row, owner_row,
                contin_row, acc[5:6, :], tril, alpha_max, alpha_min, eps,
            )
            wmask = jnp.where(contrib, a_hat * t_g, 0.0)
            in_range = ib_row < cnt_row
            col_safe = jnp.where(in_range, rows[:, 6:9], 0.0)
            gidx = jnp.where(contrib, ib_row + 1.0, 0.0)

            for q in range(ns):
                owner = owners[q]
                inbase = inbases[q]
                cnt = cnts[q]
                lo = q * sub

                @pl.when(owner < num_tiles)
                def _():
                    @pl.when(inbase == 0)
                    def _():  # fresh tile opens at this sub-block
                        acc[0:3, :] = jnp.zeros((3, npix), jnp.float32)
                        acc[3:4, :] = jnp.ones((1, npix), jnp.float32)
                        acc[4:5, :] = jnp.zeros((1, npix), jnp.float32)
                        acc[5:6, :] = jnp.ones((1, npix), jnp.float32)

                    acc[0:3, :] += _dot32(
                        jnp.transpose(col_safe[lo : lo + sub]),
                        wmask[lo : lo + sub],
                    )
                    acc[4:5, :] = jnp.maximum(
                        acc[4:5, :],
                        jnp.max(gidx[lo : lo + sub], 0, keepdims=True),
                    )
                    # CUDA leaves T after the last contributing row = min of
                    # probe over contributing rows (probe monotone/segment).
                    acc[3:4, :] = jnp.minimum(
                        acc[3:4, :],
                        jnp.min(
                            jnp.where(
                                contrib[lo : lo + sub],
                                probe[lo : lo + sub],
                                _BIG,
                            ),
                            axis=0,
                            keepdims=True,
                        ),
                    )
                    acc[5:6, :] = probe[lo + sub - 1 : lo + sub, :]

                    @pl.when(inbase + sub >= cnt)  # tile closes: flush
                    def _():
                        do_flush(owner)

        # A saturated open tile's remaining chunks are skipped above — but
        # its LAST chunk must still flush the carried state.  Under the skip
        # every sub continues the same tile (all_contin), so at most the
        # final live sub closes it; no opens/resets can occur, so ordering
        # against resets is moot here.
        @pl.when(jnp.logical_not(any_live & jnp.logical_not(saturated)))
        def _():
            for q in range(ns):
                @pl.when(
                    (owners[q] < num_tiles) & (inbases[q] + sub >= cnts[q])
                )
                def _():
                    do_flush(owners[q])

    @pl.when(i == num_steps - 1)
    def _():  # drain in-flight flushes
        ctr = fmeta[0]
        for back in range(2):
            @pl.when(ctr >= back + 1)
            def _():
                slot = jax.lax.rem(ctr - 1 - back, 2)
                flush_dma(slot, fmeta[1 + slot]).wait()


def _packed_backward_kernel(
    owner_ref,    # (Q,) int32
    inbase_ref,   # (Q,) int32
    scount_ref,   # (Q,) int32
    openidx_ref,  # (Q,) int32: ordinal of the tile-open at this sub (if any)
    openseq_ref,  # (Q+pad,) int32: tile id of the k-th open
    splat_ref,    # (16, S*chunk) VMEM block
    meta_hbm,     # (T, 16, npix) HBM: rows 0:8 fwd out, 8:16 upstream grads
    dsplat_ref,   # (16, S*chunk) VMEM out block
    state,        # (8, npix) VMEM scratch: [T,probe,pcc,-,-,-,-,-]
    ring,         # (R, 16, npix) VMEM scratch: tile-meta DMA ring
    rsem,         # (R,) DMA semaphores
    *,
    grid_x: int,
    tile_x: int,
    tile_y: int,
    chunk: int,
    sub: int,
    s_chunks: int,
    num_tiles: int,
    num_steps: int,
    alpha_max: float,
    alpha_min: float,
    eps: float,
    ring_slots: int = 8,
    lookahead: int = 4,
):
    npix = tile_x * tile_y
    ns = chunk // sub
    i = pl.program_id(0)
    tril = _tril(chunk)
    pxpat, pypat = _pixel_patterns(tile_x, tile_y)
    rowq = jax.lax.broadcasted_iota(jnp.int32, (chunk, 1), 0) // sub
    rowin = jax.lax.broadcasted_iota(jnp.int32, (chunk, 1), 0) % sub

    def ring_dma(k, tile):
        slot = jax.lax.rem(k, ring_slots)
        return pltpu.make_async_copy(
            meta_hbm.at[tile], ring.at[slot], rsem.at[slot]
        )

    @pl.when(i == 0)
    def _():  # warm the ring
        for k in range(lookahead):
            tile = openseq_ref[k]

            @pl.when(tile < num_tiles)
            def _():
                ring_dma(k, tile).start()

    dsplat_ref[:, :] = jnp.zeros_like(dsplat_ref)

    for j in range(s_chunks):
        c0 = (i * s_chunks + j) * ns
        owners = [owner_ref[c0 + q] for q in range(ns)]
        inbases = [inbase_ref[c0 + q] for q in range(ns)]
        cnts = [scount_ref[c0 + q] for q in range(ns)]
        kopens = [openidx_ref[c0 + q] for q in range(ns)]

        any_live = owners[0] < num_tiles
        all_contin = inbases[0] > 0
        for q in range(1, ns):
            any_live = any_live | (owners[q] < num_tiles)
            all_contin = all_contin & (owners[q] == owners[0])
        saturated = (jnp.max(state[1:2, :]) < eps) & all_contin

        # Tile opens always advance the ring (even under saturation-skip the
        # ring sequence must stay in lockstep with openidx).
        for q in range(ns):
            @pl.when((owners[q] < num_tiles) & (inbases[q] == 0))
            def _():
                ring_dma(kopens[q], owners[q]).wait()
                nxt = openseq_ref[kopens[q] + lookahead]

                @pl.when(nxt < num_tiles)
                def _():
                    ring_dma(kopens[q] + lookahead, nxt).start()

        @pl.when(any_live & jnp.logical_not(saturated))
        def _():
            rows = jnp.transpose(
                splat_ref[:, j * chunk : (j + 1) * chunk]
            )
            owner_row = _row_select(rowq, owners, chunk)
            ox = _row_select(
                rowq, [(o % grid_x) * tile_x for o in owners], chunk)
            oy = _row_select(
                rowq, [(o // grid_x) * tile_y for o in owners], chunk)
            ib_row = _row_select(rowq, inbases, chunk) + rowin.astype(
                jnp.float32)
            cnt_row = _row_select(rowq, cnts, chunk)
            contin_row = (owner_row == owners[0].astype(jnp.float32)) & (
                inbases[0] > 0)

            a_hat, skip, g_exp, dx, dy, contrib, t_g, probe, _ = (
                _packed_chunk(
                    rows, pxpat, pypat, ox, oy, ib_row, cnt_row, owner_row,
                    contin_row, state[1:2, :], tril, alpha_max, alpha_min,
                    eps,
                )
            )

            # Per-sub gc-weighted contribution rows, concatenated chunk-wide
            # for ONE segmented prefix matmul.
            wat = a_hat * t_g
            gparts = []
            for q in range(ns):
                slot = jax.lax.rem(kopens[q], ring_slots)
                lo = q * sub
                gc0 = ring[slot, 8:9, :]
                gc1 = ring[slot, 9:10, :]
                gc2 = ring[slot, 10:11, :]
                gcol_q = (
                    gc0 * rows[lo : lo + sub, 6:7]
                    + gc1 * rows[lo : lo + sub, 7:8]
                    + gc2 * rows[lo : lo + sub, 8:9]
                )
                gparts.append(
                    jnp.where(
                        contrib[lo : lo + sub], wat[lo : lo + sub] * gcol_q,
                        0.0,
                    )
                )
            wcomb = jnp.concatenate(gparts, axis=0)  # (chunk, npix)
            same = (owner_row == jnp.transpose(owner_row)).astype(jnp.float32)
            pc_base = jnp.where(contin_row, state[2:3, :], 0.0)
            pcc = pc_base + _dot32(tril * same, wcomb)

            om = 1.0 - a_hat
            inv_om = 1.0 / om
            g_safe = jnp.where(skip, 0.0, g_exp)
            op = rows[:, 5:6]
            ca = rows[:, 2:3]
            cb = rows[:, 3:4]
            cc = rows[:, 4:5]

            grad_parts = []
            for q in range(ns):
                slot = jax.lax.rem(kopens[q], ring_slots)
                lo = q * sub
                sl = slice(lo, lo + sub)
                gc0 = ring[slot, 8:9, :]
                gc1 = ring[slot, 9:10, :]
                gc2 = ring[slot, 10:11, :]
                gt = ring[slot, 11:12, :]
                gtotal = (
                    gc0 * ring[slot, 0:1, :]
                    + gc1 * ring[slot, 1:2, :]
                    + gc2 * ring[slot, 2:3, :]
                    + gt * ring[slot, 3:4, :]
                )
                gcol_q = (
                    gc0 * rows[sl, 6:7]
                    + gc1 * rows[sl, 7:8]
                    + gc2 * rows[sl, 8:9]
                )
                dalpha = gcol_q * t_g[sl] - (gtotal - pcc[sl]) * inv_om[sl]
                dalpha = jnp.where(contrib[sl], dalpha, 0.0)
                gg = op[sl] * dalpha * g_safe[sl]

                def msum(x, sl=sl):
                    return jnp.sum(
                        jnp.where(contrib[sl], x, 0.0), axis=1, keepdims=True
                    )

                d_x = msum(gg * (-(ca[sl] * dx[sl] + cb[sl] * dy[sl])))
                d_y = msum(gg * (-(cc[sl] * dy[sl] + cb[sl] * dx[sl])))
                d_ca = msum(gg * (-0.5 * dx[sl] * dx[sl]))
                d_cb = msum(gg * (-dx[sl] * dy[sl]))
                d_cc = msum(gg * (-0.5 * dy[sl] * dy[sl]))
                d_op = msum(g_safe[sl] * dalpha)
                wq = jnp.where(contrib[sl], wat[sl], 0.0)
                d_c0 = jnp.sum(wq * gc0, axis=1, keepdims=True)
                d_c1 = jnp.sum(wq * gc1, axis=1, keepdims=True)
                d_c2 = jnp.sum(wq * gc2, axis=1, keepdims=True)
                gq = jnp.concatenate(
                    [d_x, d_y, d_ca, d_cb, d_cc, d_op, d_c0, d_c1, d_c2,
                     jnp.zeros((sub, SPLAT_WIDTH - 9), jnp.float32)],
                    axis=1,
                )
                in_r = ib_row[sl] < cnt_row[sl]
                live = (owners[q] < num_tiles).astype(jnp.float32)
                grad_parts.append(jnp.where(in_r, gq * live, 0.0))

            grads = jnp.concatenate(grad_parts, axis=0)  # (chunk, 16)
            dsplat_ref[:, j * chunk : (j + 1) * chunk] = jnp.transpose(grads)

            # Carried open-tile state: last sub-block's tail values.
            state[1:2, :] = probe[chunk - 1 :, :]
            state[2:3, :] = pcc[chunk - 1 :, :]

        # Reset carried state whenever the LAST sub of this chunk opened a
        # fresh tile mid-chunk that continues into the next chunk; the scan
        # math above already handled fresh segments via contin_row, so the
        # carry just needs the last row's values — written above.  Under the
        # saturation skip the carry is untouched (still < eps), correct by
        # monotonicity.


def _sub_tables(tile_sub_start, tile_count, *, sub: int, q_padded: int):
    """Per-sub-slot tables + open sequence (wraps stream _chunk_tables)."""
    return _chunk_tables(
        tile_sub_start, tile_count, chunk=sub, c_padded=q_padded
    )


@functools.lru_cache(maxsize=None)
def make_packed_calls(
    *,
    grid_x: int,
    grid_y: int,
    tile_x: int,
    tile_y: int,
    chunk: int,
    sub: int,
    padded_capacity: int,
    stream_chunks: int = 8,
    alpha_max: float = 0.99,
    alpha_min: float = 1.0 / 255.0,
    eps: float = 1e-4,
    interpret: bool = False,
):
    num_tiles = grid_x * grid_y
    npix = tile_x * tile_y
    Kp = padded_capacity
    assert chunk % sub == 0 and Kp % sub == 0
    ns = chunk // sub
    c_total = (Kp + chunk - 1) // chunk
    S = max(1, min(stream_chunks, c_total))
    num_steps = (c_total + S - 1) // S
    c_padded = num_steps * S
    kp_padded = c_padded * chunk
    q_padded = c_padded * ns
    kw = dict(
        grid_x=grid_x,
        tile_x=tile_x,
        tile_y=tile_y,
        chunk=chunk,
        sub=sub,
        s_chunks=S,
        num_tiles=num_tiles,
        num_steps=num_steps,
        alpha_max=alpha_max,
        alpha_min=alpha_min,
        eps=eps,
    )

    fwd_call = pl.pallas_call(
        functools.partial(_packed_forward_kernel, **kw),
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

    # Ring sizing: within one chunk, subs read slots of opens [k, k+ns-1]
    # while their prefetches write slots [k+L, k+ns-1+L]; slot reuse distance
    # is ring_slots, so ring_slots >= ns + lookahead or a prefetch lands on a
    # slot still being read (measured as garbage gradients at ns=8 with an
    # 8-slot ring).
    lookahead = 4
    ring_slots = ns + lookahead + (-(ns + lookahead)) % 4
    bwd_call = pl.pallas_call(
        functools.partial(
            _packed_backward_kernel, ring_slots=ring_slots,
            lookahead=lookahead, **kw
        ),
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
                pltpu.VMEM((ring_slots, 16, npix), jnp.float32),
                pltpu.SemaphoreType.DMA((ring_slots,)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((SPLAT_WIDTH, kp_padded), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )
    return fwd_call, bwd_call, q_padded, kp_padded


@functools.lru_cache(maxsize=None)
def make_packed_composite(
    *,
    grid_x: int,
    grid_y: int,
    tile_x: int,
    tile_y: int,
    chunk: int,
    sub: int,
    padded_capacity: int,
    stream_chunks: int = 8,
    alpha_max: float = 0.99,
    alpha_min: float = 1.0 / 255.0,
    eps: float = 1e-4,
    scan_mode: str = "log",
    interpret: bool = False,
):
    """Differentiable packed-stream composite.

    Contract matches make_tile_composite, with the binning laid out at
    ``sub`` granularity: comp(splats_T (16, Kp), tile_sub_start (T,),
    tile_count (T,)) -> (T, 8, npix).
    """
    assert scan_mode == "log", "packed schedule implements the log scan only"
    num_tiles = grid_x * grid_y
    npix = tile_x * tile_y
    Kp = padded_capacity
    fwd_call, bwd_call, q_padded, kp_padded = make_packed_calls(
        grid_x=grid_x, grid_y=grid_y, tile_x=tile_x, tile_y=tile_y,
        chunk=chunk, sub=sub, padded_capacity=Kp,
        stream_chunks=stream_chunks, alpha_max=alpha_max,
        alpha_min=alpha_min, eps=eps, interpret=interpret,
    )

    def _fwd_impl(splats_t, tile_sub_start, tile_count):
        tables = _sub_tables(
            tile_sub_start, tile_count, sub=sub, q_padded=q_padded
        )
        owner, inbase, scount, openidx, openseq = tables
        raw = fwd_call(owner, inbase, scount, _pad_stream(splats_t, kp_padded))
        empty = (tile_count == 0)[:, None, None]
        out = jnp.where(empty, _default_rows(npix), raw)
        return out, tables

    @jax.custom_vjp
    def comp(splats_t, tile_sub_start, tile_count):
        out, _ = _fwd_impl(splats_t, tile_sub_start, tile_count)
        return out

    def comp_fwd(splats_t, tile_sub_start, tile_count):
        out, tables = _fwd_impl(splats_t, tile_sub_start, tile_count)
        return out, (splats_t, tables, out)

    def comp_bwd(res, g):
        splats_t, tables, out = res
        owner, inbase, scount, openidx, openseq = tables
        meta = jnp.concatenate([out, g], axis=1)  # (T, 16, npix)
        dsplats = bwd_call(
            owner, inbase, scount, openidx, openseq,
            _pad_stream(splats_t, kp_padded), meta
        )[:, :Kp]
        zi_t = np.zeros((num_tiles,), jax.dtypes.float0)
        return (dsplats, zi_t, zi_t)

    comp.defvjp(comp_fwd, comp_bwd)
    return comp
