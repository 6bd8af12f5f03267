"""Pallas tile-compositing kernels: the TPU re-design of renderCUDA fwd/bwd.

Forward semantics match forward.cu:261-374; backward matches backward.cu:401-560
(see ops/rasterize_dense.py for the list of matched numerical details).  The
re-design for TPU:

- One grid step processes a *batch* of `tile_batch` tiles: their per-chunk DMA
  waves issue together (latencies overlap) and the grid shrinks by the batch
  factor, amortizing per-step pipeline overhead.  Each tile still streams its
  own depth-sorted instance chunks from HBM in lane-aligned DMA slices (the
  analog of the CUDA collective shared-memory fetch at forward.cu:313-322):
  the splat array is field-major (16, Kp) and every tile's range starts on a
  chunk boundary (ops/binning.py lays it out that way).
- The per-pixel sequential front-to-back loop becomes *vectorized* compositing:
  transmittance is an exclusive cumulative product along the chunk axis,
  computed in log space as one triangular matmul on the MXU; the reference's
  first-hit "done" test (forward.cu:346-351) is resolved with a min-reduction
  for the first terminating instance index — pixels ride the lane dimension.
- No atomics exist on TPU: the backward writes per-*instance* gradient rows to
  its tile's exclusive aligned slice of the instance list, and the
  per-gaussian reduction happens outside as the transpose of the XLA gather
  that built the sorted splat array (a sorted segment-sum — the TPU-native
  replacement for backward.cu's atomicAdd scatter).
- The backward recomputes suffix color sums S_g = C_total - P_g from a prefix
  sum (triangular-matmul cumsum on the MXU) instead of the reference's
  back-to-front accum_rec recursion — same math, forward order, one pass.
  dL/dalpha only ever consumes Sum_c gc_c * S_c, so by linearity ONE combined
  prefix of gc-weighted colors replaces three per-color prefixes (the
  backward was MXU-bound on those matmuls).

Field-major splat layout, 16 rows: [x_pix, y_pix, conic_a, conic_b, conic_c,
opacity, r, g, b, 0...].  Gradient rows mirror it.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

SPLAT_WIDTH = 16
_BIG = 1e9  # python float: jnp constants here would be captured by pallas_call


def _tril(n: int) -> jnp.ndarray:
    r = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    return (r >= c).astype(jnp.float32)


def _pixel_coords(tile_idx, grid_x: int, tile_x: int, tile_y: int):
    """Float pixel coordinates of one tile's pixels, shape (1, tile_x*tile_y)."""
    npix = tile_x * tile_y
    tile_col = tile_idx % grid_x
    tile_row = tile_idx // grid_x
    p = jax.lax.broadcasted_iota(jnp.int32, (1, npix), 1)
    px = (tile_col * tile_x + p % tile_x).astype(jnp.float32)
    py = (tile_row * tile_y + p // tile_x).astype(jnp.float32)
    return px, py


def _chunk_geometry(rows, px, py, chunk_base, count, alpha_max, alpha_min, chunk):
    """Shared forward/backward per-chunk splat evaluation for one tile.

    ``rows`` is the (chunk, 16) row-major view of the chunk's splats.
    """
    xg = rows[:, 0:1]
    yg = rows[:, 1:2]
    ca = rows[:, 2:3]
    cb = rows[:, 3:4]
    cc = rows[:, 4:5]
    op = rows[:, 5:6]

    dx = xg - px  # (chunk, npix)
    dy = yg - py
    power = -0.5 * (ca * dx * dx + cc * dy * dy) - cb * dx * dy
    g_exp = jnp.exp(power)
    alpha = jnp.minimum(alpha_max, op * g_exp)

    row = jax.lax.broadcasted_iota(jnp.int32, (chunk, 1), 0)
    in_range = (chunk_base + row) < count
    skip = (power > 0.0) | (alpha < alpha_min) | jnp.logical_not(in_range)
    a_hat = jnp.where(skip, 0.0, alpha)
    return a_hat, skip, g_exp, dx, dy, row


def _shift_down(x, s: int, fill: float):
    """Shift rows down by ``s`` along axis 0, filling the top with ``fill``."""
    pad = jnp.full((s,) + x.shape[1:], fill, x.dtype)
    return jnp.concatenate([pad, x[: x.shape[0] - s]], axis=0)


def _dot32(a, b):
    return jnp.dot(a, b, preferred_element_type=jnp.float32)


def _sum_rows(x):
    """Sum over the sublane (chunk) axis -> (1, npix), on the MXU.

    A ones-matvec: the VPU tree reduction over 128 sublanes costs ~7 passes
    over the whole array; the MXU does it in one streamed pass (the kernels
    are VPU-bound, MXU mostly idle)."""
    ones = jnp.ones((1, x.shape[0]), jnp.float32)
    return _dot32(ones, x)


def _sum_lanes(x):
    """Sum over the lane (npix) axis -> (chunk, 1), on the MXU."""
    ones = jnp.ones((x.shape[1], 1), jnp.float32)
    return _dot32(x, ones)


def _composite_step(a_hat, skip, t_in, done_in, eps, tril):
    """First-hit termination + transmittance bookkeeping for one chunk.

    Two scan strategies for the transmittance recurrence T *= (1 - alpha):

    - ``tril`` given ("log" mode): cumulative sum of log1p(-alpha) along the
      chunk as one triangular matmul on the MXU; the exclusive product
      divides out the own factor.  fp32 log/exp round-trip error is ~1e-7
      relative — far inside tolerances.
    - ``tril is None`` ("linear" mode): Hillis-Steele exclusive prefix
      *product* of (1 - alpha) via log2(chunk) shift-multiplies on the VPU —
      no transcendentals, no division, no MXU use.  Because the inclusive
      prefix is monotone non-increasing down the chunk, "before the first
      terminating instance" is exactly "prefix >= eps", so the first-hit
      index min-reduction disappears too.
    """
    om = 1.0 - a_hat
    if tril is None:
        p = _shift_down(om, 1, 1.0)
        s = 1
        while s < a_hat.shape[0]:
            p = p * _shift_down(p, s, 1.0)
            s *= 2
        t_g = t_in * p  # exclusive transmittance per row
        test_t = t_g * om  # inclusive
        live = done_in < 0.5
        below = test_t < eps
        contrib = jnp.logical_not(skip | below) & live
        # CUDA leaves T at its value after the last *contributing* row (the
        # terminating row `continue`s without updating T).  test_t is monotone
        # non-increasing, so that value is the min over contributing rows —
        # a min-reduction, since Mosaic has no reduce_prod.
        t_out = jnp.minimum(
            t_in,
            jnp.min(jnp.where(contrib, test_t, _BIG), axis=0, keepdims=True),
        )
        hit = jnp.max(
            jnp.where(jnp.logical_not(skip) & below, 1.0, 0.0),
            axis=0,
            keepdims=True,
        )
        done_out = jnp.maximum(done_in, hit)
        return contrib, t_g, t_out, done_out
    log_om = jnp.log1p(-a_hat)  # exact 0 for skipped rows (a_hat == 0)
    csum = jnp.dot(tril, log_om, preferred_element_type=jnp.float32)  # inclusive
    test_t = t_in * jnp.exp(csum)  # inclusive prefix product
    t_g = test_t / om  # exclusive (om >= 1 - alpha_max = 0.01)
    row_b = jax.lax.broadcasted_iota(jnp.int32, a_hat.shape, 0)
    dmask = jnp.logical_not(skip) & (test_t < eps)
    fd = jnp.min(jnp.where(dmask, row_b.astype(jnp.float32), _BIG), axis=0, keepdims=True)
    live = done_in < 0.5  # (1, npix)
    contrib = jnp.logical_not(skip) & (row_b.astype(jnp.float32) < fd) & live
    log_eff = jnp.where(contrib, log_om, 0.0)
    t_out = t_in * jnp.exp(_sum_rows(log_eff))
    done_out = jnp.maximum(done_in, (fd < _BIG).astype(jnp.float32))
    return contrib, t_g, t_out, done_out


def _group_meta(start_ref, count_ref, g, tb: int, num_tiles: int):
    """Per-group tile metadata: chunk starts/counts/chunk-counts as (tb,)."""
    starts, counts = [], []
    for j in range(tb):
        tidx = jnp.minimum(g * tb + j, num_tiles - 1)
        in_grid = (g * tb + j) < num_tiles
        starts.append(start_ref[tidx])
        counts.append(jnp.where(in_grid, count_ref[tidx], 0))
    return starts, counts


def _forward_kernel(
    start_ref,
    count_ref,
    splats_hbm,
    out_ref,
    buf,
    sem,
    *,
    grid_x: int,
    tile_x: int,
    tile_y: int,
    chunk: int,
    tb: int,
    num_tiles: int,
    alpha_max: float,
    alpha_min: float,
    eps: float,
    scan_mode: str,
):
    npix = tile_x * tile_y
    g = pl.program_id(0)
    starts, counts = _group_meta(start_ref, count_ref, g, tb, num_tiles)
    coords = [
        _pixel_coords(jnp.minimum(g * tb + j, num_tiles - 1), grid_x, tile_x, tile_y)
        for j in range(tb)
    ]
    nchunks_t = [pl.cdiv(counts[j], chunk) for j in range(tb)]
    nchunks = nchunks_t[0]
    for j in range(1, tb):
        nchunks = jnp.maximum(nchunks, nchunks_t[j])
    tril = _tril(chunk) if scan_mode == "log" else None

    def dma(slot, j, i):
        return pltpu.make_async_copy(
            splats_hbm.at[:, pl.ds((starts[j] + i) * chunk, chunk)],
            buf.at[slot, :, j],
            sem.at[slot, j],
        )

    def issue(slot, i):
        for j in range(tb):
            @pl.when(i < nchunks_t[j])
            def _():
                dma(slot, j, i).start()

    def wait(slot, i):
        for j in range(tb):
            @pl.when(i < nchunks_t[j])
            def _():
                dma(slot, j, i).wait()

    @pl.when(nchunks > 0)
    def _():
        issue(0, 0)

    def alldone(done):
        m = jnp.min(done[0])
        for j in range(1, tb):
            m = jnp.minimum(m, jnp.min(done[j]))
        return m

    def cond(carry):
        i, _, done, *_ = carry
        return (i < nchunks) & (alldone(done) < 0.5)

    def body(carry):
        i, t_acc, done, c0, c1, c2, nc = carry

        @pl.when(i + 1 < nchunks)
        def _():
            issue((i + 1) % 2, i + 1)

        wait(i % 2, i)
        base = i * chunk
        t_acc, done, c0, c1, c2, nc = (
            list(t_acc), list(done), list(c0), list(c1), list(c2), list(nc)
        )
        for j in range(tb):
            rows = jnp.transpose(buf[i % 2, :, j])  # (chunk, 16)
            px, py = coords[j]
            a_hat, skip, _, _, _, row = _chunk_geometry(
                rows, px, py, base, counts[j], alpha_max, alpha_min, chunk
            )
            contrib, t_g, t_acc[j], done[j] = _composite_step(
                a_hat, skip, t_acc[j], done[j], eps, tril
            )
            # Colors are per-instance constants, so the three weighted pixel
            # sums are ONE (3, chunk) @ (chunk, npix) matmul on the (mostly
            # idle) MXU instead of three broadcast-multiply-reduce passes on
            # the VPU.  Stale buffer rows (chunks this tile never DMA'd) can
            # hold NaN bits that 0-weights would not erase through a matmul,
            # so both operands are where()-sanitized.
            in_range = (base + row) < counts[j]  # (chunk, 1)
            col_safe = jnp.where(in_range, rows[:, 6:9], 0.0)
            wmask = jnp.where(contrib, a_hat * t_g, 0.0)
            crgb = _dot32(jnp.transpose(col_safe), wmask)  # (3, npix)
            c0[j] = c0[j] + crgb[0:1]
            c1[j] = c1[j] + crgb[1:2]
            c2[j] = c2[j] + crgb[2:3]
            gidx = (base + row + 1).astype(jnp.float32)
            nc[j] = jnp.maximum(
                nc[j], jnp.max(jnp.where(contrib, gidx, 0.0), axis=0, keepdims=True)
            )
        return (i + 1, tuple(t_acc), tuple(done), tuple(c0), tuple(c1),
                tuple(c2), tuple(nc))

    ones = tuple(jnp.ones((1, npix), jnp.float32) for _ in range(tb))
    zeros = tuple(jnp.zeros((1, npix), jnp.float32) for _ in range(tb))
    init = (jnp.int32(0), ones, zeros, zeros, zeros, zeros, zeros)
    ie, t_fin, _, c0, c1, c2, nc = jax.lax.while_loop(cond, body, init)

    # Early exit leaves one prefetched chunk wave in flight; drain it so the
    # DMA semaphores are clean at kernel end.
    @pl.when(ie < nchunks)
    def _():
        wait(ie % 2, ie)

    for j in range(tb):
        out_ref[j, 0:1, :] = c0[j]
        out_ref[j, 1:2, :] = c1[j]
        out_ref[j, 2:3, :] = c2[j]
        out_ref[j, 3:4, :] = t_fin[j]
        out_ref[j, 4:5, :] = nc[j]
        out_ref[j, 5:8, :] = jnp.zeros((3, npix), jnp.float32)


def _backward_kernel(
    start_ref,
    count_ref,
    splats_hbm,
    fwd_ref,
    g_ref,
    dsplat_hbm,
    buf,
    gbuf,
    sem,
    gsem,
    *,
    grid_x: int,
    tile_x: int,
    tile_y: int,
    chunk: int,
    tb: int,
    num_tiles: int,
    alpha_max: float,
    alpha_min: float,
    eps: float,
    scan_mode: str,
):
    npix = tile_x * tile_y
    g = pl.program_id(0)
    starts, counts = _group_meta(start_ref, count_ref, g, tb, num_tiles)
    coords = [
        _pixel_coords(jnp.minimum(g * tb + j, num_tiles - 1), grid_x, tile_x, tile_y)
        for j in range(tb)
    ]
    nchunks_t = [pl.cdiv(counts[j], chunk) for j in range(tb)]
    nchunks = nchunks_t[0]
    for j in range(1, tb):
        nchunks = jnp.maximum(nchunks, nchunks_t[j])
    # The pcc prefix always rides the MXU; only the transmittance scan
    # switches between log-space (tril) and linear-space (None).
    tril = _tril(chunk)
    step_tril = tril if scan_mode == "log" else None

    def dma(slot, j, i):
        return pltpu.make_async_copy(
            splats_hbm.at[:, pl.ds((starts[j] + i) * chunk, chunk)],
            buf.at[slot, :, j],
            sem.at[slot, j],
        )

    def issue(slot, i):
        for j in range(tb):
            @pl.when(i < nchunks_t[j])
            def _():
                dma(slot, j, i).start()

    def wait(slot, i):
        for j in range(tb):
            @pl.when(i < nchunks_t[j])
            def _():
                dma(slot, j, i).wait()

    @pl.when(nchunks > 0)
    def _():
        issue(0, 0)

    def body(i, carry):
        t_acc, done, pcs = (list(c) for c in carry)

        @pl.when(i + 1 < nchunks)
        def _():
            issue((i + 1) % 2, i + 1)

        wait(i % 2, i)
        base = i * chunk
        for j in range(tb):
            rows = jnp.transpose(buf[i % 2, :, j])  # (chunk, 16)
            px, py = coords[j]
            t_final = fwd_ref[j, 3:4, :]
            gc0 = g_ref[j, 0:1, :]
            gc1 = g_ref[j, 1:2, :]
            gc2 = g_ref[j, 2:3, :]
            gt = g_ref[j, 3:4, :]
            # dL/dalpha needs only the gc-weighted color sums: by linearity
            # one combined prefix replaces the three per-color prefixes
            # (1 tril matmul per chunk instead of 3 — the backward was
            # MXU-bound on these).
            gtotal = (
                gc0 * fwd_ref[j, 0:1, :]
                + gc1 * fwd_ref[j, 1:2, :]
                + gc2 * fwd_ref[j, 2:3, :]
                + gt * t_final
            )

            a_hat, skip, g_exp, dx, dy, _ = _chunk_geometry(
                rows, px, py, base, counts[j], alpha_max, alpha_min, chunk
            )
            contrib, t_g, t_acc[j], done[j] = _composite_step(
                a_hat, skip, t_acc[j], done[j], eps, step_tril
            )
            # where() selections guard stale-buffer NaN (see forward kernel).
            # Elementwise gcol / tree msums / per-color trees measured faster
            # here than MXU matvec forms: their N<=3 output widths waste the
            # 128-wide MXU and stall the serial chunk body (+3.7ms on the
            # 800px train step), unlike the forward's (3,chunk)@(chunk,npix).
            col0 = rows[:, 6:7]
            col1 = rows[:, 7:8]
            col2 = rows[:, 8:9]
            gcol = gc0 * col0 + gc1 * col1 + gc2 * col2
            wat = a_hat * t_g  # alpha * T
            wcomb = jnp.where(contrib, wat * gcol, 0.0)
            pcc = pcs[j] + jnp.dot(
                tril, wcomb, preferred_element_type=jnp.float32
            )

            om = 1.0 - a_hat
            inv_om = 1.0 / om
            # dL/dalpha_g (backward.cu:515-534): front-to-back form with
            # S_g = total - P_g(inclusive), gc-combined.  where() (not a cf
            # multiply) keeps any stale-buffer NaN out of the masked rows.
            dalpha = gcol * t_g - (gtotal - pcc) * inv_om
            dalpha = jnp.where(contrib, dalpha, 0.0)
            op = rows[:, 5:6]
            g_safe = jnp.where(skip, 0.0, g_exp)
            gg = op * dalpha * g_safe
            ca = rows[:, 2:3]
            cb = rows[:, 3:4]
            cc = rows[:, 4:5]

            def msum(x):
                return jnp.sum(jnp.where(contrib, x, 0.0), axis=1, keepdims=True)

            d_x = msum(gg * (-(ca * dx + cb * dy)))
            d_y = msum(gg * (-(cc * dy + cb * dx)))
            d_ca = msum(gg * (-0.5 * dx * dx))
            d_cb = msum(gg * (-dx * dy))
            d_cc = msum(gg * (-0.5 * dy * dy))
            d_op = msum(g_safe * dalpha)
            # dL/dcolor = alpha * T * gC (backward.cu:521-527) — no color factor
            wmask = jnp.where(contrib, wat, 0.0)
            d_c0 = jnp.sum(wmask * gc0, axis=1, keepdims=True)
            d_c1 = jnp.sum(wmask * gc1, axis=1, keepdims=True)
            d_c2 = jnp.sum(wmask * gc2, axis=1, keepdims=True)

            grads = jnp.concatenate(
                [d_x, d_y, d_ca, d_cb, d_cc, d_op, d_c0, d_c1, d_c2,
                 jnp.zeros((chunk, SPLAT_WIDTH - 9), jnp.float32)],
                axis=1,
            )  # (chunk, 16)
            gbuf[:, j] = jnp.transpose(grads)  # (16, chunk)
            # carry only the chunk-total combined prefix into the next chunk
            pcs[j] = pcc[chunk - 1 :, :]

        for j in range(tb):
            @pl.when(i < nchunks_t[j])
            def _():
                wcp = pltpu.make_async_copy(
                    gbuf.at[:, j],
                    dsplat_hbm.at[:, pl.ds((starts[j] + i) * chunk, chunk)],
                    gsem.at[j],
                )
                wcp.start()
                wcp.wait()
        return (tuple(t_acc), tuple(done), tuple(pcs))

    ones = tuple(jnp.ones((1, npix), jnp.float32) for _ in range(tb))
    zeros = tuple(jnp.zeros((1, npix), jnp.float32) for _ in range(tb))
    jax.lax.fori_loop(0, nchunks, body, (ones, zeros, zeros))


@functools.lru_cache(maxsize=None)
def make_batch_calls(
    *,
    grid_x: int,
    grid_y: int,
    tile_x: int,
    tile_y: int,
    chunk: int,
    padded_capacity: int,
    tile_batch: int = 4,
    alpha_max: float = 0.99,
    alpha_min: float = 1.0 / 255.0,
    eps: float = 1e-4,
    scan_mode: str = "log",
    interpret: bool = False,
):
    """Raw forward/backward pallas_calls of the tile-batched schedule.

    Returns (fwd_call, bwd_call, t_pad); fwd_call(start, count, splats_t) ->
    (T_pad, 8, npix), bwd_call(start, count, splats_t, fwd_out, g) ->
    (16, Kp).  Exposed separately so make_mixed_composite can pair this
    forward with the stream-schedule backward (bit-identical numerics).
    """
    num_tiles = grid_x * grid_y
    tb = max(1, min(tile_batch, num_tiles))
    groups = (num_tiles + tb - 1) // tb
    t_pad = groups * tb
    npix = tile_x * tile_y
    Kp = padded_capacity
    assert Kp % chunk == 0
    kw = dict(
        grid_x=grid_x,
        tile_x=tile_x,
        tile_y=tile_y,
        chunk=chunk,
        tb=tb,
        num_tiles=num_tiles,
        alpha_max=alpha_max,
        alpha_min=alpha_min,
        eps=eps,
        scan_mode=scan_mode,
    )

    fwd_call = pl.pallas_call(
        functools.partial(_forward_kernel, **kw),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(groups,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)],
            out_specs=pl.BlockSpec(
                (tb, 8, npix), lambda g, *_: (g, 0, 0), memory_space=pltpu.VMEM
            ),
            scratch_shapes=[
                pltpu.VMEM((2, SPLAT_WIDTH, tb, chunk), jnp.float32),
                pltpu.SemaphoreType.DMA((2, tb)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((t_pad, 8, npix), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )

    bwd_call = pl.pallas_call(
        functools.partial(_backward_kernel, **kw),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(groups,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.HBM),  # splats (16, Kp)
                pl.BlockSpec(
                    (tb, 8, npix), lambda g, *_: (g, 0, 0), memory_space=pltpu.VMEM
                ),  # forward outputs
                pl.BlockSpec(
                    (tb, 8, npix), lambda g, *_: (g, 0, 0), memory_space=pltpu.VMEM
                ),  # upstream grads
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.HBM),
            scratch_shapes=[
                pltpu.VMEM((2, SPLAT_WIDTH, tb, chunk), jnp.float32),
                pltpu.VMEM((SPLAT_WIDTH, tb, chunk), jnp.float32),
                pltpu.SemaphoreType.DMA((2, tb)),
                pltpu.SemaphoreType.DMA((tb,)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((SPLAT_WIDTH, Kp), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )
    return fwd_call, bwd_call, t_pad


@functools.lru_cache(maxsize=None)
def make_tile_composite(
    *,
    grid_x: int,
    grid_y: int,
    tile_x: int,
    tile_y: int,
    chunk: int,
    padded_capacity: int,
    tile_batch: int = 4,
    alpha_max: float = 0.99,
    alpha_min: float = 1.0 / 255.0,
    eps: float = 1e-4,
    scan_mode: str = "log",
    interpret: bool = False,
):
    """Build the differentiable tile-compositing op for a static geometry.

    Returns comp(splats_T (16, Kp), tile_chunk_start (T,), tile_count (T,)) ->
    (T_pad, 8, npix) with rows [r, g, b, final_T, n_contrib, 0, 0, 0], where
    T_pad rounds the tile count up to the batch size (callers slice [:T]).
    """
    Kp = padded_capacity
    fwd_call, bwd_call, t_pad = make_batch_calls(
        grid_x=grid_x,
        grid_y=grid_y,
        tile_x=tile_x,
        tile_y=tile_y,
        chunk=chunk,
        padded_capacity=padded_capacity,
        tile_batch=tile_batch,
        alpha_max=alpha_max,
        alpha_min=alpha_min,
        eps=eps,
        scan_mode=scan_mode,
        interpret=interpret,
    )

    @jax.custom_vjp
    def comp(splats_t, tile_chunk_start, tile_count):
        return fwd_call(tile_chunk_start, tile_count, splats_t)

    def comp_fwd(splats_t, tile_chunk_start, tile_count):
        out = fwd_call(tile_chunk_start, tile_count, splats_t)
        return out, (splats_t, tile_chunk_start, tile_count, out)

    def comp_bwd(res, g):
        splats_t, tile_chunk_start, tile_count, out = res
        dsplats = bwd_call(tile_chunk_start, tile_count, splats_t, out, g)
        # Columns past the last aligned instance slot are uninitialized memory;
        # zero everything that no tile owns.
        total = (
            tile_chunk_start[-1] + (tile_count[-1] + chunk - 1) // chunk
        ) * chunk
        col_ok = (jnp.arange(Kp, dtype=jnp.int32) < total)[None, :]
        dsplats = jnp.where(col_ok, dsplats, 0.0)
        zi = np.zeros(tile_chunk_start.shape, jax.dtypes.float0)
        return (dsplats, zi, zi)

    comp.defvjp(comp_fwd, comp_bwd)
    return comp
