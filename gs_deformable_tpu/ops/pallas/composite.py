"""Pallas tile-compositing kernels: the TPU re-design of renderCUDA fwd/bwd.

Forward semantics match forward.cu:261-374; backward matches backward.cu:401-560
(see ops/rasterize_dense.py for the list of matched numerical details).  The
re-design for TPU:

- One grid step per 16x16 tile; the tile's depth-sorted instances stream from
  HBM in chunk-sized, *lane-aligned* DMA slices (the analog of the CUDA
  collective shared-memory fetch at forward.cu:313-322).  The splat array is
  field-major (16, Kp) and every tile's range starts on a chunk boundary
  (ops/binning.py lays it out that way), so the DMA offset is provably a
  multiple of the 128 lane width.
- The per-pixel sequential front-to-back loop becomes *vectorized* compositing:
  transmittance is an exclusive cumulative product along the chunk axis,
  computed in log space as one triangular matmul on the MXU; the reference's
  first-hit "done" test (forward.cu:346-351) is resolved with a min-reduction
  for the first terminating instance index — all 256 pixels ride the lane
  dimension.
- No atomics exist on TPU: the backward writes per-*instance* gradient rows to
  its tile's exclusive aligned slice of the instance list, and the
  per-gaussian reduction happens outside as the transpose of the XLA gather
  that built the sorted splat array (a sorted segment-sum — the TPU-native
  replacement for backward.cu's atomicAdd scatter).
- The backward recomputes suffix color sums S_g = C_total - P_g from a prefix
  sum (triangular-matmul cumsum on the MXU) instead of the reference's
  back-to-front accum_rec recursion — same math, forward order, one pass.

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
    """Float pixel coordinates of this tile's pixels, shape (1, tile_x*tile_y)."""
    npix = tile_x * tile_y
    tile_col = tile_idx % grid_x
    tile_row = tile_idx // grid_x
    p = jax.lax.broadcasted_iota(jnp.int32, (1, npix), 1)
    px = (tile_col * tile_x + p % tile_x).astype(jnp.float32)
    py = (tile_row * tile_y + p // tile_x).astype(jnp.float32)
    return px, py


def _chunk_geometry(buf, px, py, chunk_base, count, alpha_max, alpha_min, chunk):
    """Shared forward/backward per-chunk splat evaluation.

    ``buf`` is the (chunk, 16) row-major view of the chunk's splats.
    Returns alpha_hat (clamped alpha, skipped rows zeroed) and friends.
    """
    xg = buf[:, 0:1]
    yg = buf[:, 1:2]
    ca = buf[:, 2:3]
    cb = buf[:, 3:4]
    cc = buf[:, 4:5]
    op = buf[:, 5:6]

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


def _composite_step(a_hat, skip, t_in, done_in, eps, chunk, tril):
    """First-hit termination + transmittance bookkeeping for one chunk.

    The transmittance recurrence T *= (1 - alpha) runs in log space: the
    cumulative sum of log1p(-alpha) along the chunk is one triangular matmul
    on the MXU (vs ~14 VPU passes for a Hillis-Steele cumprod), and the
    exclusive product is exp(incl - own).  fp32 log/exp round-trip error is
    ~1e-7 relative — far inside the compositing tolerances.

    Returns (contrib mask, t_g per-row transmittance, t_out, done_out).
    """
    om = 1.0 - a_hat
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
    t_out = t_in * jnp.exp(jnp.sum(log_eff, axis=0, keepdims=True))
    done_out = jnp.maximum(done_in, (fd < _BIG).astype(jnp.float32))
    return contrib, t_g, t_out, done_out


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
    alpha_max: float,
    alpha_min: float,
    eps: float,
):
    npix = tile_x * tile_y
    t = pl.program_id(0)
    start_chunk = start_ref[t]
    count = count_ref[t]
    px, py = _pixel_coords(t, grid_x, tile_x, tile_y)
    nchunks = pl.cdiv(count, chunk)
    tril = _tril(chunk)

    def dma(slot, i):
        return pltpu.make_async_copy(
            splats_hbm.at[:, pl.ds((start_chunk + i) * chunk, chunk)],
            buf.at[slot],
            sem.at[slot],
        )

    @pl.when(nchunks > 0)
    def _():
        dma(0, 0).start()

    def cond(carry):
        i, _, done, *_ = carry
        return (i < nchunks) & (jnp.min(done) < 0.5)

    def body(carry):
        i, t_acc, done, c0, c1, c2, nc = carry

        # Prefetch the next chunk while this one computes (double buffering).
        @pl.when(i + 1 < nchunks)
        def _():
            dma((i + 1) % 2, i + 1).start()

        dma(i % 2, i).wait()
        rows = jnp.transpose(buf[i % 2])  # (chunk, 16)
        base = i * chunk
        a_hat, skip, _, _, _, row = _chunk_geometry(
            rows, px, py, base, count, alpha_max, alpha_min, chunk
        )
        contrib, t_g, t_acc, done = _composite_step(a_hat, skip, t_acc, done, eps, chunk, tril)
        w = jnp.where(contrib, a_hat * t_g, 0.0)
        c0 = c0 + jnp.sum(w * rows[:, 6:7], axis=0, keepdims=True)
        c1 = c1 + jnp.sum(w * rows[:, 7:8], axis=0, keepdims=True)
        c2 = c2 + jnp.sum(w * rows[:, 8:9], axis=0, keepdims=True)
        gidx = (base + row + 1).astype(jnp.float32)  # 1-based instance counter
        nc = jnp.maximum(
            nc, jnp.max(jnp.where(contrib, gidx, 0.0), axis=0, keepdims=True)
        )
        return (i + 1, t_acc, done, c0, c1, c2, nc)

    ones = jnp.ones((1, npix), jnp.float32)
    zeros = jnp.zeros((1, npix), jnp.float32)
    init = (jnp.int32(0), ones, zeros, zeros, zeros, zeros, zeros)
    ie, t_fin, _, c0, c1, c2, nc = jax.lax.while_loop(cond, body, init)

    # Early exit leaves one prefetched chunk in flight; drain it so the DMA
    # semaphore is clean at kernel end.
    @pl.when(ie < nchunks)
    def _():
        dma(ie % 2, ie).wait()

    out_ref[0, 0:1, :] = c0
    out_ref[0, 1:2, :] = c1
    out_ref[0, 2:3, :] = c2
    out_ref[0, 3:4, :] = t_fin
    out_ref[0, 4:5, :] = nc
    out_ref[0, 5:8, :] = jnp.zeros((3, npix), jnp.float32)


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
    alpha_max: float,
    alpha_min: float,
    eps: float,
):
    npix = tile_x * tile_y
    t = pl.program_id(0)
    start_chunk = start_ref[t]
    count = count_ref[t]
    px, py = _pixel_coords(t, grid_x, tile_x, tile_y)
    nchunks = pl.cdiv(count, chunk)

    total0 = fwd_ref[0, 0:1, :]
    total1 = fwd_ref[0, 1:2, :]
    total2 = fwd_ref[0, 2:3, :]
    t_final = fwd_ref[0, 3:4, :]
    gc0 = g_ref[0, 0:1, :]
    gc1 = g_ref[0, 1:2, :]
    gc2 = g_ref[0, 2:3, :]
    gt = g_ref[0, 3:4, :]

    tril = _tril(chunk)

    def dma(slot, i):
        return pltpu.make_async_copy(
            splats_hbm.at[:, pl.ds((start_chunk + i) * chunk, chunk)],
            buf.at[slot],
            sem.at[slot],
        )

    @pl.when(nchunks > 0)
    def _():
        dma(0, 0).start()

    def body(i, carry):
        t_acc, done, p0, p1, p2 = carry

        @pl.when(i + 1 < nchunks)
        def _():
            dma((i + 1) % 2, i + 1).start()

        dma(i % 2, i).wait()
        rows = jnp.transpose(buf[i % 2])  # (chunk, 16)
        base = i * chunk
        a_hat, skip, g_exp, dx, dy, _ = _chunk_geometry(
            rows, px, py, base, count, alpha_max, alpha_min, chunk
        )
        contrib, t_g, t_out, done_out = _composite_step(
            a_hat, skip, t_acc, done, eps, chunk, tril
        )
        cf = contrib.astype(jnp.float32)
        w = cf * a_hat * t_g  # alpha * T for contributing rows
        col0 = rows[:, 6:7]
        col1 = rows[:, 7:8]
        col2 = rows[:, 8:9]

        # Inclusive prefix sums of c*alpha*T along the chunk (MXU matmul), plus
        # the carry from earlier chunks.
        pc0 = p0 + jnp.dot(tril, w * col0, preferred_element_type=jnp.float32)
        pc1 = p1 + jnp.dot(tril, w * col1, preferred_element_type=jnp.float32)
        pc2 = p2 + jnp.dot(tril, w * col2, preferred_element_type=jnp.float32)

        om = 1.0 - a_hat
        inv_om = 1.0 / om
        # dL/dalpha_g (backward.cu:515-534): front-to-back form with
        # S_g = total - P_g(inclusive).
        dalpha = (
            gc0 * (col0 * t_g - (total0 - pc0) * inv_om)
            + gc1 * (col1 * t_g - (total1 - pc1) * inv_om)
            + gc2 * (col2 * t_g - (total2 - pc2) * inv_om)
            + gt * (-t_final * inv_om)
        )
        dalpha = cf * dalpha
        op = rows[:, 5:6]
        g_safe = jnp.where(skip, 0.0, g_exp)
        dl_dg = op * dalpha
        d_op = jnp.sum(g_safe * dalpha, axis=1, keepdims=True)
        ca = rows[:, 2:3]
        cb = rows[:, 3:4]
        gg = dl_dg * g_safe
        d_x = jnp.sum(gg * (-(ca * dx + cb * dy)), axis=1, keepdims=True)
        cc = rows[:, 4:5]
        d_y = jnp.sum(gg * (-(cc * dy + cb * dx)), axis=1, keepdims=True)
        d_ca = jnp.sum(gg * (-0.5 * dx * dx), axis=1, keepdims=True)
        d_cb = jnp.sum(gg * (-dx * dy), axis=1, keepdims=True)
        d_cc = jnp.sum(gg * (-0.5 * dy * dy), axis=1, keepdims=True)
        d_c0 = jnp.sum(w * gc0, axis=1, keepdims=True)
        d_c1 = jnp.sum(w * gc1, axis=1, keepdims=True)
        d_c2 = jnp.sum(w * gc2, axis=1, keepdims=True)

        grads = jnp.concatenate(
            [d_x, d_y, d_ca, d_cb, d_cc, d_op, d_c0, d_c1, d_c2,
             jnp.zeros((chunk, SPLAT_WIDTH - 9), jnp.float32)],
            axis=1,
        )  # (chunk, 16)
        gbuf[:] = jnp.transpose(grads)  # (16, chunk)
        wcp = pltpu.make_async_copy(
            gbuf, dsplat_hbm.at[:, pl.ds((start_chunk + i) * chunk, chunk)], gsem
        )
        wcp.start()
        wcp.wait()
        return (t_out, done_out, pc0[chunk - 1 :, :], pc1[chunk - 1 :, :], pc2[chunk - 1 :, :])

    ones = jnp.ones((1, npix), jnp.float32)
    zeros = jnp.zeros((1, npix), jnp.float32)
    jax.lax.fori_loop(0, nchunks, body, (ones, zeros, zeros, zeros, zeros))


@functools.lru_cache(maxsize=None)
def make_tile_composite(
    *,
    grid_x: int,
    grid_y: int,
    tile_x: int,
    tile_y: int,
    chunk: int,
    padded_capacity: int,
    alpha_max: float = 0.99,
    alpha_min: float = 1.0 / 255.0,
    eps: float = 1e-4,
    interpret: bool = False,
):
    """Build the differentiable tile-compositing op for a static geometry.

    Returns comp(splats_T (16, Kp), tile_chunk_start (T,), tile_count (T,)) ->
    (T, 8, npix) with rows [r, g, b, final_T, n_contrib, 0, 0, 0].
    """
    num_tiles = grid_x * grid_y
    npix = tile_x * tile_y
    Kp = padded_capacity
    assert Kp % chunk == 0
    kw = dict(
        grid_x=grid_x,
        tile_x=tile_x,
        tile_y=tile_y,
        chunk=chunk,
        alpha_max=alpha_max,
        alpha_min=alpha_min,
        eps=eps,
    )

    fwd_call = pl.pallas_call(
        functools.partial(_forward_kernel, **kw),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(num_tiles,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)],
            out_specs=pl.BlockSpec(
                (1, 8, npix), lambda t, *_: (t, 0, 0), memory_space=pltpu.VMEM
            ),
            scratch_shapes=[
                pltpu.VMEM((2, SPLAT_WIDTH, chunk), jnp.float32),
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
        functools.partial(_backward_kernel, **kw),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(num_tiles,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.HBM),  # splats (16, Kp)
                pl.BlockSpec(
                    (1, 8, npix), lambda t, *_: (t, 0, 0), memory_space=pltpu.VMEM
                ),  # forward outputs
                pl.BlockSpec(
                    (1, 8, npix), lambda t, *_: (t, 0, 0), memory_space=pltpu.VMEM
                ),  # upstream grads
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.HBM),
            scratch_shapes=[
                pltpu.VMEM((2, SPLAT_WIDTH, chunk), jnp.float32),
                pltpu.VMEM((SPLAT_WIDTH, chunk), jnp.float32),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.DMA,
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((SPLAT_WIDTH, Kp), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
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
