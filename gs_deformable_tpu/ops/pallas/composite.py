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
  first-hit "done" test (forward.cu:346-351) reduces to comparing a carried
  monotone *probe* transmittance against eps (see _composite_step) — no
  per-row index reductions, no done flags; pixels ride the lane dimension.
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
- The backward's nine per-instance pixel reductions stay VPU lane-tree
  reductions: two MXU offloads (narrow matvecs; batched 8-wide moment
  matmuls) each measured slower on v5e — see _instance_grads.

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
    # Precision MUST be pinned: in this environment the Mosaic dot lowers to
    # ONE bf16 MXU pass by default on the real chip (discovered round 3 via
    # tools/smoke_tpu.py / parity_onchip — round-1's "Mosaic fp32 dots are
    # exact" no longer holds), which drifted the compositing transmittance
    # scan ~2.5e-3 CPU-vs-TPU.  The kernels are VPU-bound (MXU mostly idle),
    # so the fp32 6-pass costs nothing measurable.
    return jnp.dot(a, b, preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.HIGHEST)


def _sum_rows(x):
    """Sum over the sublane (chunk) axis -> (1, npix), on the MXU.

    A ones-matvec: the VPU tree reduction over 128 sublanes costs ~7 passes
    over the whole array; the MXU does it in one streamed pass (the kernels
    are VPU-bound, MXU mostly idle)."""
    ones = jnp.ones((1, x.shape[0]), jnp.float32)
    return _dot32(ones, x)


def _composite_step(a_hat, skip, t_in, probe_in, eps, tril, reduce_t=True):
    """First-hit termination + transmittance bookkeeping for one chunk.

    Termination state rides a second carried scalar per pixel: the *probe*
    transmittance — the inclusive prefix product over EVERY evaluated row
    (contributing or not, terminated or not).  The probe is monotone
    non-increasing down the whole instance stream, and before the pixel's
    terminating row it equals the true transmittance bit-for-bit (skipped
    rows multiply by exactly 1; the MXU/scan accumulates the same values in
    the same order).  Hence:

    - "before the first terminating instance" is exactly ``probe >= eps``
      (the old first-terminating-row min-reduction is bitwise equivalent),
    - "the pixel already terminated in an earlier chunk" is exactly
      ``probe_in < eps`` (sticky by monotonicity),

    so the done flag, the per-row index compare, and both min/max reductions
    disappear from the chunk body.  The real transmittance ``t_in``/``t_out``
    (CUDA leaves T at its value after the last *contributing* row) is still
    carried for the final_T output and the alpha weights.

    Two scan strategies for the prefix product:
    - ``tril`` given ("log" mode): cumulative sum of log1p(-alpha) along the
      chunk as one triangular matmul on the MXU; the exclusive product
      divides out the own factor.  fp32 log/exp round-trip error is ~1e-7
      relative — far inside tolerances.
    - ``tril is None`` ("linear" mode): Hillis-Steele exclusive prefix
      *product* of (1 - alpha) via log2(chunk) shift-multiplies on the VPU —
      no transcendentals, no division, no MXU use.

    ``reduce_t=False`` skips the per-chunk T bookkeeping and returns the full
    inclusive-probe matrix (chunk, npix) in the T slot instead.  Two users:
    the backward kernels, whose T chain is dead work (only t_g and probe feed
    the gradients — the forward outputs carry final_T); and the forward's
    deferred-reduction schedule, which folds the probe matrix into a carried
    elementwise-min buffer and reduces ONCE per tile instead of paying a
    log2(chunk) sublane min-reduction per chunk (min is associative and
    commutative, so the deferral is value-identical).
    """
    om = 1.0 - a_hat
    if tril is None:
        p = _shift_down(om, 1, 1.0)
        s = 1
        while s < a_hat.shape[0]:
            p = p * _shift_down(p, s, 1.0)
            s *= 2
        t_g = probe_in * p  # exclusive transmittance per row
        probe = t_g * om  # inclusive
        contrib = jnp.logical_not(skip) & (probe >= eps)
        probe_out = probe[a_hat.shape[0] - 1 :, :]
        if not reduce_t:
            return contrib, t_g, probe, probe_out
        # CUDA leaves T at its value after the last *contributing* row (the
        # terminating row `continue`s without updating T).  probe is monotone
        # non-increasing, so that value is the min over contributing rows —
        # a min-reduction, since Mosaic has no reduce_prod.
        t_out = jnp.minimum(
            t_in,
            jnp.min(jnp.where(contrib, probe, _BIG), axis=0, keepdims=True),
        )
        return contrib, t_g, t_out, probe_out
    log_om = jnp.log1p(-a_hat)  # exact 0 for skipped rows (a_hat == 0)
    csum = _dot32(tril, log_om)  # inclusive
    probe = probe_in * jnp.exp(csum)  # inclusive prefix product
    t_g = probe / om  # exclusive (om >= 1 - alpha_max = 0.01)
    contrib = jnp.logical_not(skip) & (probe >= eps)
    probe_out = probe[a_hat.shape[0] - 1 :, :]
    if not reduce_t:
        return contrib, t_g, probe, probe_out
    log_eff = jnp.where(contrib, log_om, 0.0)
    t_out = t_in * jnp.exp(_sum_rows(log_eff))
    return contrib, t_g, t_out, probe_out


def _instance_grads(
    rows, dx, dy, in_range, contrib, a_hat, t_g, g_exp, skip,
    gc0, gc1, gc2, gtotal, pc_in, tril, chunk: int,
):
    """Per-instance gradient rows for one chunk: (chunk, 16) + carried prefix.

    The nine per-instance pixel reductions (six spatial grads, opacity grad,
    three color grads — backward.cu:515-554) run as VPU lane-tree reductions
    over the pixel axis.  Two MXU alternatives were measured SLOWER on v5e
    and reverted with notes: per-grad N<=3 matvecs (+3.7 ms on the 800px
    train step — narrow outputs waste the 128-wide MXU and stall the serial
    chunk body) and a batched 8-wide polynomial-moment matmul pair (+2.0 ms
    at 1080p/430k instances, measured same-process old-vs-new; the moment
    expansion also reassociates the fp32 sums ~1e-5 away from the CUDA
    per-pixel products).  Only the combined gc-weighted prefix (pcc) rides
    the MXU — dL/dalpha consumes just the gc-weighted suffix color sums, so
    by linearity ONE triangular-matmul prefix replaces three per-color ones.
    """
    col0 = rows[:, 6:7]
    col1 = rows[:, 7:8]
    col2 = rows[:, 8:9]
    gcol = gc0 * col0 + gc1 * col1 + gc2 * col2
    wat = a_hat * t_g
    wcomb = jnp.where(contrib, wat * gcol, 0.0)
    pcc = pc_in + _dot32(tril, wcomb)
    om = 1.0 - a_hat
    inv_om = 1.0 / om
    # dL/dalpha_g (backward.cu:515-534): front-to-back form with
    # S_g = total - P_g(inclusive), gc-combined.  where() (not a cf multiply)
    # keeps stale-buffer NaN out of the masked rows.
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
    # Rows past the tile's instance count (aligned padding, or chunks this
    # tile never streamed) can mix stale/NaN scalars into the products; one
    # masked select keeps them out of the segment sum.
    grads = jnp.where(in_range, grads, 0.0)
    return grads, pcc[chunk - 1 :, :]


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
    tmin_scr,
    ncb_scr,
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
    defer: bool = True,
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

    def anylive(probe):
        m = jnp.max(probe[0])
        for j in range(1, tb):
            m = jnp.maximum(m, jnp.max(probe[j]))
        return m

    def cond(carry):
        i, probe, *_ = carry
        return (i < nchunks) & (anylive(probe) >= eps)

    def body(carry):
        i, probe, c0, c1, c2 = carry

        @pl.when(i + 1 < nchunks)
        def _():
            issue((i + 1) % 2, i + 1)

        wait(i % 2, i)
        base = i * chunk
        probe, c0, c1, c2 = list(probe), list(c0), list(c1), list(c2)
        for j in range(tb):
            rows = jnp.transpose(buf[i % 2, :, j])  # (chunk, 16)
            px, py = coords[j]
            a_hat, skip, _, _, _, row = _chunk_geometry(
                rows, px, py, base, counts[j], alpha_max, alpha_min, chunk
            )
            contrib, t_g, probe_m, probe[j] = _composite_step(
                a_hat, skip, None, probe[j], eps, tril, reduce_t=False
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
            # DEFERRED T/n_contrib bookkeeping: the old schedule paid a
            # log2(chunk) sublane min-reduce (final-T) and max-reduce
            # (n_contrib) per chunk body — ~25% of the VPU ops of a chunk.
            # min/max are associative+commutative, so the per-chunk
            # reductions fold into carried elementwise buffers (2 VPU ops
            # each) and reduce ONCE per tile after the sweep — value-
            # identical in linear scan mode (bitwise: same values, same
            # min/max lattice), ~1e-7 in log mode (final_T via min-of-probe
            # instead of the exp(sum) product form).
            gidx = (base + row + 1).astype(jnp.float32)
            tm = jnp.where(contrib, probe_m, _BIG)
            ncv = jnp.where(contrib, gidx, 0.0)
            if defer:
                @pl.when(i == 0)
                def _():
                    tmin_scr[j] = tm
                    ncb_scr[j] = ncv

                @pl.when(i > 0)
                def _():
                    tmin_scr[j] = jnp.minimum(tmin_scr[j], tm)
                    ncb_scr[j] = jnp.maximum(ncb_scr[j], ncv)
            else:
                # Round-3 schedule (A/B reference): reduce per chunk.
                tmin_scr[j, 0:1, :] = jnp.minimum(
                    jnp.where(i == 0, jnp.ones((1, npix), jnp.float32),
                              tmin_scr[j, 0:1, :]),
                    jnp.min(tm, axis=0, keepdims=True),
                )
                ncb_scr[j, 0:1, :] = jnp.maximum(
                    jnp.where(i == 0, jnp.zeros((1, npix), jnp.float32),
                              ncb_scr[j, 0:1, :]),
                    jnp.max(ncv, axis=0, keepdims=True),
                )

        return (i + 1, tuple(probe), tuple(c0), tuple(c1), tuple(c2))

    ones = tuple(jnp.ones((1, npix), jnp.float32) for _ in range(tb))
    zeros = tuple(jnp.zeros((1, npix), jnp.float32) for _ in range(tb))
    init = (jnp.int32(0), ones, zeros, zeros, zeros)
    ie, _, c0, c1, c2 = jax.lax.while_loop(cond, body, init)

    # Early exit leaves one prefetched chunk wave in flight; drain it so the
    # DMA semaphores are clean at kernel end.
    @pl.when(ie < nchunks)
    def _():
        wait(ie % 2, ie)

    for j in range(tb):
        out_ref[j, 0:1, :] = c0[j]
        out_ref[j, 1:2, :] = c1[j]
        out_ref[j, 2:3, :] = c2[j]

        @pl.when(nchunks > 0)
        def _():  # per-tile deferred reductions (once, not per chunk)
            if defer:
                out_ref[j, 3:4, :] = jnp.minimum(
                    1.0, jnp.min(tmin_scr[j], axis=0, keepdims=True)
                )
                out_ref[j, 4:5, :] = jnp.max(ncb_scr[j], axis=0, keepdims=True)
            else:
                out_ref[j, 3:4, :] = tmin_scr[j, 0:1, :]
                out_ref[j, 4:5, :] = ncb_scr[j, 0:1, :]

        @pl.when(nchunks == 0)
        def _():  # empty group: buffers were never written
            out_ref[j, 3:4, :] = jnp.ones((1, npix), jnp.float32)
            out_ref[j, 4:5, :] = jnp.zeros((1, npix), jnp.float32)

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

    # Per-tile loop invariant, hoisted out of the chunk sweep: dL/dalpha
    # needs only the gc-weighted color sums; by linearity one combined
    # prefix replaces three per-color prefixes.
    gcs, gtotals = [], []
    for j in range(tb):
        gc0 = g_ref[j, 0:1, :]
        gc1 = g_ref[j, 1:2, :]
        gc2 = g_ref[j, 2:3, :]
        gt = g_ref[j, 3:4, :]
        gcs.append((gc0, gc1, gc2))
        gtotals.append(
            gc0 * fwd_ref[j, 0:1, :]
            + gc1 * fwd_ref[j, 1:2, :]
            + gc2 * fwd_ref[j, 2:3, :]
            + gt * fwd_ref[j, 3:4, :]
        )

    def body(i, carry):
        probe, pcs = (list(c) for c in carry)

        @pl.when(i + 1 < nchunks)
        def _():
            issue((i + 1) % 2, i + 1)

        wait(i % 2, i)
        base = i * chunk
        for j in range(tb):
            rows = jnp.transpose(buf[i % 2, :, j])  # (chunk, 16)
            px, py = coords[j]
            gc0, gc1, gc2 = gcs[j]
            a_hat, skip, g_exp, dx, dy, row = _chunk_geometry(
                rows, px, py, base, counts[j], alpha_max, alpha_min, chunk
            )
            # reduce_t=False: the backward never consumes the running T (the
            # forward outputs carry final_T); its per-chunk min-reduction was
            # dead work.
            contrib, t_g, _, probe[j] = _composite_step(
                a_hat, skip, None, probe[j], eps, step_tril, reduce_t=False
            )
            in_range = (base + row) < counts[j]
            grads, pcs[j] = _instance_grads(
                rows, dx, dy, in_range, contrib,
                a_hat, t_g, g_exp, skip, gc0, gc1, gc2, gtotals[j],
                pcs[j], tril, chunk,
            )
            gbuf[:, j] = jnp.transpose(grads)  # (16, chunk)

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
        return (tuple(probe), tuple(pcs))

    ones = tuple(jnp.ones((1, npix), jnp.float32) for _ in range(tb))
    zeros = tuple(jnp.zeros((1, npix), jnp.float32) for _ in range(tb))
    jax.lax.fori_loop(0, nchunks, body, (ones, zeros))


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
    defer_reductions: bool = True,
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
        functools.partial(_forward_kernel, defer=defer_reductions, **kw),
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
                # Deferred-reduction buffers: elementwise running min of the
                # contributing probe (final_T) and max contributing rank
                # (n_contrib) per batched tile; reduced once per tile.
                pltpu.VMEM((tb, chunk, npix), jnp.float32),
                pltpu.VMEM((tb, chunk, npix), jnp.float32),
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
    defer_reductions: bool = True,
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
        defer_reductions=defer_reductions,
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
