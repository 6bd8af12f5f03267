"""Binning-internals decomposition at bench scale (round 3).

binning is the largest render stage at HEAD (9.4 ms of the 32.2 ms frame).
This times its sub-stages separately with the fori+null methodology of
tools/stages_r03.py, on the same screen-space inputs the bench scene
produces: front-end P-sort, cumsum, segment prefix fills (both fill modes),
instance tile sort, tile bounds, rank/chunk fills, aligned relayout (both
modes).  One TPU job; prints one JSON line.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from gs_deformable_tpu.config import Config, RasterizeConfig
from gs_deformable_tpu.models import gaussians as G
from gs_deformable_tpu.ops import transforms as tf
from gs_deformable_tpu.ops.binning import (
    _prefix_fills, _delta_fills, aligned_capacity, bin_gaussians,
    tile_bounds_via_sort,
)
from gs_deformable_tpu.ops.scan_utils import cumsum_i32
from gs_deformable_tpu.ops.projection import ndc2pix, preprocess, tile_ellipse_mask
from gs_deformable_tpu.ops.transforms import build_cov3d
from gs_deformable_tpu import training

ITERS = 10
RESULTS = {}
NULL_MS = [0.0]


def timeit(name, fn, *args):
    @jax.jit
    def loop(args):
        def body(i, carry):
            return carry * 0.0 + fn(i, *args)
        return jax.lax.fori_loop(0, ITERS, body, jnp.float32(0.0))

    t0 = time.time()
    float(loop(args))
    compile_s = time.time() - t0
    t0 = time.time()
    float(loop(args))
    dt = (time.time() - t0) / ITERS * 1e3
    corr = max(dt - NULL_MS[0], 0.0)
    RESULTS[name] = {"ms": round(dt, 3), "ms_corr": round(corr, 3),
                     "compile_s": round(compile_s, 1)}
    print(f"{name:30s} raw {dt:8.3f} ms  corrected {corr:8.3f} ms "
          f"(compile {compile_s:.0f}s)", flush=True)


def main():
    n, cap = 100_000, 131_072
    icap, slack = 576 * 1024, 640 * 1024
    rng = np.random.default_rng(0)
    cfg = Config(raster=RasterizeConfig(
        instance_capacity=icap, chunk=128, aligned_slack=slack))

    pts = np.stack(
        [rng.uniform(-2, 2, n), rng.uniform(-1.2, 1.2, n),
         rng.uniform(2.5, 12, n)], -1).astype(np.float32)
    cols = rng.uniform(0, 1, (n, 3)).astype(np.float32)
    state = G.init_from_points(pts, cols, capacity=cap, sh_degree=3)
    scal = np.log(0.01 * rng.uniform(0.5, 2.0, (n, 3))).astype(np.float32)
    state = state.replace(
        scaling=jnp.asarray(np.pad(scal, ((0, cap - n), (0, 0)))))
    ts = training.init_train_state(state, seed=0, cfg=cfg)

    W, H = 1920, 1080
    fov = 1.0
    fovy = 2 * np.arctan(np.tan(fov / 2) * H / W)
    proj = tf.projection_matrix(0.01, 100.0, fov, fovy)
    view = np.eye(4, dtype=np.float32)
    tanx, tany = float(np.tan(fov / 2)), float(np.tan(fovy / 2))
    grid_x, grid_y = 120, 68
    num_tiles = grid_x * grid_y
    K = icap
    Kp = aligned_capacity(icap, num_tiles, 128, slack)

    g = ts.gaussians
    opac = jax.nn.sigmoid(g.opacity)[:, 0]
    cov3d = build_cov3d(jnp.exp(g.scaling),
                        g.rotation / jnp.linalg.norm(g.rotation, axis=-1,
                                                     keepdims=True), 1.0)
    pre = preprocess(
        g.xyz, cov3d, jnp.asarray(view), jnp.asarray(view @ proj),
        width=W, height=H, tan_fovx=tanx, tan_fovy=tany,
        tile_x=16, tile_y=16, alive=g.alive, opacities=opac)
    pix = jnp.stack([ndc2pix(pre.means2d_ndc[:, 0], W),
                     ndc2pix(pre.means2d_ndc[:, 1], H)], -1)
    tmask, tt = tile_ellipse_mask(
        pix, pre.conics, opac, pre.rect, pre.tiles_touched,
        tile_x=16, tile_y=16)
    rect, depths = pre.rect, pre.depths
    P = tt.shape[0]
    ids = jnp.arange(P, dtype=jnp.int32)

    # replicate the exact front-end state bin_gaussians builds
    w_t = jnp.maximum(rect[:, 2] - rect[:, 0], 1)
    code = ((rect[:, 1] * grid_x + rect[:, 0]) << 10) | w_t
    inactive = (tt <= 0).astype(jnp.int32)
    s = jax.lax.sort((inactive, depths, ids, tt, code, tmask),
                     num_keys=2, is_stable=True)
    ids_s, t_s, code_s, tmask_s = s[2], s[3], s[4], s[5]
    cum = cumsum_i32(t_s)
    offsets = cum - t_s

    b_full = bin_gaussians(
        tt, rect, depths, grid_x=grid_x, grid_y=grid_y, capacity=K,
        chunk=128, sort_mode="exact", aligned_slack=slack, tile_mask=tmask)
    print(f"required={int(b_full.required)} aligned={int(b_full.total_aligned)}",
          flush=True)

    dev = jax.block_until_ready(jax.device_put(
        (tt, rect, depths, tmask, ids_s, t_s, code_s, tmask_s, offsets,
         b_full.gid)))
    (tt, rect, depths, tmask, ids_s, t_s, code_s, tmask_s, offsets,
     gid_al) = dev

    @jax.jit
    def null_loop(x):
        def body(i, c):
            return c * 0.0 + x + i * 0.0
        return jax.lax.fori_loop(0, ITERS, body, jnp.float32(0.0))
    float(null_loop(jnp.float32(1.0)))
    t0 = time.time()
    float(null_loop(jnp.float32(2.0)))
    NULL_MS[0] = (time.time() - t0) / ITERS * 1e3
    print(f"fori overhead {NULL_MS[0]:.3f} ms/iter", flush=True)
    RESULTS["fori_null"] = {"ms": round(NULL_MS[0], 3)}

    def f_front(i, t_, d, idv, c, tm):
        s = jax.lax.sort(((t_ <= 0).astype(jnp.int32), d + i * 1e-9, idv,
                          t_, c, tm), num_keys=2, is_stable=True)
        return (s[2][0] + s[3][0]).astype(jnp.float32)
    timeit("front P-sort (6 arrays)", f_front, tt, depths, ids, code, tmask)

    def f_cumsum(i, t_):
        c = cumsum_i32(t_ + (i % 1))
        return c[-1].astype(jnp.float32)
    timeit("cumsum P", f_cumsum, t_s)

    for fm in ("scatter", "pallas"):
        def f_fill(i, idv, off, c, tm, t_):
            fills = _prefix_fills(
                [idv, off, c, tm], t_ > 0, off + (i % 1), K,
                widths=[22, 22, 23, 17], fill_mode=fm)
            return (fills[0][0] + fills[1][0]).astype(jnp.float32)
        timeit(f"prefix_fills[{fm}] K", f_fill, ids_s, offsets, code_s,
               tmask_s, t_s)

    tid_example = jnp.where(
        jnp.arange(K) < int(b_full.num_instances),
        (jnp.arange(K, dtype=jnp.int32) * 7) % num_tiles, num_tiles)
    tid_sorted0 = jnp.sort(tid_example)
    safe_gid = jnp.arange(K, dtype=jnp.int32) % P

    def f_tsort(i, tid, gidv):
        t_o, g_o = jax.lax.sort((tid + (i % 1), gidv), num_keys=1,
                                is_stable=True)
        return (t_o[0] + g_o[0]).astype(jnp.float32)
    timeit("instance tile sort K", f_tsort, tid_example, safe_gid)

    def f_bounds(i, tsrt):
        b = tile_bounds_via_sort(tsrt + (i % 1), num_tiles)
        return b[0].astype(jnp.float32)
    timeit("tile bounds via sort", f_bounds, tid_sorted0)

    tile_start = jnp.zeros((num_tiles,), jnp.int32)
    tile_count = jnp.full((num_tiles,), int(b_full.num_instances) // num_tiles,
                          jnp.int32)

    def f_rank(i, tstart, tcount):
        fills = _delta_fills([tstart, tstart], tcount > 0, tstart + (i % 1), K)
        return fills[0][0].astype(jnp.float32)
    timeit("rank/chunk delta fills K", f_rank, tile_start, tile_count)

    new_pos = jnp.arange(K, dtype=jnp.int32)  # sorted unique (identity)
    for fm in ("scatter", "pallas"):
        if fm == "pallas":
            from gs_deformable_tpu.ops.pallas.ordered_fill import (
                ordered_place_i32,
            )

            def f_rel(i, npos, gidv):
                out = ordered_place_i32(npos + (i % 1), gidv, Kp)
                return out[0].astype(jnp.float32)
        else:
            def f_rel(i, npos, gidv):
                out = jnp.zeros((Kp,), jnp.int32).at[npos + (i % 1)].set(
                    gidv, mode="drop", unique_indices=True,
                    indices_are_sorted=True)
                return out[0].astype(jnp.float32)
        timeit(f"relayout[{fm}] Kp", f_rel, new_pos, safe_gid)

    for fm in ("scatter", "pallas"):
        def f_bin(i, t_, r, d, tm):
            b = bin_gaussians(
                t_, r, d + i * 1e-9, grid_x=grid_x, grid_y=grid_y,
                capacity=K, chunk=128, sort_mode="exact",
                aligned_slack=slack, tile_mask=tm, fill_mode=fm)
            return (b.gid[0] + b.tile_count[0]).astype(jnp.float32)
        timeit(f"FULL binning[{fm}]", f_bin, tt, rect, depths, tmask)

    print(json.dumps({"binstages_r03": RESULTS}))


if __name__ == "__main__":
    main()
