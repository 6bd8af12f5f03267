"""Fine-grained sub-profile of the CURRENT binning pipeline stages.

One TPU job; measures each stage of ops/binning.py v2 (delta fills) plus the
composite wrapper's _chunk_tables, at the bench scale.
"""

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
    aligned_capacity, bin_gaussians, take_searchsorted, _delta_fills,
)
from gs_deformable_tpu.ops.scan_utils import cumsum_i32
from gs_deformable_tpu.ops.projection import preprocess
from gs_deformable_tpu.ops.transforms import build_cov3d
from gs_deformable_tpu import training
from gs_deformable_tpu.renderer import CameraArrays

ITERS = 10


def timeit(name, fn, *args):
    @jax.jit
    def loop(args):
        def body(i, carry):
            return carry * 0.0 + fn(i, *args)
        return jax.lax.fori_loop(0, ITERS, body, jnp.float32(0.0))

    t0 = time.time()
    float(loop(args))
    c = time.time() - t0
    t0 = time.time()
    float(loop(args))
    dt = (time.time() - t0) / ITERS
    print(f"{name:36s} {dt*1e3:9.3f} ms   (compile {c:.0f}s)", flush=True)
    return dt


def main():
    n = 100_000
    cap = 131_072
    icap = 1 << 20
    rng = np.random.default_rng(0)
    cfg = Config(raster=RasterizeConfig(instance_capacity=icap, chunk=128))
    rc = cfg.raster

    pts = np.stack(
        [rng.uniform(-2, 2, n), rng.uniform(-1.2, 1.2, n), rng.uniform(2.5, 12, n)],
        -1,
    ).astype(np.float32)
    cols = rng.uniform(0, 1, (n, 3)).astype(np.float32)
    state = G.init_from_points(pts, cols, capacity=cap, sh_degree=3)
    scal = np.log(0.01 * rng.uniform(0.5, 2.0, (n, 3))).astype(np.float32)
    state = state.replace(scaling=jnp.asarray(np.pad(scal, ((0, cap - n), (0, 0)))))
    ts = training.init_train_state(state, seed=0, cfg=cfg)

    W, H = 1920, 1080
    fov = 1.0
    fovy = 2 * np.arctan(np.tan(fov / 2) * H / W)
    proj = tf.projection_matrix(0.01, 100.0, fov, fovy)
    view = np.eye(4, dtype=np.float32)
    cam = CameraArrays(world_view=jnp.asarray(view), full_proj=jnp.asarray(view @ proj),
                       camera_center=jnp.zeros(3), time=jnp.float32(0.5))
    tanx, tany = float(np.tan(fov / 2)), float(np.tan(fovy / 2))
    grid_x, grid_y = (W + 15) // 16, (H + 15) // 16
    num_tiles = grid_x * grid_y
    K, chunk = icap, 128
    Kp = aligned_capacity(K, num_tiles, chunk)

    g = ts.gaussians
    cov3d = build_cov3d(jnp.exp(g.scaling),
                        g.rotation / jnp.linalg.norm(g.rotation, axis=-1, keepdims=True), 1.0)
    op = jax.nn.sigmoid(g.opacity)[:, 0]
    pre = preprocess(g.xyz, cov3d, cam.world_view, cam.full_proj, width=W, height=H,
                     tan_fovx=tanx, tan_fovy=tany, alive=g.alive, opacities=op)

    t = pre.tiles_touched.astype(jnp.int32)
    rect = pre.rect
    depths = pre.depths
    P = t.shape[0]
    cum = cumsum_i32(t)
    offsets = cum - t
    required = cum[-1]
    ids = jnp.arange(P, dtype=jnp.int32)
    pos = jnp.arange(K, dtype=jnp.int32)

    def f_cumsum(i, t):
        return cumsum_i32(t + i * 0)[-1].astype(jnp.float32)
    timeit("blocked cumsum P", f_cumsum, t)

    def f_cumsum_K(i, x):
        return cumsum_i32(x + i * 0)[-1].astype(jnp.float32)
    zk = jnp.zeros((K,), jnp.int32)
    timeit("blocked cumsum K=1M", f_cumsum_K, zk)

    def f_scatterK(i, offsets, vals):
        s = jnp.zeros((K,), jnp.int32).at[offsets + i * 0].set(vals, mode="drop")
        return s[-1].astype(jnp.float32)
    timeit("scatter P->K (set)", f_scatterK, jnp.where(t > 0, offsets, K), ids)

    def f_fills(i, t, offsets):
        a, b = _delta_fills([ids, offsets + i * 0], t > 0, offsets, K)
        return (a[-1] + b[-1]).astype(jnp.float32)
    timeit("delta fills x2 (expand)", f_fills, t, offsets)

    safe_gid, offs = _delta_fills([ids, offsets], t > 0, offsets, K)

    def f_code_gather(i, code, safe_gid):
        return (code + i * 0)[safe_gid][-1].astype(jnp.float32)
    w_t = jnp.maximum(rect[:, 2] - rect[:, 0], 1)
    code = (rect[:, 0] << 20) | (rect[:, 1] << 10) | w_t
    timeit("code gather 1M", f_code_gather, code, safe_gid)

    def f_take2(i, code, safe_gid):
        return jnp.take(code + i * 0, safe_gid)[-1].astype(jnp.float32)
    timeit("jnp.take gather 1M", f_take2, code, safe_gid)

    def f_depth_gather(i, depths, safe_gid):
        return (depths + i * 0)[safe_gid][-1]
    timeit("depth gather 1M", f_depth_gather, depths, safe_gid)

    def f_both_gather(i, pack2, safe_gid):
        return (pack2 + i * 0)[safe_gid][-1, 0].astype(jnp.float32)
    pack2 = jnp.stack([code, depths.view(jnp.int32)], -1)
    timeit("packed (P,2) row gather 1M", f_both_gather, pack2, safe_gid)

    def f_tilemath(i, ic_, rank):
        ic = ic_ + i * 0
        iw = ic & 0x3FF
        tx = (ic >> 20) + rank % iw
        ty = ((ic >> 10) & 0x3FF) + rank // iw
        return (ty * grid_x + tx)[-1].astype(jnp.float32)
    ic = code[safe_gid]
    timeit("tile math (mod/div) 1M", f_tilemath, ic, pos - offs)

    valid = pos < jnp.minimum(required, K)
    iw = ic & 0x3FF
    rank = pos - offs
    tile_id = jnp.where(valid, ((ic >> 10) & 0x3FF) * 0 + ((ic >> 10) & 0x3FF) * 0
                        + ((ic >> 20) + rank % iw) + (((ic >> 10) & 0x3FF) + rank // iw) * grid_x,
                        num_tiles).astype(jnp.int32)
    depth_key = jnp.where(valid, depths[safe_gid], jnp.inf)

    def f_sort(i, tile_id, depth_key, safe_gid):
        a, _, c = jax.lax.sort((tile_id, depth_key + i * 1e-9, safe_gid),
                               num_keys=2, is_stable=True)
        return (a[-1] + c[-1]).astype(jnp.float32)
    timeit("2-key sort 1M", f_sort, tile_id, depth_key, safe_gid)

    tile_sorted, _, gid_sorted = jax.lax.sort(
        (tile_id, depth_key, safe_gid), num_keys=2, is_stable=True)

    def f_takesearch(i, tile_sorted):
        b = take_searchsorted(tile_sorted + i * 0,
                              jnp.arange(num_tiles + 1, dtype=jnp.int32))
        return b[-1].astype(jnp.float32)
    timeit("take_searchsorted 8k", f_takesearch, tile_sorted)

    bounds = take_searchsorted(
        tile_sorted, jnp.arange(num_tiles + 1, dtype=jnp.int32)).astype(jnp.int32)
    tile_start = bounds[:-1]
    tile_count = bounds[1:] - bounds[:-1]
    cpt = (tile_count + chunk - 1) // chunk
    chunk_start = cumsum_i32(cpt) - cpt

    def f_sorted_fills(i, tile_start, chunk_start, tile_count):
        a, b = _delta_fills([tile_start + i * 0, chunk_start],
                            tile_count > 0, tile_start, K)
        return (a[-1] + b[-1]).astype(jnp.float32)
    timeit("delta fills x2 (sorted)", f_sorted_fills, tile_start, chunk_start,
           tile_count)

    start_fill, chunk_base = _delta_fills(
        [tile_start, chunk_start], tile_count > 0, tile_start, K)
    in_tile = tile_sorted < num_tiles
    new_pos = jnp.where(in_tile, chunk_base * chunk + (pos - start_fill), Kp)

    def f_relayout(i, new_pos, gid_sorted):
        ga = jnp.zeros((Kp,), jnp.int32).at[new_pos + i * 0].set(
            gid_sorted, mode="drop")
        return ga[-1].astype(jnp.float32)
    timeit("relayout scatter 1M->2.1M", f_relayout, new_pos, gid_sorted)

    def f_tables(i, chunk_start, tile_count):
        from gs_deformable_tpu.ops.pallas.stream_composite import _chunk_tables
        o, ib, cc, oi, osq = _chunk_tables(chunk_start + i * 0, tile_count,
                                           chunk=chunk, c_padded=Kp // chunk)
        return (o[-1] + ib[-1] + oi[-1]).astype(jnp.float32)
    timeit("_chunk_tables 16k", f_tables, chunk_start, tile_count)

    def f_bin_total(i, t, rect, depths):
        b = bin_gaussians(t, rect, depths + i * 1e-9, grid_x=grid_x,
                          grid_y=grid_y, capacity=K, chunk=chunk)
        return (b.gid[0] + b.tile_count[0]).astype(jnp.float32)
    timeit("bin_gaussians total", f_bin_total, t, rect, depths)


if __name__ == "__main__":
    main()
