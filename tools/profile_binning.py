"""Sub-profile of bin_gaussians internals + stream-composite on-chip check.

One TPU job.  Times each internal stage of the binning pipeline at the bench
scale (100k gaussians, 1M instance capacity, 1080p grid), an alternative
scatter+cummax expansion, and the stream composite kernel (parity vs the
batched kernel + timing).
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
from gs_deformable_tpu.ops import sh as sh_ops
from gs_deformable_tpu.ops.binning import aligned_capacity, bin_gaussians
from gs_deformable_tpu.ops.pallas.composite import SPLAT_WIDTH, make_tile_composite
from gs_deformable_tpu.ops.pallas.stream_composite import make_stream_composite
from gs_deformable_tpu.ops.projection import ndc2pix, preprocess
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
    compile_s = time.time() - t0
    t0 = time.time()
    float(loop(args))
    dt = (time.time() - t0) / ITERS
    print(f"{name:36s} {dt*1e3:9.3f} ms   (compile {compile_s:.0f}s)", flush=True)
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
    cam = CameraArrays(
        world_view=jnp.asarray(view), full_proj=jnp.asarray(view @ proj),
        camera_center=jnp.zeros(3), time=jnp.float32(0.5),
    )
    tanx, tany = float(np.tan(fov / 2)), float(np.tan(fovy / 2))
    grid_x = (W + rc.tile_x - 1) // rc.tile_x
    grid_y = (H + rc.tile_y - 1) // rc.tile_y
    num_tiles = grid_x * grid_y
    K = icap
    chunk = rc.chunk
    Kp = aligned_capacity(K, num_tiles, chunk)

    g = ts.gaussians
    means3d = g.xyz
    scales = jnp.exp(g.scaling)
    rotations = g.rotation / jnp.linalg.norm(g.rotation, axis=-1, keepdims=True)
    opacities = jax.nn.sigmoid(g.opacity)[:, 0]
    shs = jnp.concatenate([g.f_dc, g.f_rest], axis=1)

    cov3d = build_cov3d(scales, rotations, 1.0)
    pre = preprocess(
        means3d, cov3d, cam.world_view, cam.full_proj,
        width=W, height=H, tan_fovx=tanx, tan_fovy=tany,
        tile_x=rc.tile_x, tile_y=rc.tile_y, alive=g.alive,
        opacities=opacities if rc.opacity_aware_radius else None,
    )
    binning = bin_gaussians(
        pre.tiles_touched, pre.rect, pre.depths,
        grid_x=grid_x, grid_y=grid_y, capacity=icap, chunk=chunk,
        sort_mode="exact",
    )
    pix = jnp.stack([ndc2pix(pre.means2d_ndc[:, 0], W),
                     ndc2pix(pre.means2d_ndc[:, 1], H)], -1)
    colors = sh_ops.eval_sh_color(3, shs, means3d, cam.camera_center)
    P = means3d.shape[0]
    splats = jnp.concatenate(
        [pix, pre.conics, opacities[:, None], colors,
         jnp.zeros((P, SPLAT_WIDTH - 9), jnp.float32)], axis=1)
    sorted_splats_t = splats[binning.gid].T
    print(f"required={int(binning.required)} aligned={int(binning.total_aligned)} "
          f"Kp={Kp}", flush=True)

    tt = pre.tiles_touched
    rect = pre.rect
    depths = pre.depths

    # --- binning internals -------------------------------------------------
    t32 = tt.astype(jnp.int32)
    cum = jnp.cumsum(t32)
    offsets = cum - t32
    pos = jnp.arange(K, dtype=jnp.int32)

    def f_cumsum(i, t32):
        c = jnp.cumsum(t32 + i * 0)
        return (c[-1]).astype(jnp.float32)
    timeit("cumsum P", f_cumsum, t32)

    def f_repeat(i, t32):
        gid = jnp.repeat(jnp.arange(P, dtype=jnp.int32), t32 + i * 0,
                         total_repeat_length=K)
        return gid[-1].astype(jnp.float32)
    timeit("jnp.repeat expand K", f_repeat, t32)

    def f_scatter_cummax(i, offsets, t32):
        seg = jnp.zeros((K,), jnp.int32).at[offsets + i * 0].max(
            jnp.arange(P, dtype=jnp.int32), mode="drop")
        gid = jax.lax.cummax(seg)
        return gid[-1].astype(jnp.float32)
    timeit("scatter+cummax expand K", f_scatter_cummax, offsets, t32)

    safe_gid = jnp.repeat(jnp.arange(P, dtype=jnp.int32), t32,
                          total_repeat_length=K)

    def f_keys(i, safe_gid, offsets, rect, depths):
        packed = jnp.stack(
            [offsets, rect[:, 0], rect[:, 1],
             jnp.maximum(rect[:, 2] - rect[:, 0], 1)], axis=1)
        pk = (packed + i * 0)[safe_gid]
        rank = pos - pk[:, 0]
        w = pk[:, 3]
        tx = pk[:, 1] + rank % w
        ty = pk[:, 2] + rank // w
        tile_id = ty * grid_x + tx
        dk = depths[safe_gid]
        return (tile_id[-1]).astype(jnp.float32) + dk[-1]
    timeit("key build (packed gather)", f_keys, safe_gid, offsets, rect, depths)

    valid = pos < jnp.minimum(cum[-1], K)
    packed = jnp.stack(
        [offsets, rect[:, 0], rect[:, 1],
         jnp.maximum(rect[:, 2] - rect[:, 0], 1)], axis=1)
    pk = packed[safe_gid]
    rank = pos - pk[:, 0]
    w = pk[:, 3]
    tile_id = jnp.where(valid, (pk[:, 2] + rank // w) * grid_x + pk[:, 1] + rank % w,
                        num_tiles).astype(jnp.int32)
    depth_key = jnp.where(valid, depths[safe_gid], jnp.inf).astype(jnp.float32)

    def f_packed_sort(i, tile_id, depth_key, safe_gid):
        dbits = ((depth_key + i * 1e-9).view(jnp.uint32) >> 13) & jnp.uint32(0x7FFFF)
        key = (tile_id.astype(jnp.uint32) << 19) | dbits
        ks, gs = jax.lax.sort((key, safe_gid), num_keys=1, is_stable=True)
        return (ks[-1] & jnp.uint32(1)).astype(jnp.float32) + gs[-1]
    timeit("packed 1-key sort 1M", f_packed_sort, tile_id, depth_key, safe_gid)

    tile_sorted, _, gid_sorted = jax.lax.sort(
        (tile_id, depth_key, safe_gid), num_keys=2, is_stable=True)

    def f_bounds(i, tile_sorted):
        b = jnp.searchsorted(tile_sorted + i * 0,
                             jnp.arange(num_tiles + 1, dtype=jnp.int32),
                             side="left")
        return b[-1].astype(jnp.float32)
    timeit("searchsorted bounds", f_bounds, tile_sorted)

    bounds = jnp.searchsorted(
        tile_sorted, jnp.arange(num_tiles + 1, dtype=jnp.int32), side="left"
    ).astype(jnp.int32)
    tile_start = bounds[:-1]
    tile_count = bounds[1:] - bounds[:-1]
    cpt = (tile_count + chunk - 1) // chunk
    chunk_start = jnp.cumsum(cpt) - cpt

    def f_relayout(i, tile_sorted, gid_sorted, tile_start, chunk_start):
        in_tile = tile_sorted < num_tiles
        safe_tile = jnp.minimum(tile_sorted, num_tiles - 1)
        rank_in_tile = pos - tile_start[safe_tile]
        new_pos = jnp.where(
            in_tile, chunk_start[safe_tile] * chunk + rank_in_tile, Kp)
        ga = jnp.zeros((Kp,), jnp.int32).at[new_pos].set(
            gid_sorted + i * 0, mode="drop")
        return ga[-1].astype(jnp.float32)
    timeit("aligned relayout scatter", f_relayout, tile_sorted, gid_sorted,
           tile_start, chunk_start)

    # --- stream composite --------------------------------------------------
    common = dict(
        grid_x=grid_x, grid_y=grid_y, tile_x=rc.tile_x, tile_y=rc.tile_y,
        chunk=chunk, padded_capacity=Kp, alpha_max=rc.alpha_max,
        alpha_min=rc.alpha_min, eps=rc.transmittance_eps, interpret=False,
    )
    comp_b = make_tile_composite(tile_batch=rc.tile_batch, **common)
    for S in (8, 16):
        comp_s = make_stream_composite(stream_chunks=S, **common)

        if S == 8:
            out_b = comp_b(sorted_splats_t, binning.tile_chunk_start,
                           binning.tile_count)[:num_tiles]
            out_s = comp_s(sorted_splats_t, binning.tile_chunk_start,
                           binning.tile_count)
            d = float(jnp.max(jnp.abs(out_b[:, 0:4] - out_s[:, 0:4])))
            dn = float(jnp.max(jnp.abs(out_b[:, 4] - out_s[:, 4])))
            print(f"stream-vs-batch max|diff| rgbT={d:.3e} nc={dn:.3e}", flush=True)

            def loss_fn(comp):
                def f(sst, start, count):
                    out = comp(sst, start, count)[:num_tiles]
                    return jnp.sum(out[:, 0:4, :] * 1e-6)
                return f

            gb = jax.grad(loss_fn(comp_b))(sorted_splats_t,
                                           binning.tile_chunk_start,
                                           binning.tile_count)
            gs = jax.grad(loss_fn(comp_s))(sorted_splats_t,
                                           binning.tile_chunk_start,
                                           binning.tile_count)
            dg = float(jnp.max(jnp.abs(gb - gs)))
            print(f"stream-vs-batch max|grad diff|={dg:.3e}", flush=True)

        def f_s_fwd(i, sst, start, count):
            out = comp_s(sst + i * 1e-12, start, count)
            return out[0, 0, 0]
        timeit(f"stream fwd S={S}", f_s_fwd, sorted_splats_t,
               binning.tile_chunk_start, binning.tile_count)

        def f_s_bwd(i, sst, start, count):
            def loss(s):
                out = comp_s(s, start, count)
                return jnp.sum(out[:, 0:4, :])
            v, g_ = jax.value_and_grad(loss)(sst + i * 1e-12)
            return v + g_[0, 0]
        timeit(f"stream fwd+bwd S={S}", f_s_bwd, sorted_splats_t,
               binning.tile_chunk_start, binning.tile_count)


if __name__ == "__main__":
    main()
