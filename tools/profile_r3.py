"""Round-2 decomposition: find the 1080p frame's unattributed ~13 ms.

ONE TPU job (compiles queue serially; CLAUDE.md).  fori methodology with the
carry threaded into each stage's float inputs (see profile_r2.timeit); an
empty-loop baseline calibrates the per-iteration overhead to subtract.

Measures, at exact bench scale (100k gaussians, 1080p, icap 576k, slack 640k):
  A. pipeline prefixes: preprocess / ellipse cull / SH+concat / MLP / binning
     / splat gather / composite fwd / assemble / FULL render
  B. binning internals: fills+keys, the 2-key sort, packed u32 sort,
     bounds+relayout
  C. gather/relayout variants: current (gid scatter -> Kp-row gather -> T),
     K-row gather -> row scatter -> T, pure transpose, transposed scatter
  D. train-step schedule A/B at 800px: mixed (default) vs packed
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from gs_deformable_tpu.config import Config, OptimizationConfig, RasterizeConfig
from gs_deformable_tpu.models import gaussians as G
from gs_deformable_tpu.models import deform as deform_mod
from gs_deformable_tpu.ops import transforms as tf
from gs_deformable_tpu.ops import sh as sh_ops
from gs_deformable_tpu.ops.binning import (
    _delta_fills, aligned_capacity, bin_gaussians, tile_bounds_from_sorted,
    _kth_set_bit,
)
from gs_deformable_tpu.ops.scan_utils import cumsum_i32
from gs_deformable_tpu.ops.pallas.composite import SPLAT_WIDTH, make_tile_composite
from gs_deformable_tpu.ops.projection import ndc2pix, preprocess, tile_ellipse_mask
from gs_deformable_tpu.ops.transforms import build_cov3d
from gs_deformable_tpu import training
from gs_deformable_tpu.renderer import CameraArrays, render

ITERS = 10
RESULTS = {}


def timeit(name, fn, *args):
    @jax.jit
    def loop(args):
        def body(i, carry):
            return carry * 0.0 + fn(carry * 0.0, *args)

        return jax.lax.fori_loop(0, ITERS, body, jnp.float32(0.0))

    try:
        t0 = time.time()
        r = loop(args)
        float(r)
        compile_s = time.time() - t0
        t0 = time.time()
        r = loop(args)
        float(r)
    except Exception as e:
        print(f"{name:40s} FAIL {type(e).__name__}: {str(e)[:100]}", flush=True)
        return None
    dt = (time.time() - t0) / ITERS
    RESULTS[name] = dt * 1e3
    print(f"{name:40s} {dt*1e3:9.3f} ms   (compile {compile_s:.0f}s)", flush=True)
    return dt


def main():
    n = 100_000
    cap = 131_072
    icap = 576 * 1024
    slack = 640 * 1024
    rng = np.random.default_rng(0)
    cfg = Config(raster=RasterizeConfig(
        instance_capacity=icap, chunk=128, aligned_slack=slack))
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
        world_view=jnp.asarray(view),
        full_proj=jnp.asarray(view @ proj),
        camera_center=jnp.zeros(3),
        time=jnp.float32(0.5),
    )
    tanx, tany = float(np.tan(fov / 2)), float(np.tan(fovy / 2))
    grid_x = (W + rc.tile_x - 1) // rc.tile_x
    grid_y = (H + rc.tile_y - 1) // rc.tile_y
    num_tiles = grid_x * grid_y
    K = icap
    Kp = aligned_capacity(icap, num_tiles, rc.chunk, slack)
    chunk = rc.chunk

    g = ts.gaussians
    means3d = g.xyz
    scales = jnp.exp(g.scaling)
    rotations = g.rotation / jnp.linalg.norm(g.rotation, axis=-1, keepdims=True)
    opacities = jax.nn.sigmoid(g.opacity)[:, 0]
    shs = jnp.concatenate([g.f_dc, g.f_rest], axis=1)
    alive = g.alive

    cov3d = build_cov3d(scales, rotations, 1.0)
    pre = preprocess(
        means3d, cov3d, cam.world_view, cam.full_proj,
        width=W, height=H, tan_fovx=tanx, tan_fovy=tany,
        tile_x=rc.tile_x, tile_y=rc.tile_y, alive=alive,
        opacities=opacities,
    )
    pix = jnp.stack([ndc2pix(pre.means2d_ndc[:, 0], W),
                     ndc2pix(pre.means2d_ndc[:, 1], H)], -1)
    tmask, tt = tile_ellipse_mask(
        pix, pre.conics, opacities, pre.rect, pre.tiles_touched,
        tile_x=rc.tile_x, tile_y=rc.tile_y)
    binning = bin_gaussians(
        tt, pre.rect, pre.depths,
        grid_x=grid_x, grid_y=grid_y, capacity=icap, chunk=chunk,
        sort_mode="exact", aligned_slack=slack, tile_mask=tmask)
    print(f"gaussians={n} required={int(binning.required)} "
          f"aligned={int(binning.total_aligned)} K={K} Kp={Kp}", flush=True)

    colors = sh_ops.eval_sh_color(3, shs, means3d, cam.camera_center)
    P = means3d.shape[0]
    splats = jnp.concatenate(
        [pix, pre.conics, opacities[:, None], colors,
         jnp.zeros((P, SPLAT_WIDTH - 9), jnp.float32)], axis=1)

    # ---- binning internals, replicated from bin_gaussians (exact mode) ----
    def fills_stage(tt_, rect_, depths_, tmask_):
        t = tt_.astype(jnp.int32)
        ids = jnp.arange(P, dtype=jnp.int32)
        w_t = jnp.maximum(rect_[:, 2] - rect_[:, 0], 1)
        code = (rect_[:, 0] << 20) | (rect_[:, 1] << 10) | w_t
        cum = cumsum_i32(t)
        offsets = cum - t
        required = cum[-1]
        dbits = depths_.view(jnp.int32)
        vals = [ids, offsets, code, dbits, tmask_]
        widths = [22, 22, 30, 31, 17]
        fills = _delta_fills(vals, t > 0, offsets, K, widths=widths)
        safe_gid, offs, ic, idb, imask = fills
        pos = jnp.arange(K, dtype=jnp.int32)
        valid = pos < jnp.minimum(required, K)
        rank = pos - offs
        flagged = (imask >> 16) > 0
        slot = _kth_set_bit(imask & 0xFFFF, rank)
        rank = jnp.where(flagged, slot, rank)
        iw = ic & 0x3FF
        iy0 = (ic >> 10) & 0x3FF
        ix0 = ic >> 20
        tx = ix0 + rank % iw
        ty = iy0 + rank // iw
        tile_id = jnp.where(valid, ty * grid_x + tx, num_tiles).astype(jnp.int32)
        depth_key = jnp.where(valid, idb.view(jnp.float32), jnp.inf)
        return tile_id, depth_key.astype(jnp.float32), safe_gid

    tile_id, depth_key, safe_gid = fills_stage(tt, pre.rect, pre.depths, tmask)

    def sort_stage(tid, dk, gid):
        return jax.lax.sort((tid, dk, gid), num_keys=2, is_stable=True)

    tile_sorted, _, gid_sorted = sort_stage(tile_id, depth_key, safe_gid)

    def relayout_stage(tile_sorted_, gid_sorted_):
        bounds = tile_bounds_from_sorted(tile_sorted_, num_tiles)
        tile_start = bounds[:-1]
        tile_count = bounds[1:] - bounds[:-1]
        chunks_per_tile = (tile_count + chunk - 1) // chunk
        chunk_start = cumsum_i32(chunks_per_tile) - chunks_per_tile
        start_fill, chunk_base = _delta_fills(
            [tile_start, chunk_start], tile_count > 0, tile_start, K)
        pos = jnp.arange(K, dtype=jnp.int32)
        rank_in_tile = pos - start_fill
        in_tile = tile_sorted_ < num_tiles
        new_pos = jnp.where(in_tile, chunk_base * chunk + rank_in_tile, Kp)
        gid_aligned = jnp.zeros((Kp,), jnp.int32).at[new_pos].set(
            gid_sorted_, mode="drop")
        return gid_aligned, new_pos, chunk_start, tile_count

    gid_aligned, new_pos, chunk_start2, tile_count2 = relayout_stage(
        tile_sorted, gid_sorted)

    sorted_splats_t = splats[binning.gid].T

    common = dict(
        grid_x=grid_x, grid_y=grid_y, tile_x=rc.tile_x, tile_y=rc.tile_y,
        chunk=chunk, padded_capacity=Kp, alpha_max=rc.alpha_max,
        alpha_min=rc.alpha_min, eps=rc.transmittance_eps, interpret=False,
    )
    comp_b = make_tile_composite(tile_batch=rc.tile_batch, scan_mode="log",
                                 **common)
    out_tiles = comp_b(sorted_splats_t, binning.tile_chunk_start,
                       binning.tile_count)

    big = jax.block_until_ready(jax.device_put(
        (sorted_splats_t, binning, splats, tile_id, depth_key, safe_gid,
         tile_sorted, gid_sorted, new_pos, out_tiles)))
    (sorted_splats_t, binning, splats, tile_id, depth_key, safe_gid,
     tile_sorted, gid_sorted, new_pos, out_tiles) = big

    # ================= A. pipeline prefixes =================
    timeit("loop overhead (empty body)", lambda c: c + 1.0)

    def f_mlp(c, xyz_):
        tcol = jnp.full((P, 1), 0.5, jnp.float32)
        dx, dsc, drt, dsh = deform_mod.deform_offsets(
            ts.deform, xyz_ + c, tcol, jnp.asarray(10_000), cfg.deform)
        return dx[0, 0] + dsc[0, 0] + drt[0, 0] + dsh[0, 0]
    timeit("deformation MLP (blocked rows)", f_mlp, means3d)

    def f_bin(c, tt_, rect_, depths_, tmask_):
        b = bin_gaussians(
            tt_, rect_, depths_ + c,
            grid_x=grid_x, grid_y=grid_y, capacity=icap, chunk=chunk,
            sort_mode="exact", aligned_slack=slack, tile_mask=tmask_)
        return (b.gid[0] + b.tile_count[0]).astype(jnp.float32)
    timeit("binning TOTAL", f_bin, tt, pre.rect, pre.depths, tmask)

    def f_gather(c, spl, gid):
        s = jax.lax.optimization_barrier(spl + c)
        out = jax.lax.optimization_barrier(s[gid])
        return jax.lax.optimization_barrier(out.T)[0, 0]
    timeit("splat gather Kp rows + T (cur)", f_gather, splats, binning.gid)

    def f_comp(c, sst, start, count):
        out = comp_b(sst + c, start, count)
        return out[0, 0, 0]
    timeit("composite fwd (batch, log)", f_comp, sorted_splats_t,
           binning.tile_chunk_start, binning.tile_count)

    def f_asm(c, tiles):
        rows = tiles[:num_tiles] + c
        r = 5
        x = rows[:, 0:5, :].reshape(grid_y, grid_x, r, rc.tile_y, rc.tile_x)
        x = x.transpose(2, 0, 3, 1, 4).reshape(
            r, grid_y * rc.tile_y, grid_x * rc.tile_x)
        planes = x[:, :H, :W]
        image = planes[0:3] + planes[3][None] * 0.0
        return image[0, 0, 0]
    timeit("assemble + bg", f_asm, out_tiles)

    def f_render(c, gstate, deform):
        out, _ = render(
            gstate, deform, cam._replace(time=cam.time + c),
            iteration=jnp.asarray(10_000), bg=jnp.zeros(3),
            width=W, height=H, tan_fovx=tanx, tan_fovy=tany,
            active_sh_degree=3, cfg=cfg,
        )
        return out.image[0, 0, 0]
    timeit("FULL render 1080p", f_render, ts.gaussians, ts.deform)

    def f_bin_radix(c, tt_, rect_, depths_, tmask_):
        b = bin_gaussians(
            tt_, rect_, depths_ + c,
            grid_x=grid_x, grid_y=grid_y, capacity=icap, chunk=chunk,
            sort_mode="radix", aligned_slack=slack, tile_mask=tmask_)
        return (b.gid[0] + b.tile_count[0]).astype(jnp.float32)
    timeit("binning TOTAL (radix mode)", f_bin_radix, tt, pre.rect,
           pre.depths, tmask)

    cfg_rx = Config(raster=RasterizeConfig(
        instance_capacity=icap, chunk=128, aligned_slack=slack,
        sort_mode="radix"))

    def f_render_rx(c, gstate, deform):
        out, _ = render(
            gstate, deform, cam._replace(time=cam.time + c),
            iteration=jnp.asarray(10_000), bg=jnp.zeros(3),
            width=W, height=H, tan_fovx=tanx, tan_fovy=tany,
            active_sh_degree=3, cfg=cfg_rx,
        )
        return out.image[0, 0, 0]
    timeit("FULL render 1080p (radix sort)", f_render_rx, ts.gaussians,
           ts.deform)

    ov = RESULTS.get("loop overhead (empty body)", 0.0)
    print(f"--- overhead/iter {ov:.2f} ms ---", flush=True)

    # ================= B. binning internals =================
    def b_fills(c, tt_, rect_, depths_, tmask_):
        tid, dk, gid = fills_stage(tt_, rect_, depths_ + c, tmask_)
        return (tid[0] + gid[0]).astype(jnp.float32) + dk[0] * 0.0
    timeit("bin.fills+keys", b_fills, tt, pre.rect, pre.depths, tmask)

    def b_sort(c, tid, dk, gid):
        ts_, ds_, gs_ = sort_stage(tid, dk + c * 0.0, gid)
        return (ts_[0] + gs_[0]).astype(jnp.float32) + ds_[0] * 0.0
    timeit("bin.sort 2-key stable", b_sort, tile_id, depth_key, safe_gid)

    def b_sortp(c, tid, dk, gid):
        dshift = (dk + c * 0.0).view(jnp.uint32) >> 13
        key = (tid.astype(jnp.uint32) << 19) | (dshift & jnp.uint32(0x7FFFF))
        ks, gs_ = jax.lax.sort((key, gid), num_keys=1, is_stable=True)
        return (ks[0].astype(jnp.int32) + gs_[0]).astype(jnp.float32)
    timeit("bin.sort packed u32", b_sortp, tile_id, depth_key, safe_gid)

    def b_relay(c, tsort, gsort):
        ga, npos, cs, tc = relayout_stage(
            tsort, gsort + (c * 0.0).astype(jnp.int32))
        return (ga[0] + npos[0] + cs[0] + tc[0]).astype(jnp.float32)
    timeit("bin.bounds+relayout", b_relay, tile_sorted, gid_sorted)

    # ================= C. gather/relayout variants =================
    def v_rowscatter(c, spl, gsort, npos):
        rows = jax.lax.optimization_barrier((spl + c)[gsort])  # (K, 16)
        aligned = jnp.zeros((Kp, SPLAT_WIDTH), jnp.float32).at[npos].set(
            rows, mode="drop")
        return jax.lax.optimization_barrier(aligned.T)[0, 0]
    timeit("gatherK rows + rowscatter + T", v_rowscatter, splats, gid_sorted,
           new_pos)

    sorted_full = jax.block_until_ready(splats[binning.gid])

    def v_transpose(c, x):
        return jax.lax.optimization_barrier((x + c).T)[0, 0]
    timeit("pure transpose (Kp,16)->T", v_transpose, sorted_full)

    def v_scatT(c, spl, gsort, npos):
        rows_t = jax.lax.optimization_barrier((spl + c)[gsort].T)  # (16, K)
        out = jnp.zeros((SPLAT_WIDTH, Kp), jnp.float32).at[:, npos].set(
            rows_t, mode="drop")
        return jax.lax.optimization_barrier(out)[0, 0]
    timeit("gatherK + T + colscatter", v_scatT, splats, gid_sorted, new_pos)

    # ================= C2. composite variants =================
    comp8 = make_tile_composite(tile_batch=8, scan_mode="log", **common)

    def f_comp8(c, sst, start, count):
        return comp8(sst + c, start, count)[0, 0, 0]
    timeit("composite fwd tb=8", f_comp8, sorted_splats_t,
           binning.tile_chunk_start, binning.tile_count)

    comp_lin = make_tile_composite(tile_batch=rc.tile_batch,
                                   scan_mode="linear", **common)

    def f_complin(c, sst, start, count):
        return comp_lin(sst + c, start, count)[0, 0, 0]
    timeit("composite fwd linear scan", f_complin, sorted_splats_t,
           binning.tile_chunk_start, binning.tile_count)

    # ================= D. train-step A/B at 800px =================
    Wt = Ht = 800
    fovy_t = 2 * np.arctan(np.tan(fov / 2) * Ht / Wt)
    proj_t = tf.projection_matrix(0.01, 100.0, fov, fovy_t)
    cam_t = CameraArrays(
        world_view=jnp.asarray(view),
        full_proj=jnp.asarray(view @ proj_t),
        camera_center=jnp.zeros(3),
        time=jnp.float32(0.5),
    )
    gt = jnp.asarray(rng.uniform(0, 1, (3, Ht, Wt)), jnp.float32)
    opt0 = OptimizationConfig(
        position_lr_init=0.0, position_lr_final=0.0, offset_lr_init=0.0,
        offset_lr_final=0.0, feature_lr=0.0, opacity_lr=0.0,
        scaling_lr=0.0, rotation_lr=0.0)

    for mode, sub in (("mixed", 32), ("packed", 32), ("packed", 64)):
        cfg_t = Config(raster=RasterizeConfig(
            instance_capacity=256 * 1024, chunk=128,
            aligned_slack=176 * 1024 if mode == "mixed" else -1,
            composite_mode=mode, sub_chunk=sub), opt=opt0)
        step = training.make_train_step(
            cfg_t, width=Wt, height=Ht, tan_fovx=float(np.tan(fov / 2)),
            tan_fovy=float(np.tan(fovy_t / 2)),
            active_sh_degree=3, spatial_lr_scale=1.0,
        )
        ts_dev = jax.block_until_ready(jax.device_put(ts))
        t0 = time.time()
        try:
            cur, m = step(ts_dev, cam_t, gt, jnp.zeros(3), jnp.asarray(5000))
            float(m["loss"])
        except Exception as e:
            print(f"train[{mode},{sub}] FAILED: {type(e).__name__}: "
                  f"{str(e)[:200]}", flush=True)
            continue
        print(f"train[{mode},{sub}] compile {time.time()-t0:.0f}s "
              f"req={int(m['required_instances'])} "
              f"al={int(m['required_aligned'])}", flush=True)
        t0 = time.time()
        for i in range(ITERS):
            cur, m = step(cur, cam_t, gt, jnp.zeros(3), jnp.asarray(5001 + i))
        float(m["loss"])
        dt = (time.time() - t0) / ITERS
        print(f"{'train 800px [' + mode + ',' + str(sub) + ']':40s} "
              f"{dt*1e3:9.3f} ms   loss={float(m['loss']):.4f}", flush=True)


if __name__ == "__main__":
    main()
