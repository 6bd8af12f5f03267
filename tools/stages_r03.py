"""Stage decomposition of the 1080p render at BENCH-matched config (round 3).

Differences from tools/profile_render.py (round-1 vintage): instance capacity
/ aligned slack match bench.py's snug budgets (576k/640k), the tile-cull mask
path is included in binning, both fill modes are timed, and a NULL-body fori
baseline is measured so the known ~1.5-2.4 ms/iter loop overhead can be
subtracted per stage (report raw and corrected).

One TPU job. Usage: python tools/stages_r03.py
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
from gs_deformable_tpu.models.deform import deform_offsets
from gs_deformable_tpu.ops import transforms as tf
from gs_deformable_tpu.ops import sh as sh_ops
from gs_deformable_tpu.ops.binning import aligned_capacity, bin_gaussians
from gs_deformable_tpu.ops.pallas.composite import SPLAT_WIDTH, make_batch_calls
from gs_deformable_tpu.ops.projection import ndc2pix, preprocess, tile_ellipse_mask
from gs_deformable_tpu.ops.segsum import gather_splats_t
from gs_deformable_tpu.ops.transforms import build_cov3d
from gs_deformable_tpu import training
from gs_deformable_tpu.renderer import CameraArrays, render

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
    print(f"{name:28s} raw {dt:8.3f} ms  corrected {corr:8.3f} ms "
          f"(compile {compile_s:.0f}s)", flush=True)
    return dt


def main():
    n, cap = 100_000, 131_072
    icap, slack = 576 * 1024, 640 * 1024
    rng = np.random.default_rng(0)
    cfg = Config(raster=RasterizeConfig(
        instance_capacity=icap, chunk=128, aligned_slack=slack))
    rc = cfg.raster

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
    cam = CameraArrays(
        world_view=jnp.asarray(view), full_proj=jnp.asarray(view @ proj),
        camera_center=jnp.zeros(3), time=jnp.float32(0.5))
    tanx, tany = float(np.tan(fov / 2)), float(np.tan(fovy / 2))
    grid_x, grid_y = (W + 15) // 16, (H + 15) // 16
    num_tiles = grid_x * grid_y

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
        tile_x=16, tile_y=16, alive=alive, opacities=opacities)
    pix = jnp.stack([ndc2pix(pre.means2d_ndc[:, 0], W),
                     ndc2pix(pre.means2d_ndc[:, 1], H)], -1)
    tmask, tt = tile_ellipse_mask(
        pix, pre.conics, opacities, pre.rect, pre.tiles_touched,
        tile_x=16, tile_y=16)
    binning = bin_gaussians(
        tt, pre.rect, pre.depths, grid_x=grid_x, grid_y=grid_y,
        capacity=icap, chunk=128, sort_mode="exact",
        aligned_slack=slack, tile_mask=tmask)
    print(f"n={n} required={int(binning.required)} "
          f"aligned={int(binning.total_aligned)}", flush=True)

    colors = sh_ops.eval_sh_color(3, shs, means3d, cam.camera_center)
    P = means3d.shape[0]
    splats = jnp.concatenate(
        [pix, pre.conics, opacities[:, None], colors,
         jnp.zeros((P, SPLAT_WIDTH - 9), jnp.float32)], axis=1)
    sorted_splats_t = gather_splats_t(splats, binning.gid, "scatter")
    Kp = aligned_capacity(icap, num_tiles, 128, slack)
    fwd_call, _, _ = make_batch_calls(
        grid_x=grid_x, grid_y=grid_y, tile_x=16, tile_y=16, chunk=128,
        padded_capacity=Kp, tile_batch=rc.tile_batch,
        alpha_max=rc.alpha_max, alpha_min=rc.alpha_min,
        eps=rc.transmittance_eps, scan_mode=rc.scan_mode, interpret=False)

    args_dev = jax.block_until_ready(jax.device_put(
        (splats, sorted_splats_t, binning, pix, colors, cov3d, tt, tmask)))
    (splats, sorted_splats_t, binning, pix, colors, cov3d, tt, tmask) = args_dev

    # null body: pure fori overhead at this environment
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

    def f_mlp(i, xyz):
        dx, ds, dr, dsh = deform_offsets(
            ts.deform, xyz + i * 1e-12, jnp.float32(0.5),
            jnp.asarray(10_000), cfg.deform,
            compute_dtype=jnp.bfloat16)  # renderer default tier
        return dx[0, 0] + ds[0, 0] + dr[0, 0] + dsh[0, 0]
    timeit("deform_mlp", f_mlp, means3d)

    def f_pre(i, m, c3):
        p = preprocess(
            m + i * 1e-12, c3, cam.world_view, cam.full_proj,
            width=W, height=H, tan_fovx=tanx, tan_fovy=tany,
            tile_x=16, tile_y=16, alive=alive, opacities=opacities)
        px = jnp.stack([ndc2pix(p.means2d_ndc[:, 0], W),
                        ndc2pix(p.means2d_ndc[:, 1], H)], -1)
        tm, t2 = tile_ellipse_mask(px, p.conics, opacities, p.rect,
                                   p.tiles_touched, tile_x=16, tile_y=16)
        return p.depths[0] + px[0, 0] + t2[0].astype(jnp.float32)
    timeit("preprocess+cull", f_pre, means3d, cov3d)

    def f_sh(i, s):
        return sh_ops.eval_sh_color(3, s + i * 1e-12, means3d,
                                    cam.camera_center)[0, 0]
    timeit("sh_color", f_sh, shs)

    for fm in ("scatter", "pallas"):
        def f_bin(i, t_, rect, depths, tm):
            b = bin_gaussians(
                t_, rect, depths + i * 1e-9, grid_x=grid_x, grid_y=grid_y,
                capacity=icap, chunk=128, sort_mode="exact",
                aligned_slack=slack, tile_mask=tm, fill_mode=fm)
            return (b.gid[0] + b.tile_count[0]).astype(jnp.float32)
        timeit(f"binning[{fm}]", f_bin, tt, pre.rect, pre.depths, tmask)

    def f_gather(i, s, gid):
        out = gather_splats_t(s + i * 1e-12, gid, "scatter")
        return out[0, 0]
    timeit("splat gather+T", f_gather, splats, binning.gid)

    def f_comp(i, sst, start, count):
        out = fwd_call(start, count, sst + i * 1e-12)
        return out[0, 0, 0]
    timeit("composite fwd (batch)", f_comp, sorted_splats_t,
           binning.tile_chunk_start, binning.tile_count)

    def f_render(i, gstate, deform):
        out, _ = render(
            gstate, deform, cam._replace(time=cam.time + i * 1e-9),
            iteration=jnp.asarray(10_000), bg=jnp.zeros(3),
            width=W, height=H, tan_fovx=tanx, tan_fovy=tany,
            active_sh_degree=3, cfg=cfg)
        return out.image[0, 0, 0]
    timeit("FULL render", f_render, ts.gaussians, ts.deform)

    print(json.dumps({"stages_r03": RESULTS}))


if __name__ == "__main__":
    main()
