"""Attribute the ~8 ms gap between summed stages and the full 1080p render.

stages_r03 accounts ~21.5 ms of the 30.6 ms frame.  This measures the
candidates the stage list skips: the tile->image assemble, the splat-table
concat, the activation/SH-feature prep, and rasterize_arrays as one unit
(binning+gather+composite+assemble from precomputed screen arrays) so
renderer-level vs rasterizer-level glue separate.

One TPU job.  Usage: python tools/glue_r03.py
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
from gs_deformable_tpu.ops import sh as sh_ops
from gs_deformable_tpu.ops.projection import ndc2pix, preprocess, tile_ellipse_mask
from gs_deformable_tpu.ops.rasterize import rasterize_arrays
from gs_deformable_tpu.ops.transforms import build_cov3d
from gs_deformable_tpu import training
from gs_deformable_tpu.renderer import CameraArrays

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
    cam = CameraArrays(
        world_view=jnp.asarray(view), full_proj=jnp.asarray(view @ proj),
        camera_center=jnp.zeros(3), time=jnp.float32(0.5))
    tanx, tany = float(np.tan(fov / 2)), float(np.tan(fovy / 2))
    grid_x, grid_y = 120, 68

    g = ts.gaussians
    opac = jax.nn.sigmoid(g.opacity)[:, 0]
    cov3d = build_cov3d(jnp.exp(g.scaling),
                        g.rotation / jnp.linalg.norm(
                            g.rotation, axis=-1, keepdims=True), 1.0)
    pre = preprocess(
        g.xyz, cov3d, cam.world_view, cam.full_proj,
        width=W, height=H, tan_fovx=tanx, tan_fovy=tany,
        tile_x=16, tile_y=16, alive=g.alive, opacities=opac)
    pix = jnp.stack([ndc2pix(pre.means2d_ndc[:, 0], W),
                     ndc2pix(pre.means2d_ndc[:, 1], H)], -1)
    colors = sh_ops.eval_sh_color(
        3, jnp.concatenate([g.f_dc, g.f_rest], axis=1), g.xyz,
        cam.camera_center)
    bg = jnp.zeros(3)
    dev = jax.block_until_ready(jax.device_put(
        (pix, pre.depths, pre.conics, opac, colors, pre.rect,
         pre.tiles_touched)))
    pixd, depths, conics, opacd, colorsd, rect, tt = dev

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

    # (1) activations + feature concat (what renderer.py does around render)
    def f_act(i, sc, rot, fdc, frest):
        scales = jnp.exp(sc + i * 1e-12)
        r = rot / jnp.linalg.norm(rot, axis=-1, keepdims=True)
        shs = jnp.concatenate([fdc, frest], axis=1)
        c6 = build_cov3d(scales, r, 1.0)
        return c6[0, 0] + shs[0, 0, 0]
    timeit("activations+cov3d+shs-concat", f_act, g.scaling, g.rotation,
           g.f_dc, g.f_rest)

    # (2) rasterize_arrays as one unit (binning+gather+composite+assemble)
    def f_rast(i, px, d, c, op, col, r, t_):
        img, ft, nc, req, ta = rasterize_arrays(
            px, d + i * 1e-9, c, op, col, r, t_, bg,
            width=W, height=H, cfg=cfg.raster)
        return img[0, 0, 0] + ft[0, 0]
    timeit("rasterize_arrays (all-in)", f_rast, pixd, depths, conics,
           opacd, colorsd, rect, tt)

    # (3) assemble alone: (T, 8, npix) -> (5, H, W) relayout
    out_tiles = jnp.asarray(
        rng.uniform(0, 1, (grid_x * grid_y, 8, 256)), jnp.float32)

    def f_asm(i, rows):
        r5 = rows[:, 0:5, :] + i * 1e-9
        x = r5.reshape(grid_y, grid_x, 5, 16, 16)
        x = x.transpose(2, 0, 3, 1, 4).reshape(5, grid_y * 16, grid_x * 16)
        x = x[:, :H, :W]
        return x[0, 0, 0] + x[4, -1, -1]
    timeit("assemble (tiles->planes)", f_asm, out_tiles)

    # (4) splat-table concat alone (P, 16)
    def f_concat(i, px, c, op, col):
        s = jnp.concatenate(
            [px + i * 1e-9, c, op[:, None], col,
             jnp.zeros((px.shape[0], 7), jnp.float32)], axis=1)
        return s[0, 0]
    timeit("splat concat (P,16)", f_concat, pixd, conics, opacd, colorsd)

    print(json.dumps({"glue_r03": RESULTS}))


if __name__ == "__main__":
    main()
