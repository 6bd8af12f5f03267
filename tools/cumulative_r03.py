"""Cumulative ablation of the full 1080p render graph.

glue_r03 showed rasterize_arrays' parts sum cleanly (19.0 ms) while the full
render graph runs ~6 ms more than all measured stages combined — so the
overhead appears when the stages COMPOSE into one jit.  This measures the
pipeline cumulatively: rasterize-only, +SH, +preprocess, +activations,
+deform MLP (= the full renderer body), each as one jitted graph, so the
deltas attribute the composition cost to a specific join.

One TPU job.  Usage: python tools/cumulative_r03.py
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
from gs_deformable_tpu.ops.projection import ndc2pix, preprocess, tile_ellipse_mask
from gs_deformable_tpu.ops.rasterize import rasterize_arrays
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
    print(f"{name:32s} raw {dt:8.3f} ms  corrected {corr:8.3f} ms "
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

    g = ts.gaussians
    opac = jax.nn.sigmoid(g.opacity)[:, 0]
    cov3d0 = build_cov3d(jnp.exp(g.scaling),
                         g.rotation / jnp.linalg.norm(
                             g.rotation, axis=-1, keepdims=True), 1.0)
    pre0 = preprocess(
        g.xyz, cov3d0, cam.world_view, cam.full_proj,
        width=W, height=H, tan_fovx=tanx, tan_fovy=tany,
        tile_x=16, tile_y=16, alive=g.alive, opacities=opac)
    pix0 = jnp.stack([ndc2pix(pre0.means2d_ndc[:, 0], W),
                      ndc2pix(pre0.means2d_ndc[:, 1], H)], -1)
    colors0 = sh_ops.eval_sh_color(
        3, jnp.concatenate([g.f_dc, g.f_rest], axis=1), g.xyz,
        cam.camera_center)
    bg = jnp.zeros(3)
    dev = jax.block_until_ready(jax.device_put(
        (pix0, pre0.depths, pre0.conics, opac, colors0, pre0.rect,
         pre0.tiles_touched, cov3d0)))
    (pix0, depths0, conics0, opac0, colors0, rect0, tt0, cov3d0) = dev

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

    def rast(px, d, c, op, col, r, t_):
        img, ft, nc, req, ta = rasterize_arrays(
            px, d, c, op, col, r, t_, bg, width=W, height=H, cfg=cfg.raster)
        return img[0, 0, 0] + ft[0, 0]

    def f1(i, px, d, c, op, col, r, t_):
        return rast(px, d + i * 1e-9, c, op, col, r, t_)
    timeit("L1 rasterize only", f1, pix0, depths0, conics0, opac0,
           colors0, rect0, tt0)

    def f2(i, px, d, c, op, r, t_, fdc, frest, xyz):
        col = sh_ops.eval_sh_color(
            3, jnp.concatenate([fdc, frest], axis=1), xyz + i * 1e-12,
            cam.camera_center)
        return rast(px, d + i * 1e-9, c, op, col, r, t_)
    timeit("L2 +sh", f2, pix0, depths0, conics0, opac0, rect0, tt0,
           g.f_dc, g.f_rest, g.xyz)

    def f3(i, xyz, c6, op, fdc, frest):
        p = preprocess(
            xyz + i * 1e-12, c6, cam.world_view, cam.full_proj,
            width=W, height=H, tan_fovx=tanx, tan_fovy=tany,
            tile_x=16, tile_y=16, alive=g.alive, opacities=op)
        px = jnp.stack([ndc2pix(p.means2d_ndc[:, 0], W),
                        ndc2pix(p.means2d_ndc[:, 1], H)], -1)
        col = sh_ops.eval_sh_color(
            3, jnp.concatenate([fdc, frest], axis=1), xyz, cam.camera_center)
        return rast(px, p.depths, p.conics, op, col, p.rect, p.tiles_touched)
    timeit("L3 +preprocess", f3, g.xyz, cov3d0, opac0, g.f_dc, g.f_rest)

    def f4(i, xyz, sc, rot, opraw, fdc, frest):
        scales = jnp.exp(sc)
        r = rot / jnp.linalg.norm(rot, axis=-1, keepdims=True)
        op = jax.nn.sigmoid(opraw)[:, 0]
        c6 = build_cov3d(scales, r, 1.0)
        p = preprocess(
            xyz + i * 1e-12, c6, cam.world_view, cam.full_proj,
            width=W, height=H, tan_fovx=tanx, tan_fovy=tany,
            tile_x=16, tile_y=16, alive=g.alive, opacities=op)
        px = jnp.stack([ndc2pix(p.means2d_ndc[:, 0], W),
                        ndc2pix(p.means2d_ndc[:, 1], H)], -1)
        col = sh_ops.eval_sh_color(
            3, jnp.concatenate([fdc, frest], axis=1), xyz, cam.camera_center)
        return rast(px, p.depths, p.conics, op, col, p.rect, p.tiles_touched)
    timeit("L4 +activations", f4, g.xyz, g.scaling, g.rotation, g.opacity,
           g.f_dc, g.f_rest)

    def f5(i, gstate, deform):
        out, _ = render(
            gstate, deform, cam._replace(time=cam.time + i * 1e-9),
            iteration=jnp.asarray(10_000), bg=bg,
            width=W, height=H, tan_fovx=tanx, tan_fovy=tany,
            active_sh_degree=3, cfg=cfg)
        return out.image[0, 0, 0]
    timeit("L5 FULL render (+mlp)", f5, ts.gaussians, ts.deform)

    print(json.dumps({"cumulative_r03": RESULTS}))


if __name__ == "__main__":
    main()
