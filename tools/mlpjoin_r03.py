"""Why does the deformation MLP cost 9.7 ms inside the full render graph
(cumulative_r03 L5-L4) when it measures 2.6 ms alone?

Variants: MLP computed but unconsumed; only dx consumed; full coupling at
several lax.map block sizes and precision tiers.  One TPU job.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from gs_deformable_tpu.config import Config, DeformConfig, RasterizeConfig
from gs_deformable_tpu.models import gaussians as G
from gs_deformable_tpu.models.deform import deform_offsets
from gs_deformable_tpu.ops import transforms as tf
from gs_deformable_tpu.ops import sh as sh_ops
from gs_deformable_tpu.ops.projection import ndc2pix, preprocess
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
    print(f"{name:36s} raw {dt:8.3f} ms  corrected {corr:8.3f} ms "
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
    bg = jnp.zeros(3)

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

    def pipeline(xyz, sc, rot, opraw, fdc, frest, shs_extra=None):
        scales = jnp.exp(sc)
        r = rot / jnp.linalg.norm(rot, axis=-1, keepdims=True)
        op = jax.nn.sigmoid(opraw)[:, 0]
        c6 = build_cov3d(scales, r, 1.0)
        p = preprocess(
            xyz, c6, cam.world_view, cam.full_proj,
            width=W, height=H, tan_fovx=tanx, tan_fovy=tany,
            tile_x=16, tile_y=16, alive=g.alive, opacities=op)
        px = jnp.stack([ndc2pix(p.means2d_ndc[:, 0], W),
                        ndc2pix(p.means2d_ndc[:, 1], H)], -1)
        shs = jnp.concatenate([fdc, frest], axis=1)
        if shs_extra is not None:
            shs = shs + shs_extra.reshape(-1, 16, 3)
        col = sh_ops.eval_sh_color(3, shs, xyz, cam.camera_center)
        img, ft, nc, req, ta = rasterize_arrays(
            px, p.depths, p.conics, op, col, p.rect, p.tiles_touched, bg,
            width=W, height=H, cfg=cfg.raster)
        return img[0, 0, 0] + ft[0, 0]

    def mk(dcfg, dtype):
        def run_mlp(i, xyz):
            return deform_offsets(
                ts.deform, xyz, cam.time + i * 1e-9,
                jnp.asarray(10_000), dcfg, compute_dtype=dtype)
        return run_mlp

    base = DeformConfig()

    def v_unconsumed(i, xyz, sc, rot, opr, fdc, frest):
        dx, ds, dr, dsh = mk(base, jnp.bfloat16)(i, xyz)
        return (pipeline(xyz + i * 1e-12, sc, rot, opr, fdc, frest)
                + dx[0, 0] * 1e-20 + ds[0, 0] * 1e-20 + dr[0, 0] * 1e-20
                + dsh[0, 0] * 1e-20)
    timeit("V1 mlp computed, unconsumed", v_unconsumed, g.xyz, g.scaling,
           g.rotation, g.opacity, g.f_dc, g.f_rest)

    def v_dx_only(i, xyz, sc, rot, opr, fdc, frest):
        dx, ds, dr, dsh = mk(base, jnp.bfloat16)(i, xyz)
        return pipeline(xyz + dx, sc, rot, opr, fdc, frest) + ds[0, 0] * 1e-20
    timeit("V2 dx consumed only", v_dx_only, g.xyz, g.scaling,
           g.rotation, g.opacity, g.f_dc, g.f_rest)

    def make_full(dcfg, dtype):
        def v_full(i, xyz, sc, rot, opr, fdc, frest):
            dx, ds, dr, dsh = mk(dcfg, dtype)(i, xyz)
            return pipeline(xyz + dx, sc + ds, rot + dr, opr, fdc, frest,
                            shs_extra=dsh)
        return v_full

    timeit("V3 full couple (block 65536)", make_full(base, jnp.bfloat16),
           g.xyz, g.scaling, g.rotation, g.opacity, g.f_dc, g.f_rest)
    timeit("V4 full couple (block 131072)",
           make_full(DeformConfig(block_rows=131072), jnp.bfloat16),
           g.xyz, g.scaling, g.rotation, g.opacity, g.f_dc, g.f_rest)
    timeit("V5 full couple (block 32768)",
           make_full(DeformConfig(block_rows=32768), jnp.bfloat16),
           g.xyz, g.scaling, g.rotation, g.opacity, g.f_dc, g.f_rest)

    print(json.dumps({"mlpjoin_r03": RESULTS}))


if __name__ == "__main__":
    main()
