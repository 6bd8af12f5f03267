"""Second bisection of the full-render overhead (mlpjoin_r03 follow-up).

V3 (hand replica of the renderer math) = 22.4 ms, real render() = 29.1 ms.
Variants here: V6 = the real render() verbatim; V7 = deformed_attributes +
render_gaussians with the dead-slot where() sweep REMOVED; V8 = real
render() with deform_mode='none' (MLP out, everything else in).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from gs_deformable_tpu.config import Config, ModelConfig, RasterizeConfig
from gs_deformable_tpu.models import gaussians as G
from gs_deformable_tpu.models.deform import deform_offsets
from gs_deformable_tpu.ops import transforms as tf
from gs_deformable_tpu.ops.rasterize import render_gaussians
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
    print(f"{name:34s} raw {dt:8.3f} ms  corrected {corr:8.3f} ms "
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

    def f_v6(i, gstate, deform):
        out, _ = render(
            gstate, deform, cam._replace(time=cam.time + i * 1e-9),
            iteration=jnp.asarray(10_000), bg=bg,
            width=W, height=H, tan_fovx=tanx, tan_fovy=tany,
            active_sh_degree=3, cfg=cfg)
        return out.image[0, 0, 0]
    timeit("V6 real render()", f_v6, ts.gaussians, ts.deform)

    def f_v7(i, gstate, deform):
        xyz = gstate.xyz
        dx, ds, dr, dsh = deform_offsets(
            deform, xyz, cam.time + i * 1e-9, jnp.asarray(10_000),
            cfg.deform, compute_dtype=jnp.bfloat16)
        means3d = xyz + dx
        scales = jnp.exp(gstate.scaling + ds)
        rot = gstate.rotation + dr
        rotations = rot / jnp.maximum(
            jnp.linalg.norm(rot, axis=-1, keepdims=True), 1e-12)
        shs = gstate.get_features() + dsh.reshape(cap, 16, 3)
        opacity = jax.nn.sigmoid(gstate.opacity)
        out = render_gaussians(
            means3d, scales, rotations, opacity, shs,
            viewmatrix=cam.world_view, projmatrix=cam.full_proj,
            campos=cam.camera_center, bg=bg, width=W, height=H,
            tan_fovx=tanx, tan_fovy=tany, sh_degree=3,
            alive=gstate.alive, cfg=cfg.raster)
        return out.image[0, 0, 0]
    timeit("V7 render sans alive-wheres", f_v7, ts.gaussians, ts.deform)

    cfg_none = Config(model=ModelConfig(deform_mode="none"),
                      raster=cfg.raster)

    def f_v8(i, gstate, deform):
        out, _ = render(
            gstate, deform, cam._replace(time=cam.time + i * 1e-9),
            iteration=jnp.asarray(10_000), bg=bg,
            width=W, height=H, tan_fovx=tanx, tan_fovy=tany,
            active_sh_degree=3, cfg=cfg_none)
        return out.image[0, 0, 0]
    timeit("V8 render deform_mode=none", f_v8, ts.gaussians, ts.deform)

    print(json.dumps({"mlpjoin2_r03": RESULTS}))


if __name__ == "__main__":
    main()
