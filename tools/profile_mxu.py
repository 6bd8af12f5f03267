"""On-chip A/B for the MXU-offloaded composite reductions.

Baselines from the same fori-loop methodology earlier today:
  [log, no cull, icap 832k/736k]  render 38.14 ms, train 86.22 ms
  [log, cull, icap 565k/352k]     render 39.36 ms, train 75.14 ms
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
from gs_deformable_tpu import training
from gs_deformable_tpu.renderer import CameraArrays, render

ITERS = 20


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
    print(f"{name:44s} {dt*1e3:9.3f} ms   (compile {c:.0f}s)", flush=True)
    return dt


def main():
    n = 100_000
    cap = 131_072
    rng = np.random.default_rng(0)
    pts = np.stack(
        [rng.uniform(-2, 2, n), rng.uniform(-1.2, 1.2, n), rng.uniform(2.5, 12, n)],
        -1,
    ).astype(np.float32)
    cols = rng.uniform(0, 1, (n, 3)).astype(np.float32)
    scal = np.log(0.01 * rng.uniform(0.5, 2.0, (n, 3))).astype(np.float32)

    W, H = 1920, 1080
    fov = 1.0
    fovy = 2 * np.arctan(np.tan(fov / 2) * H / W)
    proj = tf.projection_matrix(0.01, 100.0, fov, fovy)
    view = np.eye(4, dtype=np.float32)
    cam = CameraArrays(world_view=jnp.asarray(view), full_proj=jnp.asarray(view @ proj),
                       camera_center=jnp.zeros(3), time=jnp.float32(0.5))
    tanx, tany = float(np.tan(fov / 2)), float(np.tan(fovy / 2))

    for label, icap, slack, cull in [
        ("nocull 832k", 832 * 1024, 736 * 1024, False),
        ("cull 565k", 565248, 352256, True),
    ]:
        cfg = Config(raster=RasterizeConfig(
            instance_capacity=icap, chunk=128, aligned_slack=slack,
            tile_cull=cull))
        state = G.init_from_points(pts, cols, capacity=cap, sh_degree=3)
        state = state.replace(
            scaling=jnp.asarray(np.pad(scal, ((0, cap - n), (0, 0)))))
        ts = training.init_train_state(state, seed=0, cfg=cfg)

        def f_render(i, gstate, deform):
            out, _ = render(gstate, deform, cam._replace(time=cam.time + i * 1e-9),
                            iteration=jnp.asarray(10_000), bg=jnp.zeros(3),
                            width=W, height=H, tan_fovx=tanx, tan_fovy=tany,
                            active_sh_degree=3, cfg=cfg)
            return out.image[0, 0, 0]
        timeit(f"render 1080p mxu [{label}]", f_render, ts.gaussians, ts.deform)

        Wt = Ht = 800
        fovy_t = 2 * np.arctan(np.tan(fov / 2) * Ht / Wt)
        proj_t = tf.projection_matrix(0.01, 100.0, fov, fovy_t)
        cam_t = CameraArrays(world_view=jnp.asarray(view),
                             full_proj=jnp.asarray(view @ proj_t),
                             camera_center=jnp.zeros(3), time=jnp.float32(0.5))
        step = training.make_train_step(
            cfg, width=Wt, height=Ht, tan_fovx=float(np.tan(fov / 2)),
            tan_fovy=float(np.tan(fovy_t / 2)), active_sh_degree=3,
            spatial_lr_scale=1.0)
        gt = jnp.asarray(rng.uniform(0, 1, (3, Ht, Wt)), jnp.float32)
        t0 = time.time()
        ts2, m = step(ts, cam_t, gt, jnp.zeros(3), jnp.asarray(5000))
        float(m["loss"])
        print(f"train compile [{label}] {time.time()-t0:.0f}s", flush=True)
        t0 = time.time()
        for i in range(10):
            ts2, m = step(ts2, cam_t, gt, jnp.zeros(3), jnp.asarray(5001 + i))
        lv = float(m["loss"])
        print(f"train 800x800 mxu [{label}]: {(time.time()-t0)/10*1e3:.2f} ms  "
              f"(loss {lv:.4f})", flush=True)


if __name__ == "__main__":
    main()
