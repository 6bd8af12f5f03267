"""On-chip A/B: scan_mode log vs linear at bench scale (1080p + train step).

One process, all measurements batched (TPU compiles queue serially and are
not cached across processes — CLAUDE.md).  fori_loop timing carries ~1.5ms
per iteration of loop overhead; both arms carry it equally so the delta is
clean, and the absolute render number is cross-checked by bench.py's
python-loop timing.
"""

import os
import sys
import time
import dataclasses

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
    print(f"{name:40s} {dt*1e3:9.3f} ms   (compile {c:.0f}s)", flush=True)
    return dt


def main():
    n = 100_000
    cap = 131_072
    icap = 832 * 1024
    slack = 736 * 1024
    rng = np.random.default_rng(0)

    pts = np.stack(
        [rng.uniform(-2, 2, n), rng.uniform(-1.2, 1.2, n), rng.uniform(2.5, 12, n)],
        -1,
    ).astype(np.float32)
    cols = rng.uniform(0, 1, (n, 3)).astype(np.float32)

    W, H = 1920, 1080
    fov = 1.0
    fovy = 2 * np.arctan(np.tan(fov / 2) * H / W)
    proj = tf.projection_matrix(0.01, 100.0, fov, fovy)
    view = np.eye(4, dtype=np.float32)
    cam = CameraArrays(world_view=jnp.asarray(view), full_proj=jnp.asarray(view @ proj),
                       camera_center=jnp.zeros(3), time=jnp.float32(0.5))
    tanx, tany = float(np.tan(fov / 2)), float(np.tan(fovy / 2))

    for scan in ["log", "linear"]:
        cfg = Config(raster=RasterizeConfig(
            instance_capacity=icap, chunk=128, aligned_slack=slack,
            scan_mode=scan))
        state = G.init_from_points(pts, cols, capacity=cap, sh_degree=3)
        scal = np.log(0.01 * rng.uniform(0.5, 2.0, (n, 3))).astype(np.float32)
        state = state.replace(
            scaling=jnp.asarray(np.pad(scal, ((0, cap - n), (0, 0)))))
        ts = training.init_train_state(state, seed=0, cfg=cfg)

        def f_render(i, gstate, deform):
            out, _ = render(gstate, deform, cam._replace(time=cam.time + i * 1e-9),
                            iteration=jnp.asarray(10_000), bg=jnp.zeros(3),
                            width=W, height=H, tan_fovx=tanx, tan_fovy=tany,
                            active_sh_degree=3, cfg=cfg)
            return out.image[0, 0, 0]
        timeit(f"FULL render 1080p [{scan}]", f_render, ts.gaussians, ts.deform)

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
        print(f"train compile [{scan}] {time.time()-t0:.0f}s", flush=True)
        t0 = time.time()
        for i in range(10):
            ts2, m = step(ts2, cam_t, gt, jnp.zeros(3), jnp.asarray(5001 + i))
        lv = float(m["loss"])
        print(f"train step 800x800 [{scan}]: {(time.time()-t0)/10*1e3:.2f} ms  "
              f"(loss {lv:.4f})", flush=True)


if __name__ == "__main__":
    main()
