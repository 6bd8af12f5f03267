"""On-chip: tile_cull impact at bench scale + capacity retune, one process.

Phase 1 runs the bench scene at the previous snug capacities (tuned for the
un-culled ~754k instances) and reads the culled required/aligned counts.
Phase 2 re-jits with capacities snug to the culled counts and measures the
1080p render and the 800x800 train step.
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

    def setup(icap, slack):
        cfg = Config(raster=RasterizeConfig(
            instance_capacity=icap, chunk=128, aligned_slack=slack))
        state = G.init_from_points(pts, cols, capacity=cap, sh_degree=3)
        state = state.replace(
            scaling=jnp.asarray(np.pad(scal, ((0, cap - n), (0, 0)))))
        ts = training.init_train_state(state, seed=0, cfg=cfg)
        return cfg, ts

    # ---- phase 1: measure culled counts at the old snug capacities -----
    cfg1, ts1 = setup(832 * 1024, 736 * 1024)

    @jax.jit
    def probe(gstate, deform):
        out, _ = render(gstate, deform, cam, iteration=jnp.asarray(10_000),
                        bg=jnp.zeros(3), width=W, height=H,
                        tan_fovx=tanx, tan_fovy=tany,
                        active_sh_degree=3, cfg=cfg1)
        return out.required_instances, out.required_aligned
    t0 = time.time()
    req, req_al = probe(ts1.gaussians, ts1.deform)
    req, req_al = int(req), int(req_al)
    print(f"culled required={req} aligned={req_al}  (compile {time.time()-t0:.0f}s)",
          flush=True)

    def f_render(cfg):
        def f(i, gstate, deform):
            out, _ = render(gstate, deform, cam._replace(time=cam.time + i * 1e-9),
                            iteration=jnp.asarray(10_000), bg=jnp.zeros(3),
                            width=W, height=H, tan_fovx=tanx, tan_fovy=tany,
                            active_sh_degree=3, cfg=cfg)
            return out.image[0, 0, 0]
        return f

    timeit("render 1080p [cull, old capacities]", f_render(cfg1),
           ts1.gaussians, ts1.deform)

    # ---- phase 2: snug capacities from the measured counts -------------
    # Round up to chunk-multiples with ~4% headroom for time-varying scenes.
    icap2 = ((int(req * 1.04) + 8191) // 8192) * 8192
    slack2 = ((req_al - req + 16384 + 8191) // 8192) * 8192
    print(f"retuned icap={icap2} slack={slack2}", flush=True)
    cfg2, ts2 = setup(icap2, slack2)
    timeit("render 1080p [cull, snug capacities]", f_render(cfg2),
           ts2.gaussians, ts2.deform)

    Wt = Ht = 800
    fovy_t = 2 * np.arctan(np.tan(fov / 2) * Ht / Wt)
    proj_t = tf.projection_matrix(0.01, 100.0, fov, fovy_t)
    cam_t = CameraArrays(world_view=jnp.asarray(view),
                         full_proj=jnp.asarray(view @ proj_t),
                         camera_center=jnp.zeros(3), time=jnp.float32(0.5))
    step = training.make_train_step(
        cfg2, width=Wt, height=Ht, tan_fovx=float(np.tan(fov / 2)),
        tan_fovy=float(np.tan(fovy_t / 2)), active_sh_degree=3,
        spatial_lr_scale=1.0)
    gt = jnp.asarray(rng.uniform(0, 1, (3, Ht, Wt)), jnp.float32)
    t0 = time.time()
    ts2b, m = step(ts2, cam_t, gt, jnp.zeros(3), jnp.asarray(5000))
    print(f"train compile {time.time()-t0:.0f}s "
          f"(800px required={int(m['required_instances'])} "
          f"aligned={int(m['required_aligned'])})", flush=True)
    t0 = time.time()
    for i in range(10):
        ts2b, m = step(ts2b, cam_t, gt, jnp.zeros(3), jnp.asarray(5001 + i))
    lv = float(m["loss"])
    print(f"train step 800x800 [cull, snug]: {(time.time()-t0)/10*1e3:.2f} ms  "
          f"(loss {lv:.4f})", flush=True)


if __name__ == "__main__":
    main()
