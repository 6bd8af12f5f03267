"""On-chip timings: binning v4 (gather-free fills), render, train, transpose.

fori_loop device timing carries ~1.5ms/iteration of loop overhead (see the
baseline row) — subtract it when reading small rows.
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
from gs_deformable_tpu.ops.binning import aligned_capacity, bin_gaussians, take_searchsorted
from gs_deformable_tpu.ops.pallas.composite import SPLAT_WIDTH
from gs_deformable_tpu.ops.projection import ndc2pix, preprocess
from gs_deformable_tpu.ops.transforms import build_cov3d
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
    print(f"{name:36s} {dt*1e3:9.3f} ms   (compile {c:.0f}s)", flush=True)
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
    cam = CameraArrays(world_view=jnp.asarray(view), full_proj=jnp.asarray(view @ proj),
                       camera_center=jnp.zeros(3), time=jnp.float32(0.5))
    tanx, tany = float(np.tan(fov / 2)), float(np.tan(fovy / 2))
    grid_x, grid_y = (W + 15) // 16, (H + 15) // 16
    Kp = aligned_capacity(icap, grid_x * grid_y, rc.chunk)

    g = ts.gaussians
    cov3d = build_cov3d(jnp.exp(g.scaling),
                        g.rotation / jnp.linalg.norm(g.rotation, axis=-1, keepdims=True), 1.0)
    op = jax.nn.sigmoid(g.opacity)[:, 0]
    pre = preprocess(g.xyz, cov3d, cam.world_view, cam.full_proj, width=W, height=H,
                     tan_fovx=tanx, tan_fovy=tany, alive=g.alive, opacities=op)

    timeit("baseline (loop overhead)", lambda i, x: x[0] * 0 + i, pre.depths)

    def f_pre_sh(i, xyz, shs):
        p = preprocess(xyz + i * 1e-12, cov3d, cam.world_view, cam.full_proj,
                       width=W, height=H, tan_fovx=tanx, tan_fovy=tany,
                       alive=g.alive, opacities=op)
        c = sh_ops.eval_sh_color(3, shs, xyz + i * 1e-12, cam.camera_center)
        return p.depths[0] + c[0, 0]
    shs = jnp.concatenate([g.f_dc, g.f_rest], axis=1)
    timeit("preprocess + sh (elementwise)", f_pre_sh, g.xyz, shs)

    def f_bin(i, tt, rect, depths):
        b = bin_gaussians(tt, rect, depths + i * 1e-9, grid_x=grid_x,
                          grid_y=grid_y, capacity=icap, chunk=rc.chunk)
        return (b.gid[0] + b.tile_count[0]).astype(jnp.float32)
    timeit("bin_gaussians v4", f_bin, pre.tiles_touched, pre.rect, pre.depths)

    binning = bin_gaussians(pre.tiles_touched, pre.rect, pre.depths,
                            grid_x=grid_x, grid_y=grid_y, capacity=icap,
                            chunk=rc.chunk)
    pix = jnp.stack([ndc2pix(pre.means2d_ndc[:, 0], W),
                     ndc2pix(pre.means2d_ndc[:, 1], H)], -1)
    colors = sh_ops.eval_sh_color(3, shs, g.xyz, cam.camera_center)
    P = g.xyz.shape[0]
    splats = jnp.concatenate(
        [pix, pre.conics, op[:, None], colors,
         jnp.zeros((P, SPLAT_WIDTH - 9), jnp.float32)], axis=1)

    def f_gather(i, splats, gid):
        return (splats + i * 1e-12)[gid].T[0, 0]
    timeit("splat gather+T (Kp rows)", f_gather, splats, binning.gid)

    def f_gather_vjp(i, splats, gid):
        def f(s):
            return jnp.sum((s + i * 1e-12)[gid].T * 1e-6)
        return jax.grad(f)(splats)[0, 0]
    timeit("splat gather fwd+bwd(scatter-add)", f_gather_vjp, splats, binning.gid)

    tile_sorted_fake = jnp.sort(
        jnp.where(jnp.arange(icap) < binning.num_instances,
                  (jnp.arange(icap, dtype=jnp.int32) * 8160) // icap,
                  8160))
    def f_tsearch(i, ts_):
        b = take_searchsorted(ts_ + i * 0, jnp.arange(8161, dtype=jnp.int32))
        return b[-1].astype(jnp.float32)
    timeit("take_searchsorted (real)", f_tsearch, tile_sorted_fake)

    def f_render(i, gstate, deform):
        out, _ = render(gstate, deform, cam._replace(time=cam.time + i * 1e-9),
                        iteration=jnp.asarray(10_000), bg=jnp.zeros(3),
                        width=W, height=H, tan_fovx=tanx, tan_fovy=tany,
                        active_sh_degree=3, cfg=cfg)
        return out.image[0, 0, 0]
    timeit("FULL render 1080p", f_render, ts.gaussians, ts.deform)

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
    print(f"train compile {time.time()-t0:.0f}s", flush=True)
    t0 = time.time()
    for i in range(10):
        ts2, m = step(ts2, cam_t, gt, jnp.zeros(3), jnp.asarray(5001 + i))
    float(m["loss"])
    print(f"train step 800x800: {(time.time()-t0)/10*1e3:.2f} ms", flush=True)

    # deform MLP cost inside the step (fwd+bwd), isolated
    from gs_deformable_tpu.models.deform import deform_offsets

    def f_mlp(i, params, xyz):
        def f(p):
            dx, dsc, drot, dsh = deform_offsets(
                p, xyz + i * 1e-12, jnp.float32(0.5), jnp.asarray(10_000),
                cfg.deform)
            return jnp.sum(dx) * 1e-6 + jnp.sum(dsc) * 1e-6
        return jax.grad(lambda p: f(p))(params)["layers"][0]["w"][0, 0]
    try:
        timeit("deform MLP fwd+bwd", f_mlp, ts.deform, g.xyz)
    except Exception as e:
        print("deform mlp profile skipped:", str(e)[:120], flush=True)


if __name__ == "__main__":
    main()
