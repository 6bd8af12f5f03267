"""On-chip timings after binning v2 + mixed composite.

One TPU job: binning v2 (exact/packed), mixed-composite fwd/bwd, full render,
train step.
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
from gs_deformable_tpu.ops.binning import bin_gaussians
from gs_deformable_tpu.ops.projection import preprocess
from gs_deformable_tpu.ops.transforms import build_cov3d
from gs_deformable_tpu import training
from gs_deformable_tpu.renderer import CameraArrays, render

ITERS = 10


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
    dt = (time.time() - t0) / ITERS
    print(f"{name:36s} {dt*1e3:9.3f} ms   (compile {compile_s:.0f}s)", flush=True)
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
    cam = CameraArrays(
        world_view=jnp.asarray(view), full_proj=jnp.asarray(view @ proj),
        camera_center=jnp.zeros(3), time=jnp.float32(0.5),
    )
    tanx, tany = float(np.tan(fov / 2)), float(np.tan(fovy / 2))
    grid_x = (W + rc.tile_x - 1) // rc.tile_x
    grid_y = (H + rc.tile_y - 1) // rc.tile_y

    g = ts.gaussians
    scales = jnp.exp(g.scaling)
    rotations = g.rotation / jnp.linalg.norm(g.rotation, axis=-1, keepdims=True)
    opacities = jax.nn.sigmoid(g.opacity)[:, 0]
    cov3d = build_cov3d(scales, rotations, 1.0)
    pre = preprocess(
        g.xyz, cov3d, cam.world_view, cam.full_proj,
        width=W, height=H, tan_fovx=tanx, tan_fovy=tany,
        tile_x=rc.tile_x, tile_y=rc.tile_y, alive=g.alive,
        opacities=opacities if rc.opacity_aware_radius else None,
    )

    for mode in ("exact", "packed"):
        def f_bin(i, tt, rect, depths):
            b = bin_gaussians(tt, rect, depths + i * 1e-9,
                              grid_x=grid_x, grid_y=grid_y, capacity=icap,
                              chunk=rc.chunk, sort_mode=mode)
            return (b.gid[0] + b.tile_count[0] + b.tile_chunk_start[0]).astype(
                jnp.float32)
        timeit(f"bin_gaussians v2 {mode}", f_bin, pre.tiles_touched, pre.rect,
               pre.depths)

    # section composite timing + parity at bench scale
    import dataclasses
    from gs_deformable_tpu.ops.binning import aligned_capacity
    from gs_deformable_tpu.ops import sh as sh_ops
    from gs_deformable_tpu.ops.projection import ndc2pix
    from gs_deformable_tpu.ops.pallas.composite import SPLAT_WIDTH, make_tile_composite
    from gs_deformable_tpu.ops.pallas.section_composite import make_section_composite

    binning = bin_gaussians(
        pre.tiles_touched, pre.rect, pre.depths,
        grid_x=grid_x, grid_y=grid_y, capacity=icap, chunk=rc.chunk,
        sort_mode="exact",
    )
    pix = jnp.stack([ndc2pix(pre.means2d_ndc[:, 0], W),
                     ndc2pix(pre.means2d_ndc[:, 1], H)], -1)
    shs = jnp.concatenate([g.f_dc, g.f_rest], axis=1)
    colors = sh_ops.eval_sh_color(3, shs, g.xyz, cam.camera_center)
    P = g.xyz.shape[0]
    splats = jnp.concatenate(
        [pix, pre.conics, opacities[:, None], colors,
         jnp.zeros((P, SPLAT_WIDTH - 9), jnp.float32)], axis=1)
    sorted_splats_t = splats[binning.gid].T
    Kp = aligned_capacity(icap, grid_x * grid_y, rc.chunk)
    common = dict(
        grid_x=grid_x, grid_y=grid_y, tile_x=rc.tile_x, tile_y=rc.tile_y,
        chunk=rc.chunk, padded_capacity=Kp, alpha_max=rc.alpha_max,
        alpha_min=rc.alpha_min, eps=rc.transmittance_eps, interpret=False,
    )
    comp_b = make_tile_composite(tile_batch=rc.tile_batch, **common)
    num_tiles = grid_x * grid_y
    for F in (4, 8, 16):
        comp_s = make_section_composite(
            stream_chunks=rc.stream_chunks, sections=F, **common)
        if F == 8:
            out_b = comp_b(sorted_splats_t, binning.tile_chunk_start,
                           binning.tile_count)[:num_tiles]
            out_s = comp_s(sorted_splats_t, binning.tile_chunk_start,
                           binning.tile_count)
            d = float(jnp.max(jnp.abs(out_b[:, 0:5] - out_s[:, 0:5])))
            print(f"section-vs-batch fwd max|diff|={d:.3e}", flush=True)

            def loss_fn(comp, slice_t):
                def f(sst):
                    out = comp(sst, binning.tile_chunk_start,
                               binning.tile_count)[:slice_t]
                    return jnp.sum(out[:, 0:4, :])
                return f
            gb = jax.grad(loss_fn(comp_b, num_tiles))(sorted_splats_t)
            gs = jax.grad(loss_fn(comp_s, num_tiles))(sorted_splats_t)
            dg = float(jnp.max(jnp.abs(gb - gs)))
            print(f"section-vs-batch bwd max|grad diff|={dg:.3e}", flush=True)

        def f_s_fwd(i, sst, start, count):
            out = comp_s(sst + i * 1e-12, start, count)
            return out[0, 0, 0]
        timeit(f"section fwd F={F}", f_s_fwd, sorted_splats_t,
               binning.tile_chunk_start, binning.tile_count)

        def f_s_bwd(i, sst, start, count):
            def loss(s):
                out = comp_s(s, start, count)
                return jnp.sum(out[:, 0:4, :])
            v, g_ = jax.value_and_grad(loss)(sst + i * 1e-12)
            return v + g_[0, 0]
        timeit(f"section fwd+bwd F={F}", f_s_bwd, sorted_splats_t,
               binning.tile_chunk_start, binning.tile_count)

    def f_render(i, gstate, deform):
        out, _ = render(
            gstate, deform, cam._replace(time=cam.time + i * 1e-9),
            iteration=jnp.asarray(10_000), bg=jnp.zeros(3),
            width=W, height=H, tan_fovx=tanx, tan_fovy=tany,
            active_sh_degree=3, cfg=cfg,
        )
        return out.image[0, 0, 0]
    timeit("FULL render 1080p (mixed)", f_render, ts.gaussians, ts.deform)

    # correctness cross-check of the full pipeline vs prior default config
    import dataclasses
    cfg_old = Config(raster=dataclasses.replace(
        rc, composite_mode="batch", sort_mode="exact"))
    out_new, _ = render(ts.gaussians, ts.deform, cam,
                        iteration=jnp.asarray(10_000), bg=jnp.zeros(3),
                        width=W, height=H, tan_fovx=tanx, tan_fovy=tany,
                        active_sh_degree=3, cfg=cfg)
    out_old, _ = render(ts.gaussians, ts.deform, cam,
                        iteration=jnp.asarray(10_000), bg=jnp.zeros(3),
                        width=W, height=H, tan_fovx=tanx, tan_fovy=tany,
                        active_sh_degree=3, cfg=cfg_old)
    d = float(jnp.max(jnp.abs(out_new.image - out_old.image)))
    dn = float(jnp.max(jnp.abs(out_new.n_contrib - out_old.n_contrib)))
    print(f"mixed-vs-batch full-render max|diff| img={d:.3e} nc={dn}", flush=True)

    # train step
    Wt = Ht = 800
    fovy_t = 2 * np.arctan(np.tan(fov / 2) * Ht / Wt)
    proj_t = tf.projection_matrix(0.01, 100.0, fov, fovy_t)
    cam_t = CameraArrays(
        world_view=jnp.asarray(view), full_proj=jnp.asarray(view @ proj_t),
        camera_center=jnp.zeros(3), time=jnp.float32(0.5),
    )
    step = training.make_train_step(
        cfg, width=Wt, height=Ht, tan_fovx=float(np.tan(fov / 2)),
        tan_fovy=float(np.tan(fovy_t / 2)), active_sh_degree=3,
        spatial_lr_scale=1.0,
    )
    gt = jnp.asarray(rng.uniform(0, 1, (3, Ht, Wt)), jnp.float32)
    t0 = time.time()
    ts2, m = step(ts, cam_t, gt, jnp.zeros(3), jnp.asarray(5000))
    float(m["loss"])
    print(f"train step compile {time.time()-t0:.0f}s", flush=True)
    iters = 10
    t0 = time.time()
    for i in range(iters):
        ts2, m = step(ts2, cam_t, gt, jnp.zeros(3), jnp.asarray(5001 + i))
    float(m["loss"])
    print(f"train step 800x800: {(time.time()-t0)/iters*1e3:.2f} ms", flush=True)


if __name__ == "__main__":
    main()
