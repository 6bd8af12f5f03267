"""On-chip A/B of the probe-scan + moment-backward kernel rework.

ONE TPU job (compiles queue serially; CLAUDE.md).  fori methodology: each
stage runs ITERS serialized device-side iterations inside one jit; carries
~1.5 ms/iter loop overhead, so compare against the same-methodology numbers
in the git log (fca73f0: render 1080p ~38-39 ms, train 800px ~72.3 ms with
tile_cull + snug capacities).

Usage: python tools/profile_r2.py
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
from gs_deformable_tpu.ops.binning import aligned_capacity, bin_gaussians
from gs_deformable_tpu.ops.pallas.composite import SPLAT_WIDTH, make_tile_composite
from gs_deformable_tpu.ops.pallas.stream_composite import make_mixed_composite
from gs_deformable_tpu.ops.projection import ndc2pix, preprocess, tile_ellipse_mask
from gs_deformable_tpu.ops.transforms import build_cov3d
from gs_deformable_tpu import training
from gs_deformable_tpu.renderer import CameraArrays, render

ITERS = 10


def timeit(name, fn, *args):
    """fori timing with the carry THREADED INTO the stage's float inputs.

    `x + i * 0` perturbations constant-fold, letting XLA hoist the whole
    stage out of the loop (this produced binning "measurements" of 3-11 ms
    for the same graph); `x + carry * 0.0` cannot fold (fp x*0 is not 0 for
    inf/NaN) and carry is loop-carried, so the stage re-executes serially.
    """
    @jax.jit
    def loop(args):
        def body(i, carry):
            return carry * 0.0 + fn(carry * 0.0, *args)

        return jax.lax.fori_loop(0, ITERS, body, jnp.float32(0.0))

    t0 = time.time()
    r = loop(args)
    float(r)
    compile_s = time.time() - t0
    t0 = time.time()
    r = loop(args)
    float(r)
    dt = (time.time() - t0) / ITERS
    print(f"{name:36s} {dt*1e3:9.3f} ms   (compile {compile_s:.0f}s)", flush=True)
    return dt


def main():
    n = 100_000
    cap = 131_072
    icap = 576 * 1024
    slack = 640 * 1024
    rng = np.random.default_rng(0)
    cfg = Config(raster=RasterizeConfig(
        instance_capacity=icap, chunk=128, aligned_slack=slack))
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
        world_view=jnp.asarray(view),
        full_proj=jnp.asarray(view @ proj),
        camera_center=jnp.zeros(3),
        time=jnp.float32(0.5),
    )
    tanx, tany = float(np.tan(fov / 2)), float(np.tan(fovy / 2))
    grid_x = (W + rc.tile_x - 1) // rc.tile_x
    grid_y = (H + rc.tile_y - 1) // rc.tile_y
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
        tile_x=rc.tile_x, tile_y=rc.tile_y, alive=alive,
        opacities=opacities,
    )
    pix = jnp.stack([ndc2pix(pre.means2d_ndc[:, 0], W),
                     ndc2pix(pre.means2d_ndc[:, 1], H)], -1)
    tmask, tt = tile_ellipse_mask(
        pix, pre.conics, opacities, pre.rect, pre.tiles_touched,
        tile_x=rc.tile_x, tile_y=rc.tile_y)
    binning = bin_gaussians(
        tt, pre.rect, pre.depths,
        grid_x=grid_x, grid_y=grid_y, capacity=icap, chunk=rc.chunk,
        sort_mode=rc.sort_mode, aligned_slack=slack, tile_mask=tmask)
    print(f"gaussians={n} required={int(binning.required)} "
          f"aligned={int(binning.total_aligned)}", flush=True)

    colors = sh_ops.eval_sh_color(3, shs, means3d, cam.camera_center)
    P = means3d.shape[0]
    splats = jnp.concatenate(
        [pix, pre.conics, opacities[:, None], colors,
         jnp.zeros((P, SPLAT_WIDTH - 9), jnp.float32)], axis=1)
    sorted_splats_t = splats[binning.gid].T

    Kp = aligned_capacity(icap, num_tiles, rc.chunk, slack)
    common = dict(
        grid_x=grid_x, grid_y=grid_y, tile_x=rc.tile_x, tile_y=rc.tile_y,
        chunk=rc.chunk, padded_capacity=Kp, alpha_max=rc.alpha_max,
        alpha_min=rc.alpha_min, eps=rc.transmittance_eps, interpret=False,
    )
    comp_b = make_tile_composite(tile_batch=rc.tile_batch, **common)
    comp_m = make_mixed_composite(
        tile_batch=rc.tile_batch, stream_chunks=rc.stream_chunks, **common)

    (sorted_splats_t, binning) = jax.block_until_ready(
        jax.device_put((sorted_splats_t, binning)))

    def f_pre(c, m3d, c3d):
        p = preprocess(
            m3d + c, c3d, cam.world_view, cam.full_proj,
            width=W, height=H, tan_fovx=tanx, tan_fovy=tany,
            tile_x=rc.tile_x, tile_y=rc.tile_y, alive=alive,
            opacities=opacities,
        )
        return p.depths[0] + p.conics[0, 0]
    timeit("preprocess", f_pre, means3d, cov3d)

    def f_bin(c, tt_, rect_, depths_, tmask_):
        b = bin_gaussians(
            tt_, rect_, depths_ + c,
            grid_x=grid_x, grid_y=grid_y, capacity=icap, chunk=rc.chunk,
            sort_mode=rc.sort_mode, aligned_slack=slack, tile_mask=tmask_)
        return (b.gid[0] + b.tile_count[0]).astype(jnp.float32)
    timeit("binning (fills+sort+relayout)", f_bin, tt, pre.rect, pre.depths,
           tmask)

    def f_gather(c, spl, gid):
        s = jax.lax.optimization_barrier(spl + c)
        out = jax.lax.optimization_barrier(s[gid])
        return jax.lax.optimization_barrier(out.T)[0, 0]
    timeit("splat gather + transpose", f_gather, splats, binning.gid)

    def f_comp(c, sst, start, count):
        out = comp_b(sst + c, start, count)
        return out[0, 0, 0]
    timeit("composite fwd (batch)", f_comp, sorted_splats_t,
           binning.tile_chunk_start, binning.tile_count)

    def f_comp_bwd(c, sst, start, count):
        def loss(s):
            out = comp_m(s, start, count)
            return jnp.sum(out[:, 0:4, :])
        v, g_ = jax.value_and_grad(loss)(sst + c)
        return v + g_[0, 0]
    timeit("composite fwd+bwd (mixed)", f_comp_bwd, sorted_splats_t,
           binning.tile_chunk_start, binning.tile_count)

    def f_render(c, gstate, deform):
        out, _ = render(
            gstate, deform, cam._replace(time=cam.time + c),
            iteration=jnp.asarray(10_000), bg=jnp.zeros(3),
            width=W, height=H, tan_fovx=tanx, tan_fovy=tany,
            active_sh_degree=3, cfg=cfg,
        )
        return out.image[0, 0, 0]
    timeit("FULL render 1080p", f_render, ts.gaussians, ts.deform)

    # train step 800x800 (bench config)
    Wt = Ht = 800
    fovy_t = 2 * np.arctan(np.tan(fov / 2) * Ht / Wt)
    proj_t = tf.projection_matrix(0.01, 100.0, fov, fovy_t)
    cam_t = CameraArrays(
        world_view=jnp.asarray(view),
        full_proj=jnp.asarray(view @ proj_t),
        camera_center=jnp.zeros(3),
        time=jnp.float32(0.5),
    )
    step = training.make_train_step(
        cfg, width=Wt, height=Ht, tan_fovx=float(np.tan(fov / 2)),
        tan_fovy=float(np.tan(fovy_t / 2)),
        active_sh_degree=3, spatial_lr_scale=1.0,
    )
    gt = jnp.asarray(rng.uniform(0, 1, (3, Ht, Wt)), jnp.float32)

    ts_dev = jax.block_until_ready(jax.device_put(ts))
    t0 = time.time()
    # step donates its state arg — ts_dev is consumed by the warmup; the
    # timing loop must chain from the warmup's OUTPUT (reusing a donated
    # buffer surfaces as a runtime INVALID_ARGUMENT through the tunnel).
    ts2, m = step(ts_dev, cam_t, gt, jnp.zeros(3), jnp.asarray(5000))
    float(m["loss"])
    print(f"train compile {time.time()-t0:.0f}s", flush=True)
    t0 = time.time()
    cur = ts2
    for i in range(ITERS):
        cur, m = step(cur, cam_t, gt, jnp.zeros(3), jnp.asarray(5001 + i))
    float(m["loss"])
    dt = (time.time() - t0) / ITERS
    print(f"{'train step 800px (wall, 10x)':36s} {dt*1e3:9.3f} ms", flush=True)
    print("loss", float(m["loss"]), flush=True)


if __name__ == "__main__":
    main()
