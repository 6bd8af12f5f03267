"""Round-2 job 2: batched delta-fills + MLP precision/block A/B + train A/B.

ONE TPU job.  fori methodology (10 device-side reps, carry threaded into the
stage inputs); 'loop overhead' calibrates the ~2.3 ms/iter to subtract.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from gs_deformable_tpu.config import (
    Config, DeformConfig, OptimizationConfig, RasterizeConfig,
)
from gs_deformable_tpu.models import gaussians as G
from gs_deformable_tpu.models import deform as deform_mod
from gs_deformable_tpu.ops import transforms as tf
from gs_deformable_tpu.ops.binning import bin_gaussians
from gs_deformable_tpu.ops.projection import ndc2pix, preprocess, tile_ellipse_mask
from gs_deformable_tpu.ops.transforms import build_cov3d
from gs_deformable_tpu import training
from gs_deformable_tpu.renderer import CameraArrays, render

ITERS = 10
RESULTS = {}


def timeit(name, fn, *args):
    @jax.jit
    def loop(args):
        def body(i, carry):
            return carry * 0.0 + fn(carry * 0.0, *args)

        return jax.lax.fori_loop(0, ITERS, body, jnp.float32(0.0))

    try:
        t0 = time.time()
        float(loop(args))
        compile_s = time.time() - t0
        t0 = time.time()
        float(loop(args))
    except Exception as e:
        print(f"{name:44s} FAIL {type(e).__name__}: {str(e)[:100]}", flush=True)
        return None
    dt = (time.time() - t0) / ITERS
    RESULTS[name] = dt * 1e3
    print(f"{name:44s} {dt*1e3:9.3f} ms   (compile {compile_s:.0f}s)", flush=True)
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
    ts_host = jax.tree_util.tree_map(
        np.asarray, training.init_train_state(state, seed=0, cfg=cfg))

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

    ts = jax.device_put(ts_host)
    g = ts.gaussians
    means3d = g.xyz
    scales = jnp.exp(g.scaling)
    rotations = g.rotation / jnp.linalg.norm(g.rotation, axis=-1, keepdims=True)
    opacities = jax.nn.sigmoid(g.opacity)[:, 0]
    alive = g.alive
    P = means3d.shape[0]

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
    (tt, tmask, pre) = jax.block_until_ready(jax.device_put((tt, tmask, pre)))

    timeit("loop overhead (empty body)", lambda c: c + 1.0)

    def f_bin(c, tt_, rect_, depths_, tmask_):
        b = bin_gaussians(
            tt_, rect_, depths_ + c,
            grid_x=grid_x, grid_y=grid_y, capacity=icap, chunk=rc.chunk,
            sort_mode="exact", aligned_slack=slack, tile_mask=tmask_)
        return (b.gid[0] + b.tile_count[0]).astype(jnp.float32)
    timeit("binning TOTAL (batched fills)", f_bin, tt, pre.rect, pre.depths,
           tmask)

    # ---- MLP variants --------------------------------------------------
    for block in (8192, 32768, 65536):
        dc = DeformConfig(block_rows=block)

        def f_mlp(c, xyz_, dc=dc):
            tcol = jnp.full((P, 1), 0.5, jnp.float32)
            dx, dsc, drt, dsh = deform_mod.deform_offsets(
                ts.deform, xyz_ + c, tcol, jnp.asarray(10_000), dc)
            return dx[0, 0] + dsc[0, 0] + drt[0, 0] + dsh[0, 0]
        timeit(f"MLP HIGHEST block={block}", f_mlp, means3d)

    for name, dt_ in (("HIGH (fp32 3-pass)", "float32_3x"),
                      ("bf16", jnp.bfloat16)):
        dc = DeformConfig(block_rows=65536)

        def f_mlp(c, xyz_, dc=dc, dt_=dt_):
            tcol = jnp.full((P, 1), 0.5, jnp.float32)
            dx, dsc, drt, dsh = deform_mod.deform_offsets(
                ts.deform, xyz_ + c, tcol, jnp.asarray(10_000), dc,
                compute_dtype=dt_)
            return dx[0, 0] + dsc[0, 0] + drt[0, 0] + dsh[0, 0]
        timeit(f"MLP {name} block=65536", f_mlp, means3d)

    # ---- FULL render variants ------------------------------------------
    for name, dcfg in (
        ("f32 HIGHEST b8192", DeformConfig()),
        ("f32 HIGHEST b65536", DeformConfig(block_rows=65536)),
        ("f32_3x b65536", DeformConfig(block_rows=65536,
                                       compute_dtype="float32_3x")),
        ("bf16 b65536", DeformConfig(block_rows=65536,
                                     compute_dtype="bfloat16")),
    ):
        cfg_v = Config(raster=rc, deform=dcfg)

        def f_render(c, gstate, deform, cfg_v=cfg_v):
            out, _ = render(
                gstate, deform, cam._replace(time=cam.time + c),
                iteration=jnp.asarray(10_000), bg=jnp.zeros(3),
                width=W, height=H, tan_fovx=tanx, tan_fovy=tany,
                active_sh_degree=3, cfg=cfg_v,
            )
            return out.image[0, 0, 0]
        timeit(f"FULL render [{name}]", f_render, ts.gaussians, ts.deform)

    ov = RESULTS.get("loop overhead (empty body)", 0.0)
    print(f"--- overhead/iter {ov:.2f} ms ---", flush=True)

    # ---- train-step A/B at 800px ----------------------------------------
    Wt = Ht = 800
    fovy_t = 2 * np.arctan(np.tan(fov / 2) * Ht / Wt)
    proj_t = tf.projection_matrix(0.01, 100.0, fov, fovy_t)
    cam_t = CameraArrays(
        world_view=jnp.asarray(view),
        full_proj=jnp.asarray(view @ proj_t),
        camera_center=jnp.zeros(3),
        time=jnp.float32(0.5),
    )
    gt = jnp.asarray(rng.uniform(0, 1, (3, Ht, Wt)), jnp.float32)
    opt0 = OptimizationConfig(
        position_lr_init=0.0, position_lr_final=0.0, offset_lr_init=0.0,
        offset_lr_final=0.0, feature_lr=0.0, opacity_lr=0.0,
        scaling_lr=0.0, rotation_lr=0.0)
    dbest = DeformConfig(block_rows=65536)

    for mode, sub in (("mixed", 32), ("packed", 32), ("packed", 64)):
        cfg_t = Config(raster=RasterizeConfig(
            instance_capacity=256 * 1024, chunk=128,
            aligned_slack=176 * 1024 if mode == "mixed" else -1,
            composite_mode=mode, sub_chunk=sub), opt=opt0, deform=dbest)
        step = training.make_train_step(
            cfg_t, width=Wt, height=Ht, tan_fovx=float(np.tan(fov / 2)),
            tan_fovy=float(np.tan(fovy_t / 2)),
            active_sh_degree=3, spatial_lr_scale=1.0,
        )
        ts_dev = jax.block_until_ready(jax.device_put(ts_host))
        t0 = time.time()
        try:
            cur, m = step(ts_dev, cam_t, gt, jnp.zeros(3), jnp.asarray(5000))
            float(m["loss"])
        except Exception as e:
            print(f"train[{mode},{sub}] FAILED: {type(e).__name__}: "
                  f"{str(e)[:200]}", flush=True)
            continue
        print(f"train[{mode},{sub}] compile {time.time()-t0:.0f}s "
              f"req={int(m['required_instances'])} "
              f"al={int(m['required_aligned'])}", flush=True)
        t0 = time.time()
        for i in range(ITERS):
            cur, m = step(cur, cam_t, gt, jnp.zeros(3), jnp.asarray(5001 + i))
        float(m["loss"])
        dt = (time.time() - t0) / ITERS
        print(f"{'train 800px [' + mode + ',' + str(sub) + ']':44s} "
              f"{dt*1e3:9.3f} ms   loss={float(m['loss']):.4f}", flush=True)


if __name__ == "__main__":
    main()
