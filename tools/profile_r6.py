"""Round-2 job 4: scatter fast-path flags + posenc barrier + defaults pick.

ONE TPU job; fori methodology.  Measures, at bench scale:
  - binning TOTAL with sorted/unique scatter flags (was 15.3 ms net)
  - the three scatter micro-stages with flags (were 5.2 / 2.7 / 2.6 ms net)
  - deform_offsets with the posenc barrier: unblocked vs block 65536, at
    bf16 / f32_3x / HIGHEST (was 10.7 bf16 / 19.4 HIGHEST net, blocked)
  - FULL render / train step with the winning combination
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
from gs_deformable_tpu.ops.binning import (
    aligned_capacity, bin_gaussians, tile_bounds_from_sorted,
)
from gs_deformable_tpu.ops.projection import ndc2pix, preprocess, tile_ellipse_mask
from gs_deformable_tpu.ops.transforms import build_cov3d
from gs_deformable_tpu import training
from gs_deformable_tpu.renderer import CameraArrays, render

ITERS = 10


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
        print(f"{name:46s} FAIL {type(e).__name__}: {str(e)[:100]}", flush=True)
        return None
    dt = (time.time() - t0) / ITERS
    print(f"{name:46s} {dt*1e3:9.3f} ms   (compile {compile_s:.0f}s)", flush=True)
    return dt


def main():
    P = 131_072
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
    ts = jax.device_put(ts_host)

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
    grid_x, grid_y = (W + 15) // 16, (H + 15) // 16
    num_tiles = grid_x * grid_y
    K = icap
    Kp = aligned_capacity(icap, num_tiles, 128, slack)

    timeit("loop overhead (empty body)", lambda c: c + 1.0)

    # ---- MLP with posenc barrier ---------------------------------------
    means3d = ts.gaussians.xyz
    for name, block, dt_ in (
        ("bf16 unblocked", 0, jnp.bfloat16),
        ("bf16 b65536", 65536, jnp.bfloat16),
        ("f32_3x unblocked", 0, "float32_3x"),
        ("HIGHEST unblocked", 0, None),
    ):
        dc = DeformConfig(block_rows=block)

        def f_mlp(c, xyz_, dc=dc, dt_=dt_):
            tcol = jnp.full((P, 1), 0.5, jnp.float32)
            dx, dsc, drt, dsh = deform_mod.deform_offsets(
                ts.deform, xyz_ + c, tcol, jnp.asarray(10_000), dc,
                compute_dtype=dt_)
            return dx[0, 0] + dsc[0, 0] + drt[0, 0] + dsh[0, 0]
        timeit(f"MLP+barrier [{name}]", f_mlp, means3d)

    # ---- binning with scatter flags --------------------------------------
    g = ts.gaussians
    scales = jnp.exp(g.scaling)
    rotations = g.rotation / jnp.linalg.norm(g.rotation, axis=-1, keepdims=True)
    opacities = jax.nn.sigmoid(g.opacity)[:, 0]
    cov3d = build_cov3d(scales, rotations, 1.0)
    pre = preprocess(
        g.xyz, cov3d, cam.world_view, cam.full_proj,
        width=W, height=H, tan_fovx=tanx, tan_fovy=tany,
        tile_x=16, tile_y=16, alive=g.alive, opacities=opacities,
    )
    pix = jnp.stack([ndc2pix(pre.means2d_ndc[:, 0], W),
                     ndc2pix(pre.means2d_ndc[:, 1], H)], -1)
    tmask, tt = tile_ellipse_mask(
        pix, pre.conics, opacities, pre.rect, pre.tiles_touched,
        tile_x=16, tile_y=16)
    (tt, tmask, pre) = jax.block_until_ready(jax.device_put((tt, tmask, pre)))

    def f_bin(c, tt_, rect_, depths_, tmask_):
        bb = bin_gaussians(
            tt_, rect_, depths_ + c,
            grid_x=grid_x, grid_y=grid_y, capacity=icap, chunk=128,
            sort_mode="exact", aligned_slack=slack, tile_mask=tmask_)
        return (bb.gid[0] + bb.tile_count[0]).astype(jnp.float32)
    timeit("binning TOTAL (scatter flags)", f_bin, tt, pre.rect, pre.depths,
           tmask)

    # scatter micro-variants
    delta7 = jnp.asarray(rng.standard_normal((cap, 7)), jnp.float32)
    pc_sorted = jnp.sort(jnp.asarray(
        rng.choice(K, cap, replace=False).astype(np.int32)))

    def f_scat_flags(c, pc, d7):
        seg = jnp.zeros((K, 7), jnp.float32).at[pc].set(
            d7 + c, mode="drop", unique_indices=True,
            indices_are_sorted=True)
        return seg[0, 0]
    timeit("scatter (cap,7)->(K,7) sorted+unique", f_scat_flags, pc_sorted,
           delta7)

    def f_scat_uniq(c, pc, d7):
        seg = jnp.zeros((K, 7), jnp.float32).at[pc].set(
            d7 + c, mode="drop", unique_indices=True)
        return seg[0, 0]
    timeit("scatter (cap,7)->(K,7) unique only", f_scat_uniq, pc_sorted,
           delta7)

    def f_scat_flat(c, pc, d7):
        flat_idx = (pc[:, None] * 7
                    + jnp.arange(7, dtype=jnp.int32)[None, :]).reshape(-1)
        seg = jnp.zeros((K * 7,), jnp.float32).at[flat_idx].set(
            (d7 + c).reshape(-1), mode="drop", unique_indices=True,
            indices_are_sorted=True)
        return seg[0]
    timeit("scatter flat (cap*7)->(K*7) s+u", f_scat_flat, pc_sorted, delta7)

    new_pos = jnp.sort(jnp.asarray(
        rng.choice(Kp, K, replace=False).astype(np.int32)))
    gid_s = jnp.asarray(rng.integers(0, cap, K, dtype=np.int32))

    def f_relay_flags(c, npos, gs):
        out = jnp.zeros((Kp,), jnp.int32).at[npos].set(
            gs + (c * 0.0).astype(jnp.int32), mode="drop",
            unique_indices=True, indices_are_sorted=True)
        return out[0].astype(jnp.float32)
    timeit("gid scatter (K)->(Kp) sorted+unique", f_relay_flags, new_pos,
           gid_s)

    tile_stream = jnp.sort(jnp.asarray(
        rng.integers(0, num_tiles, K, dtype=np.int32)))

    def f_bounds(c, ts_):
        bounds = tile_bounds_from_sorted(
            ts_ + (c * 0.0).astype(jnp.int32), num_tiles)
        return bounds[-1].astype(jnp.float32)
    timeit("tile_bounds (unique sentinels)", f_bounds, tile_stream)

    # ---- FULL render / train with the new defaults ------------------------
    for name, dcfg in (
        ("bf16 unblocked", DeformConfig(block_rows=0,
                                        compute_dtype="bfloat16")),
        ("f32_3x unblocked", DeformConfig(block_rows=0,
                                          compute_dtype="float32_3x")),
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
    for name, dcfg in (
        ("bf16", DeformConfig(block_rows=0, compute_dtype="bfloat16")),
        ("f32_3x", DeformConfig(block_rows=0, compute_dtype="float32_3x")),
    ):
        cfg_t = Config(raster=RasterizeConfig(
            instance_capacity=256 * 1024, chunk=128,
            aligned_slack=176 * 1024), opt=opt0, deform=dcfg)
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
            print(f"train[{name}] FAILED: {type(e).__name__}: {str(e)[:160]}",
                  flush=True)
            continue
        print(f"train[{name}] compile {time.time()-t0:.0f}s", flush=True)
        t0 = time.time()
        for i in range(ITERS):
            cur, m = step(cur, cam_t, gt, jnp.zeros(3), jnp.asarray(5001 + i))
        float(m["loss"])
        dt = (time.time() - t0) / ITERS
        print(f"{'train 800px [' + name + ']':46s} {dt*1e3:9.3f} ms "
              f"loss={float(m['loss']):.4f}", flush=True)


if __name__ == "__main__":
    main()
