"""Round-2 job 6: scatter lowering variants + binning v3.1 check.

Is the ~210M update/s scatter cost the drop-mode OOB handling?  Variants of
the (cap,C)->(K,C) fill scatter and the (K,)->(Kp,) relayout scatter:
  - drop mode (baseline)
  - extended target (sentinels land in a garbage tail, all indices in
    bounds -> no OOB clamping semantics) + sorted/unique flags
  - 'promise_in_bounds' mode on the extended target
Also re-times binning TOTAL after the 23-bit code packing (4 fill columns).
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
    cap = 131_072
    K = 576 * 1024
    Kp = 1_245_184
    rng = np.random.default_rng(0)

    timeit("loop overhead (empty body)", lambda c: c + 1.0)

    C = 4
    delta = jnp.asarray(rng.standard_normal((cap, C)), jnp.float32)
    # ~100k sorted unique valid positions; tail = ascending OOB sentinels
    nval = 100_000
    base = np.sort(rng.choice(K, nval, replace=False)).astype(np.int32)
    pos = np.concatenate([base, K + np.arange(cap - nval, dtype=np.int32)])
    pos = jnp.asarray(pos)

    def f_drop(c, pc, d):
        seg = jnp.zeros((K, C), jnp.float32).at[pc].set(
            d + c, mode="drop", unique_indices=True, indices_are_sorted=True)
        return seg[0, 0]
    timeit(f"fill scatter drop-mode (C={C})", f_drop, pos, delta)

    def f_ext(c, pc, d):
        seg = jnp.zeros((K + cap, C), jnp.float32).at[pc].set(
            d + c, unique_indices=True, indices_are_sorted=True)
        return seg[0, 0]
    timeit("fill scatter extended in-bounds", f_ext, pos, delta)

    def f_prom(c, pc, d):
        seg = jnp.zeros((K + cap, C), jnp.float32).at[pc].set(
            d + c, mode="promise_in_bounds", unique_indices=True,
            indices_are_sorted=True)
        return seg[0, 0]
    timeit("fill scatter promise_in_bounds", f_prom, pos, delta)

    def f_prom_nf(c, pc, d):
        seg = jnp.zeros((K + cap, C), jnp.float32).at[pc].set(
            d + c, mode="promise_in_bounds")
        return seg[0, 0]
    timeit("fill scatter promise, no flags", f_prom_nf, pos, delta)

    # 1-D relayout variants
    gid = jnp.asarray(rng.integers(0, cap, K, dtype=np.int32))
    npos_v = np.sort(rng.choice(Kp, K, replace=False)).astype(np.int32)
    npos_j = jnp.asarray(npos_v)

    def g_drop(c, pc, d):
        out = jnp.zeros((Kp,), jnp.int32).at[pc].set(
            d + (c * 0.0).astype(jnp.int32), mode="drop",
            unique_indices=True, indices_are_sorted=True)
        return out[0].astype(jnp.float32)
    timeit("gid scatter drop-mode", g_drop, npos_j, gid)

    def g_prom(c, pc, d):
        out = jnp.zeros((Kp + K,), jnp.int32).at[pc].set(
            d + (c * 0.0).astype(jnp.int32), mode="promise_in_bounds",
            unique_indices=True, indices_are_sorted=True)
        return out[0].astype(jnp.float32)
    timeit("gid scatter promise extended", g_prom, npos_j, gid)

    # ---- binning v3.1 + full render re-check --------------------------
    n = 100_000
    icap = 576 * 1024
    slack = 640 * 1024
    cfg = Config(raster=RasterizeConfig(
        instance_capacity=icap, chunk=128, aligned_slack=slack))
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
    grid_x, grid_y = 120, 68

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
    timeit("binning TOTAL v3.1 (4 cols)", f_bin, tt, pre.rect, pre.depths,
           tmask)

    def f_render(c, gstate, deform):
        out, _ = render(
            gstate, deform, cam._replace(time=cam.time + c),
            iteration=jnp.asarray(10_000), bg=jnp.zeros(3),
            width=W, height=H, tan_fovx=tanx, tan_fovy=tany,
            active_sh_degree=3, cfg=cfg,
        )
        return out.image[0, 0, 0]
    timeit("FULL render 1080p v3.1", f_render, ts.gaussians, ts.deform)


if __name__ == "__main__":
    main()
