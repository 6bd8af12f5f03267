"""On-chip stage times for the tile-cull path: mask, binning, gather.

Explains the gap between the expected ~0.5ms cull overhead and the measured
render delta.  fori-loop timing (~1.5ms/iter overhead; compare rows, not
absolutes).
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
from gs_deformable_tpu.ops.pallas.composite import SPLAT_WIDTH
from gs_deformable_tpu.ops.projection import ndc2pix, preprocess, tile_ellipse_mask
from gs_deformable_tpu.ops.transforms import build_cov3d
from gs_deformable_tpu import training

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
    print(f"{name:46s} {dt*1e3:9.3f} ms   (compile {c:.0f}s)", flush=True)
    return dt


def main():
    n = 100_000
    cap = 131_072
    rng = np.random.default_rng(0)
    cfg = Config(raster=RasterizeConfig(instance_capacity=832 * 1024, chunk=128))
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
    tanx, tany = float(np.tan(fov / 2)), float(np.tan(fovy / 2))
    grid_x, grid_y = (W + 15) // 16, (H + 15) // 16

    g = ts.gaussians
    cov3d = build_cov3d(jnp.exp(g.scaling),
                        g.rotation / jnp.linalg.norm(g.rotation, axis=-1, keepdims=True), 1.0)
    op = jax.nn.sigmoid(g.opacity)[:, 0]
    pre = preprocess(g.xyz, cov3d, jnp.asarray(view), jnp.asarray(view @ proj),
                     width=W, height=H, tan_fovx=tanx, tan_fovy=tany,
                     alive=g.alive, opacities=op)

    timeit("baseline (loop overhead)", lambda i, x: x[0] * 0 + i, pre.depths)

    def f_mask(i, pix, con, opa, rect, tt):
        mc, ntt = tile_ellipse_mask(pix + i * 1e-12, con, opa, rect, tt,
                                    tile_x=16, tile_y=16)
        return (mc[0] + ntt[0]).astype(jnp.float32)
    timeit("tile_ellipse_mask alone", f_mask, pre.means2d_pix, pre.conics,
           op, pre.rect, pre.tiles_touched)

    mask_code, new_tt = tile_ellipse_mask(
        pre.means2d_pix, pre.conics, op, pre.rect, pre.tiles_touched,
        tile_x=16, tile_y=16)

    def f_bin(mask):
        def f(i, tt, rect, depths, mc):
            b = bin_gaussians(tt, rect, depths + i * 1e-9, grid_x=grid_x,
                              grid_y=grid_y, capacity=832 * 1024, chunk=128,
                              tile_mask=mc if mask else None)
            return (b.gid[0] + b.tile_count[0]).astype(jnp.float32)
        return f
    timeit("bin_gaussians [no mask]", f_bin(False),
           pre.tiles_touched, pre.rect, pre.depths, mask_code)
    timeit("bin_gaussians [mask]", f_bin(True),
           new_tt, pre.rect, pre.depths, mask_code)

    # gather at both padded capacities
    binning = bin_gaussians(new_tt, pre.rect, pre.depths, grid_x=grid_x,
                            grid_y=grid_y, capacity=832 * 1024, chunk=128,
                            tile_mask=mask_code)
    pix = jnp.stack([ndc2pix(pre.means2d_ndc[:, 0], W),
                     ndc2pix(pre.means2d_ndc[:, 1], H)], -1)
    shs = jnp.concatenate([g.f_dc, g.f_rest], axis=1)
    colors = sh_ops.eval_sh_color(3, shs, g.xyz, jnp.zeros(3))
    P = g.xyz.shape[0]
    splats = jnp.concatenate(
        [pix, pre.conics, op[:, None], colors,
         jnp.zeros((P, SPLAT_WIDTH - 9), jnp.float32)], axis=1)

    for kp_label, icap2, slack2 in [
        ("Kp=1.57M", 832 * 1024, 736 * 1024),
        ("Kp=918k", 565248, 352256),
    ]:
        kp = aligned_capacity(icap2, grid_x * grid_y, 128, slack2)
        gid = jnp.zeros((kp,), jnp.int32).at[: min(kp, binning.gid.shape[0])].set(
            binning.gid[: min(kp, binning.gid.shape[0])])

        def f_gather(i, sp, gg):
            return (sp + i * 1e-12)[gg].T[0, 0]
        timeit(f"splat gather+T [{kp_label}]", f_gather, splats, gid)

    # tile_batch sweep of the full render (per-grid-step overhead dominates
    # the forward at ~1 chunk/tile; bigger batches amortize it)
    from gs_deformable_tpu.renderer import CameraArrays, render
    cam = CameraArrays(world_view=jnp.asarray(view),
                       full_proj=jnp.asarray(view @ proj),
                       camera_center=jnp.zeros(3), time=jnp.float32(0.5))
    for tb in (8, 16):
        cfg_tb = Config(raster=RasterizeConfig(
            instance_capacity=565248, chunk=128, aligned_slack=352256,
            tile_batch=tb))

        def f_render(i, gstate, deform):
            out, _ = render(gstate, deform,
                            cam._replace(time=cam.time + i * 1e-9),
                            iteration=jnp.asarray(10_000), bg=jnp.zeros(3),
                            width=W, height=H, tan_fovx=tanx, tan_fovy=tany,
                            active_sh_degree=3, cfg=cfg_tb)
            return out.image[0, 0, 0]
        timeit(f"render 1080p [cull, tile_batch={tb}]", f_render,
               ts.gaussians, ts.deform)


if __name__ == "__main__":
    main()
