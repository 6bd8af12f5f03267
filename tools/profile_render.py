"""One-shot stage-by-stage on-chip profile of the 1080p render pipeline.

Run as ONE TPU job (compiles queue serially; see CLAUDE.md).  Device-side
timing: each stage runs inside a lax.fori_loop whose body input varies with
the index, and one scalar is fetched — dispatch RTT and tunnel laziness are
amortized/defeated.

Usage: python tools/profile_render.py [n_gaussians]
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
from gs_deformable_tpu.ops.projection import ndc2pix, preprocess
from gs_deformable_tpu.ops.transforms import build_cov3d
from gs_deformable_tpu import training
from gs_deformable_tpu.renderer import CameraArrays, render

ITERS = 10


def timeit(name, fn, *args):
    """fn(i, *args) -> scalar; times ITERS serialized device-side calls."""

    @jax.jit
    def loop(args):
        def body(i, carry):
            return carry * 0.0 + fn(i, *args)

        return jax.lax.fori_loop(0, ITERS, body, jnp.float32(0.0))

    t0 = time.time()
    r = loop(args)
    float(r)
    compile_s = time.time() - t0
    t0 = time.time()
    r = loop(args)
    float(r)
    dt = (time.time() - t0) / ITERS
    print(f"{name:32s} {dt*1e3:9.3f} ms   (compile {compile_s:.0f}s)", flush=True)
    return dt


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
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
    means3d = g.xyz[: cap]
    scales = jnp.exp(g.scaling)
    rotations = g.rotation / jnp.linalg.norm(g.rotation, axis=-1, keepdims=True)
    opacities = jax.nn.sigmoid(g.opacity)[:, 0]
    shs = jnp.concatenate([g.f_dc, g.f_rest], axis=1)
    alive = g.alive

    # ---- precompute intermediates once (host-side graph, one run) -------
    cov3d = build_cov3d(scales, rotations, 1.0)
    pre = preprocess(
        means3d, cov3d, cam.world_view, cam.full_proj,
        width=W, height=H, tan_fovx=tanx, tan_fovy=tany,
        tile_x=rc.tile_x, tile_y=rc.tile_y, alive=alive,
        opacities=opacities if rc.opacity_aware_radius else None,
    )
    binning = bin_gaussians(
        pre.tiles_touched, pre.rect, pre.depths,
        grid_x=grid_x, grid_y=grid_y, capacity=icap, chunk=rc.chunk,
        sort_mode=rc.sort_mode,
    )
    print(f"gaussians={n} required_instances={int(binning.required)} "
          f"total_aligned={int(binning.total_aligned)}", flush=True)

    pix = jnp.stack([ndc2pix(pre.means2d_ndc[:, 0], W),
                     ndc2pix(pre.means2d_ndc[:, 1], H)], -1)
    colors = sh_ops.eval_sh_color(3, shs, means3d, cam.camera_center)
    P = means3d.shape[0]
    splats = jnp.concatenate(
        [pix, pre.conics, opacities[:, None], colors,
         jnp.zeros((P, SPLAT_WIDTH - 9), jnp.float32)], axis=1)
    sorted_splats_t = splats[binning.gid].T

    Kp = aligned_capacity(icap, num_tiles, rc.chunk)
    comp = make_tile_composite(
        grid_x=grid_x, grid_y=grid_y, tile_x=rc.tile_x, tile_y=rc.tile_y,
        chunk=rc.chunk, padded_capacity=Kp, tile_batch=rc.tile_batch,
        alpha_max=rc.alpha_max, alpha_min=rc.alpha_min,
        eps=rc.transmittance_eps, interpret=False,
    )

    (splats, sorted_splats_t, binning, pix, colors, cov3d) = jax.block_until_ready(
        jax.device_put((splats, sorted_splats_t, binning, pix, colors, cov3d)))

    # ---- stage timings ---------------------------------------------------
    def f_pre(i, means3d, cov3d):
        p = preprocess(
            means3d + i * 1e-12, cov3d, cam.world_view, cam.full_proj,
            width=W, height=H, tan_fovx=tanx, tan_fovy=tany,
            tile_x=rc.tile_x, tile_y=rc.tile_y, alive=alive,
            opacities=opacities if rc.opacity_aware_radius else None,
        )
        return p.depths[0] + p.conics[0, 0] + p.means2d_ndc[0, 0]
    timeit("preprocess(+cov3d)", f_pre, means3d, cov3d)

    def f_sh(i, shs):
        c = sh_ops.eval_sh_color(3, shs + i * 1e-12, means3d, cam.camera_center)
        return c[0, 0]
    timeit("sh_color", f_sh, shs)

    def f_bin(i, tt, rect, depths):
        b = bin_gaussians(tt, rect, depths + i * 1e-9,
                          grid_x=grid_x, grid_y=grid_y, capacity=icap,
                          chunk=rc.chunk, sort_mode=rc.sort_mode)
        return (b.gid[0] + b.tile_count[0] + b.tile_chunk_start[0]).astype(jnp.float32)
    timeit("bin_gaussians (total)", f_bin, pre.tiles_touched, pre.rect, pre.depths)

    # sort alone (2-key as configured path uses)
    tid = jnp.where(jnp.arange(icap) < binning.num_instances,
                    jnp.zeros((icap,), jnp.int32), num_tiles)
    dk = jnp.abs(jax.random.normal(jax.random.PRNGKey(0), (icap,), jnp.float32))
    def f_sort(i, tid, dk, gid):
        t, _, s = jax.lax.sort((tid, dk + i * 1e-9, gid), num_keys=2, is_stable=True)
        return (t[0] + s[0]).astype(jnp.float32)
    timeit("lax.sort 2-key 1M", f_sort, tid, dk, jnp.arange(icap, dtype=jnp.int32))

    def f_gather(i, splats, gid):
        s = (splats + i * 1e-12)[gid]
        return s[0, 0]
    timeit("splat gather (Kp,16)", f_gather, splats, binning.gid)

    def f_gather_t(i, splats, gid):
        s = (splats + i * 1e-12)[gid].T
        return s[0, 0]
    timeit("splat gather + T", f_gather_t, splats, binning.gid)

    def f_comp(i, sst, start, count):
        out = comp(sst + i * 1e-12, start, count)
        return out[0, 0, 0]
    timeit("composite fwd", f_comp, sorted_splats_t,
           binning.tile_chunk_start, binning.tile_count)

    def f_comp_bwd(i, sst, start, count):
        def loss(s):
            out = comp(s, start, count)
            return jnp.sum(out[:, 0:4, :])
        v, g_ = jax.value_and_grad(loss)(sst + i * 1e-12)
        return v + g_[0, 0]
    timeit("composite fwd+bwd", f_comp_bwd, sorted_splats_t,
           binning.tile_chunk_start, binning.tile_count)

    def f_render(i, gstate, deform):
        out, _ = render(
            gstate, deform, cam._replace(time=cam.time + i * 1e-9),
            iteration=jnp.asarray(10_000), bg=jnp.zeros(3),
            width=W, height=H, tan_fovx=tanx, tan_fovy=tany,
            active_sh_degree=3, cfg=cfg,
        )
        return out.image[0, 0, 0]
    timeit("FULL render 1080p", f_render, ts.gaussians, ts.deform)


if __name__ == "__main__":
    main()
