"""Round-5 on-chip probes: composite-forward deferral A/B + stage refresh.

All measurements are SAME-PROCESS chained-dispatch A/Bs at bench scale
(round-4 rule: never compare across processes; chained beats fori here).

Stages (cumulative graph builds, each consuming a scalar):
  binning       bin_gaussians alone
  +gather       + sorted-splat gather
  +composite    + the mixed-schedule composite forward
  render        the full 1080p render
A/B:
  render with defer_fwd_reductions True vs False (same process)

Usage: python tools/probe_r05.py  (plain python, on the chip)
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N, CAP = 100_000, 131_072
ICAP, SLACK = 576 * 1024, 640 * 1024
W, H = 1920, 1080
REPS = 20


def chained(fn, *args):
    import jax

    # Warm with the SAME signature as the timed loop (a j-less warm call
    # compiles a different jit signature, so the first timed call pays a
    # full remote compile — the round-5 first-probe bug).
    fn(*args, np.float32(-1.0)).block_until_ready()
    t0 = time.time()
    out = None
    for i in range(REPS):
        out = fn(*args, np.float32(i))
    jax.block_until_ready(out)
    return (time.time() - t0) / REPS * 1e3


def main():
    import jax
    import jax.numpy as jnp
    import dataclasses

    from bench import _scene, _camera
    from gs_deformable_tpu.config import Config, RasterizeConfig
    from gs_deformable_tpu.renderer import render, deformed_attributes
    from gs_deformable_tpu.ops import sh as sh_ops
    from gs_deformable_tpu.ops.binning import bin_gaussians
    from gs_deformable_tpu.ops.projection import ndc2pix, preprocess, tile_ellipse_mask
    from gs_deformable_tpu.ops.rasterize import composite_tiles
    from gs_deformable_tpu.ops.segsum import gather_splats_t
    from gs_deformable_tpu.ops.transforms import build_cov3d
    from gs_deformable_tpu.ops.pallas.composite import SPLAT_WIDTH

    cfg = Config(raster=RasterizeConfig(
        instance_capacity=ICAP, chunk=128, aligned_slack=SLACK))
    ts, _ = _scene(N, CAP, cfg)
    cam, tanx, tany = _camera(W, H)
    r = cfg.raster
    grid_x, grid_y = (W + 15) // 16, (H + 15) // 16
    out = {}

    # Precompute the screen-space arrays ON DEVICE once (jitted).
    @jax.jit
    def screen_arrays(gaussians, deform, c):
        means3d, scales, rotations, opacity, shs, _ = deformed_attributes(
            gaussians, deform, c.time, jnp.asarray(10_000), cfg)
        cov3d = build_cov3d(scales, rotations)
        pre = preprocess(
            means3d, cov3d, c.world_view, c.full_proj, width=W, height=H,
            tan_fovx=tanx, tan_fovy=tany, tile_x=16, tile_y=16,
            alive=gaussians.alive, opacities=opacity[:, 0])
        colors = sh_ops.eval_sh_color(3, shs, means3d, c.camera_center)
        pix = jnp.stack([ndc2pix(pre.means2d_ndc[:, 0], W),
                         ndc2pix(pre.means2d_ndc[:, 1], H)], -1)
        return (pix, pre.depths, pre.conics, opacity[:, 0], colors,
                pre.rect, pre.tiles_touched)

    arrs = jax.block_until_ready(
        screen_arrays(ts.gaussians, ts.deform, cam))
    pix, depths, conics, op, colors, rect, tt = arrs

    def with_jitter(fn):
        @jax.jit
        def run(j=np.float32(0)):
            return fn(depths + j * 1e-12)
        return run

    # --- stage: binning alone ------------------------------------------
    def stage_bin(d):
        tm, tt2 = tile_ellipse_mask(pix, conics, op, rect, tt,
                                    tile_x=16, tile_y=16)
        b = bin_gaussians(
            tt2, rect, d, grid_x=grid_x, grid_y=grid_y,
            capacity=r.instance_capacity, chunk=r.chunk,
            sort_mode=r.sort_mode, aligned_slack=r.aligned_slack,
            tile_mask=tm, fill_mode=r.fill_mode)
        return (b.gid.astype(jnp.float32).sum() + b.tile_count.sum()
                + b.required)

    out["binning_ms"] = round(chained(with_jitter(stage_bin)), 2)

    # --- stage: + splat gather -----------------------------------------
    def stage_gather(d):
        tm, tt2 = tile_ellipse_mask(pix, conics, op, rect, tt,
                                    tile_x=16, tile_y=16)
        b = bin_gaussians(
            tt2, rect, d, grid_x=grid_x, grid_y=grid_y,
            capacity=r.instance_capacity, chunk=r.chunk,
            sort_mode=r.sort_mode, aligned_slack=r.aligned_slack,
            tile_mask=tm, fill_mode=r.fill_mode)
        P = pix.shape[0]
        splats = jnp.concatenate(
            [pix, conics, op[:, None], colors,
             jnp.zeros((P, SPLAT_WIDTH - 9), jnp.float32)], 1)
        st = gather_splats_t(splats, b.gid, r.grad_reduce)
        return st.sum() + b.tile_count.sum()

    out["bin_gather_ms"] = round(chained(with_jitter(stage_gather)), 2)

    # --- stage: + composite (full composite_tiles) ---------------------
    def stage_comp(d):
        tiles, req, ta = composite_tiles(
            pix, d, conics, op, colors, rect, tt,
            grid_x=grid_x, grid_y=grid_y, cfg=r)
        return tiles[:, 0:4, :].sum() + req

    out["bin_gather_composite_ms"] = round(chained(with_jitter(stage_comp)), 2)

    # --- full render at current defaults -------------------------------
    # (The defer_fwd_reductions A/B ran in the first round-5 probe pass:
    # deferred 23.61 ms vs per-chunk 21.09, images bitwise equal — deferral
    # REJECTED, default stays per-chunk.)
    del dataclasses

    @jax.jit
    def frame(c, j):
        o, _ = render(
            ts.gaussians, ts.deform, c._replace(time=c.time + j * 1e-9),
            iteration=jnp.asarray(10_000), bg=jnp.zeros(3),
            width=W, height=H, tan_fovx=tanx, tan_fovy=tany,
            active_sh_degree=3, cfg=cfg)
        return o.image

    frame(cam, np.float32(0)).block_until_ready()
    t0 = time.time()
    img = None
    for i in range(REPS):
        img = frame(cam, np.float32(i))
    jax.block_until_ready(img)
    out["render_ms"] = round((time.time() - t0) / REPS * 1e3, 2)

    out["backend"] = jax.default_backend()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
