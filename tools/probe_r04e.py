"""Round-4e: attribute the train-step whole-vs-parts gap (ONE TPU job).

After the MLP fixes the isolated stages of the 800px train fwd+bwd sum to
~30 ms but the full loss fwd+bwd measures ~42-45.  This probe builds the
loss CUMULATIVELY — each level adds one subsystem to the differentiated
graph — so consecutive diffs attribute the gap including interactions:

  e1 deform+activations            (value_and_grad)
  e2 + preprocess + SH color
  e3 + binning (fwd-only bookkeeping)
  e4 + sorted-splat gather (+ its segmented-sum VJP)
  e5 + Pallas composite (composite_tiles)
  e6 + tile->image assemble + L1 vs gt
  e7 + offset-norm + SSIM (the full training loss)

All fori+null, packed schedule, same scene/scale as probe_r04.

Usage: python tools/probe_r04e.py
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from gs_deformable_tpu.config import Config, OptimizationConfig, RasterizeConfig
from gs_deformable_tpu.ops import sh as sh_ops
from gs_deformable_tpu.ops.binning import bin_gaussians
from gs_deformable_tpu.ops.pallas.composite import SPLAT_WIDTH
from gs_deformable_tpu.ops.projection import ndc2pix, preprocess, tile_ellipse_mask
from gs_deformable_tpu.ops.rasterize import composite_tiles, rasterize_arrays
from gs_deformable_tpu.ops.segsum import gather_splats_t
from gs_deformable_tpu.ops.transforms import build_cov3d
from gs_deformable_tpu.renderer import deformed_attributes, render
from gs_deformable_tpu.utils.losses import l1_loss, ssim
from gs_deformable_tpu import training
from tools.probe_r04 import RESULTS, calibrate_null, camera, make_scene, timeit


def main():
    print(f"backend: {jax.default_backend()}", flush=True)
    calibrate_null()
    Wt = Ht = 800
    t_icap = 256 * 1024
    opt0 = OptimizationConfig(
        position_lr_init=0.0, position_lr_final=0.0, offset_lr_init=0.0,
        offset_lr_final=0.0, feature_lr=0.0, opacity_lr=0.0,
        scaling_lr=0.0, rotation_lr=0.0)
    cfg = Config(raster=RasterizeConfig(
        instance_capacity=t_icap, chunk=128, aligned_slack=-1,
        composite_mode="packed"), opt=opt0)
    rc = cfg.raster
    state, rng = make_scene(100_000, 131_072)
    ts = training.init_train_state(state, seed=0, cfg=cfg)
    cam, tanx, tany = camera(Wt, Ht)
    gt = jnp.asarray(rng.uniform(0, 1, (3, Ht, Wt)), jnp.float32)
    gx, gy = Wt // 16, Ht // 16
    T = gx * gy
    npix = 256
    gfix = jax.device_put(
        rng.standard_normal((T, 8, npix)).astype(np.float32) * 1e-3)
    P = 131_072
    Kp_pack = None  # resolved lazily for wfix

    def stages(gstate, dp, t_jitter, level):
        m3, sc, rot, opc, shs, dx = deformed_attributes(
            gstate, dp, cam.time + t_jitter, jnp.asarray(5000), cfg, None)
        acc = (jnp.sum(m3 * 1e-6) + jnp.sum(sc * 1e-6)
               + jnp.sum(shs * 1e-7) + jnp.sum(rot * 1e-6))
        if level == 1:
            return acc
        op = opc[:, 0] if opc.ndim == 2 else opc
        cov3d = build_cov3d(sc, rot, 1.0)
        pre = preprocess(
            m3, cov3d, cam.world_view, cam.full_proj, width=Wt, height=Ht,
            tan_fovx=tanx, tan_fovy=tany, tile_x=16, tile_y=16,
            alive=gstate.alive, opacities=op)
        pix = jnp.stack([ndc2pix(pre.means2d_ndc[:, 0], Wt),
                         ndc2pix(pre.means2d_ndc[:, 1], Ht)], -1)
        colors = sh_ops.eval_sh_color(3, shs, m3, cam.camera_center)
        acc = acc + (jnp.sum(pre.conics * 1e-7) + jnp.sum(colors * 1e-6)
                     + jnp.sum(pix * 1e-7))
        if level == 2:
            return acc
        tmask, tt = tile_ellipse_mask(
            pix, pre.conics, op, jax.lax.stop_gradient(pre.rect),
            pre.tiles_touched, tile_x=16, tile_y=16)
        b = bin_gaussians(
            tt, jax.lax.stop_gradient(pre.rect),
            jax.lax.stop_gradient(pre.depths), grid_x=gx, grid_y=gy,
            capacity=t_icap, chunk=rc.sub_chunk, sort_mode="exact",
            aligned_slack=-1, tile_mask=tmask, fill_mode=rc.fill_mode)
        acc = acc + jnp.sum(b.tile_count).astype(jnp.float32) * 1e-9
        if level == 3:
            return acc
        splats = jnp.concatenate(
            [pix, pre.conics, op[:, None], colors,
             jnp.zeros((P, SPLAT_WIDTH - 9), jnp.float32)], axis=1)
        st = gather_splats_t(splats, b.gid, rc.grad_reduce)
        acc = acc + jnp.sum(st * 1e-7)
        if level == 4:
            return acc
        return acc  # levels 5+ use the composite helpers below

    def lvl(level):
        def f(i, gstate, dp):
            def loss(xyz, dparams):
                return stages(
                    gstate.replace(xyz=xyz), dparams, i * 1e-9, level)
            v, g = jax.value_and_grad(loss, argnums=(0, 1))(gstate.xyz, dp)
            return v + g[0][0, 0]
        return f

    for level in (1, 2, 3, 4):
        timeit(f"e{level}", lvl(level), ts.gaussians, ts.deform)

    def e5(i, gstate, dp):
        def loss(xyz, dparams):
            m3, sc, rot, opc, shs, dx = deformed_attributes(
                gstate.replace(xyz=xyz), dparams, cam.time + i * 1e-9,
                jnp.asarray(5000), cfg, None)
            op = opc[:, 0] if opc.ndim == 2 else opc
            cov3d = build_cov3d(sc, rot, 1.0)
            pre = preprocess(
                m3, cov3d, cam.world_view, cam.full_proj, width=Wt,
                height=Ht, tan_fovx=tanx, tan_fovy=tany, tile_x=16,
                tile_y=16, alive=gstate.alive, opacities=op)
            pix = jnp.stack([ndc2pix(pre.means2d_ndc[:, 0], Wt),
                             ndc2pix(pre.means2d_ndc[:, 1], Ht)], -1)
            colors = sh_ops.eval_sh_color(3, shs, m3, cam.camera_center)
            out, req, ta = composite_tiles(
                pix, pre.depths, pre.conics, op, colors, pre.rect,
                pre.tiles_touched, grid_x=gx, grid_y=gy, cfg=rc)
            return jnp.sum(out * gfix)
        v, g = jax.value_and_grad(loss, argnums=(0, 1))(gstate.xyz, dp)
        return v + g[0][0, 0]
    timeit("e5", e5, ts.gaussians, ts.deform)

    def render_loss(gstate, dparams, t_jitter, with_ssim):
        out, dx = render(
            gstate, dparams, cam._replace(time=cam.time + t_jitter),
            iteration=jnp.asarray(5000), bg=jnp.zeros(3), width=Wt,
            height=Ht, tan_fovx=tanx, tan_fovy=tany, active_sh_degree=3,
            cfg=cfg, latent_heads=ts.latent)
        l1 = l1_loss(out.image, gt)
        if not with_ssim:
            return l1
        off = 0.1 * jnp.sqrt(jnp.sum(dx ** 2, -1) + 1e-20).mean()
        s = ssim(out.image, gt)
        return 0.8 * (l1 + off) + 0.2 * (1 - s)

    def e6(i, gstate, dp):
        def loss(xyz, dparams):
            return render_loss(
                gstate.replace(xyz=xyz), dparams, i * 1e-9, False)
        v, g = jax.value_and_grad(loss, argnums=(0, 1))(gstate.xyz, dp)
        return v + g[0][0, 0]
    timeit("e6", e6, ts.gaussians, ts.deform)

    def e7(i, gstate, dp):
        def loss(xyz, dparams):
            return render_loss(
                gstate.replace(xyz=xyz), dparams, i * 1e-9, True)
        v, g = jax.value_and_grad(loss, argnums=(0, 1))(gstate.xyz, dp)
        return v + g[0][0, 0]
    timeit("e7", e7, ts.gaussians, ts.deform)

    def e7f(i, gstate, dp):
        return render_loss(gstate, dp, i * 1e-9, True)
    timeit("e7_fwd_only", e7f, ts.gaussians, ts.deform)

    print(json.dumps({"probe_r04e": RESULTS}))


if __name__ == "__main__":
    main()
