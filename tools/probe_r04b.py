"""Round-4 re-measure after the three fixes (ONE TPU job):

- deform MLP bf16 tier now lowers to one MXU pass (was HIGHEST 6-pass);
- grad_reduce "sort" = exact segmented-scan reduction (new default);
- fill_mode "pallas_all" = two-level-mask kernels for fills AND relayout.

Measures the same headline graphs as tools/probe_r04.py for direct A/B
(same process structure: render scale first, then train scale).

Usage: python tools/probe_r04b.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from gs_deformable_tpu.config import Config, OptimizationConfig, RasterizeConfig
from gs_deformable_tpu.renderer import deformed_attributes, render
from gs_deformable_tpu.utils.losses import l1_loss, ssim
from gs_deformable_tpu import training
from tools.probe_r04 import (
    ITERS, NULL_MS, RESULTS, calibrate_null, camera, make_scene, timeit)


def main():
    print(f"backend: {jax.default_backend()}", flush=True)
    calibrate_null()

    # ---------------- render scale (1080p, mixed) ---------------------
    W, H = 1920, 1080
    n, cap = 100_000, 131_072
    cfgA = Config(raster=RasterizeConfig(
        instance_capacity=576 * 1024, chunk=128, aligned_slack=640 * 1024,
        composite_mode="mixed"))
    state, rng = make_scene(n, cap)
    tsA = training.init_train_state(state, seed=0, cfg=cfgA)
    camA, tanxA, tanyA = camera(W, H)

    def frame(i, gaussians, deform):
        out, _ = render(
            gaussians, deform, camA._replace(time=camA.time + i * 1e-9),
            iteration=jnp.asarray(10_000), bg=jnp.zeros(3),
            width=W, height=H, tan_fovx=tanxA, tan_fovy=tanyA,
            active_sh_degree=3, cfg=cfgA)
        return out.image[0, 0, 0]
    timeit("A.render_1080p_mixed", frame, tsA.gaussians, tsA.deform)

    # ---------------- train scale (800px) ------------------------------
    Wt = Ht = 800
    t_icap = 256 * 1024
    opt0 = OptimizationConfig(
        position_lr_init=0.0, position_lr_final=0.0, offset_lr_init=0.0,
        offset_lr_final=0.0, feature_lr=0.0, opacity_lr=0.0,
        scaling_lr=0.0, rotation_lr=0.0)
    cfgP = Config(raster=RasterizeConfig(
        instance_capacity=t_icap, chunk=128, aligned_slack=-1,
        composite_mode="packed"), opt=opt0)
    cfgM = Config(raster=RasterizeConfig(
        instance_capacity=t_icap, chunk=128, aligned_slack=176 * 1024,
        composite_mode="mixed"), opt=opt0)
    tsB = training.init_train_state(state, seed=0, cfg=cfgP)
    camB, tanxB, tanyB = camera(Wt, Ht)
    gt = jnp.asarray(rng.uniform(0, 1, (3, Ht, Wt)), jnp.float32)

    def dfwd(i, gstate, deform):
        m3, sc, rot, opc, shs, dx = deformed_attributes(
            gstate, deform, camB.time + i * 1e-9, jnp.asarray(5000), cfgP,
            None)
        return m3[0, 0] + sc[0, 0] + shs[0, 0, 0] + dx[0, 0]
    timeit("B.deform_act_fwd", dfwd, tsB.gaussians, tsB.deform)

    def dbwd(i, gstate, deform):
        def f(dp, xyz):
            m3, sc, rot, opc, shs, dx = deformed_attributes(
                gstate.replace(xyz=xyz), dp, camB.time + i * 1e-9,
                jnp.asarray(5000), cfgP, None)
            return (jnp.sum(m3 * 1e-6) + jnp.sum(sc * 1e-6)
                    + jnp.sum(shs * 1e-6) + jnp.sum(rot * 1e-6))
        v, g = jax.value_and_grad(f, argnums=(0, 1))(deform, gstate.xyz)
        return v + g[1][0, 0]
    timeit("B.deform_act_fwdbwd", dbwd, tsB.gaussians, tsB.deform)

    def full_loss(gstate, deform, t_jitter, cfg):
        out, dx = render(
            gstate, deform, camB._replace(time=camB.time + t_jitter),
            iteration=jnp.asarray(5000), bg=jnp.zeros(3),
            width=Wt, height=Ht, tan_fovx=tanxB, tan_fovy=tanyB,
            active_sh_degree=3, cfg=cfg, latent_heads=tsB.latent)
        l1 = l1_loss(out.image, gt)
        off = 0.1 * jnp.sqrt(jnp.sum(dx ** 2, -1) + 1e-20).mean()
        s = ssim(out.image, gt)
        lam = cfg.opt.lambda_dssim
        return (1 - lam) * (l1 + off) + lam * (1 - s)

    def f_fwdbwd(i, gstate, deform, cfg):
        def lf(xyz, dp):
            return full_loss(gstate.replace(xyz=xyz), dp, i * 1e-9, cfg)
        v, grads = jax.value_and_grad(lf, argnums=(0, 1))(gstate.xyz, deform)
        return v + grads[0][0, 0]
    timeit("B.loss_fwdbwd_packed",
           lambda i, g0, d0: f_fwdbwd(i, g0, d0, cfgP),
           tsB.gaussians, tsB.deform)
    timeit("B.loss_fwdbwd_mixed",
           lambda i, g0, d0: f_fwdbwd(i, g0, d0, cfgM),
           tsB.gaussians, tsB.deform)

    for name, cfg_t in (("B.train_step_fori", cfgP),
                        ("B.train_step_fori_mixed", cfgM)):
        step = training.make_train_step(
            cfg_t, width=Wt, height=Ht, tan_fovx=tanxB, tan_fovy=tanyB,
            active_sh_degree=3, spatial_lr_scale=1.0)

        @jax.jit
        def step_loop(ts0, step=step):
            def body(i, ts):
                new_ts, m = step(
                    ts, camB._replace(time=camB.time + i * 1e-9), gt,
                    jnp.zeros(3), 5000 + i)
                return new_ts
            out = jax.lax.fori_loop(0, ITERS, body, ts0)
            return out.gaussians.xyz[0, 0]
        t0 = time.time()
        float(step_loop(tsB))
        cs = time.time() - t0
        t0 = time.time()
        float(step_loop(tsB))
        dt = (time.time() - t0) / ITERS * 1e3
        corr = max(dt - NULL_MS[0], 0.0)
        RESULTS[name] = {"ms": round(dt, 3), "ms_corr": round(corr, 3),
                         "compile_s": round(cs, 1)}
        print(f"{name:34s} raw {dt:8.3f} ms  corr {corr:8.3f} ms "
              f"(compile {cs:.0f}s)", flush=True)

    print(json.dumps({"probe_r04b": RESULTS}))


if __name__ == "__main__":
    main()
