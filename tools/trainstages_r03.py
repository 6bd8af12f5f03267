"""Train-step decomposition at bench config (800px, packed schedule).

The 53.4 ms train step is the least-decomposed number at HEAD (render-side
stages live in tools/stages_r03.py).  Times, with the fori+null methodology:
full fwd (loss), full fwd+bwd, Adam alone, SSIM fwd+bwd alone, composite
fwd and fwd+bwd at train scale (packed), splat-gather VJP reduction.

One TPU job. Usage: python tools/trainstages_r03.py
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
from gs_deformable_tpu.models import gaussians as G
from gs_deformable_tpu.ops import transforms as tf
from gs_deformable_tpu.renderer import CameraArrays, render
from gs_deformable_tpu.utils.losses import l1_loss, ssim
from gs_deformable_tpu import training

ITERS = 10
RESULTS = {}
NULL_MS = [0.0]


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
    dt = (time.time() - t0) / ITERS * 1e3
    corr = max(dt - NULL_MS[0], 0.0)
    RESULTS[name] = {"ms": round(dt, 3), "ms_corr": round(corr, 3),
                     "compile_s": round(compile_s, 1)}
    print(f"{name:28s} raw {dt:8.3f} ms  corrected {corr:8.3f} ms "
          f"(compile {compile_s:.0f}s)", flush=True)


def main():
    n, cap = 100_000, 131_072
    rng = np.random.default_rng(0)
    cfg = Config(
        raster=RasterizeConfig(
            instance_capacity=256 * 1024, chunk=128, aligned_slack=-1,
            composite_mode="packed"),
        opt=OptimizationConfig(),
    )

    pts = np.stack(
        [rng.uniform(-2, 2, n), rng.uniform(-1.2, 1.2, n),
         rng.uniform(2.5, 12, n)], -1).astype(np.float32)
    cols = rng.uniform(0, 1, (n, 3)).astype(np.float32)
    state = G.init_from_points(pts, cols, capacity=cap, sh_degree=3)
    scal = np.log(0.01 * rng.uniform(0.5, 2.0, (n, 3))).astype(np.float32)
    state = state.replace(
        scaling=jnp.asarray(np.pad(scal, ((0, cap - n), (0, 0)))))
    ts = training.init_train_state(state, seed=0, cfg=cfg)

    W = H = 800
    fov = 1.0
    fovy = 2 * np.arctan(np.tan(fov / 2) * H / W)
    proj = tf.projection_matrix(0.01, 100.0, fov, fovy)
    view = np.eye(4, dtype=np.float32)
    cam = CameraArrays(
        world_view=jnp.asarray(view), full_proj=jnp.asarray(view @ proj),
        camera_center=jnp.zeros(3), time=jnp.float32(0.5))
    tanx, tany = float(np.tan(fov / 2)), float(np.tan(fovy / 2))
    gt = jnp.asarray(rng.uniform(0, 1, (3, H, W)), jnp.float32)

    @jax.jit
    def null_loop(x):
        def body(i, c):
            return c * 0.0 + x + i * 0.0
        return jax.lax.fori_loop(0, ITERS, body, jnp.float32(0.0))
    float(null_loop(jnp.float32(1.0)))
    t0 = time.time()
    float(null_loop(jnp.float32(2.0)))
    NULL_MS[0] = (time.time() - t0) / ITERS * 1e3
    print(f"fori overhead {NULL_MS[0]:.3f} ms/iter", flush=True)
    RESULTS["fori_null"] = {"ms": round(NULL_MS[0], 3)}

    g = ts.gaussians

    def full_loss(gstate, deform, t_jitter):
        out, dx = render(
            gstate, deform, cam._replace(time=cam.time + t_jitter),
            iteration=jnp.asarray(5000), bg=jnp.zeros(3),
            width=W, height=H, tan_fovx=tanx, tan_fovy=tany,
            active_sh_degree=3, cfg=cfg, latent_heads=ts.latent)
        l1 = l1_loss(out.image, gt)
        off = 0.1 * jnp.sqrt(jnp.sum(dx ** 2, -1) + 1e-20).mean()
        s = ssim(out.image, gt)
        lam = cfg.opt.lambda_dssim
        return (1 - lam) * (l1 + off) + lam * (1 - s)

    def f_fwd(i, gstate, deform):
        return full_loss(gstate, deform, i * 1e-9)
    timeit("loss fwd (render+L1+SSIM)", f_fwd, g, ts.deform)

    def f_fwdbwd(i, gstate, deform):
        def lf(xyz, dp):
            return full_loss(gstate.replace(xyz=xyz), dp, i * 1e-9)
        v, grads = jax.value_and_grad(lf, argnums=(0, 1))(gstate.xyz, deform)
        return v + grads[0][0, 0]
    timeit("loss fwd+bwd (xyz+mlp)", f_fwdbwd, g, ts.deform)

    def f_ssim(i, img):
        def lf(x):
            return ssim(x, gt)
        v, gr = jax.value_and_grad(lf)(img + i * 1e-9)
        return v + gr[0, 0, 0]
    timeit("ssim fwd+bwd", f_ssim, gt * 0.5)

    # Adam alone on the full param set
    from gs_deformable_tpu.models.gaussians import adam_step

    def f_adam(i, tstate):
        params = {**tstate.gaussians.params(),
                  "offset_model": tstate.deform}
        grads = jax.tree_util.tree_map(lambda x: x * 0 + i * 1e-9, params)
        lrs = training.learning_rates(jnp.asarray(5000), cfg, 1.0)
        new_params, _ = adam_step(
            params, grads, tstate.adam, lrs,
            b1=cfg.opt.adam_b1, b2=cfg.opt.adam_b2, eps=cfg.opt.adam_eps)
        return new_params["xyz"][0, 0]
    timeit("adam step (all groups)", f_adam, ts)

    # full train step for reference (includes everything + stats update)
    step = training.make_train_step(
        cfg, width=W, height=H, tan_fovx=tanx, tan_fovy=tany,
        active_sh_degree=3, spatial_lr_scale=1.0)
    t0 = time.time()
    ts2, m = step(ts, cam, gt, jnp.zeros(3), jnp.asarray(5000))
    jax.block_until_ready(m["loss"])
    float(m["loss"])
    print(f"full step compile {time.time() - t0:.0f}s", flush=True)
    iters = 20
    t0 = time.time()
    for i in range(iters):
        ts2, m = step(ts2, cam, gt, jnp.zeros(3), jnp.asarray(5001 + i))
    jax.block_until_ready(m["loss"])
    float(m["loss"])
    ms = (time.time() - t0) / iters * 1e3
    RESULTS["full_step_chained"] = {"ms": round(ms, 2)}
    print(f"full step (chained dispatch)   {ms:8.3f} ms", flush=True)

    print(json.dumps({"trainstages_r03": RESULTS}))


if __name__ == "__main__":
    main()
