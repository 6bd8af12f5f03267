"""Round-5 train-step probes: bf16-cotangent A/B + step timing refresh.

Same-process chained A/Bs at the bench train workload (800x800, packed
schedule, pinned LRs).  DCE-proof: the fwd+bwd probes consume a tree-sum of
EVERY gradient leaf (round-4 trap 7).

Usage: python tools/probe_r05b.py   (plain python, on the chip)
"""

import dataclasses
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N, CAP = 100_000, 131_072
ICAP = 256 * 1024
Wt = Ht = 800
REPS = 20


def main():
    import jax
    import jax.numpy as jnp

    from bench import _scene, _camera
    from gs_deformable_tpu.config import (
        Config, DeformConfig, OptimizationConfig, RasterizeConfig)
    from gs_deformable_tpu import training
    from gs_deformable_tpu.renderer import render
    from gs_deformable_tpu.utils.losses import l1_loss, ssim

    opt0 = OptimizationConfig(
        position_lr_init=0.0, position_lr_final=0.0, offset_lr_init=0.0,
        offset_lr_final=0.0, feature_lr=0.0, opacity_lr=0.0,
        scaling_lr=0.0, rotation_lr=0.0)

    def make_cfg(bf16_cot):
        return Config(
            deform=DeformConfig(bf16_cotangents=bf16_cot),
            raster=RasterizeConfig(
                instance_capacity=ICAP, chunk=128, aligned_slack=-1,
                composite_mode="packed"),
            opt=opt0)

    cfg0 = make_cfg(False)
    ts, rng = _scene(N, CAP, cfg0)
    cam, tx, ty = _camera(Wt, Ht)
    gt = jnp.asarray(rng.uniform(0, 1, (3, Ht, Wt)), jnp.float32)
    out = {}

    def chained(fn, *args):
        jax.block_until_ready(fn(*args, np.float32(0)))
        t0 = time.time()
        o = None
        for i in range(REPS):
            o = fn(*args, np.float32(i))
        jax.block_until_ready(o)
        return round((time.time() - t0) / REPS * 1e3, 2)

    # --- loss fwd+bwd (all leaves consumed) under both cotangent modes ---
    for name, bf16_cot in (("lossbwd_fp32cot_ms", False),
                           ("lossbwd_bf16cot_ms", True)):
        cfg = make_cfg(bf16_cot)

        @jax.jit
        def lossbwd(gaussians, deform, c, j):
            def loss_fn(gp, dp):
                st = gaussians.with_params(gp)
                o, dx = render(
                    st, dp, c._replace(time=c.time + j * 1e-9),
                    iteration=jnp.asarray(5000), bg=jnp.zeros(3),
                    width=Wt, height=Ht, tan_fovx=tx, tan_fovy=ty,
                    active_sh_degree=3, cfg=cfg)
                img = o.image
                return ((1 - 0.2) * (l1_loss(img, gt)
                                     + 0.1 * jnp.abs(dx).sum() / N)
                        + 0.2 * (1 - ssim(img, gt)))

            l, (gg, gd) = jax.value_and_grad(loss_fn, argnums=(0, 1))(
                gaussians.params(), deform)
            tot = l
            for leaf in jax.tree_util.tree_leaves((gg, gd)):
                tot = tot + leaf.sum()
            return tot

        out[name] = chained(lossbwd, ts.gaussians, ts.deform, cam)

    # --- full train step under both modes --------------------------------
    for name, bf16_cot in (("step_fp32cot_ms", False),
                           ("step_bf16cot_ms", True)):
        cfg = make_cfg(bf16_cot)
        step = training.make_train_step(
            cfg, width=Wt, height=Ht, tan_fovx=tx, tan_fovy=ty,
            active_sh_degree=3, spatial_lr_scale=1.0)
        ts_l, m = step(ts, cam, gt, jnp.zeros(3), jnp.asarray(5000))
        jax.block_until_ready(m["loss"])
        t0 = time.time()
        for i in range(REPS):
            ts_l, m = step(ts_l, cam, gt, jnp.zeros(3), jnp.asarray(5001 + i))
        jax.block_until_ready(m["loss"])
        out[name] = round((time.time() - t0) / REPS * 1e3, 2)
        ts = ts_l  # old ts was donated

    out["backend"] = jax.default_backend()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
