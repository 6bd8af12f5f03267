"""Round-4c: isolate the deformation-MLP BACKWARD cost (ONE TPU job).

probe_r04b: the bf16 one-pass fix brought the MLP fwd 9.7 -> 3.0 ms, but
fwd+bwd stayed ~21 ms — a ~6x bwd/fwd ratio where ~2x is expected.  This
probe separates: pure apply_mlp on pre-encoded inputs (no posenc / lax.map /
cond), grads wrt params vs wrt inputs, lax.map on/off, jax.checkpoint
(remat), and a bf16-cotangent variant (trunk outputs bf16 so transpose dots
see bf16 operands on both sides).

Usage: python tools/probe_r04c.py
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from gs_deformable_tpu.config import DeformConfig
from gs_deformable_tpu.models import deform as D
from tools.probe_r04 import RESULTS, calibrate_null, timeit

N = 131_072


def main():
    print(f"backend: {jax.default_backend()}", flush=True)
    calibrate_null()
    cfg = DeformConfig()
    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)
    params = D.init_offset_net(key, cfg)
    xyz = jnp.asarray(rng.uniform(-2, 2, (N, 3)).astype(np.float32))
    xe = jnp.asarray(rng.standard_normal((N, 63)).astype(np.float32))
    te = jnp.asarray(rng.standard_normal((N, 21)).astype(np.float32))

    def heads_sum(outs):
        return sum(jnp.sum(o) * 1e-6 for o in outs)

    # pure apply_mlp, no posenc/map/cond
    def raw_fwd(i, p, xe, te):
        outs = D.apply_mlp(p, xe + i * 1e-9, te, cfg.skips, jnp.bfloat16)
        return outs[0][0, 0] + outs[3][0, 0]
    timeit("mlp_raw_fwd", raw_fwd, params, xe, te)

    def raw_bwd_params(i, p, xe, te):
        def f(p):
            return heads_sum(
                D.apply_mlp(p, xe + i * 1e-9, te, cfg.skips, jnp.bfloat16))
        v, g = jax.value_and_grad(f)(p)
        return v + g["layers"][0]["w"][0, 0]
    timeit("mlp_raw_bwd_params", raw_bwd_params, params, xe, te)

    def raw_bwd_x(i, p, xe, te):
        def f(xe):
            return heads_sum(
                D.apply_mlp(p, xe, te, cfg.skips, jnp.bfloat16))
        v, g = jax.value_and_grad(f)(xe + i * 1e-9)
        return v + g[0, 0]
    timeit("mlp_raw_bwd_x", raw_bwd_x, params, xe, te)

    def raw_bwd_both(i, p, xe, te):
        def f(p, xe):
            return heads_sum(
                D.apply_mlp(p, xe, te, cfg.skips, jnp.bfloat16))
        v, g = jax.value_and_grad(f, argnums=(0, 1))(p, xe + i * 1e-9)
        return v + g[1][0, 0]
    timeit("mlp_raw_bwd_both", raw_bwd_both, params, xe, te)

    # remat: recompute the forward in the backward
    def remat_bwd(i, p, xe, te):
        ap = jax.checkpoint(
            lambda p, xe, te: heads_sum(
                D.apply_mlp(p, xe, te, cfg.skips, jnp.bfloat16)))

        def f(p, xe):
            return ap(p, xe, te)
        v, g = jax.value_and_grad(f, argnums=(0, 1))(p, xe + i * 1e-9)
        return v + g[1][0, 0]
    timeit("mlp_remat_bwd_both", remat_bwd, params, xe, te)

    # bf16 cotangents: trunk/head outputs stay bf16 (one cast at the end)
    def apply_bf16(p, xe, te):
        h = jnp.concatenate([xe, te], axis=-1).astype(jnp.bfloat16)
        for i, layer in enumerate(p["layers"]):
            w = layer["w"].astype(jnp.bfloat16)
            b = layer["b"].astype(jnp.bfloat16)
            h = jax.nn.relu(
                jnp.dot(h, w, preferred_element_type=jnp.bfloat16,
                        precision=jax.lax.Precision.DEFAULT) + b)
            if i in cfg.skips:
                h = jnp.concatenate(
                    [xe.astype(jnp.bfloat16), h], axis=-1)
        wcat = jnp.concatenate(
            [h_["w"] for h_ in p["heads"]], axis=1).astype(jnp.bfloat16)
        bcat = jnp.concatenate(
            [h_["b"] for h_ in p["heads"]], axis=0).astype(jnp.bfloat16)
        out = jnp.dot(h, wcat, preferred_element_type=jnp.bfloat16,
                      precision=jax.lax.Precision.DEFAULT) + bcat
        return out.astype(jnp.float32)

    def bf16ct_bwd(i, p, xe, te):
        def f(p, xe):
            return jnp.sum(apply_bf16(p, xe, te)) * 1e-6
        v, g = jax.value_and_grad(f, argnums=(0, 1))(p, xe + i * 1e-9)
        return v + g[1][0, 0]
    timeit("mlp_bf16ct_bwd_both", bf16ct_bwd, params, xe, te)

    # full deform_offsets (posenc + barrier + lax.map + cond), wrt both
    def full_bwd(i, p, xyz):
        def f(p, xyz):
            outs = D.deform_offsets(
                p, xyz, jnp.float32(0.5) + i * 1e-9, jnp.asarray(5000),
                cfg, compute_dtype=jnp.bfloat16)
            return heads_sum(outs)
        v, g = jax.value_and_grad(f, argnums=(0, 1))(p, xyz)
        return v + g[1][0, 0]
    timeit("mlp_full_bwd_both", full_bwd, params, xyz)

    # lax.map off (block_rows=0)
    try:
        cfg0 = DeformConfig(block_rows=0)

        def noblk_bwd(i, p, xyz):
            def f(p, xyz):
                outs = D.deform_offsets(
                    p, xyz, jnp.float32(0.5) + i * 1e-9, jnp.asarray(5000),
                    cfg0, compute_dtype=jnp.bfloat16)
                return heads_sum(outs)
            v, g = jax.value_and_grad(f, argnums=(0, 1))(p, xyz)
            return v + g[1][0, 0]
        timeit("mlp_noblock_bwd_both", noblk_bwd, params, xyz)
    except Exception as e:
        print(f"mlp_noblock_bwd_both failed: {type(e).__name__}: "
              f"{str(e)[:200]}", flush=True)

    print(json.dumps({"probe_r04c": RESULTS}))


if __name__ == "__main__":
    main()
