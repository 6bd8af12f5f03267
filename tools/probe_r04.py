"""Round-4 decomposition + A/B probes (ONE TPU job).

Section A (1080p render scale, mixed schedule — run first, cleanest
residency): ordered_fill mask-mode A/B (twolevel vs flat vs XLA scatter) for
both the K-sized prefix fills and the Kp-sized relayout place, full
bin_gaussians under fill_mode pallas/pallas_all/scatter, and the full render
as a device-side fori loop (the round-4 bench methodology).

Section B (800px train scale, packed schedule): composite fwd and fwd+bwd in
isolation (packed AND mixed), the splat-gather VJP (scatter vs sort
reduction), the scatter-add alone, deformation+activations fwd / fwd+bwd,
preprocess+SH fwd+bwd without the composite, the full loss fwd / fwd+bwd,
and the full train step inside a device fori loop.

All timings use the fori+null methodology (CLAUDE.md): ITERS dependent reps
inside one jit, `+ i * 1e-9` float dependence (constant-foldable forms hoist
— round-3 trap), null-loop overhead subtracted.  A/B only within this
process.

Usage: python tools/probe_r04.py  (plain python, on the chip)
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
from gs_deformable_tpu.renderer import CameraArrays, deformed_attributes, render
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
    print(f"{name:34s} raw {dt:8.3f} ms  corr {corr:8.3f} ms "
          f"(compile {compile_s:.0f}s)", flush=True)
    return corr


def calibrate_null():
    @jax.jit
    def null_loop(x):
        def body(i, c):
            return c * 0.0 + x + i * 1e-9
        return jax.lax.fori_loop(0, ITERS, body, jnp.float32(0.0))
    float(null_loop(jnp.float32(1.0)))
    t0 = time.time()
    float(null_loop(jnp.float32(2.0)))
    NULL_MS[0] = (time.time() - t0) / ITERS * 1e3
    print(f"fori overhead {NULL_MS[0]:.3f} ms/iter", flush=True)
    RESULTS["fori_null"] = {"ms": round(NULL_MS[0], 3)}


def make_scene(n, cap, seed=0):
    rng = np.random.default_rng(seed)
    pts = np.stack(
        [rng.uniform(-2, 2, n), rng.uniform(-1.2, 1.2, n),
         rng.uniform(2.5, 12, n)], -1).astype(np.float32)
    cols = rng.uniform(0, 1, (n, 3)).astype(np.float32)
    state = G.init_from_points(pts, cols, capacity=cap, sh_degree=3)
    scal = np.log(0.01 * rng.uniform(0.5, 2.0, (n, 3))).astype(np.float32)
    state = state.replace(
        scaling=jnp.asarray(np.pad(scal, ((0, cap - n), (0, 0)))))
    return state, rng


def camera(width, height, fov=1.0):
    fovy = 2 * np.arctan(np.tan(fov / 2) * height / width)
    proj = tf.projection_matrix(0.01, 100.0, fov, fovy)
    view = np.eye(4, dtype=np.float32)
    cam = CameraArrays(
        world_view=jnp.asarray(view), full_proj=jnp.asarray(view @ proj),
        camera_center=jnp.zeros(3), time=jnp.float32(0.5))
    return cam, float(np.tan(fov / 2)), float(np.tan(fovy / 2))


def screen_arrays(ts, cam, cfg, W, H, tanx, tany, it=10_000):
    """Precompute screen-space arrays + binning inputs (concrete values)."""
    from gs_deformable_tpu.ops.projection import (
        ndc2pix, preprocess, tile_ellipse_mask)
    from gs_deformable_tpu.ops.transforms import build_cov3d
    from gs_deformable_tpu.ops import sh as sh_ops

    @jax.jit
    def go(gstate, deform):
        means3d, scales, rotations, opacity, shs, dx = deformed_attributes(
            gstate, deform, cam.time, jnp.asarray(it), cfg, None)
        if opacity.ndim == 2:
            opacity = opacity[:, 0]
        cov3d = build_cov3d(scales, rotations, 1.0)
        pre = preprocess(
            means3d, cov3d, cam.world_view, cam.full_proj,
            width=W, height=H, tan_fovx=tanx, tan_fovy=tany,
            tile_x=cfg.raster.tile_x, tile_y=cfg.raster.tile_y,
            alive=gstate.alive, opacities=opacity)
        pix = jnp.stack(
            [ndc2pix(pre.means2d_ndc[:, 0], W),
             ndc2pix(pre.means2d_ndc[:, 1], H)], axis=-1)
        colors = sh_ops.eval_sh_color(3, shs, means3d, cam.camera_center)
        tile_mask, tt = tile_ellipse_mask(
            pix, pre.conics, opacity, pre.rect, pre.tiles_touched,
            tile_x=cfg.raster.tile_x, tile_y=cfg.raster.tile_y)
        return (pix, pre.depths, pre.conics, opacity, colors, pre.rect,
                tt, tile_mask)
    out = go(ts.gaussians, ts.deform)
    return [jax.device_put(np.asarray(x)) for x in out]


def main():
    backend = jax.default_backend()
    print(f"backend: {backend}", flush=True)
    calibrate_null()

    from gs_deformable_tpu.ops.binning import (
        aligned_capacity, bin_gaussians)
    from gs_deformable_tpu.ops.pallas.ordered_fill import (
        ordered_place_i32, ordered_prefix_fill)
    from gs_deformable_tpu.ops.scan_utils import cumsum_cols_f32

    # ---------------- Section A: 1080p render scale -------------------
    W, H = 1920, 1080
    n, cap = 100_000, 131_072
    icap, slack = 576 * 1024, 640 * 1024
    cfgA = Config(raster=RasterizeConfig(
        instance_capacity=icap, chunk=128, aligned_slack=slack,
        composite_mode="mixed"))
    state, rng = make_scene(n, cap)
    tsA = training.init_train_state(state, seed=0, cfg=cfgA)
    camA, tanxA, tanyA = camera(W, H)

    # full render, device fori (round-4 bench methodology preview)
    def frame(i, gaussians, deform):
        out, _ = render(
            gaussians, deform, camA._replace(time=camA.time + i * 1e-9),
            iteration=jnp.asarray(10_000), bg=jnp.zeros(3),
            width=W, height=H, tan_fovx=tanxA, tan_fovy=tanyA,
            active_sh_degree=3, cfg=cfgA)
        return out.image[0, 0, 0]
    timeit("A.render_1080p_mixed", frame, tsA.gaussians, tsA.deform)

    # binning totals at bench scale
    (pix, depths, conics, op, colors, rect, tt, tmask) = screen_arrays(
        tsA, camA, cfgA, W, H, tanxA, tanyA)
    grid_x, grid_y = (W + 15) // 16, (H + 15) // 16

    def binfull(i, depths, tt, rect, tmask, mode):
        b = bin_gaussians(
            tt, rect, depths + i * 1e-9, grid_x=grid_x, grid_y=grid_y,
            capacity=icap, chunk=128, sort_mode="exact",
            aligned_slack=slack, tile_mask=tmask, fill_mode=mode)
        return (b.gid[0] + b.tile_count[0] + b.total_aligned).astype(
            jnp.float32)
    for mode in ("pallas", "pallas_all", "scatter"):
        timeit(f"A.bin_{mode}", lambda i, d, t, r, m, mo=mode: binfull(
            i, d, t, r, m, mo), depths, tt, rect, tmask)

    # isolated fill/place kernels, realistic sizes
    K = icap
    Kp = aligned_capacity(icap, grid_x * grid_y, 128, slack)
    nP = cap
    nvalid = 97_000
    posv = np.sort(rng.choice(K, nvalid, replace=False)).astype(np.int32)
    posK = np.concatenate(
        [posv, K + 7 + np.arange(nP - nvalid, dtype=np.int32)])
    deltaK = rng.integers(-(1 << 20), 1 << 20, (nP, 4)).astype(np.float32)
    posK = jnp.asarray(posK)
    deltaK = jnp.asarray(deltaK)

    def fillk(i, p, d, mm):
        out = ordered_prefix_fill(p, d + i * 1e-9, K, mask_mode=mm)
        return out[0, K - 1]
    timeit("A.fill_twolevel", lambda i, p, d: fillk(i, p, d, "twolevel"),
           posK, deltaK)
    timeit("A.fill_flat", lambda i, p, d: fillk(i, p, d, "flat"),
           posK, deltaK)

    def fillx(i, p, d):
        seg = jnp.zeros((K, 4), jnp.float32).at[p].set(
            d + i * 1e-9, mode="drop", unique_indices=True,
            indices_are_sorted=True)
        cs = cumsum_cols_f32(seg)
        return cs[K - 1, 0]
    timeit("A.fill_xla_scatter", fillx, posK, deltaK)

    nplace = 538_000
    posp = np.sort(rng.choice(Kp, nplace, replace=False)).astype(np.int32)
    posp = np.concatenate(
        [posp, Kp + 7 + np.arange(icap - nplace, dtype=np.int32)])
    valsp = rng.integers(0, cap, icap).astype(np.int32)
    posp = jnp.asarray(posp)
    valsp = jnp.asarray(valsp)

    def placek(i, p, v, mm):
        out = ordered_place_i32(
            p, v + (i * 1e-9 * 0).astype(jnp.int32) + (i % 2), Kp,
            mask_mode=mm)
        return out[Kp - 1].astype(jnp.float32)
    timeit("A.place_twolevel", lambda i, p, v: placek(i, p, v, "twolevel"),
           posp, valsp)
    timeit("A.place_flat", lambda i, p, v: placek(i, p, v, "flat"),
           posp, valsp)

    def placex(i, p, v):
        out = jnp.zeros((Kp,), jnp.int32).at[p].set(
            v + (i % 2), mode="drop", unique_indices=True,
            indices_are_sorted=True)
        return out[Kp - 1].astype(jnp.float32)
    timeit("A.place_xla_scatter", placex, posp, valsp)

    # ---------------- Section B: 800px train scale --------------------
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
    gxB, gyB = Wt // 16, Ht // 16
    TB = gxB * gyB
    npix = 256

    (pixB, depthsB, conicsB, opB, colorsB, rectB, ttB, tmaskB) = (
        screen_arrays(tsB, camB, cfgP, Wt, Ht, tanxB, tanyB, it=5000))

    # packed-layout binning (concrete) + splat table
    @jax.jit
    def binP(depths, tt, rect, tmask):
        return bin_gaussians(
            tt, rect, depths, grid_x=gxB, grid_y=gyB, capacity=t_icap,
            chunk=32, sort_mode="exact", aligned_slack=-1,
            tile_mask=tmask, fill_mode="pallas")
    bP = binP(depthsB, ttB, rectB, tmaskB)
    gidP = jax.device_put(np.asarray(bP.gid))
    startP = jax.device_put(np.asarray(bP.tile_chunk_start))
    countP = jax.device_put(np.asarray(bP.tile_count))
    KpP = gidP.shape[0]

    @jax.jit
    def binM(depths, tt, rect, tmask):
        return bin_gaussians(
            tt, rect, depths, grid_x=gxB, grid_y=gyB, capacity=t_icap,
            chunk=128, sort_mode="exact", aligned_slack=176 * 1024,
            tile_mask=tmask, fill_mode="pallas")
    bM = binM(depthsB, ttB, rectB, tmaskB)
    gidM = jax.device_put(np.asarray(bM.gid))
    startM = jax.device_put(np.asarray(bM.tile_chunk_start))
    countM = jax.device_put(np.asarray(bM.tile_count))
    KpM = gidM.shape[0]
    print(f"[B] packed Kp={KpP} mixed Kp={KpM} required={int(bP.required)}",
          flush=True)

    from gs_deformable_tpu.ops.pallas.composite import SPLAT_WIDTH
    P = cap
    splats = jnp.concatenate(
        [pixB, conicsB, opB[:, None], colorsB,
         jnp.zeros((P, SPLAT_WIDTH - 9), jnp.float32)], axis=1)
    splats = jax.device_put(np.asarray(splats))
    sortedP = jax.device_put(np.asarray(splats)[np.asarray(gidP)].T.copy())
    sortedM = jax.device_put(np.asarray(splats)[np.asarray(gidM)].T.copy())

    from gs_deformable_tpu.ops.pallas.packed_composite import (
        make_packed_composite)
    from gs_deformable_tpu.ops.pallas.stream_composite import (
        make_mixed_composite)
    compP = make_packed_composite(
        grid_x=gxB, grid_y=gyB, tile_x=16, tile_y=16, chunk=128, sub=32,
        padded_capacity=KpP, stream_chunks=8, scan_mode="log",
        interpret=False)
    compM = make_mixed_composite(
        grid_x=gxB, grid_y=gyB, tile_x=16, tile_y=16, chunk=128,
        padded_capacity=KpM, tile_batch=8, stream_chunks=8,
        scan_mode="linear", interpret=False)

    gfix = jax.device_put(
        rng.standard_normal((TB, 8, npix)).astype(np.float32) * 1e-3)

    def comp_fwd(i, st, s0, c0):
        out = compP(st + i * 1e-9, s0, c0)
        return out[0, 0, 0]
    timeit("B.comp_packed_fwd", comp_fwd, sortedP, startP, countP)

    def comp_fwdbwd(i, st, s0, c0):
        def f(s):
            return jnp.sum(compP(s, s0, c0)[:TB] * gfix)
        v, g = jax.value_and_grad(f)(st + i * 1e-9)
        return v + g[0, 0]
    timeit("B.comp_packed_fwdbwd", comp_fwdbwd, sortedP, startP, countP)

    def comp_fwdM(i, st, s0, c0):
        out = compM(st + i * 1e-9, s0, c0)
        return out[0, 0, 0]
    timeit("B.comp_mixed_fwd", comp_fwdM, sortedM, startM, countM)

    def comp_fwdbwdM(i, st, s0, c0):
        def f(s):
            return jnp.sum(compM(s, s0, c0)[:TB] * gfix)
        v, g = jax.value_and_grad(f)(st + i * 1e-9)
        return v + g[0, 0]
    timeit("B.comp_mixed_fwdbwd", comp_fwdbwdM, sortedM, startM, countM)

    # splat-gather + VJP (the per-gaussian reduction)
    from gs_deformable_tpu.ops.segsum import gather_splats_t
    wfixP = jax.device_put(
        rng.standard_normal((SPLAT_WIDTH, KpP)).astype(np.float32) * 1e-3)

    def gat(i, sp, gid, mode):
        def f(s):
            return jnp.sum(gather_splats_t(s, gid, mode) * wfixP)
        v, g = jax.value_and_grad(f)(sp + i * 1e-9)
        return v + g[0, 0]
    timeit("B.gather_vjp_scatter",
           lambda i, sp, gid: gat(i, sp, gid, "scatter"), splats, gidP)
    timeit("B.gather_vjp_sort",
           lambda i, sp, gid: gat(i, sp, gid, "sort"), splats, gidP)

    rowsfix = jax.device_put(
        rng.standard_normal((KpP, SPLAT_WIDTH)).astype(np.float32))

    def scat(i, rows, gid):
        out = jnp.zeros((P, SPLAT_WIDTH), jnp.float32).at[gid].add(
            rows + i * 1e-9)
        return out[0, 0]
    timeit("B.scatter_add_alone", scat, rowsfix, gidP)

    # deformation + activations
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

    # preprocess + SH autodiff chain, no composite
    from gs_deformable_tpu.ops.projection import ndc2pix, preprocess
    from gs_deformable_tpu.ops.transforms import build_cov3d
    from gs_deformable_tpu.ops import sh as sh_ops

    def pfwdbwd(i, gstate, deform):
        def f(dp, xyz):
            m3, sc, rot, opc, shs, dx = deformed_attributes(
                gstate.replace(xyz=xyz), dp, camB.time + i * 1e-9,
                jnp.asarray(5000), cfgP, None)
            cov3d = build_cov3d(sc, rot, 1.0)
            pre = preprocess(
                m3, cov3d, camB.world_view, camB.full_proj,
                width=Wt, height=Ht, tan_fovx=tanxB, tan_fovy=tanyB,
                tile_x=16, tile_y=16, alive=gstate.alive, opacities=opc)
            colors = sh_ops.eval_sh_color(3, shs, m3, camB.camera_center)
            return (jnp.sum(pre.conics * 1e-6) + jnp.sum(colors * 1e-6)
                    + jnp.sum(pre.means2d_ndc * 1e-6))
        v, g = jax.value_and_grad(f, argnums=(0, 1))(deform, gstate.xyz)
        return v + g[1][0, 0]
    timeit("B.deform_preproc_sh_fwdbwd", pfwdbwd, tsB.gaussians, tsB.deform)

    # full loss fwd / fwd+bwd (packed)
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

    timeit("B.loss_fwd_packed",
           lambda i, g0, d0: full_loss(g0, d0, i * 1e-9, cfgP),
           tsB.gaussians, tsB.deform)

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

    # full train step inside a device fori loop
    step = training.make_train_step(
        cfgP, width=Wt, height=Ht, tan_fovx=tanxB, tan_fovy=tanyB,
        active_sh_degree=3, spatial_lr_scale=1.0)

    @jax.jit
    def step_loop(ts0):
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
    RESULTS["B.train_step_fori"] = {
        "ms": round(dt, 3), "ms_corr": round(corr, 3),
        "compile_s": round(cs, 1)}
    print(f"{'B.train_step_fori':34s} raw {dt:8.3f} ms  corr {corr:8.3f} ms "
          f"(compile {cs:.0f}s)", flush=True)

    print(json.dumps({"probe_r04": RESULTS}))


if __name__ == "__main__":
    main()
