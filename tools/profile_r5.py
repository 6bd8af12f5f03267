"""Round-2 job 3: MLP matmul micro-probes + binning micro-stages + precision
quality A/B.  ONE TPU job; fori methodology (see profile_r4)."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from gs_deformable_tpu.config import (
    Config, DeformConfig, OptimizationConfig, RasterizeConfig,
)
from gs_deformable_tpu.models import gaussians as G
from gs_deformable_tpu.models import deform as deform_mod
from gs_deformable_tpu.ops import transforms as tf
from gs_deformable_tpu.ops.binning import (
    _delta_fills, aligned_capacity, bin_gaussians, tile_bounds_from_sorted,
)
from gs_deformable_tpu.ops.scan_utils import cumsum_cols_f32, cumsum_i32
from gs_deformable_tpu.ops.projection import ndc2pix, preprocess, tile_ellipse_mask
from gs_deformable_tpu.ops.transforms import build_cov3d
from gs_deformable_tpu import training
from gs_deformable_tpu.renderer import CameraArrays

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
    P = 131_072
    rng = np.random.default_rng(0)
    timeit("loop overhead (empty body)", lambda c: c + 1.0)

    # ================= A. MLP micro-probes =================
    x256 = jnp.asarray(rng.uniform(-1, 1, (P, 256)), jnp.float32)
    w256 = jnp.asarray(rng.uniform(-0.1, 0.1, (256, 256)), jnp.float32)

    for name, prec, dt_ in (
        ("HIGHEST", jax.lax.Precision.HIGHEST, None),
        ("HIGH", jax.lax.Precision.HIGH, None),
        ("DEFAULT", jax.lax.Precision.DEFAULT, None),
        ("bf16 cast", jax.lax.Precision.DEFAULT, jnp.bfloat16),
    ):
        def f(c, x, w, prec=prec, dt_=dt_):
            xx, ww = x + c, w
            if dt_ is not None:
                xx, ww = xx.astype(dt_), ww.astype(dt_)
            y = jnp.dot(xx, ww, precision=prec,
                        preferred_element_type=jnp.float32)
            return y[0, 0]
        timeit(f"matmul 131k x256x256 [{name}]", f, x256, w256)

    def f_chain(c, x, w):
        h = x + c
        for _ in range(8):
            h = jax.nn.relu(jnp.dot(
                h.astype(jnp.bfloat16), w.astype(jnp.bfloat16),
                preferred_element_type=jnp.float32))
        return h[0, 0]
    timeit("8-chain matmul+relu 131k [bf16]", f_chain, x256, w256)

    cfgd = DeformConfig(block_rows=0)
    params = deform_mod.init_offset_net(jax.random.PRNGKey(0), cfgd)
    xyz = jnp.asarray(rng.uniform(-1, 1, (P, 3)), jnp.float32)
    xe = deform_mod.posenc(xyz, 10)
    te = deform_mod.posenc(jnp.full((P, 1), 0.5, jnp.float32), 10)

    def f_posenc(c, x):
        a = deform_mod.posenc(x + c, 10)
        b = deform_mod.posenc(jnp.full((P, 1), 0.5 + c * 0.0), 10)
        return a[0, 0] + b[0, 0]
    timeit("posenc alone (63+21)", f_posenc, xyz)

    def f_trunk(c, a, b):
        outs = deform_mod.apply_mlp(params, a + c, b, cfgd.skips,
                                    jnp.bfloat16)
        return sum(o[0, 0] for o in outs)
    timeit("apply_mlp on pre-encoded [bf16]", f_trunk, xe, te)

    def f_trunk_hi(c, a, b):
        outs = deform_mod.apply_mlp(params, a + c, b, cfgd.skips, None)
        return sum(o[0, 0] for o in outs)
    timeit("apply_mlp on pre-encoded [HIGHEST]", f_trunk_hi, xe, te)

    # ================= B. binning micro-stages =================
    n = 100_000
    cap = 131_072
    icap = 576 * 1024
    slack = 640 * 1024
    cfg = Config(raster=RasterizeConfig(
        instance_capacity=icap, chunk=128, aligned_slack=slack))
    rc = cfg.raster
    pts = np.stack(
        [rng.uniform(-2, 2, n), rng.uniform(-1.2, 1.2, n), rng.uniform(2.5, 12, n)],
        -1,
    ).astype(np.float32)
    cols = rng.uniform(0, 1, (n, 3)).astype(np.float32)
    state = G.init_from_points(pts, cols, capacity=cap, sh_degree=3)
    scal = np.log(0.01 * rng.uniform(0.5, 2.0, (n, 3))).astype(np.float32)
    state = state.replace(scaling=jnp.asarray(np.pad(scal, ((0, cap - n), (0, 0)))))
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
    grid_x, grid_y = (W + 15) // 16, (H + 15) // 16
    num_tiles = grid_x * grid_y
    K = icap
    Kp = aligned_capacity(icap, num_tiles, 128, slack)
    chunk = 128

    scales = jnp.exp(state.scaling)
    rotations = state.rotation / jnp.linalg.norm(
        state.rotation, axis=-1, keepdims=True)
    opacities = jax.nn.sigmoid(state.opacity)[:, 0]
    cov3d = build_cov3d(scales, rotations, 1.0)
    pre = preprocess(
        state.xyz, cov3d, cam.world_view, cam.full_proj,
        width=W, height=H, tan_fovx=tanx, tan_fovy=tany,
        tile_x=16, tile_y=16, alive=state.alive, opacities=opacities,
    )
    pix = jnp.stack([ndc2pix(pre.means2d_ndc[:, 0], W),
                     ndc2pix(pre.means2d_ndc[:, 1], H)], -1)
    tmask, tt = tile_ellipse_mask(
        pix, pre.conics, opacities, pre.rect, pre.tiles_touched,
        tile_x=16, tile_y=16)
    (tt, tmask, pre) = jax.block_until_ready(jax.device_put((tt, tmask, pre)))

    t_i32 = tt.astype(jnp.int32)
    ones_k = jnp.ones((K,), jnp.int32)

    def f_cumsum(c, x):
        return cumsum_i32(x + (c * 0.0).astype(jnp.int32))[-1].astype(
            jnp.float32)
    timeit("cumsum_i32 over K (590k)", f_cumsum, ones_k)

    # the real batched fill call, exactly as bin_gaussians issues it
    ids = jnp.arange(cap, dtype=jnp.int32)
    w_t = jnp.maximum(pre.rect[:, 2] - pre.rect[:, 0], 1)
    code = (pre.rect[:, 0] << 20) | (pre.rect[:, 1] << 10) | w_t
    cum = cumsum_i32(t_i32)
    offsets = cum - t_i32
    dbits = pre.depths.view(jnp.int32)

    def f_fills(c, tvec, offs, code_, dbits_, tmask_):
        vals = [ids, offs, code_, dbits_, tmask_]
        widths = [22, 22, 30, 31, 17]
        fills = _delta_fills(
            vals, (tvec + (c * 0.0).astype(jnp.int32)) > 0, offs, K,
            widths=widths)
        return sum(f[0] for f in fills).astype(jnp.float32)
    timeit("batched _delta_fills (5 vals, 7 cols)", f_fills, t_i32, offsets,
           code, dbits, tmask)

    slot = jnp.where(t_i32 > 0, cum - 1, cap)
    pos_c = jnp.full((cap,), K, jnp.int32).at[slot].set(offsets, mode="drop")
    delta7 = jnp.asarray(rng.standard_normal((cap, 7)), jnp.float32)

    def f_scat(c, pc, d7):
        seg = jnp.zeros((K, 7), jnp.float32).at[pc].set(d7 + c, mode="drop")
        return seg[0, 0]
    timeit("scatter (cap,7)->(K,7)", f_scat, pos_c, delta7)

    seg7 = jnp.zeros((K, 7), jnp.float32).at[pos_c].set(delta7, mode="drop")

    def f_ccols(c, s):
        return cumsum_cols_f32(s + c)[-1, 0]
    timeit("cumsum_cols_f32 (K,7)", f_ccols, seg7)

    def f_ccols1(c, s):
        return cumsum_i32((s[:, 0] + c).astype(jnp.int32))[-1].astype(
            jnp.float32)
    timeit("cumsum_i32 (K,) single col", f_ccols1, seg7)

    # sorted-side stages
    b = bin_gaussians(
        tt, pre.rect, pre.depths, grid_x=grid_x, grid_y=grid_y,
        capacity=icap, chunk=chunk, sort_mode="exact", aligned_slack=slack,
        tile_mask=tmask)
    b = jax.block_until_ready(jax.device_put(b))

    # reconstruct a sorted tile stream for bounds timing
    tile_of_slot = jnp.clip(
        jnp.cumsum(jnp.zeros((K,), jnp.int32)), 0, num_tiles)

    def f_bounds(c, ts_):
        bounds = tile_bounds_from_sorted(
            ts_ + (c * 0.0).astype(jnp.int32), num_tiles)
        return bounds[-1].astype(jnp.float32)
    timeit("tile_bounds_from_sorted", f_bounds, tile_of_slot)

    new_pos = jnp.asarray(
        rng.permutation(Kp)[:K].astype(np.int32))
    gid_s = jnp.asarray(rng.integers(0, cap, K, dtype=np.int32))

    def f_relay(c, npos, gs):
        out = jnp.zeros((Kp,), jnp.int32).at[npos].set(
            gs + (c * 0.0).astype(jnp.int32), mode="drop")
        return out[0].astype(jnp.float32)
    timeit("final gid scatter (K)->(Kp)", f_relay, new_pos, gid_s)

    def f_bin(c, tt_, rect_, depths_, tmask_):
        bb = bin_gaussians(
            tt_, rect_, depths_ + c,
            grid_x=grid_x, grid_y=grid_y, capacity=icap, chunk=chunk,
            sort_mode="exact", aligned_slack=slack, tile_mask=tmask_)
        return (bb.gid[0] + bb.tile_count[0]).astype(jnp.float32)
    timeit("binning TOTAL (reference)", f_bin, tt, pre.rect, pre.depths, tmask)

    # ================= C. precision quality A/B =================
    # 300 live-LR steps on a deformable synthetic target; report PSNR.
    Wt = Ht = 512
    fovy_t = 2 * np.arctan(np.tan(fov / 2) * Ht / Wt)
    proj_t = tf.projection_matrix(0.01, 100.0, fov, fovy_t)
    cam_t = CameraArrays(
        world_view=jnp.asarray(view),
        full_proj=jnp.asarray(view @ proj_t),
        camera_center=jnp.zeros(3),
        time=jnp.float32(0.5),
    )
    gt = jnp.asarray(rng.uniform(0, 1, (3, Ht, Wt)), jnp.float32)
    gt = jax.image.resize(  # smooth target: make the MLP matter
        jax.image.resize(gt, (3, 16, 16), "linear"), (3, Ht, Wt), "linear")

    for name, dcfg in (
        ("f32 HIGHEST", DeformConfig(block_rows=65536, warmup_iters=20)),
        ("f32_3x", DeformConfig(block_rows=65536, warmup_iters=20,
                                compute_dtype="float32_3x")),
        ("bf16", DeformConfig(block_rows=65536, warmup_iters=20,
                              compute_dtype="bfloat16")),
    ):
        cfg_q = Config(
            raster=RasterizeConfig(instance_capacity=512 * 1024, chunk=128),
            deform=dcfg,
            opt=OptimizationConfig(),
        )
        n_q, cap_q = 20_000, 32_768
        st = G.init_from_points(pts[:n_q], cols[:n_q], capacity=cap_q,
                                sh_degree=3)
        st = st.replace(scaling=jnp.asarray(
            np.pad(scal[:n_q] + np.log(3.0), ((0, cap_q - n_q), (0, 0)))))
        tsq = training.init_train_state(st, seed=0, cfg=cfg_q)
        step = training.make_train_step(
            cfg_q, width=Wt, height=Ht, tan_fovx=float(np.tan(fov / 2)),
            tan_fovy=float(np.tan(fovy_t / 2)),
            active_sh_degree=3, spatial_lr_scale=1.0,
        )
        t0 = time.time()
        try:
            for it in range(1, 301):
                tsq, m = step(tsq, cam_t._replace(
                    time=jnp.float32(0.25 + 0.5 * (it % 2))),
                    gt, jnp.zeros(3), jnp.asarray(it))
            psnr_final = float(m["psnr"])
            print(f"quality[{name:12s}] psnr@300={psnr_final:.3f} "
                  f"loss={float(m['loss']):.5f} "
                  f"({time.time()-t0:.0f}s)", flush=True)
        except Exception as e:
            print(f"quality[{name}] FAILED: {type(e).__name__}: "
                  f"{str(e)[:160]}", flush=True)


if __name__ == "__main__":
    main()
