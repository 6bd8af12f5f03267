"""On-chip parity harness: TPU vs CPU on identical saved inputs — one JSON line.

Formalizes the post-mortem workflow that caught the silent bf16 matmul
corruption (see CLAUDE.md): small on-device checks pass while values < 2^8
stay bf16-exact, so this compares BINNING INTERNALS (tile_count sums, gid
checksums — integer quantities large enough to expose one-pass-bf16 rounding)
in addition to the rendered image and parameter gradients, on a deterministic
synthetic scene large enough that the carried integers exceed 2^8.

Usage (driver-runnable):  python tools/parity_onchip.py
  - spawns itself once with a cleaned CPU environment to produce the CPU
    reference artifact, then computes the same quantities on the local chip
    and prints ONE JSON line: {"parity": "PASS"|"FAIL", ...}.
"""

import json
import os
import subprocess
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

# Scene scale: big enough that binning integers exceed 2^8 (the bf16 trap),
# small enough that CPU interpret-mode kernels finish in ~a minute.
N = 5_000
CAP = 8_192
ICAP = 32_768
W, H = 320, 192


def compute(out_path: str) -> None:
    import jax
    import jax.numpy as jnp

    from gs_deformable_tpu.config import Config, DeformConfig, RasterizeConfig
    from gs_deformable_tpu.models import gaussians as G
    from gs_deformable_tpu.ops import transforms as tf
    from gs_deformable_tpu.renderer import CameraArrays, render
    from gs_deformable_tpu.ops.binning import bin_gaussians
    from gs_deformable_tpu.ops.projection import (
        ndc2pix, preprocess, tile_ellipse_mask,
    )
    from gs_deformable_tpu.ops.transforms import build_cov3d
    from gs_deformable_tpu import training

    rng = np.random.default_rng(0)
    cfg = Config(
        deform=DeformConfig(warmup_iters=3000),
        raster=RasterizeConfig(instance_capacity=ICAP, chunk=128),
    )
    rc = cfg.raster
    pts = np.stack(
        [rng.uniform(-2, 2, N), rng.uniform(-1.2, 1.2, N),
         rng.uniform(2.5, 12, N)], -1,
    ).astype(np.float32)
    cols = rng.uniform(0, 1, (N, 3)).astype(np.float32)
    state = G.init_from_points(pts, cols, capacity=CAP, sh_degree=3)
    scal = np.log(0.01 * rng.uniform(0.5, 2.0, (N, 3))).astype(np.float32)
    state = state.replace(
        scaling=jnp.asarray(np.pad(scal, ((0, CAP - N), (0, 0)))))
    ts = training.init_train_state(state, seed=0, cfg=cfg)

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

    # ---- binning internals on fixed screen-space inputs ------------------
    g = ts.gaussians
    scales = jnp.exp(g.scaling)
    rotations = g.rotation / jnp.linalg.norm(g.rotation, axis=-1, keepdims=True)
    opac = jax.nn.sigmoid(g.opacity)[:, 0]

    @jax.jit
    def binning_probe(xyz, scaling, rot, op):
        cov3d = build_cov3d(jnp.exp(scaling), rot, 1.0)
        pre = preprocess(
            xyz, cov3d, cam.world_view, cam.full_proj,
            width=W, height=H, tan_fovx=tanx, tan_fovy=tany,
            tile_x=rc.tile_x, tile_y=rc.tile_y, alive=g.alive, opacities=op,
        )
        pix = jnp.stack([ndc2pix(pre.means2d_ndc[:, 0], W),
                         ndc2pix(pre.means2d_ndc[:, 1], H)], -1)
        tmask, tt = tile_ellipse_mask(
            pix, pre.conics, op, pre.rect, pre.tiles_touched,
            tile_x=rc.tile_x, tile_y=rc.tile_y)
        b = bin_gaussians(
            tt, pre.rect, pre.depths,
            grid_x=grid_x, grid_y=grid_y, capacity=ICAP, chunk=rc.chunk,
            sort_mode="exact", tile_mask=tmask)
        return {
            "tiles_touched_sum": jnp.sum(tt),
            "required": b.required,
            "total_aligned": b.total_aligned,
            "tile_count_sum": jnp.sum(b.tile_count),
            "tile_count_sq_sum": jnp.sum(b.tile_count * b.tile_count),
            # int32 modular checksum: wraparound addition is commutative, so
            # the value is order-independent and backend-exact (a float
            # checksum would differ by reduction order alone).
            "gid_checksum": jnp.sum(
                b.gid * (jnp.arange(b.gid.shape[0], dtype=jnp.int32) % 997)
            ),
            "chunk_start_last": b.tile_chunk_start[-1],
        }

    probe = {k: float(v) for k, v in binning_probe(
        g.xyz, g.scaling, rotations, opac).items()}

    # ---- image + parameter gradients through the full render -------------
    wkey = jnp.asarray(
        np.random.default_rng(1).uniform(0, 1, (3, H, W)), np.float32)

    def loss_fn(xyz, scaling, rotation, opacity, f_dc):
        st = g.replace(xyz=xyz, scaling=scaling, rotation=rotation,
                       opacity=opacity, f_dc=f_dc)
        out, _ = render(
            st, ts.deform, cam, iteration=jnp.asarray(10_000),
            bg=jnp.zeros(3), width=W, height=H, tan_fovx=tanx, tan_fovy=tany,
            active_sh_degree=3, cfg=cfg,
        )
        return jnp.sum(out.image * wkey), out.image

    (val, image), grads = jax.jit(
        jax.value_and_grad(loss_fn, argnums=(0, 1, 2, 3, 4), has_aux=True)
    )(g.xyz, g.scaling, g.rotation, g.opacity, g.f_dc)

    payload = dict(probe)
    payload["loss"] = float(val)
    np.savez_compressed(
        out_path,
        image=np.asarray(image),
        g_xyz=np.asarray(grads[0]), g_scaling=np.asarray(grads[1]),
        g_rotation=np.asarray(grads[2]), g_opacity=np.asarray(grads[3]),
        g_fdc=np.asarray(grads[4]),
        meta=json.dumps(payload),
    )


def main():
    if len(sys.argv) > 1 and sys.argv[1] == "--phase-compute":
        compute(sys.argv[2])
        return

    tmp = tempfile.mkdtemp(prefix="parity_onchip_")
    cpu_path = os.path.join(tmp, "cpu.npz")
    dev_path = os.path.join(tmp, "dev.npz")

    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    r = subprocess.run(
        [sys.executable, os.path.abspath(__file__), "--phase-compute",
         cpu_path],
        env=env, capture_output=True, text=True, timeout=1800,
    )
    if r.returncode != 0:
        print(json.dumps({"parity": "FAIL", "stage": "cpu",
                          "error": r.stderr[-500:]}))
        return

    compute(dev_path)  # local chip (or CPU when no chip — then trivially equal)

    cpu = np.load(cpu_path, allow_pickle=False)
    dev = np.load(dev_path, allow_pickle=False)
    mc = json.loads(str(cpu["meta"]))
    md = json.loads(str(dev["meta"]))

    result = {}
    ok = True
    # Binning internals must match EXACTLY (integers).
    for k in ["tiles_touched_sum", "required", "total_aligned",
              "tile_count_sum", "tile_count_sq_sum", "gid_checksum",
              "chunk_start_last"]:
        same = mc[k] == md[k]
        ok &= same
        result[f"bin.{k}"] = [mc[k], md[k]] if not same else mc[k]

    def relerr(a, b):
        denom = max(float(np.abs(a).max()), 1e-12)
        return float(np.abs(a - b).max()) / denom

    img_err = relerr(cpu["image"], dev["image"])
    result["image_max_rel"] = round(img_err, 9)
    ok &= img_err < 5e-5
    for k in ["g_xyz", "g_scaling", "g_rotation", "g_opacity", "g_fdc"]:
        e = relerr(cpu[k], dev[k])
        result[f"{k}_max_rel"] = round(e, 9)
        ok &= e < 5e-4
    result["loss_rel"] = round(
        abs(mc["loss"] - md["loss"]) / max(abs(mc["loss"]), 1e-12), 9)
    ok &= result["loss_rel"] < 1e-5

    import jax

    out = {"parity": "PASS" if ok else "FAIL",
           "backend": jax.default_backend(), **result}
    print(json.dumps(out))


if __name__ == "__main__":
    main()
