"""Round-3 on-chip A/B: the round-2 perf theses, measured end-to-end.

One process, one job (TPU compiles queue serially through the tunnel):
- 1080p render: fill_mode scatter vs pallas x grad_reduce scatter vs sort
  (grad_reduce only affects the backward, so render-only configs A/B the
  fill; the train configs A/B both).
- 800px train step: the winning fill mode x grad_reduce x composite
  mixed vs packed (VERDICT r2 #5/#8: qualify packed's train-step win).

Timing: chained-dispatch wall clock over `iters` dependent calls (the same
methodology as bench.py — 36 ms graphs are above the tunnel's unreliable
sub-20 ms regime; deltas < ~1 ms are noise, the theses claim 2-6 ms).
Prints one JSON line per config as it completes (partial output stays
useful if a late config dies).
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def main():
    import argparse

    import jax
    import jax.numpy as jnp

    ap = argparse.ArgumentParser()
    ap.add_argument("--only", default="")
    only = set(filter(None, ap.parse_args().only.split(",")))

    from gs_deformable_tpu.config import (
        Config, OptimizationConfig, RasterizeConfig,
    )
    from gs_deformable_tpu.models import gaussians as G
    from gs_deformable_tpu.ops import transforms as tf
    from gs_deformable_tpu.renderer import CameraArrays, render
    from gs_deformable_tpu import training

    rng = np.random.default_rng(0)
    n, cap = 100_000, 131_072
    pts = np.stack(
        [rng.uniform(-2, 2, n), rng.uniform(-1.2, 1.2, n),
         rng.uniform(2.5, 12, n)], -1).astype(np.float32)
    cols = rng.uniform(0, 1, (n, 3)).astype(np.float32)
    state = G.init_from_points(pts, cols, capacity=cap, sh_degree=3)
    scal = np.log(0.01 * rng.uniform(0.5, 2.0, (n, 3))).astype(np.float32)
    state = state.replace(
        scaling=jnp.asarray(np.pad(scal, ((0, cap - n), (0, 0)))))
    # The train step donates its state arg, which would delete the shared
    # buffers after the first config — keep a host copy per config.
    state_host = jax.device_get(state)

    def fresh_state():
        return jax.tree_util.tree_map(jnp.asarray, state_host)

    fov = 1.0
    view = np.eye(4, dtype=np.float32)

    def camera(width, height):
        fovy = 2 * np.arctan(np.tan(fov / 2) * height / width)
        proj = tf.projection_matrix(0.01, 100.0, fov, fovy)
        cam = CameraArrays(
            world_view=jnp.asarray(view),
            full_proj=jnp.asarray(view @ proj),
            camera_center=jnp.zeros(3),
            time=jnp.float32(0.5),
        )
        return cam, float(np.tan(fov / 2)), float(np.tan(fovy / 2))

    results = {}

    # ---- 1080p render: fill A/B ----------------------------------------
    W, H = 1920, 1080
    cam, tanx, tany = camera(W, H)

    def render_cfg(**rov):
        return Config(raster=RasterizeConfig(
            instance_capacity=576 * 1024, chunk=128,
            aligned_slack=640 * 1024, **rov))

    for name, rov in [
        ("render_fill_scatter", {}),
        ("render_fill_pallas", {"fill_mode": "pallas"}),
        ("render_pallas_linear", {"fill_mode": "pallas",
                                  "scan_mode": "linear"}),
        ("render_packed", {"fill_mode": "pallas",
                           "composite_mode": "packed"}),  # packed = log scan
        ("render_pallas_linear_tb16", {"fill_mode": "pallas",
                                       "scan_mode": "linear",
                                       "tile_batch": 16}),
    ]:
        if only and name not in only:
            continue
        try:
            cfg = render_cfg(**rov)
            ts = training.init_train_state(fresh_state(), seed=0, cfg=cfg)

            @jax.jit
            def frame(gaussians, deform, c, t):
                out, _ = render(
                    gaussians, deform, c._replace(time=c.time + 0 * t),
                    iteration=jnp.asarray(10_000), bg=jnp.zeros(3),
                    width=W, height=H, tan_fovx=tanx, tan_fovy=tany,
                    active_sh_degree=3, cfg=cfg)
                return out.image

            t0 = time.time()
            img = frame(ts.gaussians, ts.deform, cam, jnp.float32(0))
            jax.block_until_ready(img)
            np.asarray(img.ravel()[:1])
            compile_s = time.time() - t0
            iters = 20
            t0 = time.time()
            for i in range(iters):
                img = frame(ts.gaussians, ts.deform, cam, jnp.float32(i))
            jax.block_until_ready(img)
            np.asarray(img.ravel()[:1])
            ms = (time.time() - t0) / iters * 1e3
            results[name] = {"ms": round(ms, 2),
                             "compile_s": round(compile_s, 1)}
        except Exception as e:  # keep later configs alive
            results[name] = {"error": f"{type(e).__name__}: {str(e)[:200]}"}
        print(json.dumps({name: results[name]}), flush=True)

    # ---- 800px train step: fill x grad x schedule -----------------------
    Wt = Ht = 800
    cam_t, tx, ty = camera(Wt, Ht)
    opt0 = OptimizationConfig(
        position_lr_init=0.0, position_lr_final=0.0, offset_lr_init=0.0,
        offset_lr_final=0.0, feature_lr=0.0, opacity_lr=0.0,
        scaling_lr=0.0, rotation_lr=0.0)
    gt = jnp.asarray(rng.uniform(0, 1, (3, Ht, Wt)), jnp.float32)

    for name, rov in [
        ("train_scatter_scatter", {}),
        ("train_pallas_scatter", {"fill_mode": "pallas"}),
        ("train_pallas_sort", {"fill_mode": "pallas", "grad_reduce": "sort"}),
        ("train_scatter_sort", {"grad_reduce": "sort"}),
        ("train_packed", {"composite_mode": "packed",
                          "fill_mode": "pallas"}),
        ("train_packed_sort", {"composite_mode": "packed",
                               "fill_mode": "pallas",
                               "grad_reduce": "sort"}),
        ("train_packed_scatterfill_sort", {"composite_mode": "packed",
                                           "grad_reduce": "sort"}),
        ("train_mixed_linear", {"fill_mode": "pallas",
                                "scan_mode": "linear"}),
    ]:
        if only and name not in only:
            continue
        try:
            cfg_t = Config(raster=RasterizeConfig(
                instance_capacity=256 * 1024, chunk=128,
                aligned_slack=(176 * 1024 if rov.get("composite_mode")
                               != "packed" else -1), **rov), opt=opt0)
            ts_l = training.init_train_state(fresh_state(), seed=0, cfg=cfg_t)
            step = training.make_train_step(
                cfg_t, width=Wt, height=Ht, tan_fovx=tx, tan_fovy=ty,
                active_sh_degree=3, spatial_lr_scale=1.0)
            t0 = time.time()
            ts_l, m = step(ts_l, cam_t, gt, jnp.zeros(3), jnp.asarray(5000))
            jax.block_until_ready(m["loss"])
            float(m["loss"])
            compile_s = time.time() - t0
            req = int(m["required_instances"])
            iters = 20
            t0 = time.time()
            for i in range(iters):
                ts_l, m = step(ts_l, cam_t, gt, jnp.zeros(3),
                               jnp.asarray(5001 + i))
            jax.block_until_ready(m["loss"])
            float(m["loss"])
            ms = (time.time() - t0) / iters * 1e3
            results[name] = {"ms": round(ms, 2),
                             "compile_s": round(compile_s, 1),
                             "required": req}
        except Exception as e:  # keep later configs alive
            results[name] = {"error": f"{type(e).__name__}: {str(e)[:200]}"}
        print(json.dumps({name: results[name]}), flush=True)

    print(json.dumps({"ab_r03": results}))


if __name__ == "__main__":
    main()
