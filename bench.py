"""Benchmark: 1080p render throughput + train iters/s on the local chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...extras}

Primary metric: pixels/s/chip rendering a 1080p frame of a synthetic
deformable scene (SH degree 3, deformation MLP active).  The baseline
reference point is the upstream 3DGS citation of >= 30 fps at 1080p
(submodules/diff-gaussian-rasterization/README.md:3), i.e. 62.2 Mpix/s;
vs_baseline = value / 62.2e6.  Extras report train iters/s at 800x800.

Measurement methodology (round 4): the primary number is the per-frame wall
time of a host-driven CHAINED dispatch loop (20 dependent frames in flight,
block once at the end) — with the round-4 per-frame device time, the tunnel
RTT pipelines behind compute and the chained wall now tracks the device time
(20.3 ms at 1080p).  A device-side ``lax.fori_loop`` over N frames is
reported as ``render_ms_fori`` for cross-checking: in THIS environment each
device-loop iteration itself pays ~0.8-3 ms of per-iteration overhead
through the tunnel (the round-4 bench measured fori 28.4 vs chained 20.3 on
the same graph; a bare null fori costs ~3 ms/iter), so the fori number is an
UPPER bound on device time, not a lower one.  The train step is measured the
same two ways.

Train metrics (round 5): ``train_ms_800px`` is per-step chained dispatch
(comparable to BENCH_r04); ``train_ms_800px_chunked`` measures the PRODUCT
training loop's dispatch mode — up to 10 steps per device-side chunk
(training.make_chunk_step), which pays the tunnel's ~12 ms TrainState
return/carry cost once per chunk instead of once per step.
``train_iters_per_s_800px`` reports the chunked (product-loop) rate.

Process isolation (round 4): render and train workloads each run in a FRESH
subprocess — round 3 measured the SAME graph at 29.1 ms in a process holding
several big executables resident and 22.5 ms in a clean process, so mixing
both workloads in one process contaminates the smaller one.  Compiles were
never shared anyway (the tunnel caches nothing across processes).

Scene-scale note: on a direct TPU backend the scene is 100k gaussians with a
~1M-instance sort.  Through the axon remote-compile tunnel the AOT helper
caps serialized executables at 2 GiB and the XLA TPU sort's compiled code
grows with the instance count past that cap at 1M instances, so the scene is
scaled down until the executable fits; the `gaussians` /
`required_instances` fields record the scale actually measured.  Each scale
is attempted largest-first and the first one that compiles is reported.
"""

import json
import os
import subprocess
import sys
import time

import numpy as np

# (gaussians, param capacity, render instance capacity, render aligned
# slack, train instance capacity, train aligned slack): largest-first;
# the remote-compile AOT path (backend "axon") cannot serialize the 1M-
# instance sort's executable, so start it at a scale that fits.  The
# primary scale budgets both workloads snugly against exact CPU-measured
# needs (1080p render: 538,347 instances / 1,208,448 aligned rows;
# 800x800 train: 230,836 / 425,472), each with a few % headroom for fp
# drift; the fallbacks stay conservative.  Overflow raises (surfaced
# counters), falling back.
SCALES = [
    (100_000, 131_072, 576 * 1024, 640 * 1024, 256 * 1024, 176 * 1024),
    (100_000, 131_072, 832 * 1024, 736 * 1024, None, -1),
    (100_000, 131_072, 1 << 20, -1, None, -1),
    (40_000, 65_536, 384 * 1024, -1, None, -1),
    (20_000, 32_768, 192 * 1024, -1, None, -1),
]

# Fail-soft ladder (VERDICT r2 #7): a Pallas kernel failing Mosaic
# compile must degrade the config — alternate composite schedule and/or
# the pure-XLA scatter fill path — and report a NUMBER plus a `degraded`
# field, not 0.0.  The RasterizeConfig default fill_mode is "pallas_all"
# (ordered_fill kernels), so the ladder also includes fill_mode="scatter"
# rungs (an ordered_fill Mosaic regression would otherwise fail every
# rung identically — round-3 advisor finding).
DEGRADATIONS = [
    {},
    {"composite_mode": "batch"},
    {"composite_mode": "stream"},
    {"fill_mode": "scatter"},
    {"fill_mode": "scatter", "composite_mode": "batch"},
    {"fill_mode": "scatter", "composite_mode": "stream"},
]

FORI_REPS = 10


def _scene(n, cap, cfg):
    import jax.numpy as jnp
    from gs_deformable_tpu.models import gaussians as G
    from gs_deformable_tpu import training

    rng = np.random.default_rng(0)
    pts = np.stack(
        [rng.uniform(-2, 2, n), rng.uniform(-1.2, 1.2, n),
         rng.uniform(2.5, 12, n)], -1).astype(np.float32)
    cols = rng.uniform(0, 1, (n, 3)).astype(np.float32)
    state = G.init_from_points(pts, cols, capacity=cap, sh_degree=3)
    # Realistic trained-scene splat sizes (~few pixels): the raw knn scales
    # of a uniform random cloud give pathological 600-px splats.
    scal = np.log(0.01 * rng.uniform(0.5, 2.0, (n, 3))).astype(np.float32)
    state = state.replace(
        scaling=jnp.asarray(np.pad(scal, ((0, cap - n), (0, 0)))))
    return training.init_train_state(state, seed=0, cfg=cfg), rng


def _camera(width, height, fov=1.0):
    import jax.numpy as jnp
    from gs_deformable_tpu.ops import transforms as tf
    from gs_deformable_tpu.renderer import CameraArrays

    fovy = 2 * np.arctan(np.tan(fov / 2) * height / width)
    proj = tf.projection_matrix(0.01, 100.0, fov, fovy)
    view = np.eye(4, dtype=np.float32)
    cam = CameraArrays(
        world_view=jnp.asarray(view),
        full_proj=jnp.asarray(view @ proj),
        camera_center=jnp.zeros(3),
        time=jnp.float32(0.5),
    )
    return cam, float(np.tan(fov / 2)), float(np.tan(fovy / 2))


def _maybe_fail(cfg):
    # Fail-soft test hook: BENCH_FAIL_MODES=mixed,stream simulates a Mosaic
    # compile failure for those composite schedules so the degradation
    # ladder can be exercised without a real kernel regression.
    fail_modes = set(filter(None, os.environ.get(
        "BENCH_FAIL_MODES", "").split(",")))
    if cfg.raster.composite_mode in fail_modes:
        raise RuntimeError(
            f"simulated MosaicError for composite_mode="
            f"{cfg.raster.composite_mode}")


def worker_render(n, cap, instance_capacity, aligned_slack, ov):
    import jax
    import jax.numpy as jnp
    from gs_deformable_tpu.config import Config, RasterizeConfig
    from gs_deformable_tpu.renderer import render
    from gs_deformable_tpu.ops.binning import aligned_capacity

    cfg = Config(raster=RasterizeConfig(
        instance_capacity=instance_capacity, chunk=128,
        aligned_slack=aligned_slack, **ov))
    _maybe_fail(cfg)
    ts, _ = _scene(n, cap, cfg)
    W, H = 1920, 1080
    cam, tanx, tany = _camera(W, H)

    @jax.jit
    def render_frame(gaussians, deform, c, t):
        out, _ = render(
            gaussians, deform, c._replace(time=c.time + 0 * t),
            iteration=jnp.asarray(10_000),
            bg=jnp.zeros(3), width=W, height=H, tan_fovx=tanx, tan_fovy=tany,
            active_sh_degree=3, cfg=cfg,
        )
        return out.image, out.required_instances, out.required_aligned

    t0 = time.time()
    img, req, req_al = render_frame(ts.gaussians, ts.deform, cam,
                                    jnp.float32(0))
    jax.block_until_ready(img)
    np.asarray(img.ravel()[:1])
    compile_s = time.time() - t0
    grid_x, grid_y = (W + 15) // 16, (H + 15) // 16
    kp = aligned_capacity(
        cfg.raster.instance_capacity, grid_x * grid_y, cfg.raster.chunk,
        cfg.raster.aligned_slack)
    if int(req) > cfg.raster.instance_capacity or int(req_al) > kp:
        raise RuntimeError(
            f"capacity overflow at this scale (required {int(req)} / "
            f"{cfg.raster.instance_capacity}, aligned {int(req_al)} / {kp})")

    # Primary: N dependent frames inside one device-side fori loop; the
    # per-frame time-jitter keeps every frame a real render (a constant-
    # foldable dependence hoists out of the loop — round-3 probe trap).
    def frame_scalar(i, gaussians, deform, c):
        out, _ = render(
            gaussians, deform, c._replace(time=c.time + i * 1e-9),
            iteration=jnp.asarray(10_000), bg=jnp.zeros(3),
            width=W, height=H, tan_fovx=tanx, tan_fovy=tany,
            active_sh_degree=3, cfg=cfg,
        )
        return out.image[0, 0, 0]

    @jax.jit
    def dev_loop(gaussians, deform, c):
        def body(i, carry):
            return carry * 0.0 + frame_scalar(i, gaussians, deform, c)
        return jax.lax.fori_loop(0, FORI_REPS, body, jnp.float32(0.0))

    t0 = time.time()
    float(dev_loop(ts.gaussians, ts.deform, cam))
    compile_fori_s = time.time() - t0
    t0 = time.time()
    float(dev_loop(ts.gaussians, ts.deform, cam))
    device_dt = (time.time() - t0) / FORI_REPS

    # Secondary: host-driven chained dispatch (pays tunnel RTT per frame).
    iters = 20
    t0 = time.time()
    for i in range(iters):
        img, req, req_al = render_frame(ts.gaussians, ts.deform, cam,
                                        jnp.float32(i))
    jax.block_until_ready(img)
    chained_dt = (time.time() - t0) / iters
    np.asarray(img.ravel()[:1])  # tiny fetch: defeat any tunnel laziness

    pix_per_s = W * H / chained_dt
    return {
        "metric": "render_pixels_per_s_per_chip_1080p",
        "value": round(pix_per_s, 1),
        "unit": "pixels/s",
        "vs_baseline": round(pix_per_s / 62.2e6, 4),
        "render_ms_1080p": round(chained_dt * 1e3, 2),
        "render_ms_fori": round(device_dt * 1e3, 2),
        "render_fori_reps": FORI_REPS,
        "gaussians": n,
        "required_instances": int(req),
        "compile_s_render": round(compile_s + compile_fori_s, 1),
        "backend": jax.default_backend(),
    }


def worker_train(n, cap, t_icap, t_slack, ov):
    import jax
    import jax.numpy as jnp
    from gs_deformable_tpu.config import (
        Config, OptimizationConfig, RasterizeConfig)
    from gs_deformable_tpu.ops.binning import aligned_capacity
    from gs_deformable_tpu import training

    Wt = Ht = int(os.environ.get("BENCH_TRAIN_SIZE", "800"))
    # Learning rates are zeroed so the measured steps run the FULL
    # fwd+bwd+Adam computation on a pinned workload: with live LRs this
    # synthetic scene's splats grow ~2x in instances within 10 steps, which
    # both drifts the metric and can overflow the snug capacity mid-run.
    opt0 = OptimizationConfig(
        position_lr_init=0.0, position_lr_final=0.0, offset_lr_init=0.0,
        offset_lr_final=0.0, feature_lr=0.0, opacity_lr=0.0,
        scaling_lr=0.0, rotation_lr=0.0)
    # composite_mode "packed" for the train workload: the sub-chunk aligned
    # layout (-45% rows) wins the backward-heavy step while losing the 1080p
    # forward — render keeps "mixed" (round-3 A/B).  The scale table's slack
    # budgets are tuned for chunk-128 alignment; packed aligns at
    # sub_chunk=32, whose EXACT worst case is smaller — pass -1.
    t_ov = {"composite_mode": "packed", **ov}
    t_slack_eff = -1 if t_ov["composite_mode"] == "packed" else t_slack
    cfg = Config(raster=RasterizeConfig(
        instance_capacity=t_icap, chunk=128, aligned_slack=t_slack_eff,
        **t_ov), opt=opt0)
    _maybe_fail(cfg)
    ts, rng = _scene(n, cap, cfg)
    cam, tx, ty = _camera(Wt, Ht)
    gt = jnp.asarray(rng.uniform(0, 1, (3, Ht, Wt)), jnp.float32)

    step = training.make_train_step(
        cfg, width=Wt, height=Ht, tan_fovx=tx, tan_fovy=ty,
        active_sh_degree=3, spatial_lr_scale=1.0,
    )
    t0 = time.time()
    ts2, m = step(ts, cam, gt, jnp.zeros(3), jnp.asarray(5000))
    # ``ts`` was DONATED to the step above — only ``ts2`` is live from here.
    jax.block_until_ready(m["loss"])
    loss0 = float(m["loss"])
    compile_s = time.time() - t0
    kp_t = aligned_capacity(
        cfg.raster.instance_capacity, (Wt // 16) * (Ht // 16),
        cfg.raster.chunk, cfg.raster.aligned_slack)
    if (int(m["required_instances"]) > cfg.raster.instance_capacity
            or int(m["required_aligned"]) > kp_t):
        raise RuntimeError(
            f"train capacity overflow (required "
            f"{int(m['required_instances'])} / "
            f"{cfg.raster.instance_capacity}, aligned "
            f"{int(m['required_aligned'])} / {kp_t})")

    # Primary: N steps inside one device-side fori loop (full state carried
    # on device; per-step iteration/time dependence keeps steps live).
    # step_loop itself does not donate its argument, so ts2 stays live for
    # the chained measurement afterwards.
    @jax.jit
    def step_loop(ts0):
        def body(i, t):
            new_t, _ = step(
                t, cam._replace(time=cam.time + i * 1e-9), gt,
                jnp.zeros(3), 5001 + i)
            return new_t
        out = jax.lax.fori_loop(0, FORI_REPS, body, ts0)
        return out.gaussians.xyz[0, 0]

    t0 = time.time()
    float(step_loop(ts2))
    compile_fori_s = time.time() - t0
    t0 = time.time()
    float(step_loop(ts2))
    device_dt = (time.time() - t0) / FORI_REPS

    # Secondary: chained dispatch.
    iters_t = 20
    ts_local = ts2
    t0 = time.time()
    for i in range(iters_t):
        ts_local, m = step(
            ts_local, cam, gt, jnp.zeros(3), jnp.asarray(5001 + i))
    jax.block_until_ready(m["loss"])
    chained_dt = (time.time() - t0) / iters_t
    loss = float(m["loss"])

    # Product-loop dispatch: the ACTUAL training loop runs up to 10 steps
    # per device-side chunk (training.make_chunk_step), paying the tunnel's
    # ~12 ms TrainState return/carry overhead (round-4 finding 8) once per
    # CHUNK instead of once per step.  Per-iteration wall of that loop is
    # the throughput a training run actually gets.
    from gs_deformable_tpu.renderer import CameraArrays

    CH = 10
    chunk_fn = training.make_chunk_step(
        cfg, width=Wt, height=Ht, tan_fovx=tx, tan_fovy=ty,
        active_sh_degree=3, spatial_lr_scale=1.0, chunk_max=CH,
    )
    cam_stack = CameraArrays(
        world_view=jnp.stack([cam.world_view] * CH),
        full_proj=jnp.stack([cam.full_proj] * CH),
        camera_center=jnp.stack([cam.camera_center] * CH),
        time=cam.time + jnp.arange(CH, dtype=jnp.float32) * 1e-9,
    )
    gt_stack = jnp.stack([gt] * CH)
    t0 = time.time()
    ts_c, mc = chunk_fn(ts_local, cam_stack, gt_stack, jnp.zeros(3),
                        jnp.asarray(6001), jnp.asarray(CH))
    jax.block_until_ready(mc["loss"])
    compile_chunk_s = time.time() - t0
    n_chunks = 4
    t0 = time.time()
    for k in range(n_chunks):
        ts_c, mc = chunk_fn(ts_c, cam_stack, gt_stack, jnp.zeros(3),
                            jnp.asarray(6011 + CH * k), jnp.asarray(CH))
    jax.block_until_ready(mc["loss"])
    chunked_dt = (time.time() - t0) / (n_chunks * CH)
    return {
        "train_iters_per_s_800px": round(1.0 / chunked_dt, 3),
        "train_ms_800px": round(chained_dt * 1e3, 2),
        "train_ms_800px_chunked": round(chunked_dt * 1e3, 2),
        "train_ms_fori": round(device_dt * 1e3, 2),
        "loss_finite": bool(
            np.isfinite(loss) and np.isfinite(loss0)
            and np.isfinite(float(mc["loss"]))),
        "compile_s_train": round(
            compile_s + compile_fori_s + compile_chunk_s, 1),
    }


def _run_worker(kind, scale_idx, degrade_idx, timeout_s=2400):
    """Spawn a fresh process for one workload (clean executable residency)."""
    env = dict(os.environ)
    proc = subprocess.run(
        [sys.executable, os.path.abspath(__file__), "--worker", kind,
         str(scale_idx), str(degrade_idx)],
        capture_output=True, text=True, timeout=timeout_s, env=env,
        cwd=os.path.dirname(os.path.abspath(__file__)),
    )
    for line in reversed(proc.stdout.strip().splitlines()):
        line = line.strip()
        if line.startswith("{"):
            try:
                out = json.loads(line)
            except json.JSONDecodeError:
                continue
            if "worker_error" in out:
                raise RuntimeError(out["worker_error"])
            return out
    raise RuntimeError(
        f"{kind} worker produced no JSON (rc={proc.returncode}): "
        f"{(proc.stderr or '')[-300:]}")


def worker_main(kind, scale_idx, degrade_idx):
    n, cap, icap, slack, t_icap, t_slack = SCALES[scale_idx]
    ov = DEGRADATIONS[degrade_idx]
    try:
        if kind == "render":
            out = worker_render(n, cap, icap, slack, ov)
        else:
            if t_icap is None:
                t_icap, t_slack = icap, -1
            out = worker_train(n, cap, t_icap, t_slack, ov)
    except Exception as e:  # surfaced to the parent as a typed failure
        out = {"worker_error": f"{type(e).__name__}: {str(e)[:300]}"}
    print(json.dumps(out), flush=True)


def main():
    if len(sys.argv) >= 2 and sys.argv[1] == "--worker":
        worker_main(sys.argv[2], int(sys.argv[3]), int(sys.argv[4]))
        return

    # The parent must NOT hold a TPU connection while workers run (one TPU
    # job at a time through the tunnel) — probe the backend in a throwaway
    # subprocess instead of importing jax here.
    try:
        bk = subprocess.run(
            [sys.executable, "-c",
             "import jax; print(jax.default_backend())"],
            capture_output=True, text=True, timeout=600,
        ).stdout.strip().splitlines()[-1]
    except Exception:
        bk = "unknown"
    scale_indices = list(range(len(SCALES)))
    if bk == "axon":
        scale_indices = scale_indices[2:]

    result = None
    last_err = None
    for si in scale_indices:
        for di in range(len(DEGRADATIONS)):
            try:
                result = _run_worker("render", si, di)
                if DEGRADATIONS[di]:
                    result["degraded"] = [
                        f"{k}={v}" for k, v in DEGRADATIONS[di].items()]
                break
            except Exception as e:
                last_err = e
                print(
                    f"[bench] render scale {si} degrade {di} failed "
                    f"({type(e).__name__}: {str(e)[:160]}); degrading",
                    file=sys.stderr,
                )
                # Capacity overflow is a SCALE problem: don't waste more
                # serial remote compiles on schedule swaps that can't fix it.
                if "overflow" in str(e):
                    break
        if result is not None:
            for di in range(len(DEGRADATIONS)):
                try:
                    result.update(_run_worker("train", si, di))
                    if DEGRADATIONS[di]:
                        result["train_degraded"] = [
                            f"{k}={v}" for k, v in DEGRADATIONS[di].items()]
                    break
                except Exception as e:
                    print(
                        f"[bench] train scale {si} degrade {di} failed "
                        f"({type(e).__name__}: {str(e)[:160]}); degrading",
                        file=sys.stderr,
                    )
                    if "overflow" in str(e):
                        result["train_error"] = (
                            f"{type(e).__name__}: {str(e)[:160]}")
                        break
            break
    if result is None:
        result = {
            "metric": "render_pixels_per_s_per_chip_1080p",
            "value": 0.0,
            "unit": "pixels/s",
            "vs_baseline": 0.0,
            "error": f"{type(last_err).__name__}: {str(last_err)[:200]}",
        }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
