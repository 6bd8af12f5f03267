"""The ACTUAL reference training regime, end-to-end on chip (VERDICT r4 #3).

Round 4's anchor (20k iters, warmup shortened to 800) validated the
uncompressed densify/reset schedule but not the configuration every
reference user runs: **40k iterations with the 3000-iteration deformation
warmup** (/root/reference/arguments/__init__.py:73 `iterations=40_000`,
/root/reference/scene/gaussian_model.py:308 `if iteration < 3000: return 0`,
densify 500..15000 every 100, opacity resets every 3000).  This runs exactly
that on the animated synthetic D-NeRF scene, reports the PSNR/SSIM
trajectory + final held-out metrics + train AND eval wall time, and prints
ONE JSON line.

Usage: python tools/quality_r05.py [--iters 40000] [--warmup 3000]
"""

import argparse
import json
import os
import re
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=40000)
    ap.add_argument("--warmup", type=int, default=3000)
    ap.add_argument("--size", type=int, default=400)
    ap.add_argument("--views", type=int, default=40)
    ap.add_argument("--out", default="")
    args = ap.parse_args()

    root = args.out or tempfile.mkdtemp(prefix="quality_r05_")
    scene = os.path.join(root, "scene")
    model = os.path.join(root, "model")

    # Trajectory milestones: off the 3000-reset grid (never eval AT a reset
    # multiple — the reset crushes opacities; r03 lesson), warmup boundary
    # +100, then every ~3-5k to the end.
    miles = [1000, 2000, 3100, 5000, 7100, 9100, 12100, 15100, 18100,
             20000, 24100, 27100, 30100, 33100, 36100, args.iters]
    miles = sorted({m for m in miles if m <= args.iters})

    # Scene build runs on CPU (dense-oracle GT renders) in a clean env.
    env_cpu = dict(os.environ)
    env_cpu.pop("PALLAS_AXON_POOL_IPS", None)
    env_cpu["JAX_PLATFORMS"] = "cpu"
    build = subprocess.run(
        [sys.executable, "-c",
         f"import sys; sys.path.insert(0, '/root/repo');"
         f"from tests.synthetic_scene import build_blender_scene;"
         f"build_blender_scene({scene!r}, n_views={args.views}, n_test=4, "
         f"size={args.size}, n_blobs=24, animate=True, seed=3)"],
        env=env_cpu, capture_output=True, text=True, timeout=3600,
    )
    if build.returncode != 0:
        print(json.dumps({"quality": "FAIL", "stage": "scene",
                          "error": build.stderr[-400:]}))
        return

    t0 = time.time()
    tr = subprocess.run(
        [sys.executable, "-m", "gs_deformable_tpu.train",
         "-s", scene, "-m", model,
         "--iterations", str(args.iters),
         "--warmup_iters", str(args.warmup),
         "--eval",  # hold out the test split so [test] PSNR exists
         "--random_init_points", "20000",
         "--instance_capacity", str(1 << 20),
         "--test_iterations", *[str(m) for m in miles],
         "--save_iterations", str(args.iters),
         "--quiet"],
        capture_output=True, text=True, timeout=28000, cwd="/root/repo",
    )
    train_s = time.time() - t0
    if tr.returncode != 0:
        print(json.dumps({"quality": "FAIL", "stage": "train",
                          "train_s": round(train_s, 1),
                          "error": (tr.stderr or tr.stdout)[-400:]}))
        return

    # PSNR trajectory from the TensorBoard eval scalars (--quiet silences
    # the [ITER] stdout lines, so the event file is the reliable source).
    traj = {}
    try:
        import glob as _glob
        import struct

        from tensorboardX.proto import event_pb2

        ev_path = _glob.glob(os.path.join(model, "events*"))[0]
        data = open(ev_path, "rb").read()
        off = 0
        while off + 12 <= len(data):
            (ln,) = struct.unpack("<Q", data[off:off + 8])
            off += 12
            payload = data[off:off + ln]
            off += ln + 4
            ev = event_pb2.Event()
            try:
                ev.ParseFromString(payload)
            except Exception:
                continue
            for v in ev.summary.value:
                if v.tag.endswith("loss_viewpoint_-_psnr"):
                    name = v.tag.split("/")[0]
                    traj.setdefault(name, []).append(
                        [int(ev.step), round(float(v.simple_value), 2)])
    except Exception as e:
        traj["error"] = f"{type(e).__name__}: {str(e)[:120]}"

    t1 = time.time()
    ev = subprocess.run(
        [sys.executable, "-m", "gs_deformable_tpu.render_cli", "-m", model],
        capture_output=True, text=True, timeout=7200, cwd="/root/repo",
    )
    eval_s = time.time() - t1
    metrics = {}
    for line in (ev.stdout + ev.stderr).splitlines():
        m = re.search(r"\[(\w+)\] PSNR: ([\d.]+) SSIM: ([\d.]+)", line)
        if m:
            metrics[f"psnr_{m.group(1)}"] = float(m.group(2))
            metrics[f"ssim_{m.group(1)}"] = float(m.group(3))
    ok = ev.returncode == 0 and "psnr_test" in metrics

    import jax

    print(json.dumps({
        "quality": "PASS" if ok else "FAIL",
        "backend": jax.default_backend(),
        "iterations": args.iters,
        "warmup": args.warmup,
        "size": args.size,
        "densify_window": [500, 15000],
        "opacity_reset_interval": 3000,
        "train_wall_s": round(train_s, 1),
        "eval_wall_s": round(eval_s, 1),
        "psnr_trajectory_test": traj.get("test", []),
        "psnr_trajectory_train": traj.get("train", []),
        **metrics,
        **({} if ok else {"error": (ev.stderr or ev.stdout)[-300:]}),
    }))


if __name__ == "__main__":
    main()
