"""Full-schedule quality anchor (VERDICT r3 #6): >= 20k on-chip iterations.

Round 3's anchor was 7k iterations at 200px with a compressed densify
window.  This runs the UNCOMPRESSED reference schedule — densify 500..15000
every 100, opacity resets every 3000 (never evaluating AT a reset multiple:
the reset crushes opacities and an eval at that iteration measures the
crushed state — two misleading r03 runs) — at >= 400px for >= 20k
iterations on an animated synthetic D-NeRF scene, reports the PSNR/SSIM
TRAJECTORY (from the train loop's eval milestones) plus final held-out
metrics via render_cli, and prints ONE JSON line.

Usage: python tools/quality_r04.py [--iters 20000] [--size 400]
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
    ap.add_argument("--iters", type=int, default=20000)
    # Deformation warmup: the reference's 3000 would leave the MLP frozen
    # for 15% of the run on an ANIMATED scene — keep the r03 shortened gate
    # so the deformable path trains through the densify window.
    ap.add_argument("--warmup", type=int, default=800)
    ap.add_argument("--size", type=int, default=400)
    ap.add_argument("--views", type=int, default=40)
    ap.add_argument("--out", default="")
    args = ap.parse_args()

    root = args.out or tempfile.mkdtemp(prefix="quality_r04_")
    scene = os.path.join(root, "scene")
    model = os.path.join(root, "model")

    # Trajectory milestones: off the 3000-reset grid (x+100 after each reset
    # that falls inside the run), plus the final iteration.
    miles = [1000, 2000, 3100, 5000, 7000, 9100, 12100, 15100, 18100,
             args.iters]
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
        capture_output=True, text=True, timeout=14000, cwd="/root/repo",
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

    ev = subprocess.run(
        [sys.executable, "-m", "gs_deformable_tpu.render_cli", "-m", model],
        capture_output=True, text=True, timeout=7200, cwd="/root/repo",
    )
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
        "size": args.size,
        "densify_window": [500, 15000],
        "opacity_reset_interval": 3000,
        "train_wall_s": round(train_s, 1),
        "psnr_trajectory_test": traj.get("test", []),
        "psnr_trajectory_train": traj.get("train", []),
        **metrics,
        **({} if ok else {"error": (ev.stderr or ev.stdout)[-300:]}),
    }))


if __name__ == "__main__":
    main()
