"""Quality-anchor A/B: bf16 vs fp32 cotangents in the MLP backward.

VERDICT r4 #2: the bf16-cotangent MLP backward (probed 2.8 vs 5.2 ms raw
fwd+bwd at 131k rows) truncates inter-layer gradient significands to 8 bits;
land it only if a full training run shows dPSNR <= 0.1 against the
fp32-cotangent arm.  Two identical short trainings (same scene, same seed,
same schedule) differing ONLY in --bf16_cotangents; prints ONE JSON line.

Usage: python tools/quality_ab_r05.py [--iters 5000] [--size 200]
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


def run_arm(scene, model, iters, warmup, flags):
    t0 = time.time()
    tr = subprocess.run(
        [sys.executable, "-m", "gs_deformable_tpu.train",
         "-s", scene, "-m", model,
         "--iterations", str(iters),
         "--warmup_iters", str(warmup),
         "--eval", "--random_init_points", "20000",
         "--instance_capacity", str(1 << 19),
         "--test_iterations", str(iters),
         "--save_iterations", str(iters),
         "--quiet", *flags],
        capture_output=True, text=True, timeout=7200, cwd="/root/repo",
    )
    wall = time.time() - t0
    if tr.returncode != 0:
        return {"error": (tr.stderr or tr.stdout)[-300:], "wall_s": wall}
    ev = subprocess.run(
        [sys.executable, "-m", "gs_deformable_tpu.render_cli", "-m", model,
         "--skip_train"],
        capture_output=True, text=True, timeout=3600, cwd="/root/repo",
    )
    out = {"wall_s": round(wall, 1)}
    for line in (ev.stdout + ev.stderr).splitlines():
        m = re.search(r"\[(\w+)\] PSNR: ([\d.]+) SSIM: ([\d.]+)", line)
        if m:
            out[f"psnr_{m.group(1)}"] = float(m.group(2))
            out[f"ssim_{m.group(1)}"] = float(m.group(3))
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=5000)
    ap.add_argument("--warmup", type=int, default=800)
    ap.add_argument("--size", type=int, default=200)
    args = ap.parse_args()

    root = tempfile.mkdtemp(prefix="quality_ab_r05_")
    scene = os.path.join(root, "scene")
    env_cpu = dict(os.environ)
    env_cpu.pop("PALLAS_AXON_POOL_IPS", None)
    env_cpu["JAX_PLATFORMS"] = "cpu"
    build = subprocess.run(
        [sys.executable, "-c",
         f"import sys; sys.path.insert(0, '/root/repo');"
         f"from tests.synthetic_scene import build_blender_scene;"
         f"build_blender_scene({scene!r}, n_views=30, n_test=4, "
         f"size={args.size}, n_blobs=24, animate=True, seed=3)"],
        env=env_cpu, capture_output=True, text=True, timeout=3600,
    )
    if build.returncode != 0:
        print(json.dumps({"ab": "FAIL", "stage": "scene",
                          "error": build.stderr[-300:]}))
        return

    fp32 = run_arm(scene, os.path.join(root, "m_fp32"), args.iters,
                   args.warmup, [])
    bf16 = run_arm(scene, os.path.join(root, "m_bf16"), args.iters,
                   args.warmup, ["--bf16_cotangents"])

    ok = "psnr_test" in fp32 and "psnr_test" in bf16
    d = round(fp32.get("psnr_test", 0) - bf16.get("psnr_test", 0), 3)
    import jax

    print(json.dumps({
        "ab": "PASS" if ok else "FAIL",
        "backend": jax.default_backend(),
        "iters": args.iters, "size": args.size,
        "fp32_cotangents": fp32, "bf16_cotangents": bf16,
        "dpsnr_test_fp32_minus_bf16": d if ok else None,
        "verdict_bar": "land bf16 if |dPSNR| <= 0.1",
    }))


if __name__ == "__main__":
    main()
