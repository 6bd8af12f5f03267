"""Multi-host training on CPU: 2 spawned processes x 4 virtual devices.

The reference has no distributed story (SURVEY.md section 5); this validates
the pod-slice path of BASELINE config 5 the way SURVEY section 4 item 5
prescribes: real `jax.distributed.initialize` processes over a shared
coordinator, the global ('data','model') mesh spanning both, host-local data
feeding (each host materializes only its own camera rows), and the sharded
train step's results matching a single-process run of the same program.
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(__file__))

HERE = os.path.dirname(os.path.abspath(__file__))


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _spawn(coordinator, n, pid):
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    return subprocess.Popen(
        [sys.executable, os.path.join(HERE, "multihost_child.py"),
         coordinator, str(n), str(pid)],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
    )


@pytest.mark.slow
def test_two_process_training_matches_single_process():
    coordinator = f"127.0.0.1:{_free_port()}"
    procs = [_spawn(coordinator, 2, pid) for pid in range(2)]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=600)
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"process {pid} failed:\n{out[-4000:]}"

    results = []
    for out in outs:
        lines = [l for l in out.splitlines() if l.startswith("MHRESULT ")]
        assert lines, out[-4000:]
        results.append(json.loads(lines[-1][len("MHRESULT "):]))

    # Both hosts observe identical replicated results.
    np.testing.assert_allclose(results[0]["loss"], results[1]["loss"],
                               rtol=1e-6)
    np.testing.assert_allclose(results[0]["xyz_sum"], results[1]["xyz_sum"],
                               rtol=1e-6)

    # Single-process reference: same program on this process's 8 devices.
    import jax
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices for the single-process check")
    import jax.numpy as jnp

    from gs_deformable_tpu import training
    from gs_deformable_tpu.parallel import sharding
    from test_sharding import H, W, make_cfg, make_setup
    from gs_deformable_tpu.renderer import CameraArrays

    cfg = make_cfg()
    state, cam, tan = make_setup()
    ts = training.init_train_state(state, seed=0, cfg=cfg)
    mesh = sharding.make_mesh(2, 4)
    ts = sharding.shard_train_state(ts, mesh)
    step = sharding.make_sharded_train_step(
        cfg, mesh, width=W, height=H, tan_fovx=tan, tan_fovy=tan,
        active_sh_degree=0, spatial_lr_scale=1.0, capacity=64,
    )
    rng = np.random.default_rng(7)
    gt_b = jnp.asarray(rng.uniform(0, 1, (2, 3, H, W)), jnp.float32)
    cam_b = CameraArrays(
        world_view=jnp.stack([cam.world_view] * 2),
        full_proj=jnp.stack([cam.full_proj] * 2),
        camera_center=jnp.stack([cam.camera_center] * 2),
        time=jnp.asarray([0.1, 0.7], jnp.float32),
    )
    for it in range(1, 4):
        ts, m = step(ts, cam_b, gt_b, jnp.zeros(3), jnp.asarray(9 + it))

    np.testing.assert_allclose(results[0]["loss"], float(m["loss"]),
                               rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(
        results[0]["xyz_sum"], float(jnp.sum(jnp.abs(ts.gaussians.xyz))),
        rtol=1e-5,
    )
    np.testing.assert_allclose(
        results[0]["deform_sum"],
        float(sum(jnp.sum(jnp.abs(l))
                  for l in jax.tree_util.tree_leaves(ts.deform))),
        rtol=1e-5,
    )
    assert results[0]["n_alive"] == int(m["n_alive"])
