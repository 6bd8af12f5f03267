"""Child process for the multi-host CPU test (tests/test_multihost.py).

Joins a 2-process jax.distributed runtime (4 virtual CPU devices each =
8 global), builds the same deterministic scene as the parent, shards the
TrainState over the global ('data', 'model') mesh, feeds ONLY this host's
data rows (parallel/multihost.local_data_indices), runs 3 sharded train
steps, and prints a JSON line with the loss and parameter checksums.

Run: python multihost_child.py <coordinator> <num_processes> <process_id>
(environment: JAX_PLATFORMS=cpu, XLA_FLAGS=--xla_force_host_platform_device_count=4)
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    coordinator, num_processes, pid = (
        sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
    )
    import jax

    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=pid,
    )
    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from gs_deformable_tpu import training
    from gs_deformable_tpu.parallel import multihost, sharding
    from test_sharding import H, W, make_cfg, make_setup

    assert jax.process_count() == num_processes
    assert len(jax.devices()) == 8, len(jax.devices())
    assert len(jax.local_devices()) == 4

    cfg = make_cfg()
    state, cam, tan = make_setup()
    ts = training.init_train_state(state, seed=0, cfg=cfg)

    n_data, n_model = 2, 4
    mesh = multihost.global_mesh(n_data, n_model)
    ts = sharding.shard_train_state(ts, mesh)

    step = sharding.make_sharded_train_step(
        cfg, mesh, width=W, height=H, tan_fovx=tan, tan_fovy=tan,
        active_sh_degree=0, spatial_lr_scale=1.0, capacity=64,
    )

    # Host-sharded data feeding: this process materializes ONLY its own data
    # rows (cameras + gt images); DCN never carries image bytes.
    rng = np.random.default_rng(7)
    gt_all = rng.uniform(0, 1, (n_data, 3, H, W)).astype(np.float32)
    times_all = np.asarray([0.1, 0.7], np.float32)
    local_rows = multihost.local_data_indices(mesh)
    ds = NamedSharding(mesh, P("data"))

    def feed(full):
        local = np.ascontiguousarray(full[local_rows])
        return jax.make_array_from_process_local_data(ds, local, full.shape)

    gt_b = feed(gt_all)
    cam_b = jax.tree_util.tree_map(
        lambda x: feed(np.broadcast_to(np.asarray(x)[None], (n_data,) + np.shape(x)).copy()),
        cam,
    )
    cam_b = cam_b._replace(time=feed(times_all))

    bg = jnp.zeros(3)
    for it in range(1, 4):
        ts, m = step(ts, cam_b, gt_b, bg, jnp.asarray(9 + it))

    # Replicated-over-data leaves are fully addressable per host (the model
    # axis lives inside each host).
    def checksum(x):
        return float(jnp.sum(jnp.abs(x)))

    out = {
        "process": pid,
        "loss": float(m["loss"]),
        "psnr": float(m["psnr"]),
        "xyz_sum": checksum(ts.gaussians.xyz),
        "opacity_sum": checksum(ts.gaussians.opacity),
        "deform_sum": float(
            sum(jnp.sum(jnp.abs(l)) for l in jax.tree_util.tree_leaves(ts.deform))
        ),
        "n_alive": int(m["n_alive"]),
    }
    print("MHRESULT " + json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
