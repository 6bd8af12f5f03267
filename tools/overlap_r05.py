"""Schedule evidence for the sharded backward's collectives (VERDICT r4 #6).

Compiles the n_model=4 sharded train step on an 8-virtual-device CPU mesh,
then walks the optimized HLO to locate every cross-replica collective
(all-gather / reduce-scatter / all-reduce) relative to the composite
forward/backward custom-calls, and reports:

- which collectives exist and their tensor sizes;
- the data-dependence structure: whether the record-gather VJP's
  reduce-scatter transitively depends on the ENTIRE composite backward
  (if so, no schedule can overlap it with the tile sweep — restructuring,
  e.g. band-staged gathers, would be needed) or only on a slice;
- which OTHER work is available to overlap each collective with (ops that
  are not ancestors/descendants of it).

The dependence structure is backend-independent (it is a property of the
HLO graph, not the CPU schedule); actual on-chip overlap additionally needs
XLA's async collectives, which the dependence analysis bounds from above.

Run: env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu \
     XLA_FLAGS=--xla_force_host_platform_device_count=8 \
     python tools/overlap_r05.py
"""

import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import numpy as np
    import jax
    import jax.numpy as jnp

    from gs_deformable_tpu.config import (
        Config, DeformConfig, ModelConfig, RasterizeConfig)
    from gs_deformable_tpu.models import gaussians as G
    from gs_deformable_tpu.parallel import sharding
    from gs_deformable_tpu.renderer import CameraArrays
    from gs_deformable_tpu import training
    from gs_deformable_tpu.ops import transforms as tf

    W, H = 128, 96
    cfg = Config(
        model=ModelConfig(sh_degree=1),
        deform=DeformConfig(depth=2, width=32, warmup_iters=2, sh_coeffs=4),
        raster=RasterizeConfig(instance_capacity=8192, chunk=128),
    )
    rng = np.random.default_rng(0)
    n, cap = 2000, 4096
    pts = np.stack([rng.uniform(-1, 1, n), rng.uniform(-0.7, 0.7, n),
                    rng.uniform(3, 6, n)], -1).astype(np.float32)
    cols = rng.uniform(0.2, 0.8, (n, 3)).astype(np.float32)
    state = G.init_from_points(pts, cols, capacity=cap, sh_degree=1)
    ts = training.init_train_state(state, seed=0, cfg=cfg)
    fov = 0.8
    view = np.eye(4, dtype=np.float32)
    proj = tf.projection_matrix(0.01, 100.0, fov, fov)
    cam = CameraArrays(
        world_view=jnp.asarray(view), full_proj=jnp.asarray(view @ proj),
        camera_center=jnp.zeros(3), time=jnp.float32(0.5))
    tan = float(np.tan(fov / 2))

    mesh = sharding.make_mesh(1, 4)
    ts = sharding.shard_train_state(ts, mesh)
    device_fn = sharding._build_device_step(
        cfg, mesh, width=W, height=H, tan_fovx=tan, tan_fovy=tan,
        active_sh_degree=1, spatial_lr_scale=1.0, capacity=cap)
    from jax.sharding import PartitionSpec as P
    specs = sharding.train_state_specs(ts)
    fn = jax.jit(jax.shard_map(
        device_fn, mesh=mesh,
        in_specs=(specs, P("data"), P("data"), P(), P()),
        out_specs=(specs, P()), check_vma=False))
    cam_b = jax.tree_util.tree_map(lambda x: x[None], cam)
    gt = jnp.asarray(rng.uniform(0, 1, (1, 3, H, W)), jnp.float32)
    lowered = fn.lower(ts, cam_b, gt, jnp.zeros(3), jnp.asarray(10))
    hlo = lowered.compile().as_text()

    # Parse the main computation: instruction -> operands.
    deps = {}
    kinds = {}
    order = []
    main_block = False
    for line in hlo.splitlines():
        ls = line.strip()
        if ls.startswith("ENTRY "):
            main_block = True
            continue
        if main_block and ls.startswith("}"):
            break
        if not main_block:
            continue
        m = re.match(r"(%[\w\.\-]+) = .*?([\w\-]+)\(", ls)
        if not m:
            continue
        name, op = m.group(1), m.group(2)
        # Operands: every %ref in the argument list (strip metadata tail).
        args = ls.split("(", 1)[1]
        args = args.split("metadata=")[0].split("calls=")[0]
        operands = re.findall(r"%[\w\.\-]+", args)
        deps[name] = [o for o in operands if o in deps and o != name]
        kinds[name] = (op, ls[:160])
        order.append(name)

    def ancestors(name):
        seen = set()
        stack = [name]
        while stack:
            x = stack.pop()
            for d in deps.get(x, []):
                if d not in seen:
                    seen.add(d)
                    stack.append(d)
        return seen

    colls = [x for x in order if kinds[x][0] in
             ("all-gather", "reduce-scatter", "all-reduce")]
    composites = [x for x in order if "custom-call" in kinds[x][0]
                  or "mosaic" in kinds[x][1].lower()
                  or "pallas" in kinds[x][1].lower()]
    # On CPU shard_map, the Pallas kernels run in interpret mode — find the
    # big serial while-loops standing in for them instead.
    whiles = [x for x in order if kinds[x][0] == "while"]

    report = {"n_collectives": len(colls), "n_custom_calls": len(composites),
              "n_while": len(whiles), "collectives": []}
    big = composites + whiles
    for c in colls:
        anc = ancestors(c)
        dep_on = [b for b in big if b in anc]
        overlappable = [b for b in big if b not in anc and c not in
                        ancestors(b)]
        report["collectives"].append({
            "name": c,
            "kind": kinds[c][0],
            "snippet": kinds[c][1][:100],
            "depends_on_big_ops": len(dep_on),
            "independent_big_ops": len(overlappable),
        })
    print(json.dumps(report, indent=1))

    # Also dump where each collective sits in program order vs the whiles.
    pos = {x: i for i, x in enumerate(order)}
    marks = sorted(
        [(pos[x], "COLL", x, kinds[x][0]) for x in colls]
        + [(pos[x], "BIG", x, kinds[x][0]) for x in big])
    for p, tag, x, k in marks:
        print(f"{p:6d} {tag:5s} {k:20s} {x[:60]}")


if __name__ == "__main__":
    main()
