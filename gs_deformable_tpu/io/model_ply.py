"""Trained-model PLY export/import with the reference's attribute schema.

Schema (construct_list_of_attributes, /root/reference/scene/gaussian_model.py:
891-903): x,y,z,nx,ny,nz,f_dc_0..2,f_rest_0..(3*(K-1)-1),opacity,scale_0..2,
rot_0..3 — channel-major feature flattening (transpose(1,2).flatten, :909-910).
The deformation nets are saved alongside the PLY as .npz files, mirroring the
reference's five .pth files (:924-929); loading restores them and sets
active_sh_degree to max (:965-1025).
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models.gaussians import GaussianState
from .ply import read_ply, write_ply

NET_FILES = (
    "offset_model",  # the trained 4-head net (gaussian_model.py:924)
    "offset_model_rot",
    "offset_model_scaling",
    "opacity_mask",
    "shs_model",
)


def _flatten_tree(tree: Any, prefix: str = "") -> Dict[str, np.ndarray]:
    flat = {}
    leaves = jax.tree_util.tree_flatten_with_path(tree)[0]
    for path, leaf in leaves:
        key = prefix + "/".join(str(p) for p in path)
        flat[key] = np.asarray(leaf)
    return flat


def save_net(path: str, params: Any) -> None:
    np.savez(path, **_flatten_tree(params))


def load_net(path: str, template: Any) -> Any:
    data = np.load(path)
    leaves_t, treedef = jax.tree_util.tree_flatten_with_path(template)
    new_leaves = []
    for p, leaf in leaves_t:
        key = "/".join(str(x) for x in p)
        arr = data[key]
        assert arr.shape == leaf.shape, f"{key}: {arr.shape} != {leaf.shape}"
        new_leaves.append(jnp.asarray(arr))
    return jax.tree_util.tree_unflatten(treedef, [l for l in new_leaves])


def save_ply(
    directory: str,
    state: GaussianState,
    nets: Optional[Dict[str, Any]] = None,
    *,
    xyz_override: Optional[np.ndarray] = None,
    filename: str = "point_cloud.ply",
) -> str:
    """save_ply (gaussian_model.py:905-929).  Only alive rows are exported;
    `xyz_override` supports the per-timestep deformed dump (save_ply_t, :932)."""
    os.makedirs(directory, exist_ok=True)
    alive = np.asarray(state.alive)
    xyz = np.asarray(state.xyz if xyz_override is None else xyz_override)[alive]
    f_dc = np.asarray(state.f_dc)[alive]  # (N, 1, 3)
    f_rest = np.asarray(state.f_rest)[alive]  # (N, K-1, 3)
    opacity = np.asarray(state.opacity)[alive]
    scaling = np.asarray(state.scaling)[alive]
    rotation = np.asarray(state.rotation)[alive]

    n = xyz.shape[0]
    # channel-major flatten: (N, K, 3) -> (N, 3, K) -> (N, 3K)  (:909-910)
    dc_flat = np.transpose(f_dc, (0, 2, 1)).reshape(n, -1)
    rest_flat = np.transpose(f_rest, (0, 2, 1)).reshape(n, -1)

    names = ["x", "y", "z", "nx", "ny", "nz"]
    cols = [xyz[:, 0], xyz[:, 1], xyz[:, 2]] + [np.zeros(n, np.float32)] * 3
    for i in range(dc_flat.shape[1]):
        names.append(f"f_dc_{i}")
        cols.append(dc_flat[:, i])
    for i in range(rest_flat.shape[1]):
        names.append(f"f_rest_{i}")
        cols.append(rest_flat[:, i])
    names.append("opacity")
    cols.append(opacity[:, 0])
    for i in range(scaling.shape[1]):
        names.append(f"scale_{i}")
        cols.append(scaling[:, i])
    for i in range(rotation.shape[1]):
        names.append(f"rot_{i}")
        cols.append(rotation[:, i])

    path = os.path.join(directory, filename)
    write_ply(path, names, [np.ascontiguousarray(c, np.float32) for c in cols])

    if nets:
        for name in NET_FILES:
            if name in nets and nets[name] is not None:
                save_net(os.path.join(directory, f"{name}.npz"), nets[name])
    return path


def load_ply(
    path: str, capacity: int, sh_degree: int
) -> Tuple[GaussianState, int]:
    """load_ply (gaussian_model.py:965-1025) into a fixed-capacity state.

    Returns (state, active_sh_degree) with active_sh_degree = sh_degree (max),
    as the reference sets after loading (:1024)."""
    d = read_ply(path)
    xyz = np.stack([d["x"], d["y"], d["z"]], -1).astype(np.float32)
    n = xyz.shape[0]
    K = (sh_degree + 1) ** 2
    dc_names = sorted(
        [k for k in d if k.startswith("f_dc_")], key=lambda s: int(s.split("_")[-1])
    )
    rest_names = sorted(
        [k for k in d if k.startswith("f_rest_")], key=lambda s: int(s.split("_")[-1])
    )
    assert len(rest_names) == 3 * (K - 1), (len(rest_names), K)
    dc = np.stack([d[k] for k in dc_names], -1).reshape(n, 3, 1)
    if rest_names:
        rest = np.stack([d[k] for k in rest_names], -1).reshape(n, 3, K - 1)
    else:  # sh_degree 0: no f_rest_* properties exist
        rest = np.zeros((n, 3, 0), np.float32)
    opacity = d["opacity"].reshape(n, 1).astype(np.float32)
    scale_names = sorted(
        [k for k in d if k.startswith("scale_")], key=lambda s: int(s.split("_")[-1])
    )
    rot_names = sorted(
        [k for k in d if k.startswith("rot_")], key=lambda s: int(s.split("_")[-1])
    )
    scaling = np.stack([d[k] for k in scale_names], -1).astype(np.float32)
    rotation = np.stack([d[k] for k in rot_names], -1).astype(np.float32)

    assert n <= capacity, f"{n} gaussians exceed capacity {capacity}"

    def pad(x, fill=0.0):
        return np.pad(
            x, [(0, capacity - n)] + [(0, 0)] * (x.ndim - 1), constant_values=fill
        )

    rot_pad = pad(rotation)
    rot_pad[n:, 0] = 1.0  # dead slots: identity quats
    state = GaussianState(
        xyz=jnp.asarray(pad(xyz)),
        f_dc=jnp.asarray(pad(np.transpose(dc, (0, 2, 1)))),
        f_rest=jnp.asarray(pad(np.transpose(rest, (0, 2, 1)))),
        opacity=jnp.asarray(pad(opacity)),
        scaling=jnp.asarray(pad(scaling)),
        rotation=jnp.asarray(rot_pad),
        alive=jnp.asarray(pad(np.ones(n, bool), 0.0).astype(bool)),
        max_radii2d=jnp.zeros(capacity, jnp.float32),
        last_offset_norm=jnp.zeros(capacity, jnp.float32),
        xyz_gradient_accum=jnp.zeros((capacity, 1), jnp.float32),
        denom=jnp.zeros((capacity, 1), jnp.float32),
    )
    return state, sh_degree
