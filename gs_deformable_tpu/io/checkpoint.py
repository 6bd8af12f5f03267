"""Training checkpoints: the capture/restore surface of the reference.

The reference saves ``(gaussians.capture(), iteration)`` — param tensors,
densification stats, optimizer state, spatial_lr_scale — plus five separate
deformation-net state dicts (train.py:685-697, gaussian_model.py:686-729).
Here the whole TrainState is one pytree; it is flattened path-wise into a
single compressed .npz (portable numpy, no pickle of code objects).
"""

from __future__ import annotations

import os
from typing import Any, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _key(path) -> str:
    return "/".join(str(p) for p in path)


def save_checkpoint(path: str, tree: Any, iteration: int) -> None:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    leaves = jax.tree_util.tree_flatten_with_path(tree)[0]
    payload = {_key(p): np.asarray(v) for p, v in leaves}
    payload["__iteration__"] = np.asarray(iteration)
    np.savez_compressed(path, **payload)


def load_checkpoint(path: str, template: Any) -> Tuple[Any, int]:
    """Restore into the structure of ``template`` (shapes must match — the
    capacity is part of the config, as the reference's restore re-runs
    training_setup with the saved tensors, gaussian_model.py:702-728)."""
    data = np.load(path, allow_pickle=False)
    leaves_t, treedef = jax.tree_util.tree_flatten_with_path(template)
    new_leaves = []
    for p, leaf in leaves_t:
        k = _key(p)
        if k not in data:
            # Fields added after the checkpoint was written (e.g. transient
            # densify inputs) keep the template value.
            new_leaves.append(leaf)
            continue
        arr = data[k]
        assert arr.shape == np.shape(leaf), f"{k}: {arr.shape} vs {np.shape(leaf)}"
        new_leaves.append(jnp.asarray(arr))
    tree = jax.tree_util.tree_unflatten(treedef, new_leaves)
    return tree, int(data["__iteration__"])
