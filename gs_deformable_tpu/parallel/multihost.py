"""Multi-host initialization and host-sharded data feeding.

The reference is single-process (SURVEY.md section 5); this is the pod-slice
story (SURVEY.md M6): `jax.distributed.initialize` brings every host into one
runtime, the global mesh spans all chips, and the same shard_map train step in
parallel/sharding.py runs unchanged — XLA routes its collectives over ICI
inside a slice and DCN across slices.  Hosts feed only the cameras their data
replicas own (`local_data_indices`), so image bytes never cross DCN.
"""

from __future__ import annotations

import os
from typing import List, Optional

import jax
import numpy as np
from jax.sharding import Mesh


def initialize_from_env(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Join the multi-host runtime.  Arguments default to the standard
    JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID environment
    (auto-detected on Cloud TPU pods, where initialize() needs no args)."""
    kw = {}
    addr = coordinator_address or os.environ.get("JAX_COORDINATOR_ADDRESS")
    if addr:
        kw["coordinator_address"] = addr
    n = num_processes or os.environ.get("JAX_NUM_PROCESSES")
    if n:
        kw["num_processes"] = int(n)
    pid = process_id if process_id is not None else os.environ.get("JAX_PROCESS_ID")
    if pid is not None:
        kw["process_id"] = int(pid)
    jax.distributed.initialize(**kw)


def global_mesh(n_data: int, n_model: int) -> Mesh:
    """Mesh over all global devices.  The model axis is laid out within-host
    first so its all-gathers/reduce-scatters ride ICI; data replicas span
    hosts (their only cross-traffic is the small psum of parameter grads)."""
    devs = jax.devices()
    assert len(devs) == n_data * n_model, (len(devs), n_data, n_model)
    arr = np.array(devs).reshape(n_data, n_model)
    return Mesh(arr, ("data", "model"))


def local_data_indices(mesh: Mesh) -> List[int]:
    """Which data-axis rows this host feeds (rows whose devices are local)."""
    local = set(d.id for d in jax.local_devices())
    rows = []
    arr = np.array(mesh.devices)
    for i in range(arr.shape[0]):
        if any(d.id in local for d in arr[i]):
            rows.append(i)
    return rows
