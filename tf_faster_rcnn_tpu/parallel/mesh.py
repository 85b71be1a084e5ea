"""Device mesh and sharding layout for data-parallel training/inference.

The reference has no distributed support at all (SURVEY.md 2.3: one GPU,
one image per step, CUDA_VISIBLE_DEVICES selection). The TPU-native scale-out
is single-program data parallelism over a jax.sharding.Mesh: the image batch
(and every per-image array: im_info, gt boxes, target masks) is sharded over
the 'data' axis, parameters and optimizer state are replicated, and XLA
inserts the gradient all-reduce over ICI when the jitted train step averages
the loss across the sharded batch. Multi-host extends the same program over
DCN via jax.distributed.initialize — no framework code changes.

TP/PP/SP/EP are documented out of scope for this ~100M-param CNN workload
(SURVEY.md 2.3); the sharding layout here is what composes: all kernel code
is per-image (vmapped), so any future axis splits cleanly.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["make_mesh", "data_sharding", "replicated", "shard_batch",
           "DATA_AXIS"]

DATA_AXIS = "data"


def make_mesh(n_devices: Optional[int] = None, devices=None) -> Mesh:
    """1-D data-parallel mesh over the first n devices."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.array(devices), (DATA_AXIS,))


def data_sharding(mesh: Mesh, ndim: int) -> NamedSharding:
    """Shard the leading (batch) dim over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS, *([None] * (ndim - 1))))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, tree):
    """Place a pytree of batched arrays with the batch dim sharded.

    Multi-process: each process passes its LOCAL slice of the global batch
    (data/loader.py process slicing); the global array is assembled without
    any cross-host data movement.
    """
    if jax.process_count() > 1:
        return jax.tree_util.tree_map(
            lambda x: jax.make_array_from_process_local_data(
                data_sharding(mesh, np.ndim(x)), np.asarray(x)), tree)
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, data_sharding(mesh, x.ndim)), tree)


def replicate(mesh: Mesh, tree):
    """Replicate a pytree over the mesh. Multi-process: every process must
    hold the same host value (guaranteed by the seeded init / restored
    snapshot)."""
    if jax.process_count() > 1:
        return jax.tree_util.tree_map(
            lambda x: jax.make_array_from_process_local_data(
                replicated(mesh), np.asarray(x)), tree)
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, replicated(mesh)), tree)
