"""Device mesh and sharding layouts for distributed training/inference.

The reference has no distributed support at all (SURVEY.md 2.3: one GPU,
one image per step, CUDA_VISIBLE_DEVICES selection). The TPU-native
scale-out is GSPMD over a `jax.sharding.Mesh`; the compiler inserts the
collectives, this module only decides the layouts:

* **Data parallelism** (the workhorse axis, ``'data'``): the image batch
  (and every per-image array: im_info, gt boxes, target masks) shards over
  ``'data'``; parameters/optimizer state are replicated; XLA inserts the
  gradient all-reduce over ICI when the jitted train step averages the loss
  across the sharded batch. Multi-host extends the same program over DCN
  via jax.distributed.initialize — no framework code changes.

* **Model parallelism** (optional second axis, ``'model'``): this ~100M-param
  CNN never *needs* TP for memory, but the hybrid layout buys step-time
  scaling past the point where DP's per-device batch hits 1 image — the
  regime the big-canvas res101-lg config actually reaches. Two placements
  ride the same axis at different depths of the program:

  - **Spatial partitioning (SP)** of the backbone: the image canvas's H dim
    shards over ``'model'``, so the conv stack (where ~90% of the FLOPs
    live) splits spatially and GSPMD inserts halo exchanges for the 3x3
    windows. The per-image detection stages (proposals/NMS/crop) consume
    gathered features — XLA places the all-gather where the spatial
    sharding ends.
  - **Tensor parallelism (TP)** of the RoI head: Megatron-style column/row
    split of the two big FC layers (vgg16 fc6/fc7, 119M params — the bulk
    of the model) and cout/cin splits of the res-tail bottleneck convs;
    one psum per pair, placed by GSPMD from the kernel shardings alone.

  GSPMD is semantics-preserving: every layout here computes bit-the-same
  math up to reduction order, pinned by tests/test_multichip.py equality
  tests against the single-device step.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["make_mesh", "make_hybrid_mesh", "data_sharding", "replicated",
           "shard_batch", "replicate", "shard_params", "shard_state",
           "data_axis_size", "model_axis_size", "DATA_AXIS", "MODEL_AXIS"]

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(n_devices: Optional[int] = None, devices=None) -> Mesh:
    """1-D data-parallel mesh over the first n devices."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.array(devices), (DATA_AXIS,))


def make_hybrid_mesh(data: Optional[int] = None, model: int = 1,
                     devices=None) -> Mesh:
    """2-D ('data', 'model') mesh: `data` × `model` devices.

    model devices are adjacent in the device list so TP/SP collectives ride
    the fastest ICI links (jax orders devices by torus coordinates).
    ``model == 1`` degenerates to the 1-D data mesh so callers can pass the
    config value straight through.
    """
    if devices is None:
        devices = jax.devices()
    if model <= 1:
        return make_mesh(data, devices=devices)
    if data is None:
        data = len(devices) // model
    need = data * model
    if len(devices) < need:
        raise ValueError(f"hybrid mesh {data}x{model} needs {need} devices, "
                         f"have {len(devices)}")
    grid = np.array(devices[:need]).reshape(data, model)
    return Mesh(grid, (DATA_AXIS, MODEL_AXIS))


def data_axis_size(mesh: Mesh) -> int:
    return mesh.shape.get(DATA_AXIS, 1)


def model_axis_size(mesh: Mesh) -> int:
    return mesh.shape.get(MODEL_AXIS, 1)


def data_sharding(mesh: Mesh, ndim: int) -> NamedSharding:
    """Shard the leading (batch) dim over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS, *([None] * (ndim - 1))))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def _place(mesh: Mesh, x, sharding: NamedSharding):
    """Put one host array with an arbitrary sharding, multi-process safe.

    Single-process: a plain device_put. Multi-process: every process holds
    the same full host value (seeded init / restored snapshot), so each
    addressable shard is materialized by slicing it out locally — no
    cross-host data movement, works for replicated and split specs alike.
    """
    if jax.process_count() > 1:
        x = np.asarray(x)
        return jax.make_array_from_callback(x.shape, sharding,
                                            lambda idx: x[idx])
    return jax.device_put(x, sharding)


def shard_batch(mesh: Mesh, tree, spatial: bool = False):
    """Place a pytree of batched arrays with the batch dim sharded.

    spatial: additionally shard the image canvas's H dim (axis 1 of the
    4-D 'image' entry) over the 'model' axis — backbone spatial
    partitioning. Applied only when the mesh has a model axis, H divides
    evenly, and the run is single-process (halos across DCN would be far
    slower than the conv they save).

    Multi-process: each process passes its LOCAL slice of the global batch
    (data/loader.py process slicing); the global array is assembled without
    any cross-host data movement.
    """
    n_model = model_axis_size(mesh)

    def spec_for(path, x):
        ndim = np.ndim(x)
        if (spatial and _path_str(path).endswith("image") and ndim == 4
                and n_model > 1 and jax.process_count() == 1
                and x.shape[1] % n_model == 0):
            return NamedSharding(mesh, P(DATA_AXIS, MODEL_AXIS, None, None))
        return data_sharding(mesh, ndim)

    if jax.process_count() > 1:
        return jax.tree_util.tree_map_with_path(
            lambda p, x: jax.make_array_from_process_local_data(
                spec_for(p, x), np.asarray(x)), tree)
    return jax.tree_util.tree_map_with_path(
        lambda p, x: jax.device_put(x, spec_for(p, x)), tree)


def replicate(mesh: Mesh, tree):
    """Replicate a pytree over the mesh. Multi-process: every process must
    hold the same host value (guaranteed by the seeded init / restored
    snapshot)."""
    sh = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: _place(mesh, x, sh), tree)


# --- tensor-parallel parameter layout -------------------------------------
#
# Rules are keyed by path substrings so the SAME table places params,
# gradients, and the optimizer's momentum trace (whose tree paths embed the
# param paths). Everything unmatched is replicated. Kernel layouts:
#
# vgg16 RoI head (models/vgg16.py tail; 25088x4096 + 4096x4096 = 119M of the
# model's ~137M params): Megatron pair — fc6 column-split (out dim + bias
# over 'model'; the ReLU/dropout between run on the sharded activation),
# fc7 row-split (in dim over 'model'; GSPMD inserts the single psum), fc7
# bias replicated and added after the reduce.
#
# resnet RoI tail (models/resnet_v1.py block4 bottlenecks): per unit,
# conv1 cout-split (its frozen-BN affine splits with it, the ReLU stays
# sharded), conv2 cin-split (consumes the sharded activation; psum after),
# conv3/shortcut replicated — one reduce per unit, same shape as Megatron's
# conv pair.
#
# mobilenet tail: a single depthwise-separable block whose pointwise conv is
# 512x1024 — too small for TP to beat its own collective; replicated.
_VGG_TP = (
    ("tail/fc6/kernel", P(None, MODEL_AXIS)),
    ("tail/fc6/bias", P(MODEL_AXIS)),
    ("tail/fc7/kernel", P(MODEL_AXIS, None)),
)
_RES_TP = (
    ("conv1/conv/kernel", P(None, None, None, MODEL_AXIS)),
    ("conv1/bn/scale", P(MODEL_AXIS)),
    ("conv1/bn/bias", P(MODEL_AXIS)),
    ("conv1/bn/mean", P(MODEL_AXIS)),
    ("conv1/bn/var", P(MODEL_AXIS)),
    ("conv2/conv/kernel", P(None, None, MODEL_AXIS, None)),
)


def _path_str(path) -> str:
    parts = []
    for p in path:
        if hasattr(p, "key"):
            parts.append(str(p.key))
        elif hasattr(p, "name"):
            parts.append(str(p.name))
        elif hasattr(p, "idx"):
            parts.append(str(p.idx))
        else:
            parts.append(str(p))
    return "/".join(parts)


def tp_pspec(path: str, backbone: str) -> P:
    """PartitionSpec for one leaf of a params-shaped tree (params, grads,
    momentum), keyed by its flattened tree path."""
    if backbone == "vgg16":
        for pat, spec in _VGG_TP:
            if pat in path:
                return spec
    elif backbone.startswith("res"):
        if "tail/block4/" in path:
            for pat, spec in _RES_TP:
                if path.endswith(pat):
                    return spec
    return P()


def shard_params(mesh: Mesh, tree, backbone: Optional[str] = None):
    """Place a params pytree with the TP layout (replicated when the mesh
    has no model axis or the backbone has no TP rules)."""
    if model_axis_size(mesh) == 1 or backbone is None:
        return replicate(mesh, tree)

    def put(path, x):
        spec = tp_pspec(_path_str(path), backbone)
        return _place(mesh, x, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map_with_path(put, tree)


def shard_state(mesh: Mesh, state, backbone: Optional[str] = None):
    """Place a TrainState: params AND the momentum trace follow the TP
    layout (the trace's tree paths embed the param paths, so one rule table
    places both); step/key/schedule counters are replicated."""
    if model_axis_size(mesh) == 1 or backbone is None:
        return replicate(mesh, state)

    def put(path, x):
        spec = tp_pspec(_path_str(path), backbone)
        return _place(mesh, x, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map_with_path(put, state)
