"""Portable serving artifacts for the detect program (jax.export).

The reference has no deployment story — its TEST path is a live TF session
driven by python (lib/model/test.py). The TPU-native equivalent is
ahead-of-time compilation: the full batched detect program (backbone +
proposals + per-class NMS postprocess) is lowered to versioned StableHLO,
one artifact per static canvas bucket, alongside the trained parameters.
The result is a self-contained directory a serving process can load and
call without the model code, the config system, or the checkpoint — only
jax (and flax's msgpack codec) and the artifact bytes.

Parameters travel as an INPUT of the exported function, not as baked-in
constants: XLA constant-folds literal weights with different operation
associativity than the runtime program, which perturbs scores in the last
bits and reorders near-tied detections — params-as-arguments keeps the
exported program bit-identical to the live engine (asserted in
tests/test_export.py).

Layout of an export directory:

    manifest.json                  — net, class count, batch, io contract
    params.msgpack                 — flax-serialized parameter pytree
    detect_<H>x<W>.shlo            — serialized jax.export.Exported,
                                     one per canvas bucket

Inputs per artifact (shapes fixed at export):
    image   [B, H, W, 3] (or the space-to-depth layout [B, H/2, W/2, 12]
            when the manifest says so) in the transfer dtype;
    im_info [B, 3] (h_scaled, w_scaled, scale);
    orig_hw [B, 2] original image extents.
Outputs: detections [B, max_per_image, 6] (cls, score, x1, y1, x2, y2 in
original-image coordinates) and a validity mask [B, max_per_image] —
identical to engine/test_engine.make_detect_fn.
"""

from __future__ import annotations

import json
import os
from typing import Dict, Optional, Tuple

import numpy as np

MANIFEST = "manifest.json"
_FORMAT = "tf_faster_rcnn_tpu.detect/1"


def export_detect(model, spec, params, out_dir: str, batch: int, *,
                  max_per_image: Optional[int] = None,
                  score_thresh: float = 0.0,
                  platforms=None) -> dict:
    """Write one StableHLO artifact per TEST canvas bucket; returns the
    manifest dict. ``platforms`` (e.g. ("tpu",) or ("tpu", "cpu")) defaults
    to the current backend's export platform."""
    import jax
    from jax import export as jexport

    from tf_faster_rcnn_tpu.config import canvas_buckets, cfg
    from tf_faster_rcnn_tpu.data.blob import batch_image_shape, transfer_dtype
    from tf_faster_rcnn_tpu.engine.test_engine import make_detect_fn

    from tf_faster_rcnn_tpu.utils.checkpoint import save_params

    detect = make_detect_fn(model, spec, max_per_image, score_thresh)
    os.makedirs(out_dir, exist_ok=True)
    save_params(os.path.join(out_dir, "params.msgpack"), params)
    param_specs = jax.tree_util.tree_map(
        lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype), params)

    entries = []
    for canvas in canvas_buckets(cfg.TEST):
        img_shape, s2d = batch_image_shape(batch, canvas)
        arg_specs = (
            param_specs,
            jax.ShapeDtypeStruct(img_shape, transfer_dtype()),
            jax.ShapeDtypeStruct((batch, 3), np.float32),
            jax.ShapeDtypeStruct((batch, 2), np.float32),
        )
        exported = jexport.export(jax.jit(detect),
                                  platforms=platforms)(*arg_specs)
        name = f"detect_{canvas[0]}x{canvas[1]}.shlo"
        with open(os.path.join(out_dir, name), "wb") as f:
            f.write(exported.serialize())
        entries.append({
            "canvas": [int(canvas[0]), int(canvas[1])],
            "file": name,
            "image_shape": [int(d) for d in img_shape],
            "space_to_depth": bool(s2d),
        })

    # which NMS lowering went into the artifacts: the RPN NMS dispatch was
    # snapshotted into ModelSpec when the spec was built (network.py:129),
    # and it only resolves to Pallas on a TPU trace host — so exporting
    # from a CPU host (including a multi-platform ("cpu","tpu") export)
    # embeds the portable jnp block NMS (identical results); export on a
    # TPU host to embed the Pallas kernel for peak postprocess speed.
    from tf_faster_rcnn_tpu.ops.nms import _pallas_available
    manifest = {
        "format": _FORMAT,
        "net": type(model).__name__,
        "pallas_nms": bool(getattr(spec, "use_pallas_nms", False))
                      and _pallas_available(),
        "num_classes": int(spec.num_classes),
        "batch": int(batch),
        "max_per_image": int(max_per_image or cfg.TPU.MAX_PER_IMAGE),
        "nms_thresh": float(cfg.TEST.NMS),
        "transfer_dtype": np.dtype(transfer_dtype()).name,
        "platforms": list(platforms) if platforms else None,
        "scales": [int(s) for s in cfg.TEST.SCALES],
        "max_size": int(cfg.TEST.MAX_SIZE),
        "pixel_means": np.asarray(cfg.PIXEL_MEANS).reshape(3).tolist(),
        "artifacts": entries,
    }
    with open(os.path.join(out_dir, MANIFEST), "w") as f:
        json.dump(manifest, f, indent=2)
    return manifest


def load_detect(out_dir: str) -> Tuple[dict, Dict[tuple, object]]:
    """Load an export directory -> (manifest, {(H, W): callable}).

    Each callable takes (image, im_info, orig_hw) — the shipped params are
    bound at load time — is jit-compatible, and runs under the current jax
    backend (which must be one of the artifact's platforms)."""
    import functools

    from flax import serialization
    from jax import export as jexport

    with open(os.path.join(out_dir, MANIFEST)) as f:
        manifest = json.load(f)
    if manifest.get("format") != _FORMAT:
        raise ValueError(f"not a detect export dir: {out_dir!r} "
                         f"(format {manifest.get('format')!r})")
    with open(os.path.join(out_dir, "params.msgpack"), "rb") as f:
        params = serialization.msgpack_restore(f.read())
    fns = {}
    for entry in manifest["artifacts"]:
        with open(os.path.join(out_dir, entry["file"]), "rb") as f:
            call = jexport.deserialize(f.read()).call
        fns[tuple(entry["canvas"])] = functools.partial(call, params)
    return manifest, fns
