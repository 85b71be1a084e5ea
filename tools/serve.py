#!/usr/bin/env python
"""Run detection from an exported serving bundle — no config, no model code.

Counterpart to tools/export_model.py: everything needed to serve (canvas
buckets, resize targets, pixel means, the compiled programs, the params)
comes from the bundle's manifest, exercising the self-containment contract
of utils/serving.py. Images are batched per orientation bucket exactly
like engine/test_engine.test_net schedules them.

    python tools/serve.py --bundle exported/ image1.jpg image2.jpg ...
    python tools/serve.py --bundle exported/ --thresh 0.8 --json out.json ...
"""

import argparse
import json

import _init_paths  # noqa: F401
import numpy as np


def _prep(path, manifest):
    """Manifest-driven host prep: BGR read, mean-subtract, shortest-side
    resize, bucket pick. Returns (bucket_hw, image, (h, w, scale), orig_hw).
    """
    from tf_faster_rcnn_tpu.data.blob import (place_on_canvas,
                                              prep_im_for_blob,
                                              read_image_bgr)
    im = read_image_bgr(path)
    orig_hw = (float(im.shape[0]), float(im.shape[1]))
    means = np.array(manifest["pixel_means"], np.float32).reshape(1, 1, 3)
    prepped, scale = prep_im_for_blob(im, means, manifest["scales"][0],
                                      manifest["max_size"])
    h, w = prepped.shape[:2]
    fits = [e for e in manifest["artifacts"]
            if e["canvas"][0] >= h and e["canvas"][1] >= w]
    assert fits, f"{path}: resized {h}x{w} fits no exported canvas"
    entry = min(fits, key=lambda e: e["canvas"][0] * e["canvas"][1])
    canvas = np.zeros(entry["image_shape"][1:], np.float32)
    h, w = place_on_canvas(canvas, prepped, entry["space_to_depth"])
    return (tuple(entry["canvas"]), canvas, (float(h), float(w), scale),
            orig_hw)


def main(argv=None):
    ap = argparse.ArgumentParser(description="Serve from an export bundle")
    ap.add_argument("--bundle", required=True, help="export_model.py output")
    ap.add_argument("--thresh", type=float, default=0.5,
                    help="score threshold for printing")
    ap.add_argument("--json", default=None, help="write detections here")
    ap.add_argument("images", nargs="+")
    args = ap.parse_args(argv)

    from tf_faster_rcnn_tpu.utils.serving import load_detect
    manifest, fns = load_detect(args.bundle)
    b = manifest["batch"]
    dtype = np.dtype(manifest["transfer_dtype"])

    # group paths by orientation bucket (a cheap size probe, no decode),
    # then prep one fixed-size batch at a time so memory stays bounded at
    # the batch size; the tail repeats the last image
    def _bucket_of(path):
        from PIL import Image
        with Image.open(path) as im:   # header-only size read
            w, h = im.size
        buckets = [tuple(e["canvas"]) for e in manifest["artifacts"]]
        if len(buckets) == 1:
            return buckets[0]
        return buckets[0] if w >= h else buckets[1]

    groups = {}
    for p in args.images:
        groups.setdefault(_bucket_of(p), []).append(p)
    results = {}
    for bucket, paths in groups.items():
        for i in range(0, len(paths), b):
            chunk = paths[i:i + b]
            rows = [_prep(p, manifest) for p in chunk]
            rows += [rows[-1]] * (b - len(chunk))
            assert all(r[0] == bucket for r in rows[:len(chunk)])
            image = np.stack([r[1] for r in rows]).astype(dtype)
            im_info = np.array([r[2] for r in rows], np.float32)
            orig_hw = np.array([r[3] for r in rows], np.float32)
            det, dv = fns[bucket](image, im_info, orig_hw)
            det, dv = np.asarray(det), np.asarray(dv)
            for j, path in enumerate(chunk):
                keep = dv[j] & (det[j, :, 1] >= args.thresh)
                results[path] = det[j][keep].tolist()

    for path in args.images:
        rows = results[path]
        print(f"{path}: {len(rows)} detections >= {args.thresh}")
        for cls, score, x1, y1, x2, y2 in rows:
            print(f"  class {int(cls):3d}  {score:.3f}  "
                  f"[{x1:.1f}, {y1:.1f}, {x2:.1f}, {y2:.1f}]")
    if args.json:
        with open(args.json, "w") as f:
            json.dump(results, f, indent=2)
        print(f"wrote {args.json}")


if __name__ == "__main__":
    main()
