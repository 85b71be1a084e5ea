"""Subprocess oracle: run real TensorFlow ops on serialized cases.

Run as ``python tf_oracle.py <cases.npz> <out.npz>``. Three case kinds,
keyed by array-name prefix:

* ``crop{i}_``: image [H,W,C], boxes [R,4] normalized (y1,x1,y2,x2),
  size [2] -> ``crop{i}_out`` from ``tf.image.crop_and_resize`` (bilinear,
  extrapolation_value=0) — the op behind the reference's RoI pooling
  (/root/reference/lib/nets/network.py:141-157, resnet_v1.py:55-76).
* ``nms{i}_``: boxes [N,4] (x1,y1,x2,y2), scores [N], params
  [max_out, iou_thresh] -> ``nms{i}_idx`` from
  ``tf.image.non_max_suppression`` — the op behind the reference's default
  E2E proposal path (lib/layer_utils/proposal_layer.py:72).
* ``post{i}_``: boxes [R,4K] (pre-decoded per-class), scores [R,K], params
  [max_per_image, nms_thresh, score_thresh] -> ``post{i}_dets`` [D,6] as
  (cls, score, x1, y1, x2, y2) — the reference's ENTIRE test-time
  detection protocol (lib/model/test.py:160-180: strict > score threshold,
  per-class NMS, max_per_image cap as a score threshold) executed with
  real ``tf.image.non_max_suppression`` as the engine.
* ``prop{i}_``: anchors [N,4], deltas [N,4], scores [N], iminfo [3],
  params [post_nms, iou_thresh] -> ``prop{i}_boxes`` [K,4] and
  ``prop{i}_scores`` [K], produced by the REFERENCE'S OWN TF functions
  ``bbox_transform_inv_tf`` / ``clip_boxes_tf`` (imported read-only from
  /root/reference/lib/model/bbox_transform.py:85-115) chained into
  ``tf.image.non_max_suppression`` exactly as ``proposal_layer_tf`` does
  (lib/layer_utils/proposal_layer.py:56-83). This is the branch that
  produced the published mAPs (cfg.USE_E2E_TF defaults True).

Kept in a subprocess so TensorFlow never loads into the pytest/JAX process.
"""

import os
import sys

os.environ["CUDA_VISIBLE_DEVICES"] = "-1"
os.environ["TF_CPP_MIN_LOG_LEVEL"] = "3"

import importlib.util

import numpy as np

REF_BBOX_TRANSFORM = "/root/reference/lib/model/bbox_transform.py"


def _load_reference_bbox_transform():
    """Load the reference module by file path: its package __init__ imports
    config (needs easydict, absent here), but the module itself only needs
    numpy and tf."""
    spec = importlib.util.spec_from_file_location(
        "ref_bbox_transform", REF_BBOX_TRANSFORM)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def main():
    src, dst = sys.argv[1], sys.argv[2]
    import tensorflow as tf

    ref = _load_reference_bbox_transform()
    bbox_transform_inv_tf, clip_boxes_tf = (
        ref.bbox_transform_inv_tf, ref.clip_boxes_tf)

    cases = dict(np.load(src, allow_pickle=False))
    out = {}
    idx = sorted({k.split("_", 1)[0] for k in cases})
    for tag in idx:
        a = lambda leaf: cases[f"{tag}_{leaf}"]
        if tag.startswith("crop"):
            boxes = a("boxes")
            res = tf.image.crop_and_resize(
                a("image")[None], boxes,
                box_indices=np.zeros(len(boxes), np.int32),
                crop_size=[int(s) for s in a("size")],
                method="bilinear", extrapolation_value=0.0)
            out[f"{tag}_out"] = res.numpy()
        elif tag.startswith("nms"):
            max_out, thresh = a("params")
            keep = tf.image.non_max_suppression(
                a("boxes"), a("scores"),
                max_output_size=int(max_out), iou_threshold=float(thresh))
            out[f"{tag}_idx"] = keep.numpy().astype(np.int32)
        elif tag.startswith("post"):
            # The reference's whole test-time detection protocol
            # (lib/model/test.py:160-180) run over REAL TF NMS: per-class
            # strict score threshold, per-class NMS at TEST.NMS, then the
            # global max_per_image cap realized as a score threshold.
            # Inputs are pre-decoded per-class boxes (decode/clip is the
            # prop{i}_ kind's business).
            boxes = a("boxes")          # [R, 4K]
            scores = a("scores")        # [R, K]
            max_per, nms_thr, score_thr = a("params")
            k = scores.shape[1]
            all_dets = []
            for j in range(1, k):
                inds = np.where(scores[:, j] > score_thr)[0]
                cls_boxes = boxes[inds, j * 4:(j + 1) * 4]
                cls_scores = scores[inds, j]
                keep = tf.image.non_max_suppression(
                    cls_boxes, cls_scores,
                    max_output_size=len(inds),
                    iou_threshold=float(nms_thr)).numpy()
                for kk in keep:
                    all_dets.append((float(j), float(cls_scores[kk]),
                                     *cls_boxes[kk].tolist()))
            dets = np.array(all_dets, np.float32).reshape(-1, 6)
            if max_per > 0 and len(dets) > int(max_per):
                image_thresh = np.sort(dets[:, 1])[-int(max_per)]
                dets = dets[dets[:, 1] >= image_thresh]
            out[f"{tag}_dets"] = dets
        elif tag.startswith("prop"):
            post_nms, thresh = a("params")
            proposals = bbox_transform_inv_tf(
                tf.constant(a("anchors")), tf.constant(a("deltas")))
            proposals = clip_boxes_tf(proposals, a("iminfo")[:2])
            keep = tf.image.non_max_suppression(
                proposals, a("scores"),
                max_output_size=int(post_nms), iou_threshold=float(thresh))
            out[f"{tag}_boxes"] = tf.gather(proposals, keep).numpy()
            out[f"{tag}_scores"] = tf.gather(a("scores"), keep).numpy()
            out[f"{tag}_decoded"] = proposals.numpy()
        else:
            raise ValueError(f"unknown case kind {tag}")
    np.savez(dst, **out)
    print(f"tf_oracle: {len(idx)} cases -> {dst}")


if __name__ == "__main__":
    main()
