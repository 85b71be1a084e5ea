"""Test-time detection: decode, per-class NMS, global cap — all on-device.

Reference flow (/root/reference/lib/model/test.py:86-180): im_detect decodes
per-class boxes on the host, then a per-class *host loop* calls the CUDA NMS
kernel once per class (:162-170), then a global max_per_image=100 cap
(:172-180). Here the whole postprocess is one fixed-shape jitted function:
class-wise NMS is a vmap over classes (legacy +1 IoU like the reference's
gpu_nms path), the cap is a top-k over the masked class-score table, and the
output is a fixed [max_per_image, 6] slab with a validity mask.
"""

from __future__ import annotations

import functools
import jax
import jax.numpy as jnp

from tf_faster_rcnn_tpu.ops.boxes import bbox_transform_inv, clip_boxes
from tf_faster_rcnn_tpu.ops.nms import sorted_nms

__all__ = ["postprocess_detections", "multiclass_nms"]


def multiclass_nms(boxes, scores, valid, nms_thresh, *, plus_one=True,
                   score_thresh=0.0):
    """Per-class NMS keep mask for one image.

    boxes: [C, R, 4] per-class decoded boxes (class 0 = background excluded
    by the caller); scores: [C, R]; valid: [C, R]. Returns keep [C, R] bool.
    Suppression follows the reference gpu_nms semantics (+1 IoU, suppress at
    iou > thresh). score_thresh reproduces the `scores > thresh` pre-filter
    (test.py:161, default 0.0 — with softmax probs this keeps everything).
    """
    r = boxes.shape[1]

    def one_class(b, s, v):
        v = v & (s > score_thresh)
        # many small NMS instances: the batched-jnp path vectorizes across
        # the vmap (classes x batch) while vmapped Pallas kernels serialize
        # into per-instance launches (measured 6.5 ms vs 57 ms for 160
        # instances of 300 boxes on v5e)
        idx, ok = sorted_nms(b, s, v, nms_thresh, r, plus_one=plus_one,
                             suppress_eq=False, use_pallas=False)
        # padded slots alias a real index (ok=False); route them out of
        # range so mode="drop" discards them instead of clobbering
        safe_idx = jnp.where(ok, idx, r)
        return jnp.zeros((r,), bool).at[safe_idx].set(True, mode="drop")

    return jax.vmap(one_class)(boxes, scores, valid)


@functools.partial(jax.jit, static_argnames=("num_classes", "max_per_image",
                                             "nms_thresh", "score_thresh"))
def postprocess_detections(rois, roi_valid, cls_prob, bbox_pred, im_info,
                           orig_hw, *, num_classes: int,
                           max_per_image: int = 100,
                           nms_thresh: float = 0.3,
                           score_thresh: float = 0.0):
    """Full batched postprocess.

    rois: [B, R, 4] proposals in scaled-image coords; roi_valid: [B, R];
    cls_prob: [B, R, K]; bbox_pred: [B, R, 4K] (already un-normalized by the
    TEST graph); im_info: [B, 3] (h_scaled, w_scaled, scale); orig_hw:
    [B, 2] exact original image (h, w) for the clip (test.py:105).

    Returns (detections [B, max_per_image, 6] as (cls, score, x1, y1, x2,
    y2) in original-image coords, valid [B, max_per_image]).
    """
    k = num_classes

    def one(rois_i, rv_i, prob_i, pred_i, info_i, ohw_i):
        boxes = rois_i / info_i[2]                       # back to orig coords
        pred = bbox_transform_inv(boxes, pred_i)         # [R, 4K]
        pred = clip_boxes(pred, ohw_i)
        r = rois_i.shape[0]
        pb = pred.reshape(r, k, 4).transpose(1, 0, 2)    # [K, R, 4]
        ps = prob_i.transpose(1, 0)                      # [K, R]
        # drop background class 0
        pb, ps = pb[1:], ps[1:]
        v = jnp.broadcast_to(rv_i[None, :], ps.shape)
        keep = multiclass_nms(pb, ps, v, nms_thresh, plus_one=True,
                              score_thresh=score_thresh)
        masked = jnp.where(keep, ps, -jnp.inf)           # [K-1, R]
        flat = masked.reshape(-1)
        top_s, top_i = jax.lax.top_k(flat, max_per_image)
        cls_idx = top_i // r + 1                         # back to 1-based cls
        box_idx = top_i % r
        out_boxes = pb.reshape(-1, 4)[top_i]
        det = jnp.concatenate(
            [cls_idx[:, None].astype(jnp.float32), top_s[:, None], out_boxes],
            axis=1)
        dv = jnp.isfinite(top_s)
        det = jnp.where(dv[:, None], det, 0.0)
        return det, dv

    return jax.vmap(one)(rois, roi_valid, cls_prob, bbox_pred, im_info,
                         orig_hw)
