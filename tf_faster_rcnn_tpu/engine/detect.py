"""Test-time detection: decode, per-class NMS, global cap — all on-device.

Reference flow (/root/reference/lib/model/test.py:86-180): im_detect decodes
per-class boxes on the host, then a per-class *host loop* calls the CUDA NMS
kernel once per class (:162-170), then a global max_per_image=100 cap
(:172-180). Here the whole postprocess is one fixed-shape jitted function
and all batch x class NMS problems run as ONE batched Pallas kernel launch
(instances in lanes, boxes in sublanes — see ops/pallas_nms.py
pallas_batched_nms_keep); the cap is a top-k over the masked class-score
table and the output is a fixed [max_per_image, 6] slab with a validity
mask. Off-TPU the NMS core falls back to the vectorized jnp block NMS.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax

from tf_faster_rcnn_tpu.ops.boxes import (BBOX_XFORM_CLIP,
                                          bbox_transform_inv, clip_boxes)
from tf_faster_rcnn_tpu.ops.nms import nms_keep_mask, sorted_nms

__all__ = ["postprocess_detections", "multiclass_nms"]


def _batched_keep(sorted_boxes, sorted_valid, nms_thresh, plus_one,
                  use_pallas=None):
    """Exact greedy keep masks for G score-sorted instances [G, N].

    use_pallas=None resolves from cfg at trace time (make_detect_fn builds
    the program once, so this is the build-time snapshot semantics the rest
    of the config uses)."""
    from tf_faster_rcnn_tpu.ops.nms import _pallas_available
    if use_pallas is None:
        from tf_faster_rcnn_tpu.config import cfg
        use_pallas = bool(cfg.TPU.USE_PALLAS_NMS)
    if use_pallas and _pallas_available():
        from tf_faster_rcnn_tpu.ops.pallas_nms import pallas_batched_nms_keep
        return pallas_batched_nms_keep(sorted_boxes, sorted_valid,
                                       float(nms_thresh), plus_one=plus_one,
                                       suppress_eq=False)
    fn = jax.vmap(lambda b, v: nms_keep_mask(
        b, v, nms_thresh, plus_one=plus_one, suppress_eq=False,
        use_pallas=False))
    return fn(sorted_boxes, sorted_valid)


def multiclass_nms(boxes, scores, valid, nms_thresh, *, plus_one=True,
                   score_thresh=0.0):
    """Per-class NMS keep mask for one image (kept for API/tests; the
    batched postprocess below is the production path).

    boxes: [C, R, 4]; scores: [C, R]; valid: [C, R]. Returns keep [C, R]
    bool in the ORIGINAL box order. Suppression follows the reference
    gpu_nms semantics (+1 IoU, suppress at iou > thresh).
    """
    r = boxes.shape[1]

    def one_class(b, s, v):
        v = v & (s > score_thresh)
        idx, ok = sorted_nms(b, s, v, nms_thresh, r, plus_one=plus_one,
                             suppress_eq=False, use_pallas=False)
        safe_idx = jnp.where(ok, idx, r)
        return jnp.zeros((r,), bool).at[safe_idx].set(True, mode="drop")

    return jax.vmap(one_class)(boxes, scores, valid)


@functools.partial(jax.jit, static_argnames=("num_classes", "max_per_image",
                                             "nms_thresh", "score_thresh",
                                             "use_pallas", "bbox_reg",
                                             "plus_one"))
def postprocess_detections(rois, roi_valid, cls_prob, bbox_pred, im_info,
                           orig_hw, *, num_classes: int,
                           max_per_image: int = 100,
                           nms_thresh: float = 0.3,
                           score_thresh: float = 0.0,
                           use_pallas=None,
                           plus_one: bool = True,
                           bbox_reg: bool = True):
    """Full batched postprocess.

    rois: [B, R, 4] proposals in scaled-image coords; roi_valid: [B, R];
    cls_prob: [B, R, K]; bbox_pred: [B, R, 4K] (already un-normalized by the
    TEST graph); im_info: [B, 3] (h_scaled, w_scaled, scale); orig_hw:
    [B, 2] exact original image (h, w) for the clip (test.py:105).

    Returns (detections [B, max_per_image, 6] as (cls, score, x1, y1, x2,
    y2) in original-image coords, valid [B, max_per_image]).
    """
    k = num_classes
    b, r, _ = rois.shape
    kc = k - 1  # foreground classes

    boxes = rois / im_info[:, 2][:, None, None]      # back to orig coords
    if bbox_reg:
        pred = bbox_transform_inv(boxes, bbox_pred,
                                  xform_clip=BBOX_XFORM_CLIP)  # [B, R, 4K]
        pred = clip_boxes(pred, orig_hw)
    else:
        # TEST.BBOX_REG=False: every class scores the raw proposal box
        # (reference test.py:100-104 tiles, and does not re-clip)
        pred = jnp.tile(boxes, (1, 1, k))
    pb = pred.reshape(b, r, k, 4).transpose(0, 2, 1, 3)[:, 1:]  # [B,kc,R,4]
    ps = cls_prob.transpose(0, 2, 1)[:, 1:]                     # [B,kc,R]
    pv = roi_valid[:, None, :] & (ps > score_thresh)

    g = b * kc
    fb = pb.reshape(g, r, 4)
    fs = ps.reshape(g, r)
    fv = pv.reshape(g, r)

    # sort each instance by descending score (lax.top_k batches natively)
    neg = jnp.float32(-1.0e10)
    masked_scores = jnp.where(fv, fs, neg)
    top_s, order = lax.top_k(masked_scores, r)        # [G, R]
    sb = jnp.take_along_axis(fb, order[..., None], axis=1)
    sv = top_s > neg / 2

    # plus_one=True is the reference engine (gpu/cpu Cython NMS, +1 IoU);
    # False switches to the standard-IoU engine (tf.image.non_max_
    # suppression semantics) — used by the TF differential protocol test
    keep = _batched_keep(sb, sv, nms_thresh, plus_one=plus_one,
                         use_pallas=use_pallas)   # [G, R] sorted order

    masked = jnp.where(keep, top_s, -jnp.inf)         # sorted order
    flat = masked.reshape(b, kc * r)
    # small-proposal configs can have fewer candidates than the output cap;
    # top_k the available ones and pad the slab to the contracted shape
    cap = min(max_per_image, kc * r)
    top_s2, top_i = lax.top_k(flat, cap)              # [B, cap]
    cls_idx = top_i // r + 1                          # back to 1-based class
    boxes_flat = sb.reshape(b, kc * r, 4)
    out_boxes = jnp.take_along_axis(boxes_flat, top_i[..., None], axis=1)
    det = jnp.concatenate(
        [cls_idx[..., None].astype(jnp.float32), top_s2[..., None],
         out_boxes], axis=-1)
    dv = jnp.isfinite(top_s2)
    det = jnp.where(dv[..., None], det, 0.0)
    if cap < max_per_image:
        det = jnp.pad(det, ((0, 0), (0, max_per_image - cap), (0, 0)))
        dv = jnp.pad(dv, ((0, 0), (0, max_per_image - cap)))
    return det, dv
