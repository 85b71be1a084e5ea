"""Box math in jnp with the legacy +1 width convention.

Numerics match the reference numpy/TF twins
(/root/reference/lib/model/bbox_transform.py:14-115 and the Cython IoU at
lib/utils/bbox.pyx:33-55): widths/heights are computed as x2-x1+1, centers as
x1+0.5*w. All functions are shape-polymorphic over leading batch dims and are
safe to jit/vmap; they work equally on numpy inputs for host-side use.
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = ["bbox_transform", "bbox_transform_inv", "clip_boxes",
           "bbox_overlaps", "BBOX_XFORM_CLIP"]

# Max dw/dh the MODEL decode paths accept before exp(): log(1000/16), the
# Detectron convention — a box may grow at most 62.5x in one decode. The
# reference decode has no clamp (lib/model/bbox_transform.py:35-65), but a
# trained net's raw deltas stay |d| < ~3 (normalized targets, stds 0.2), so
# the clamp never binds on checkpoint-parity paths; it only bounds exp()
# for untrained/diverging nets where inf boxes would poison NMS/crop
# (PARITY.md records the deviation). Callers that need exact reference
# numerics on arbitrary inputs (the TF differential suite) leave it off.
BBOX_XFORM_CLIP = float(jnp.log(1000.0 / 16.0))


def bbox_transform(ex_rois, gt_rois):
    """Encode gt boxes relative to example rois -> (dx, dy, dw, dh) targets.

    ex_rois, gt_rois: [..., 4] as (x1, y1, x2, y2).
    """
    ex_w = ex_rois[..., 2] - ex_rois[..., 0] + 1.0
    ex_h = ex_rois[..., 3] - ex_rois[..., 1] + 1.0
    ex_cx = ex_rois[..., 0] + 0.5 * ex_w
    ex_cy = ex_rois[..., 1] + 0.5 * ex_h

    gt_w = gt_rois[..., 2] - gt_rois[..., 0] + 1.0
    gt_h = gt_rois[..., 3] - gt_rois[..., 1] + 1.0
    gt_cx = gt_rois[..., 0] + 0.5 * gt_w
    gt_cy = gt_rois[..., 1] + 0.5 * gt_h

    dx = (gt_cx - ex_cx) / ex_w
    dy = (gt_cy - ex_cy) / ex_h
    dw = jnp.log(gt_w / ex_w)
    dh = jnp.log(gt_h / ex_h)
    return jnp.stack([dx, dy, dw, dh], axis=-1)


def bbox_transform_inv(boxes, deltas, xform_clip=None):
    """Decode regression deltas against boxes.

    boxes: [..., N, 4]; deltas: [..., N, 4*K] (per-class K stride-4 layout, as
    in the reference's bbox_pred head) or [..., N, 4].
    xform_clip: optional cap on dw/dh before exp() (see BBOX_XFORM_CLIP);
    None reproduces the reference decode exactly.
    Returns boxes of the same shape as deltas.
    """
    boxes = boxes.astype(deltas.dtype)
    widths = boxes[..., 2] - boxes[..., 0] + 1.0
    heights = boxes[..., 3] - boxes[..., 1] + 1.0
    ctr_x = boxes[..., 0] + 0.5 * widths
    ctr_y = boxes[..., 1] + 0.5 * heights

    dx = deltas[..., 0::4]
    dy = deltas[..., 1::4]
    dw = deltas[..., 2::4]
    dh = deltas[..., 3::4]
    if xform_clip is not None:
        dw = jnp.minimum(dw, xform_clip)
        dh = jnp.minimum(dh, xform_clip)

    pred_cx = dx * widths[..., None] + ctr_x[..., None]
    pred_cy = dy * heights[..., None] + ctr_y[..., None]
    pred_w = jnp.exp(dw) * widths[..., None]
    pred_h = jnp.exp(dh) * heights[..., None]

    x1 = pred_cx - 0.5 * pred_w
    y1 = pred_cy - 0.5 * pred_h
    x2 = pred_cx + 0.5 * pred_w
    y2 = pred_cy + 0.5 * pred_h
    # interleave back to [..., N, 4K]
    out = jnp.stack([x1, y1, x2, y2], axis=-1)  # [..., N, K, 4]
    return out.reshape(deltas.shape)


def clip_boxes(boxes, im_hw):
    """Clip boxes to [0, W-1] x [0, H-1].

    boxes: [..., 4K] interleaved (x1, y1, x2, y2)*K; im_hw: (H, W) scalars or
    per-image [..., 2] arrays broadcastable over the box dims.
    """
    h = jnp.asarray(im_hw)[..., 0]
    w = jnp.asarray(im_hw)[..., 1]
    if h.ndim > 0:
        # per-image shapes: broadcast over trailing box dims
        h = h.reshape(h.shape + (1,) * (boxes.ndim - h.ndim))
        w = w.reshape(w.shape + (1,) * (boxes.ndim - w.ndim))
    shp = boxes.shape
    b = boxes.reshape(shp[:-1] + (shp[-1] // 4, 4))
    x1 = jnp.clip(b[..., 0], 0, w - 1)
    y1 = jnp.clip(b[..., 1], 0, h - 1)
    x2 = jnp.clip(b[..., 2], 0, w - 1)
    y2 = jnp.clip(b[..., 3], 0, h - 1)
    return jnp.stack([x1, y1, x2, y2], axis=-1).reshape(shp)


def bbox_overlaps(boxes, query_boxes, plus_one: bool = True):
    """Dense IoU matrix [..., N, K] between boxes [..., N, 4] and query [..., K, 4].

    plus_one=True reproduces the reference Cython bbox_overlaps (+1 areas,
    lib/utils/bbox.pyx:33-55, also the CUDA devIoU at lib/nms/nms_kernel.cu:24-32).
    plus_one=False is the standard IoU used by TF's in-graph NMS (the default
    RPN proposal path, lib/layer_utils/proposal_layer.py:72).
    """
    e = 1.0 if plus_one else 0.0
    bx = boxes[..., :, None, :]
    qx = query_boxes[..., None, :, :]
    iw = (jnp.minimum(bx[..., 2], qx[..., 2])
          - jnp.maximum(bx[..., 0], qx[..., 0]) + e)
    ih = (jnp.minimum(bx[..., 3], qx[..., 3])
          - jnp.maximum(bx[..., 1], qx[..., 1]) + e)
    iw = jnp.maximum(iw, 0.0)
    ih = jnp.maximum(ih, 0.0)
    inter = iw * ih
    area_b = ((bx[..., 2] - bx[..., 0] + e) * (bx[..., 3] - bx[..., 1] + e))
    area_q = ((qx[..., 2] - qx[..., 0] + e) * (qx[..., 3] - qx[..., 1] + e))
    union = area_b + area_q - inter
    # guard 0-area unions (degenerate padded boxes) without NaNs
    return jnp.where(union > 0, inter / jnp.where(union > 0, union, 1.0), 0.0)
