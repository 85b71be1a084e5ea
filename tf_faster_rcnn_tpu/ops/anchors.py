"""Anchor generation.

``generate_anchors`` reproduces the reference base-anchor table exactly
(golden values at /root/reference/lib/layer_utils/generate_anchors.py:14-39;
algorithm :41-105). ``anchor_grid`` shifts the base anchors over a static
feature grid (the reference's generate_anchors_pre,
lib/layer_utils/snippets.py:14-30).

Both run in numpy at trace time: for a static canvas the full anchor set is a
compile-time constant baked into the XLA program — there is nothing to compute
on-device (the reference recomputes this every session run via its TF twin,
snippets.py:32-49).
"""

from __future__ import annotations

import numpy as np

__all__ = ["generate_anchors", "anchor_grid"]


def _whctrs(anchor):
    w = anchor[2] - anchor[0] + 1
    h = anchor[3] - anchor[1] + 1
    x_ctr = anchor[0] + 0.5 * (w - 1)
    y_ctr = anchor[1] + 0.5 * (h - 1)
    return w, h, x_ctr, y_ctr


def _mkanchors(ws, hs, x_ctr, y_ctr):
    ws = ws[:, None]
    hs = hs[:, None]
    return np.hstack((x_ctr - 0.5 * (ws - 1),
                      y_ctr - 0.5 * (hs - 1),
                      x_ctr + 0.5 * (ws - 1),
                      y_ctr + 0.5 * (hs - 1)))


def generate_anchors(base_size=16, ratios=(0.5, 1, 2), scales=(8, 16, 32)):
    """Base anchors around a (0,0,15,15) window: ratios x scales, [A, 4]."""
    ratios = np.asarray(ratios, dtype=np.float64)
    scales = np.asarray(scales, dtype=np.float64)
    base = np.array([1, 1, base_size, base_size], dtype=np.float64) - 1

    w, h, x_ctr, y_ctr = _whctrs(base)
    size = w * h
    ws = np.round(np.sqrt(size / ratios))
    hs = np.round(ws * ratios)
    ratio_anchors = _mkanchors(ws, hs, x_ctr, y_ctr)

    out = []
    for i in range(ratio_anchors.shape[0]):
        w, h, x_ctr, y_ctr = _whctrs(ratio_anchors[i])
        out.append(_mkanchors(w * scales, h * scales, x_ctr, y_ctr))
    return np.vstack(out)


def anchor_grid(feat_h: int, feat_w: int, feat_stride: int = 16,
                anchor_scales=(8, 16, 32), anchor_ratios=(0.5, 1, 2)):
    """All anchors over an feat_h x feat_w grid, shape [feat_h*feat_w*A, 4].

    Row-major over (y, x, a): width varies fastest within a row of the feature
    map, matching the reference's (K, A) -> (K*A) flattening
    (snippets.py:26-27) and therefore the RPN head's HxWxA channel layout.
    We follow the reference's numpy twin (float base anchors); its TF twin
    truncates base anchors to int32 (snippets.py:44-49), which differs only
    for configs with odd-sized anchors that no reference config uses — all
    published anchor tables (scales >= 2) are integral and identical.
    """
    base = generate_anchors(ratios=np.array(anchor_ratios),
                            scales=np.array(anchor_scales))
    A = base.shape[0]
    shift_x = np.arange(0, feat_w) * feat_stride
    shift_y = np.arange(0, feat_h) * feat_stride
    sx, sy = np.meshgrid(shift_x, shift_y)
    shifts = np.stack([sx.ravel(), sy.ravel(), sx.ravel(), sy.ravel()], axis=1)
    K = shifts.shape[0]
    anchors = base.reshape(1, A, 4) + shifts.reshape(K, 1, 4)
    return anchors.reshape(K * A, 4).astype(np.float32)
