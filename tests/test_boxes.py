"""Box-op numerics vs independent numpy reimplementations of the reference
formulas (SURVEY.md stage 2; reference lib/model/bbox_transform.py)."""

import numpy as np

from tf_faster_rcnn_tpu.ops import (bbox_overlaps, bbox_transform,
                                    bbox_transform_inv, clip_boxes)


def _rand_boxes(rng, n, hw=(480, 640)):
    h, w = hw
    x1 = rng.uniform(0, w - 20, n)
    y1 = rng.uniform(0, h - 20, n)
    x2 = x1 + rng.uniform(1, w / 2, n)
    y2 = y1 + rng.uniform(1, h / 2, n)
    return np.stack([x1, y1, x2, y2], axis=1).astype(np.float32)


def _np_transform(ex, gt):
    ew = ex[:, 2] - ex[:, 0] + 1.0
    eh = ex[:, 3] - ex[:, 1] + 1.0
    ecx = ex[:, 0] + 0.5 * ew
    ecy = ex[:, 1] + 0.5 * eh
    gw = gt[:, 2] - gt[:, 0] + 1.0
    gh = gt[:, 3] - gt[:, 1] + 1.0
    gcx = gt[:, 0] + 0.5 * gw
    gcy = gt[:, 1] + 0.5 * gh
    return np.stack([(gcx - ecx) / ew, (gcy - ecy) / eh,
                     np.log(gw / ew), np.log(gh / eh)], axis=1)


def test_bbox_transform_matches_numpy(rng):
    ex, gt = _rand_boxes(rng, 64), _rand_boxes(rng, 64)
    out = np.asarray(bbox_transform(ex, gt))
    np.testing.assert_allclose(out, _np_transform(ex, gt), rtol=1e-4, atol=1e-5)


def test_transform_inv_roundtrip(rng):
    """decode(encode(ex, gt)) recovers x1,y1 exactly and x2,y2 + 1.

    The +1 on x2/y2 is the reference's own encode/decode asymmetry (encode
    centers use +1 widths, decode never subtracts the 1 back —
    bbox_transform.py:57-63, inherited from py-faster-rcnn); trained weights
    absorb it, so parity requires reproducing it."""
    ex, gt = _rand_boxes(rng, 128), _rand_boxes(rng, 128)
    deltas = bbox_transform(ex, gt)
    rec = np.asarray(bbox_transform_inv(ex, np.asarray(deltas)))
    expected = gt + np.array([0.0, 0.0, 1.0, 1.0], np.float32)
    np.testing.assert_allclose(rec, expected, rtol=1e-4, atol=1e-2)


def test_transform_inv_multiclass_layout(rng):
    """Per-class 4K stride slicing: class k occupies columns 4k:4k+4."""
    boxes = _rand_boxes(rng, 16)
    K = 5
    deltas = rng.randn(16, 4 * K).astype(np.float32) * 0.1
    out = np.asarray(bbox_transform_inv(boxes, deltas))
    assert out.shape == (16, 4 * K)
    for k in range(K):
        single = np.asarray(bbox_transform_inv(boxes, deltas[:, 4 * k:4 * k + 4]))
        np.testing.assert_allclose(out[:, 4 * k:4 * k + 4], single, rtol=1e-5)


def test_clip_boxes(rng):
    boxes = (_rand_boxes(rng, 32) * 3 - 200).astype(np.float32)
    out = np.asarray(clip_boxes(boxes, (480, 640)))
    assert out[:, 0::4].min() >= 0 and out[:, 2::4].max() <= 639
    assert out[:, 1::4].min() >= 0 and out[:, 3::4].max() <= 479
    inside = np.clip(boxes[:, 0], 0, 639)
    np.testing.assert_allclose(out[:, 0], inside)


def test_clip_boxes_batched_per_image(rng):
    boxes = np.stack([_rand_boxes(rng, 8) * 2, _rand_boxes(rng, 8) * 2])
    hw = np.array([[480, 640], [240, 320]], np.float32)
    out = np.asarray(clip_boxes(boxes, hw))
    assert out[0, :, 2].max() <= 639 and out[1, :, 2].max() <= 319


def test_bbox_overlaps_vs_native_oracle(rng):
    from tf_faster_rcnn_tpu.utils.native import bbox_overlaps_cpu
    b, q = _rand_boxes(rng, 40), _rand_boxes(rng, 17)
    ours = np.asarray(bbox_overlaps(b, q, plus_one=True))
    oracle = bbox_overlaps_cpu(b, q, plus_one=True)
    np.testing.assert_allclose(ours, oracle, rtol=1e-5, atol=1e-6)
    ours0 = np.asarray(bbox_overlaps(b, q, plus_one=False))
    oracle0 = bbox_overlaps_cpu(b, q, plus_one=False)
    np.testing.assert_allclose(ours0, oracle0, rtol=1e-5, atol=1e-6)


def test_bbox_overlaps_identity(rng):
    b = _rand_boxes(rng, 10)
    iou = np.asarray(bbox_overlaps(b, b))
    np.testing.assert_allclose(np.diag(iou), 1.0, rtol=1e-6)
