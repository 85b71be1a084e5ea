"""Detection postprocess vs a numpy transcription of the reference test loop
(test.py:86-180): per-class NMS + global max_per_image cap."""

import numpy as np

from tf_faster_rcnn_tpu.engine.detect import postprocess_detections
from tf_faster_rcnn_tpu.ops.boxes import bbox_transform_inv, clip_boxes
from tf_faster_rcnn_tpu.utils.native import nms_cpu


def _np_reference_postprocess(rois, prob, pred, scale, ohw, num_classes,
                              max_per_image, nms_thresh):
    """Host transcription of test.py:152-180 per-class loop."""
    boxes = rois / scale
    decoded = np.asarray(bbox_transform_inv(boxes, pred))
    decoded = np.asarray(clip_boxes(decoded, ohw))
    all_dets = []
    for c in range(1, num_classes):
        cls_boxes = decoded[:, 4 * c:4 * c + 4]
        cls_scores = prob[:, c]
        dets = np.hstack([cls_boxes, cls_scores[:, None]]).astype(np.float32)
        keep = nms_cpu(dets, nms_thresh, plus_one=True, suppress_eq=False)
        for k in keep:
            all_dets.append((c, dets[k, 4], dets[k, :4]))
    all_dets.sort(key=lambda d: -d[1])
    return all_dets[:max_per_image]


def test_postprocess_matches_reference_loop(rng):
    B, R, K = 1, 50, 6
    rois = rng.uniform(0, 300, (B, R, 4)).astype(np.float32)
    rois[..., 2:] = rois[..., :2] + rng.uniform(5, 100, (B, R, 2))
    roi_valid = np.ones((B, R), bool)
    logits = rng.randn(B, R, K).astype(np.float32) * 2
    prob = np.exp(logits) / np.exp(logits).sum(-1, keepdims=True)
    pred = (rng.randn(B, R, 4 * K) * 0.1).astype(np.float32)
    im_info = np.array([[480, 640, 1.5]], np.float32)
    ohw = np.array([[320, 427]], np.float32)

    det, dv = postprocess_detections(
        rois, roi_valid, prob, pred, im_info, ohw,
        num_classes=K, max_per_image=20, nms_thresh=0.3)
    det, dv = np.asarray(det[0]), np.asarray(dv[0])

    want = _np_reference_postprocess(rois[0], prob[0], pred[0], 1.5, ohw[0],
                                     K, 20, 0.3)
    assert dv.sum() == len(want)
    got = det[dv]
    for i, (c, s, b) in enumerate(want):
        assert int(got[i, 0]) == c
        np.testing.assert_allclose(got[i, 1], s, rtol=1e-5)
        np.testing.assert_allclose(got[i, 2:], b, rtol=1e-4, atol=1e-3)


def test_postprocess_invalid_rois_excluded(rng):
    B, R, K = 1, 30, 4
    rois = rng.uniform(10, 200, (B, R, 4)).astype(np.float32)
    rois[..., 2:] = rois[..., :2] + 50
    roi_valid = np.ones((B, R), bool)
    roi_valid[0, 15:] = False
    prob = np.full((B, R, K), 0.25, np.float32)
    prob[0, 20, 1] = 0.99  # invalid roi with the best score
    pred = np.zeros((B, R, 4 * K), np.float32)
    im_info = np.array([[256, 256, 1.0]], np.float32)
    ohw = np.array([[256, 256]], np.float32)
    det, dv = postprocess_detections(rois, roi_valid, prob, pred, im_info,
                                     ohw, num_classes=K, max_per_image=10,
                                     nms_thresh=0.3)
    det, dv = np.asarray(det[0]), np.asarray(dv[0])
    # the 0.99 score of the invalid roi must not appear
    assert (det[dv, 1] < 0.9).all()


def test_postprocess_score_threshold(rng):
    B, R, K = 1, 16, 3
    rois = rng.uniform(10, 100, (B, R, 4)).astype(np.float32)
    rois[..., 2:] = rois[..., :2] + 30
    prob = np.zeros((B, R, K), np.float32)
    prob[0, :4, 1] = [0.9, 0.6, 0.4, 0.05]
    pred = np.zeros((B, R, 4 * K), np.float32)
    im_info = np.array([[128, 128, 1.0]], np.float32)
    ohw = np.array([[128, 128]], np.float32)
    det, dv = postprocess_detections(
        rois, np.ones((B, R), bool), prob, pred, im_info, ohw,
        num_classes=K, max_per_image=10, nms_thresh=0.99, score_thresh=0.5)
    det, dv = np.asarray(det[0]), np.asarray(dv[0])
    kept_scores = sorted(det[dv, 1].tolist(), reverse=True)
    assert all(s > 0.5 for s in kept_scores)
    assert len(kept_scores) == 2  # 0.9 and 0.6 survive the 0.5 threshold


def test_postprocess_bbox_reg_off_uses_raw_proposals(rng):
    """TEST.BBOX_REG=False tiles the proposal box for every class
    (reference test.py:100-104); deltas must have no effect."""
    B, R, K = 1, 20, 5
    rois = rng.uniform(0, 200, (B, R, 4)).astype(np.float32)
    rois[..., 2:] = rois[..., :2] + rng.uniform(5, 60, (B, R, 2))
    roi_valid = np.ones((B, R), bool)
    logits = rng.randn(B, R, K).astype(np.float32)
    prob = np.exp(logits) / np.exp(logits).sum(-1, keepdims=True)
    pred = (rng.randn(B, R, 4 * K) * 10.0).astype(np.float32)  # huge deltas
    im_info = np.array([[300, 400, 2.0]], np.float32)
    ohw = np.array([[150, 200]], np.float32)

    det, dv = postprocess_detections(
        rois, roi_valid, prob, pred, im_info, ohw,
        num_classes=K, max_per_image=10, nms_thresh=0.3, bbox_reg=False)
    det2, _ = postprocess_detections(
        rois, roi_valid, prob, np.zeros_like(pred), im_info, ohw,
        num_classes=K, max_per_image=10, nms_thresh=0.3, bbox_reg=False)
    np.testing.assert_array_equal(np.asarray(det), np.asarray(det2))

    det, dv = np.asarray(det[0]), np.asarray(dv[0])
    scaled = rois[0] / 2.0
    for row in det[dv]:
        # every output box is literally one of the (unscaled) proposals
        match = np.isclose(scaled, row[2:], atol=1e-4).all(axis=1)
        assert match.any()


def test_postprocess_cap_exceeds_candidates(rng):
    """max_per_image > classes*proposals pads the slab instead of crashing
    (small-proposal serving/export configs hit this)."""
    B, R, K = 1, 4, 3
    rois = rng.uniform(10, 50, (B, R, 4)).astype(np.float32)
    rois[..., 2:] = rois[..., :2] + 20
    prob = np.full((B, R, K), 1.0 / K, np.float32)
    pred = np.zeros((B, R, 4 * K), np.float32)
    im_info = np.array([[64, 64, 1.0]], np.float32)
    ohw = np.array([[64, 64]], np.float32)
    det, dv = postprocess_detections(
        rois, np.ones((B, R), bool), prob, pred, im_info, ohw,
        num_classes=K, max_per_image=100, nms_thresh=0.3)
    assert det.shape == (B, 100, 6) and dv.shape == (B, 100)
    assert int(np.asarray(dv).sum()) <= (K - 1) * R
    assert not np.asarray(dv)[0, (K - 1) * R:].any()
