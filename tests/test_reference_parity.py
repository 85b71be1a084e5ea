"""Behavioral parity against the reference's own executable numpy code.

The reference's pure-numpy twins (bbox_transform, generate_anchors_pre,
anchor_target_layer, proposal_target_layer, proposal_layer) are imported
from /root/reference/lib (read-only) and run as ORACLES on identical inputs.
Their TF / easydict / Cython dependencies are stubbed: the Cython
bbox_overlaps is replaced with our native C++ implementation (itself tested
for exactness), and tensorflow is a dummy module (only the numpy code paths
execute). This validates our on-device implementations against the actual
reference behavior rather than a transcription of it.
"""

import sys
import types

import numpy as np
import pytest

from tf_faster_rcnn_tpu.utils.native import bbox_overlaps_cpu, nms_cpu


@pytest.fixture(scope="module")
def ref():
    """Import the reference numpy modules with dependency stubs."""
    created = {}

    def stub(name, mod):
        if name not in sys.modules:
            sys.modules[name] = mod
            created[name] = mod

    # dummy tensorflow: attribute access returns inert placeholders
    tf = types.ModuleType("tensorflow")
    tf.__getattr__ = lambda name: (lambda *a, **k: None)
    stub("tensorflow", tf)

    # easydict backed by our AttrDict
    ed = types.ModuleType("easydict")
    from tf_faster_rcnn_tpu.config import AttrDict

    class EasyDict(AttrDict):
        def __init__(self, d=None):
            super().__init__()
            for k, v in (d or {}).items():
                self[k] = EasyDict(v) if isinstance(v, dict) else v
    ed.EasyDict = EasyDict
    stub("easydict", ed)

    # cython bbox -> our native op (the reference passes [N,5] gt rows; the
    # Cython op reads only the first 4 columns, so slice here)
    ub = types.ModuleType("utils.cython_bbox")
    ub.bbox_overlaps = lambda a, b: bbox_overlaps_cpu(
        np.asarray(a, np.float32)[:, :4],
        np.asarray(b, np.float32)[:, :4]).astype(np.float64)
    utils_pkg = types.ModuleType("utils")
    utils_pkg.cython_bbox = ub
    stub("utils", utils_pkg)
    stub("utils.cython_bbox", ub)

    # nms wrapper -> our native op with gpu_nms semantics (+1 IoU, > thresh)
    nw = types.ModuleType("model.nms_wrapper")
    nw.nms = lambda dets, thresh, force_cpu=False: nms_cpu(
        np.asarray(dets, np.float32), thresh, plus_one=True,
        suppress_eq=False).tolist()

    saved_path = list(sys.path)
    sys.path.insert(0, "/root/reference/lib")
    # np 2.x compat for the old reference code
    if not hasattr(np, "float"):
        np.float = float
        created["np.float"] = True
    try:
        import model.config as ref_config  # noqa: F401
        sys.modules["model.nms_wrapper"] = nw
        created["model.nms_wrapper"] = nw
        import importlib
        bt = importlib.import_module("model.bbox_transform")
        atl = importlib.import_module("layer_utils.anchor_target_layer")
        ptl = importlib.import_module("layer_utils.proposal_target_layer")
        pl = importlib.import_module("layer_utils.proposal_layer")
        sn = importlib.import_module("layer_utils.snippets")
        yield types.SimpleNamespace(
            cfg=ref_config.cfg, bbox_transform=bt, anchor_target=atl,
            proposal_target=ptl, proposal_layer=pl, snippets=sn)
    finally:
        sys.path[:] = saved_path
        for name in created:
            if name == "np.float":
                delattr(np, "float")
            else:
                sys.modules.pop(name, None)
        for name in list(sys.modules):
            if name.startswith(("model.", "layer_utils.")) or name in (
                    "model", "layer_utils"):
                sys.modules.pop(name, None)


def _rand_boxes(rng, n, hw=(300, 400)):
    h, w = hw
    x1 = rng.uniform(0, w - 30, n)
    y1 = rng.uniform(0, h - 30, n)
    x2 = x1 + rng.uniform(5, 120, n)
    y2 = y1 + rng.uniform(5, 120, n)
    return np.stack([x1, y1, x2, y2], axis=1).astype(np.float32)


def test_bbox_transform_parity(ref, rng):
    from tf_faster_rcnn_tpu.ops import bbox_transform, bbox_transform_inv
    ex, gt = _rand_boxes(rng, 50), _rand_boxes(rng, 50)
    want = ref.bbox_transform.bbox_transform(
        ex.astype(np.float64), gt.astype(np.float64))
    got = np.asarray(bbox_transform(ex, gt))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)

    deltas = (rng.randn(50, 8) * 0.2).astype(np.float32)
    want = ref.bbox_transform.bbox_transform_inv(ex, deltas.copy())
    got = np.asarray(bbox_transform_inv(ex, deltas))
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-3)


def test_anchor_grid_parity(ref):
    from tf_faster_rcnn_tpu.ops import anchor_grid
    want, length = ref.snippets.generate_anchors_pre(
        13, 17, 16, (8, 16, 32), (0.5, 1, 2))
    got = anchor_grid(13, 17, 16)
    assert length == got.shape[0]
    np.testing.assert_array_equal(got, want)


def test_anchor_target_parity_no_subsampling(ref, rng):
    """Identical labels/targets/weights with subsampling disabled."""
    import jax
    from tf_faster_rcnn_tpu.models.targets import anchor_target
    from tf_faster_rcnn_tpu.ops import anchor_grid

    h, w, stride = 8, 10, 16
    anchors = anchor_grid(h, w, stride, (2, 4), (0.5, 1, 2))
    a = anchors.shape[0] // (h * w)
    gt = np.array([[20, 20, 90, 70, 3], [60, 50, 140, 110, 7]], np.float32)
    im_info = (h * stride - 7.0, w * stride - 3.0, 1.0)

    ref.cfg.TRAIN.RPN_BATCHSIZE = 10 ** 9  # disable subsampling
    rpn_cls_score = np.zeros((1, h, w, a * 2), np.float32)
    want_labels, want_t, want_iw, want_ow = ref.anchor_target.anchor_target_layer(
        rpn_cls_score, gt, np.array(im_info, np.float32), [stride],
        anchors.astype(np.float64), a)
    # reference reshapes to the caffe map layout; undo to flat anchor order
    wl = want_labels.reshape(1, a, h, w).transpose(0, 2, 3, 1).reshape(-1)
    wt = want_t.reshape(-1, 4)
    wiw = want_iw.reshape(-1, 4)
    wow = want_ow.reshape(-1, 4)

    got = anchor_target(anchors, gt, np.array([True, True]),
                        (im_info[0], im_info[1]), jax.random.PRNGKey(0),
                        rpn_batchsize=10 ** 9)
    np.testing.assert_array_equal(np.asarray(got.labels), wl.astype(np.int32))
    np.testing.assert_allclose(np.asarray(got.bbox_targets), wt,
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_array_equal(np.asarray(got.bbox_inside_weights), wiw)
    np.testing.assert_allclose(np.asarray(got.bbox_outside_weights), wow,
                               rtol=1e-6)


def test_proposal_target_parity_deterministic(ref, rng):
    """With candidate counts that force 'select all', the sampled roi SET,
    labels, and 4K targets match the reference exactly."""
    import jax
    from tf_faster_rcnn_tpu.models.targets import proposal_target

    num_classes = 6
    gt = np.array([[10, 10, 60, 60, 2], [80, 80, 150, 160, 4]], np.float32)
    # 2 fg (within cap 4), 14 bg in [0.1, 0.5) -> batch 16 takes all of both
    fg = np.array([[12, 12, 62, 62], [78, 78, 148, 158]], np.float32)
    bg = []
    r = np.random.RandomState(7)
    while len(bg) < 14:
        c = _rand_boxes(r, 1, (200, 200))[0]
        ov = bbox_overlaps_cpu(c[None], gt[:, :4]).max()
        if 0.1 <= ov < 0.5:
            bg.append(c)
    rois = np.vstack([fg, np.array(bg, np.float32)])
    rpn_rois = np.hstack([np.zeros((16, 1), np.float32), rois])
    rpn_scores = np.ones((16, 1), np.float32)

    ref.cfg.TRAIN.BATCH_SIZE = 16
    ref.cfg.TRAIN.FG_FRACTION = 0.25
    ref.cfg.TRAIN.BG_THRESH_LO = 0.1
    ref.cfg.TRAIN.USE_GT = False
    w_rois, _, w_labels, w_t, w_iw, w_ow = \
        ref.proposal_target.proposal_target_layer(
            rpn_rois, rpn_scores, gt, num_classes)

    got = proposal_target(rois, np.ones(16, bool), gt,
                          np.array([True, True]), jax.random.PRNGKey(0),
                          num_classes, batch_size=16, fg_fraction=0.25,
                          bg_thresh_lo=0.1)

    # same multiset of rois and per-roi (label, targets) association
    def rows(rois_, labels_, t_):
        return sorted(
            tuple(round(float(v), 3) for v in
                  np.concatenate([rois_[i], [labels_[i]], t_[i]]))
            for i in range(16))
    want = rows(w_rois[:, 1:], w_labels[:, 0], w_t)
    have = rows(np.asarray(got.rois), np.asarray(got.labels),
                np.asarray(got.bbox_targets))
    assert want == have
    np.testing.assert_array_equal(
        np.asarray(got.bbox_outside_weights),
        (np.asarray(got.bbox_inside_weights) > 0).astype(np.float32))


def test_proposal_layer_parity(ref, rng):
    """The numpy proposal path (decode, clip, top-k, NMS, cap) against ours
    configured with the same (+1, >) NMS semantics."""
    import jax
    from tf_faster_rcnn_tpu.ops import anchor_grid
    from tf_faster_rcnn_tpu.ops.boxes import bbox_transform_inv, clip_boxes
    from tf_faster_rcnn_tpu.ops.nms import sorted_nms

    h, w, stride, a = 6, 8, 16, 9
    anchors = anchor_grid(h, w, stride)
    n = anchors.shape[0]
    scores_map = rng.rand(1, h, w, 2 * a).astype(np.float32)
    deltas_map = (rng.randn(1, h, w, 4 * a) * 0.2).astype(np.float32)
    im_info = np.array([90.0, 120.0, 1.0], np.float32)

    ref.cfg.TEST.RPN_PRE_NMS_TOP_N = 200
    ref.cfg.TEST.RPN_POST_NMS_TOP_N = 30
    ref.cfg.TEST.RPN_NMS_THRESH = 0.7
    blob, w_scores = ref.proposal_layer.proposal_layer(
        scores_map, deltas_map, im_info, 'TEST', [stride],
        anchors.astype(np.float64), a)

    fg = scores_map[0, :, :, a:].reshape(-1)
    deltas = deltas_map.reshape(n, 4)
    boxes = np.asarray(clip_boxes(bbox_transform_inv(anchors, deltas),
                                  im_info[:2]))
    idx, valid = sorted_nms(boxes, fg, np.ones(n, bool), 0.7, 30,
                            plus_one=True, suppress_eq=False, pre_sort_k=200,
                            use_pallas=False)
    idx, valid = np.asarray(idx), np.asarray(valid)
    got_boxes = boxes[idx[valid]]
    np.testing.assert_allclose(got_boxes, blob[:valid.sum(), 1:5],
                               rtol=1e-4, atol=1e-3)
    np.testing.assert_allclose(fg[idx[valid]], w_scores[:valid.sum(), 0],
                               rtol=1e-5)


# ---------------------------------------------------------------------------
# Whole-TEST-path parity at real scale (VERDICT round-1 item 3): the
# reference's executable numpy proposal chain (decode -> clip -> [cap] ->
# NMS -> post cap) runs as oracle on a 600x1000-sized grid (38x63x9 = 21546
# anchors) and our static-shape on-device path must match exactly --
# including adversarial clustered-score patterns at the pre-NMS cap
# boundary, which settle the cap-soundness argument:
#
#   THEOREM. A box outside the top-C by score can only suppress boxes of
#   lower score (greedy NMS), which are also outside the top C. Hence
#   NMS(top C) survivors == (full NMS survivors) restricted to the top C, in
#   identical order. If NMS(top C) yields >= P survivors, the first P of the
#   full no-cap NMS are EXACTLY the first P of NMS(top C). Divergence is
#   possible only when suppression inside the cap leaves < P survivors; then
#   ours is a strict prefix of the oracle's list.
# ---------------------------------------------------------------------------

def _real_grid(fh=38, fw=63, stride=16):
    from tf_faster_rcnn_tpu.ops import anchor_grid
    anchors = np.asarray(anchor_grid(fh, fw, stride), np.float32)
    return anchors, fh, fw, stride


def _e2e_nms_stub(dets, thresh, force_cpu=False):
    """tf.image.non_max_suppression semantics (the reference default path,
    USE_E2E_TF=True): standard IoU, no +1 widths."""
    return nms_cpu(np.asarray(dets, np.float32), thresh, plus_one=False,
                   suppress_eq=False).tolist()


def _ref_proposals(ref, scores_map, deltas_map, im_info, mode, anchors,
                   pre_n, post_n, plus_one):
    saved = (ref.cfg[mode].RPN_PRE_NMS_TOP_N,
             ref.cfg[mode].RPN_POST_NMS_TOP_N, ref.proposal_layer.nms)
    ref.cfg[mode].RPN_PRE_NMS_TOP_N = pre_n
    ref.cfg[mode].RPN_POST_NMS_TOP_N = post_n
    if not plus_one:
        ref.proposal_layer.nms = _e2e_nms_stub
    try:
        blob, w_scores = ref.proposal_layer.proposal_layer(
            scores_map, deltas_map, im_info, mode, None,
            anchors.astype(np.float64), scores_map.shape[-1] // 2)
    finally:
        (ref.cfg[mode].RPN_PRE_NMS_TOP_N,
         ref.cfg[mode].RPN_POST_NMS_TOP_N,
         ref.proposal_layer.nms) = saved
    return blob[:, 1:5], w_scores[:, 0]


def _our_proposals(anchors, fg, deltas, im_info, post_n, cap, plus_one):
    from tf_faster_rcnn_tpu.ops import bbox_transform_inv, clip_boxes
    from tf_faster_rcnn_tpu.ops.nms import sorted_nms
    n = anchors.shape[0]
    boxes = np.asarray(clip_boxes(bbox_transform_inv(anchors, deltas),
                                  im_info[:2]))
    idx, valid = sorted_nms(boxes, fg, np.ones(n, bool), 0.7, post_n,
                            plus_one=plus_one, suppress_eq=False,
                            pre_sort_k=cap, use_pallas=False)
    idx, valid = np.asarray(idx), np.asarray(valid)
    return boxes[idx[valid]], fg[idx[valid]]


def _rand_rpn_outputs(rng, fh, fw, a=9, delta_scale=0.25):
    scores_map = rng.rand(1, fh, fw, 2 * a).astype(np.float32)
    deltas_map = (rng.randn(1, fh, fw, 4 * a) * delta_scale).astype(
        np.float32)
    return scores_map, deltas_map


@pytest.mark.parametrize("mode,post_n", [("TEST", 300), ("TRAIN", 2000)])
def test_e2e_proposal_parity_real_size(ref, rng, mode, post_n):
    """Static 6000-cap path == the reference's NO-CAP default path (E2E
    semantics) at 600x1000 scale, TEST and TRAIN configs."""
    anchors, fh, fw, stride = _real_grid()
    a = 9
    scores_map, deltas_map = _rand_rpn_outputs(rng, fh, fw)
    im_info = np.array([600.0, 1000.0, 1.0])

    want_boxes, want_scores = _ref_proposals(
        ref, scores_map, deltas_map, im_info, mode, anchors,
        pre_n=0, post_n=post_n, plus_one=False)

    fg = scores_map[0, :, :, a:].reshape(-1)
    deltas = deltas_map.reshape(-1, 4)
    got_boxes, got_scores = _our_proposals(
        anchors, fg, deltas, im_info, post_n, cap=6000, plus_one=False)

    assert got_boxes.shape[0] == post_n  # cap did not starve the output
    assert want_boxes.shape[0] == post_n
    np.testing.assert_allclose(got_scores, want_scores, rtol=1e-6)
    np.testing.assert_allclose(got_boxes, want_boxes, rtol=1e-4, atol=1e-3)


def test_legacy_numpy_proposal_parity_train_12000(ref, rng):
    """The non-E2E numpy path (pre-NMS 12000 cap, +1-width host NMS) is also
    reproducible exactly with plus_one=True."""
    anchors, fh, fw, stride = _real_grid()
    a = 9
    scores_map, deltas_map = _rand_rpn_outputs(rng, fh, fw)
    im_info = np.array([600.0, 1000.0, 1.0])
    want_boxes, want_scores = _ref_proposals(
        ref, scores_map, deltas_map, im_info, "TRAIN", anchors,
        pre_n=12000, post_n=2000, plus_one=True)
    fg = scores_map[0, :, :, a:].reshape(-1)
    got_boxes, got_scores = _our_proposals(
        anchors, fg, deltas_map.reshape(-1, 4), im_info, 2000,
        cap=12000, plus_one=True)
    np.testing.assert_allclose(got_scores, want_scores, rtol=1e-6)
    np.testing.assert_allclose(got_boxes, want_boxes, rtol=1e-4, atol=1e-3)


def _clustered_rpn_outputs(ref, rng, anchors, n_clusters, n_top=6000,
                           hw=(600.0, 1000.0)):
    """Adversarial construction: the n_top highest-scoring anchors all
    decode onto only n_clusters distinct boxes (identical within a cluster,
    far apart across clusters), so NMS inside the cap leaves exactly
    n_clusters survivors. Low-scored anchors decode to well-separated small
    boxes below them."""
    n = anchors.shape[0]
    top_idx = rng.choice(n, n_top, replace=False)
    # distinct 40x40 cluster boxes on a 32px grid kept fully INSIDE the
    # image (clipping a box to zero area would give undefined IoU and break
    # the construction); 32px spacing keeps cross-cluster IoU ~0.11 << 0.7
    cols = int((hw[1] - 45) // 32)
    assert n_clusters <= cols * int((hw[0] - 45) // 32)
    cx = (np.arange(n_clusters) % cols) * 32.0 + 2
    cy = (np.arange(n_clusters) // cols) * 32.0 + 2
    centers = np.stack([cx, cy, cx + 40.0, cy + 40.0], axis=1)
    assign = rng.randint(0, n_clusters, n_top)
    deltas = np.zeros((n, 4), np.float64)
    deltas[top_idx] = ref.bbox_transform.bbox_transform(
        anchors[top_idx].astype(np.float64), centers[assign])
    scores = rng.uniform(0.0, 0.4, n)
    scores[top_idx] = rng.uniform(0.6, 1.0, n_top)
    return scores.astype(np.float32), deltas.astype(np.float32)


def test_cap_boundary_saturated_but_sufficient(ref, rng):
    """400 clusters inside the cap -> survivors (400) >= post_n (300):
    heavy suppression at the cap boundary, still EXACT vs no-cap oracle."""
    anchors, fh, fw, _ = _real_grid()
    scores, deltas = _clustered_rpn_outputs(ref, rng, anchors, 400)
    im_info = np.array([600.0, 1000.0, 1.0])
    a = 9
    scores_map = np.zeros((1, fh, fw, 2 * a), np.float32)
    scores_map[0, :, :, a:] = scores.reshape(fh, fw, a)
    deltas_map = deltas.reshape(1, fh, fw, 4 * a)

    want_boxes, want_scores = _ref_proposals(
        ref, scores_map, deltas_map, im_info, "TEST", anchors,
        pre_n=0, post_n=300, plus_one=False)
    got_boxes, got_scores = _our_proposals(
        anchors, scores, deltas, im_info, 300, cap=6000, plus_one=False)
    assert got_boxes.shape[0] == 300
    np.testing.assert_allclose(got_scores, want_scores, rtol=1e-6)
    np.testing.assert_allclose(got_boxes, want_boxes, rtol=1e-4, atol=1e-3)


def test_cap_boundary_starved_prefix_property(ref, rng):
    """200 clusters < post_n 300: the capped path yields exactly the 200
    in-cap survivors and they are EXACTLY the oracle's first 200 (the
    theorem's prefix property); the no-cap oracle then continues below the
    cap. Raising the cap to N restores full equality."""
    anchors, fh, fw, _ = _real_grid()
    n = anchors.shape[0]
    scores, deltas = _clustered_rpn_outputs(ref, rng, anchors, 200)
    im_info = np.array([600.0, 1000.0, 1.0])
    a = 9
    scores_map = np.zeros((1, fh, fw, 2 * a), np.float32)
    scores_map[0, :, :, a:] = scores.reshape(fh, fw, a)
    deltas_map = deltas.reshape(1, fh, fw, 4 * a)

    want_boxes, want_scores = _ref_proposals(
        ref, scores_map, deltas_map, im_info, "TEST", anchors,
        pre_n=0, post_n=300, plus_one=False)
    assert want_boxes.shape[0] == 300

    got_boxes, got_scores = _our_proposals(
        anchors, scores, deltas, im_info, 300, cap=6000, plus_one=False)
    assert got_boxes.shape[0] == 200          # starved: strict prefix only
    np.testing.assert_allclose(got_scores, want_scores[:200], rtol=1e-6)
    np.testing.assert_allclose(got_boxes, want_boxes[:200],
                               rtol=1e-4, atol=1e-3)

    full_boxes, full_scores = _our_proposals(
        anchors, scores, deltas, im_info, 300, cap=n, plus_one=False)
    assert full_boxes.shape[0] == 300
    np.testing.assert_allclose(full_scores, want_scores, rtol=1e-6)
    np.testing.assert_allclose(full_boxes, want_boxes, rtol=1e-4, atol=1e-3)


def test_full_head_postprocess_parity_real_size(ref, rng):
    """Detection-head postprocess at real scale (R=300 proposals, K=21
    classes, max_per_image=100): oracle is the reference's own
    bbox_transform_inv/clip_boxes (actual imported code) + per-class
    +1-width NMS + global score cap, exactly lib/model/test.py:86-180."""
    from tf_faster_rcnn_tpu.engine.detect import postprocess_detections
    R, K = 300, 21
    scale = 1.6
    ohw = np.array([375.0, 625.0])
    rois = rng.uniform(0, 590, (R, 4))
    rois[:, 2:] = np.minimum(rois[:, :2] + rng.uniform(8, 300, (R, 2)),
                             [599.0, 999.0])
    rois = rois.astype(np.float32)
    logits = (rng.randn(R, K) * 2).astype(np.float32)
    prob = np.exp(logits) / np.exp(logits).sum(-1, keepdims=True)
    pred = (rng.randn(R, 4 * K) * 0.3).astype(np.float32)

    # oracle: reference code on the host
    boxes = rois.astype(np.float64) / scale
    decoded = ref.bbox_transform.bbox_transform_inv(boxes,
                                                    pred.astype(np.float64))
    decoded = ref.bbox_transform.clip_boxes(decoded, ohw)
    want = []
    for c in range(1, K):
        dets = np.hstack([decoded[:, 4 * c:4 * c + 4],
                          prob[:, c:c + 1]]).astype(np.float32)
        keep = nms_cpu(dets, 0.3, plus_one=True, suppress_eq=False)
        want += [(c, dets[k, 4], dets[k, :4]) for k in keep]
    want.sort(key=lambda d: -d[1])
    want = want[:100]

    det, dv = postprocess_detections(
        rois[None], np.ones((1, R), bool), prob[None], pred[None],
        np.array([[600.0, 1000.0, scale]], np.float32), ohw[None],
        num_classes=K, max_per_image=100, nms_thresh=0.3)
    det, dv = np.asarray(det[0]), np.asarray(dv[0])
    got = det[dv]
    assert len(got) == len(want)
    for row, (c, s, b) in zip(got, want):
        assert int(row[0]) == c
        np.testing.assert_allclose(row[1], s, rtol=1e-5)
        np.testing.assert_allclose(row[2:], b, rtol=1e-4, atol=1e-3)
