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
