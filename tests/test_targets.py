"""On-device target layers vs a from-scratch numpy transcription of the
reference rules (anchor_target_layer.py:18-138, proposal_target_layer.py:
18-152), on inputs small enough that random subsampling does not trigger."""

import jax
import numpy as np

from tf_faster_rcnn_tpu.models.targets import anchor_target, proposal_target
from tf_faster_rcnn_tpu.ops.anchors import anchor_grid
from tf_faster_rcnn_tpu.utils.native import bbox_overlaps_cpu


def _np_anchor_labels(anchors, gt, im_hw, pos_ov=0.7, neg_ov=0.3):
    """Reference labeling rules, no subsampling."""
    n = len(anchors)
    inside = ((anchors[:, 0] >= 0) & (anchors[:, 1] >= 0)
              & (anchors[:, 2] < im_hw[1]) & (anchors[:, 3] < im_hw[0]))
    ins = np.flatnonzero(inside)
    labels = np.full(n, -1.0)
    if len(ins) and len(gt):
        ov = bbox_overlaps_cpu(anchors[ins], gt[:, :4])
        max_ov = ov.max(axis=1)
        gt_max = ov.max(axis=0)
        sub = np.full(len(ins), -1.0)
        sub[max_ov < neg_ov] = 0
        sub[np.where(ov == gt_max)[0]] = 1
        sub[max_ov >= pos_ov] = 1
        labels[ins] = sub
    return labels, inside


def test_anchor_target_labels_match_reference_rules(rng):
    anchors = anchor_grid(8, 8, 16, anchor_scales=(2, 4), anchor_ratios=(0.5, 1, 2))
    gt = np.array([[20, 20, 60, 70, 3], [50, 40, 100, 90, 7],
                   [0, 0, 0, 0, 0]], np.float32)
    gtv = np.array([True, True, False])
    im_hw = (120.0, 124.0)
    out = anchor_target(anchors, gt, gtv, im_hw, jax.random.PRNGKey(0),
                        rpn_batchsize=100000)  # no subsampling
    want, inside = _np_anchor_labels(anchors, gt[:2], im_hw)
    got = np.asarray(out.labels)
    np.testing.assert_array_equal(got, want.astype(np.int32))
    # fg anchors have inside weight 1, others 0
    assert (np.asarray(out.bbox_inside_weights)[got == 1] == 1).all()
    assert (np.asarray(out.bbox_inside_weights)[got != 1] == 0).all()
    # outside weights: uniform 1/num_examples on labeled anchors
    n_ex = (got >= 0).sum()
    ow = np.asarray(out.bbox_outside_weights)
    np.testing.assert_allclose(ow[got >= 0], 1.0 / n_ex, rtol=1e-6)
    assert (ow[got == -1] == 0).all()


def test_anchor_target_subsampling_counts(rng):
    """With many candidates the sampled batch is exactly RPN_BATCHSIZE with
    at most RPN_FG_FRACTION foreground."""
    anchors = anchor_grid(16, 16, 16, anchor_scales=(1, 2, 4))
    # one gt overlapping many anchors
    gt = np.array([[40, 40, 140, 140, 1]], np.float32)
    gtv = np.array([True])
    out = anchor_target(anchors, gt, gtv, (256.0, 256.0),
                        jax.random.PRNGKey(1), rpn_batchsize=64,
                        rpn_fg_fraction=0.5)
    labels = np.asarray(out.labels)
    assert (labels >= 0).sum() == 64
    assert (labels == 1).sum() <= 32
    # different key -> different subsample
    out2 = anchor_target(anchors, gt, gtv, (256.0, 256.0),
                         jax.random.PRNGKey(2), rpn_batchsize=64,
                         rpn_fg_fraction=0.5)
    assert not np.array_equal(labels, np.asarray(out2.labels))


def test_anchor_target_bbox_targets(rng):
    from tf_faster_rcnn_tpu.ops.boxes import bbox_transform
    anchors = anchor_grid(4, 4, 16, anchor_scales=(2,), anchor_ratios=(1,))
    gt = np.array([[8, 8, 40, 40, 2]], np.float32)
    gtv = np.array([True])
    out = anchor_target(anchors, gt, gtv, (64.0, 64.0), jax.random.PRNGKey(0))
    want = np.asarray(bbox_transform(anchors, np.tile(gt[:, :4], (16, 1))))
    inside = ((anchors[:, 0] >= 0) & (anchors[:, 1] >= 0)
              & (anchors[:, 2] < 64) & (anchors[:, 3] < 64))
    got = np.asarray(out.bbox_targets)
    np.testing.assert_allclose(got[inside], want[inside], rtol=1e-5, atol=1e-5)
    assert (got[~inside] == 0).all()


def test_proposal_target_mix_and_labels(rng):
    """fg/bg split, label assignment, and 4K target expansion."""
    gt = np.array([[10, 10, 50, 50, 3], [60, 60, 100, 100, 7]], np.float32)
    gtv = np.array([True, True])
    # build rois: 3 exact-fg (on gt), 5 partial bg overlaps, 2 invalid
    rois = np.array([
        [10, 10, 50, 50], [60, 60, 100, 100], [12, 12, 52, 52],
        [10, 40, 50, 80], [55, 20, 95, 55], [30, 60, 70, 95],
        [0, 60, 45, 105], [60, 0, 100, 42],
        [0, 0, 0, 0], [0, 0, 0, 0]], np.float32)
    rv = np.array([True] * 8 + [False, False])
    out = proposal_target(rois, rv, gt, gtv, jax.random.PRNGKey(0), 21,
                          batch_size=8, fg_fraction=0.25, bg_thresh_lo=0.0)
    labels = np.asarray(out.labels)
    assert out.valid.all()
    # fg slots first: exactly min(2, fg_count) fg with correct class labels
    n_fg = (labels > 0).sum()
    assert n_fg == 2  # fg_per_image = round(0.25*8) = 2, fg_count = 3
    assert set(labels[labels > 0]) <= {3, 7}
    assert (labels[n_fg:] == 0).all()
    # 4K expansion: fg rows have their class columns set, bg rows all zero
    t = np.asarray(out.bbox_targets)
    iw = np.asarray(out.bbox_inside_weights)
    for i in range(8):
        c = labels[i]
        if c > 0:
            assert (iw[i, 4 * c:4 * c + 4] == 1).all()
            other = np.ones(84, bool)
            other[4 * c:4 * c + 4] = False
            assert (iw[i, other] == 0).all()
        else:
            assert (iw[i] == 0).all()
    ow = np.asarray(out.bbox_outside_weights)
    np.testing.assert_array_equal(ow, (iw > 0).astype(np.float32))


def test_proposal_target_normalization():
    """Targets are (t - mean)/std normalized (proposal_target_layer.py:91-94)."""
    from tf_faster_rcnn_tpu.ops.boxes import bbox_transform
    gt = np.array([[10, 10, 50, 50, 1]], np.float32)
    gtv = np.array([True])
    rois = np.array([[12, 8, 48, 54]], np.float32)
    rv = np.array([True])
    out = proposal_target(rois, rv, gt, gtv, jax.random.PRNGKey(0), 2,
                          batch_size=1, fg_fraction=1.0)
    raw = np.asarray(bbox_transform(rois, gt[:, :4]))[0]
    want = raw / np.array([0.1, 0.1, 0.2, 0.2])
    got = np.asarray(out.bbox_targets)[0, 4:8]
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_proposal_target_bg_only():
    """No fg candidates -> all slots bg with label 0 (reference elif bg)."""
    gt = np.array([[10, 10, 30, 30, 5]], np.float32)
    gtv = np.array([True])
    rois = np.tile(np.array([[100, 100, 140, 140]], np.float32), (6, 1))
    rv = np.ones(6, bool)
    out = proposal_target(rois, rv, gt, gtv, jax.random.PRNGKey(0), 21,
                          batch_size=4, bg_thresh_lo=0.0)
    assert out.valid.all()
    assert (np.asarray(out.labels) == 0).all()
    assert (np.asarray(out.bbox_inside_weights) == 0).all()


def test_proposal_target_fg_only():
    """No bg candidates -> all slots fg (reference elif fg branch)."""
    gt = np.array([[10, 10, 50, 50, 5]], np.float32)
    gtv = np.array([True])
    rois = np.tile(np.array([[11, 11, 51, 51]], np.float32), (3, 1))
    rv = np.ones(3, bool)
    out = proposal_target(rois, rv, gt, gtv, jax.random.PRNGKey(0), 21,
                          batch_size=4, bg_thresh_lo=0.1)
    assert out.valid.all()
    assert (np.asarray(out.labels) == 5).all()
