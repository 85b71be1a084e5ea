"""imdb base-class coverage: proposal recall, external-proposal roidb
construction/merging, and the USE_GT proposal-target path."""

import numpy as np
import scipy.sparse

from tf_faster_rcnn_tpu.datasets.imdb import imdb


class _FakeImdb(imdb):
    """Minimal concrete imdb over in-memory boxes."""

    def __init__(self, gt_entries):
        super().__init__("fake", classes=["__background__", "a", "b"])
        self._image_index = [str(i) for i in range(len(gt_entries))]
        self._entries = gt_entries
        self._roidb_handler = self.gt_roidb

    def gt_roidb(self):
        out = []
        for boxes, classes in self._entries:
            n = len(boxes)
            overlaps = np.zeros((n, self.num_classes), np.float32)
            for i, c in enumerate(classes):
                overlaps[i, c] = 1.0
            out.append({
                "boxes": np.asarray(boxes, np.uint16),
                "gt_classes": np.asarray(classes, np.int32),
                "gt_overlaps": scipy.sparse.csr_matrix(overlaps),
                "flipped": False,
                "seg_areas": np.array(
                    [(b[2] - b[0] + 1) * (b[3] - b[1] + 1) for b in boxes],
                    np.float32),
            })
        return out


def _fake():
    return _FakeImdb([
        ([[10, 10, 50, 50], [60, 60, 120, 120]], [1, 2]),
        ([[20, 20, 80, 90]], [1]),
    ])


def test_evaluate_recall_perfect_proposals():
    db = _fake()
    cands = [e["boxes"].astype(np.float32) for e in db.roidb]
    res = db.evaluate_recall(candidate_boxes=cands)
    assert res["ar"] > 0.99
    assert (res["recalls"] == 1.0).all()


def test_evaluate_recall_partial():
    db = _fake()
    # cover only the first gt of image 0 (second proposal is far away);
    # image 1 has no proposals (skipped but its gt still counts in num_pos)
    cands = [np.array([[10, 10, 50, 50], [300, 300, 340, 340]], np.float32),
             np.zeros((0, 4), np.float32)]
    res = db.evaluate_recall(candidate_boxes=cands)
    np.testing.assert_allclose(res["recalls"], 1.0 / 3.0)


def test_create_roidb_from_box_list_and_merge():
    db = _fake()
    gt = db.gt_roidb()
    box_list = [np.array([[12, 12, 52, 52], [200, 200, 240, 240]],
                         np.float32),
                np.array([[22, 22, 78, 88]], np.float32)]
    prop = db.create_roidb_from_box_list(box_list, gt)
    # near-gt proposal inherits the gt class overlap, far one stays 0
    ov0 = prop[0]["gt_overlaps"].toarray()
    assert ov0[0, 1] > 0.8 and ov0[1].max() == 0.0
    assert (prop[0]["gt_classes"] == 0).all()

    merged = imdb.merge_roidbs(gt, prop)
    assert merged[0]["boxes"].shape[0] == 4
    assert merged[0]["gt_overlaps"].shape == (4, 3)
    assert merged[1]["boxes"].shape[0] == 2


def test_proposal_target_use_gt_appends_gt_boxes():
    """TRAIN.USE_GT appends gt boxes to the candidate pool
    (proposal_target_layer.py:30-36)."""
    import jax
    from tf_faster_rcnn_tpu.models.targets import proposal_target
    gt = np.array([[10, 10, 60, 60, 2]], np.float32)
    gtv = np.array([True])
    # no rpn roi overlaps fg; with use_gt the gt box itself is a candidate
    rois = np.array([[100, 100, 150, 150]], np.float32)
    rv = np.array([True])
    out = proposal_target(rois, rv, gt, gtv, jax.random.PRNGKey(0), 3,
                          batch_size=4, use_gt=True, bg_thresh_lo=0.0)
    labels = np.asarray(out.labels)
    assert (labels == 2).sum() >= 1  # the appended gt sampled as fg
    out2 = proposal_target(rois, rv, gt, gtv, jax.random.PRNGKey(0), 3,
                           batch_size=4, use_gt=False, bg_thresh_lo=0.0)
    assert (np.asarray(out2.labels) == 0).all()  # bg-only without gt append
