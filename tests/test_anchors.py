"""Anchor generation vs the reference's executable output and grid-shift
semantics.

Note: the comment block at lib/layer_utils/generate_anchors.py:14-39 shows
the 1-indexed MATLAB table ([-83, -39, 100, 56], centers at 8.5); the
reference's *code* produces the 0-indexed table below (centers at 7.5),
verified by executing /root/reference/lib/layer_utils/generate_anchors.py in
this environment. We match the executable truth — the values the reference
actually trains/evals with.
"""

import numpy as np

from tf_faster_rcnn_tpu.ops import anchor_grid, generate_anchors

GOLDEN_9 = np.array(
    [[-84., -40., 99., 55.],
     [-176., -88., 191., 103.],
     [-360., -184., 375., 199.],
     [-56., -56., 71., 71.],
     [-120., -120., 135., 135.],
     [-248., -248., 263., 263.],
     [-36., -80., 51., 95.],
     [-80., -168., 95., 183.],
     [-168., -344., 183., 359.]])


def test_golden_anchor_table():
    np.testing.assert_array_equal(generate_anchors(), GOLDEN_9)


def test_coco_anchor_scales():
    a = generate_anchors(scales=np.array([4, 8, 16, 32]))
    assert a.shape == (12, 4)
    # scale-4 ratio-1 anchor is the 16x16 base scaled 4x, centered at 7.5
    np.testing.assert_array_equal(a[4], [-24., -24., 39., 39.])


def test_anchor_grid_layout():
    g = anchor_grid(2, 3, feat_stride=16)
    assert g.shape == (2 * 3 * 9, 4)
    base = generate_anchors()
    # (y=0,x=0) block is the base table
    np.testing.assert_array_equal(g[:9], base.astype(np.float32))
    # width varies fastest: second block shifted by stride in x only
    np.testing.assert_array_equal(g[9:18], (base + [16, 0, 16, 0]).astype(np.float32))
    # row stride: block at (y=1,x=0) shifted by stride in y
    np.testing.assert_array_equal(g[27:36], (base + [0, 16, 0, 16]).astype(np.float32))


def test_anchor_grid_matches_reference_numpy_twin():
    """Independent recomputation of snippets.py:14-30 semantics."""
    h, w, stride = 5, 7, 16
    base = generate_anchors()
    sx, sy = np.meshgrid(np.arange(w) * stride, np.arange(h) * stride)
    shifts = np.vstack([sx.ravel(), sy.ravel(), sx.ravel(), sy.ravel()]).T
    expected = (base[None, :, :] + shifts[:, None, :]).reshape(-1, 4)
    np.testing.assert_array_equal(anchor_grid(h, w, stride),
                                  expected.astype(np.float32))
