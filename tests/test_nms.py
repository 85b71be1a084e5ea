"""Fixed-shape NMS vs the native C++ oracle and the numpy py_cpu_nms oracle
(SURVEY.md stage 4). Exercises all three reference semantic variants."""

import numpy as np
import pytest

from tf_faster_rcnn_tpu.ops.nms import (class_aware_nms, nms_keep_mask,
                                        select_top_k_mask, sorted_nms)
from tf_faster_rcnn_tpu.utils.native import nms_cpu, py_cpu_nms


def _rand_dets(rng, n, hw=(400, 600), cluster=True):
    h, w = hw
    if cluster:
        # clustered boxes so NMS actually suppresses
        centers = rng.uniform(50, min(h, w) - 50, size=(max(n // 8, 1), 2))
        idx = rng.randint(0, len(centers), n)
        c = centers[idx] + rng.randn(n, 2) * 12
    else:
        c = rng.uniform(20, min(h, w) - 20, size=(n, 2))
    wh = rng.uniform(10, 80, size=(n, 2))
    x1 = np.clip(c[:, 0] - wh[:, 0] / 2, 0, w - 2)
    y1 = np.clip(c[:, 1] - wh[:, 1] / 2, 0, h - 2)
    x2 = np.clip(x1 + wh[:, 0], x1 + 1, w - 1)
    y2 = np.clip(y1 + wh[:, 1], y1 + 1, h - 1)
    scores = rng.uniform(0.01, 1.0, n)
    return np.stack([x1, y1, x2, y2, scores], axis=1).astype(np.float32)


def _keep_via_mask(dets, thresh, plus_one, suppress_eq):
    """Run our fixed-shape path end-to-end: sort, mask, gather survivors."""
    order = np.argsort(-dets[:, 4], kind="stable")
    boxes = dets[order, :4]
    valid = np.ones(len(dets), bool)
    keep = np.asarray(nms_keep_mask(boxes, valid, thresh, plus_one=plus_one,
                                    suppress_eq=suppress_eq, use_pallas=False))
    return sorted(order[keep].tolist())


@pytest.mark.parametrize("plus_one,suppress_eq", [
    (True, True),    # cpu_nms.pyx semantics
    (True, False),   # CUDA gpu kernel semantics
    (False, False),  # TF non_max_suppression semantics (default RPN path)
])
@pytest.mark.parametrize("n", [1, 7, 128, 131, 500])
def test_nms_matches_native_oracle(rng, n, plus_one, suppress_eq):
    dets = _rand_dets(rng, n)
    expected = sorted(nms_cpu(dets, 0.5, plus_one=plus_one,
                              suppress_eq=suppress_eq).tolist())
    got = _keep_via_mask(dets, 0.5, plus_one, suppress_eq)
    assert got == expected


def test_nms_matches_py_cpu_nms_oracle(rng):
    dets = _rand_dets(rng, 200)
    expected = sorted(py_cpu_nms(dets, 0.3))
    got = _keep_via_mask(dets, 0.3, plus_one=True, suppress_eq=False)
    assert got == expected


def test_nms_thresholds(rng):
    dets = _rand_dets(rng, 300)
    for t in (0.1, 0.3, 0.7, 0.9):
        expected = sorted(nms_cpu(dets, t, plus_one=False, suppress_eq=False).tolist())
        assert _keep_via_mask(dets, t, False, False) == expected


def test_invalid_boxes_ignored(rng):
    dets = _rand_dets(rng, 64)
    order = np.argsort(-dets[:, 4], kind="stable")
    boxes = dets[order, :4]
    valid = np.ones(64, bool)
    valid[10:20] = False  # mark some mid-order boxes invalid
    keep = np.asarray(nms_keep_mask(boxes, valid, 0.5, use_pallas=False))
    assert not keep[10:20].any()
    # survivors must equal NMS over the valid subset alone
    sub = np.flatnonzero(valid)
    keep_sub = np.asarray(nms_keep_mask(boxes[sub], np.ones(len(sub), bool),
                                        0.5, use_pallas=False))
    assert np.array_equal(keep[sub], keep_sub)


def test_select_top_k_mask():
    mask = np.array([0, 1, 1, 0, 1, 0, 1, 1], bool)
    idx, valid = select_top_k_mask(mask, 3)
    assert np.asarray(idx).tolist() == [1, 2, 4]
    assert np.asarray(valid).all()
    idx, valid = select_top_k_mask(mask, 8)
    assert np.asarray(idx)[:5].tolist() == [1, 2, 4, 6, 7]
    assert np.asarray(valid).tolist() == [True] * 5 + [False] * 3
    # k > n (more output slots than candidates): pad slots invalid, idx 0
    idx, valid = select_top_k_mask(mask, 11)
    assert np.asarray(idx)[:5].tolist() == [1, 2, 4, 6, 7]
    assert np.asarray(valid).tolist() == [True] * 5 + [False] * 6
    assert np.asarray(idx)[5:].tolist() == [0] * 6
    # all-False mask
    idx, valid = select_top_k_mask(np.zeros(8, bool), 3)
    assert not np.asarray(valid).any()
    assert np.asarray(idx).tolist() == [0, 0, 0]


def test_sorted_nms_fixed_output(rng):
    dets = _rand_dets(rng, 400)
    idx, valid = sorted_nms(dets[:, :4], dets[:, 4], np.ones(400, bool),
                            0.7, 50, use_pallas=False)
    idx, valid = np.asarray(idx), np.asarray(valid)
    expected = nms_cpu(dets, 0.7, plus_one=False, suppress_eq=False)[:50]
    assert idx[valid].tolist() == expected[:valid.sum()].tolist()
    # survivors come out in descending score order
    s = dets[idx[valid], 4]
    assert np.all(np.diff(s) <= 0)


def test_sorted_nms_pre_sort_cap(rng):
    """pre_sort_k caps the boxes entering NMS, like RPN_PRE_NMS_TOP_N."""
    dets = _rand_dets(rng, 300)
    order = np.argsort(-dets[:, 4], kind="stable")[:100]
    sub = dets[order]
    expected = sorted(order[nms_cpu(sub, 0.5, plus_one=False,
                                    suppress_eq=False)].tolist())[:100]
    idx, valid = sorted_nms(dets[:, :4], dets[:, 4], np.ones(300, bool),
                            0.5, 100, pre_sort_k=100, use_pallas=False)
    got = sorted(np.asarray(idx)[np.asarray(valid)].tolist())
    assert got == sorted(expected)[:len(got)]


def test_class_aware_nms_shape(rng):
    C, N = 4, 80
    boxes = np.stack([_rand_dets(rng, N)[:, :4] for _ in range(C)])
    scores = rng.rand(C, N).astype(np.float32)
    valid = np.ones((C, N), bool)
    idx, v = class_aware_nms(boxes, scores, valid, 0.3, 16)
    assert np.asarray(idx).shape == (C, 16)
    # each class independently matches the oracle
    for c in range(C):
        dets = np.concatenate([boxes[c], scores[c, :, None]], axis=1)
        expected = nms_cpu(dets, 0.3, plus_one=True, suppress_eq=False)[:16]
        got = np.asarray(idx[c])[np.asarray(v[c])]
        assert got.tolist() == expected[:len(got)].tolist()


def test_sorted_nms_property_fuzz():
    """Property fuzz (hypothesis): sorted_nms == the pure-python reference
    oracle on adversarial integer-coordinate boxes — exact duplicates,
    containment chains, zero-extent boxes — with distinct scores (greedy
    NMS is only well-defined up to score ties)."""
    from hypothesis import given, settings, strategies as st

    from tf_faster_rcnn_tpu.ops.nms import sorted_nms
    from tf_faster_rcnn_tpu.utils.native import py_cpu_nms

    @settings(max_examples=40, deadline=None)
    @given(st.data())
    def run(data):
        n = data.draw(st.integers(1, 48), label="n")
        coord = st.integers(0, 24)
        side = st.integers(0, 24)
        rows = data.draw(st.lists(
            st.tuples(coord, coord, side, side), min_size=n, max_size=n),
            label="boxes")
        boxes = np.array([[x, y, x + w, y + h] for x, y, w, h in rows],
                         np.float32)
        seed = data.draw(st.integers(0, 2 ** 31 - 1), label="seed")
        scores = np.linspace(1.0, 0.1, n).astype(np.float32)
        np.random.RandomState(seed).shuffle(scores)
        thresh = data.draw(st.sampled_from([0.1, 0.3, 0.5, 0.7]),
                           label="thresh")

        idx, valid = sorted_nms(boxes, scores, np.ones(n, bool), thresh, n,
                                plus_one=True, use_pallas=False)
        got = [int(i) for i, v in zip(np.asarray(idx), np.asarray(valid))
               if v]
        dets = np.hstack([boxes, scores[:, None]]).astype(np.float32)
        want = [int(i) for i in py_cpu_nms(dets, thresh)]
        assert got == want, (boxes.tolist(), scores.tolist(), thresh)

    run()
