"""Pallas NMS kernel (interpret mode on CPU) vs the jnp block NMS and the
native oracle. On real TPU the same kernel was validated exact vs the C++
oracle for n in {300, 6000, 12000} at 0.026-0.3 ms/call."""

import numpy as np
import pytest

from tf_faster_rcnn_tpu.ops.nms import nms_keep_mask
from tf_faster_rcnn_tpu.ops.pallas_nms import pallas_nms_keep_mask


def _sorted_boxes(rng, n):
    c = rng.uniform(30, 350, (n, 2))
    wh = rng.uniform(10, 90, (n, 2))
    dets = np.concatenate([c - wh / 2, c + wh / 2, rng.rand(n, 1)],
                          axis=1).astype(np.float32)
    order = np.argsort(-dets[:, 4], kind="stable")
    return dets[order, :4]


@pytest.mark.parametrize("plus_one,suppress_eq", [
    (False, False), (True, False), (True, True)])
@pytest.mark.parametrize("n", [64, 500, 2048])
def test_pallas_matches_jnp(rng, n, plus_one, suppress_eq):
    boxes = _sorted_boxes(rng, n)
    valid = np.ones(n, bool)
    kp = np.asarray(pallas_nms_keep_mask(boxes, valid, 0.5,
                                         plus_one=plus_one,
                                         suppress_eq=suppress_eq,
                                         interpret=True))
    kj = np.asarray(nms_keep_mask(boxes, valid, 0.5, plus_one=plus_one,
                                  suppress_eq=suppress_eq, use_pallas=False))
    np.testing.assert_array_equal(kp, kj)


def test_pallas_early_exit_prefix(rng):
    """With max_keep, the first max_keep survivors are exact."""
    boxes = _sorted_boxes(rng, 1500)
    valid = np.ones(1500, bool)
    kp = np.asarray(pallas_nms_keep_mask(boxes, valid, 0.5, max_keep=40,
                                         interpret=True))
    kj = np.asarray(nms_keep_mask(boxes, valid, 0.5, use_pallas=False))
    np.testing.assert_array_equal(np.flatnonzero(kp)[:40],
                                  np.flatnonzero(kj)[:40])


def test_pallas_invalid_mask(rng):
    boxes = _sorted_boxes(rng, 256)
    valid = np.ones(256, bool)
    valid[50:90] = False
    kp = np.asarray(pallas_nms_keep_mask(boxes, valid, 0.5, interpret=True))
    kj = np.asarray(nms_keep_mask(boxes, valid, 0.5, use_pallas=False))
    np.testing.assert_array_equal(kp, kj)
    assert not kp[50:90].any()


def test_batched_kernel_matches_per_instance(rng):
    """pallas_batched_nms_keep (interpret mode) == per-instance jnp NMS."""
    from tf_faster_rcnn_tpu.ops.pallas_nms import pallas_batched_nms_keep
    G, N = 13, 96
    boxes = np.stack([_sorted_boxes(rng, N) for _ in range(G)])
    valid = rng.rand(G, N) > 0.1
    for plus_one in (True, False):
        kp = np.asarray(pallas_batched_nms_keep(boxes, valid, 0.4,
                                                plus_one=plus_one,
                                                interpret=True))
        for g in range(G):
            kj = np.asarray(nms_keep_mask(boxes[g], valid[g], 0.4,
                                          plus_one=plus_one,
                                          use_pallas=False))
            np.testing.assert_array_equal(kp[g], kj)


def test_batched_kernel_grid_tiled_lanes(rng):
    """G > 128 instances spans multiple lane-tile grid steps (the COCO
    postprocess shape class that OOMed scoped VMEM untiled); every grid
    step's block must match the per-instance oracle."""
    from tf_faster_rcnn_tpu.ops.pallas_nms import pallas_batched_nms_keep
    G, N = 300, 64
    boxes = np.stack([_sorted_boxes(rng, N) for _ in range(G)])
    valid = rng.rand(G, N) > 0.1
    kp = np.asarray(pallas_batched_nms_keep(boxes, valid, 0.4,
                                            interpret=True))
    # spot-check instances from the first, middle, and last lane tiles
    for g in [0, 127, 128, 200, 255, 256, 299]:
        kj = np.asarray(nms_keep_mask(boxes[g], valid[g], 0.4,
                                      use_pallas=False))
        np.testing.assert_array_equal(kp[g], kj, err_msg=f"instance {g}")
