"""crop_and_resize vs a from-scratch numpy oracle of TF's documented sampling
rules (SURVEY.md stage 5; reference network.py:141-157, resnet_v1.py:55-76)."""

import numpy as np
import pytest

from tf_faster_rcnn_tpu.ops.roi_align import crop_and_resize, roi_crop_pool


def _np_crop_and_resize(image, boxes, crop_size):
    """Literal per-sample implementation of TF crop_and_resize (bilinear,
    extrapolation_value=0)."""
    h, w, c = image.shape
    ch, cw = crop_size
    out = np.zeros((len(boxes), ch, cw, c), np.float32)
    for r, (y1, x1, y2, x2) in enumerate(boxes):
        for i in range(ch):
            if ch > 1:
                in_y = y1 * (h - 1) + i * (y2 - y1) * (h - 1) / (ch - 1)
            else:
                in_y = 0.5 * (y1 + y2) * (h - 1)
            if in_y < 0 or in_y > h - 1:
                continue
            y0, yf = int(np.floor(in_y)), in_y - np.floor(in_y)
            y1i = min(y0 + 1, h - 1)
            for j in range(cw):
                if cw > 1:
                    in_x = x1 * (w - 1) + j * (x2 - x1) * (w - 1) / (cw - 1)
                else:
                    in_x = 0.5 * (x1 + x2) * (w - 1)
                if in_x < 0 or in_x > w - 1:
                    continue
                x0, xf = int(np.floor(in_x)), in_x - np.floor(in_x)
                x1i = min(x0 + 1, w - 1)
                top = image[y0, x0] * (1 - xf) + image[y0, x1i] * xf
                bot = image[y1i, x0] * (1 - xf) + image[y1i, x1i] * xf
                out[r, i, j] = top * (1 - yf) + bot * yf
    return out


@pytest.mark.parametrize("crop", [(7, 7), (14, 14), (1, 1), (3, 5)])
def test_crop_and_resize_matches_tf_semantics(rng, crop):
    img = rng.randn(20, 30, 4).astype(np.float32)
    boxes = rng.uniform(0, 1, (12, 4)).astype(np.float32)
    # make half the boxes well-formed (y1<y2), leave others arbitrary
    boxes[:6] = np.sort(boxes[:6].reshape(6, 2, 2), axis=1).transpose(0, 2, 1).reshape(6, 4)
    got = np.asarray(crop_and_resize(img, boxes, crop))
    want = _np_crop_and_resize(img, boxes, crop)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_out_of_range_samples_are_zero(rng):
    img = rng.rand(10, 10, 2).astype(np.float32) + 1.0  # strictly positive
    boxes = np.array([[-0.5, -0.5, 0.5, 0.5],   # upper-left samples OOB
                      [0.5, 0.5, 1.5, 1.5]], np.float32)
    out = np.asarray(crop_and_resize(img, boxes, (8, 8)))
    want = _np_crop_and_resize(img, boxes, (8, 8))
    np.testing.assert_allclose(out, want, rtol=1e-4, atol=1e-6)
    assert (out[0, 0, 0] == 0).all()       # OOB corner exactly zero
    assert (out[1, -1, -1] == 0).all()


def test_degenerate_box_constant(rng):
    """Zero-area box samples a single point everywhere."""
    img = rng.rand(16, 16, 3).astype(np.float32)
    boxes = np.array([[0.25, 0.25, 0.25, 0.25]], np.float32)
    out = np.asarray(crop_and_resize(img, boxes, (7, 7)))
    want = _np_crop_and_resize(img, boxes, (7, 7))
    np.testing.assert_allclose(out, want, rtol=1e-4, atol=1e-6)
    assert np.allclose(out, out[0, 0, 0], atol=1e-5)


def test_roi_crop_pool_normalization(rng):
    """Pixel rois are normalized by (dim-1)*stride as in network.py:146-151."""
    feats = rng.randn(2, 8, 12, 6).astype(np.float32)
    stride = 16
    # roi covering the full feature extent maps to normalized (0,0,1,1)
    rois = np.tile(np.array([[0.0, 0.0, (12 - 1) * stride, (8 - 1) * stride]],
                            np.float32), (2, 3, 1))
    out = np.asarray(roi_crop_pool(feats, rois, stride, 7, max_pool=False))
    assert out.shape == (2, 3, 7, 7, 6)
    want = _np_crop_and_resize(feats[0], np.array([[0, 0, 1, 1]], np.float32),
                               (7, 7))
    np.testing.assert_allclose(out[0, 0], want[0], rtol=1e-4, atol=1e-5)
    # batch images differ
    assert not np.allclose(out[0, 0], out[1, 0])


def test_roi_crop_pool_max_pool_path(rng):
    """max_pool=True crops 2x and 2x2/2-max-pools (VGG path)."""
    feats = rng.randn(1, 10, 10, 2).astype(np.float32)
    rois = np.array([[[16.0, 16.0, 100.0, 80.0]]], np.float32)
    out = np.asarray(roi_crop_pool(feats, rois, 16, 7, max_pool=True))
    assert out.shape == (1, 1, 7, 7, 2)
    big = np.asarray(roi_crop_pool(feats, rois, 16, 14, max_pool=False))
    manual = big.reshape(1, 1, 7, 2, 7, 2, 2).max(axis=(3, 5))
    np.testing.assert_allclose(out, manual, rtol=1e-5)


def test_gather_and_einsum_methods_agree(rng):
    img = rng.randn(24, 30, 8).astype(np.float32)
    boxes = rng.uniform(-0.2, 1.2, (20, 4)).astype(np.float32)
    a = np.asarray(crop_and_resize(img, boxes, (7, 7), method="gather"))
    b = np.asarray(crop_and_resize(img, boxes, (7, 7), method="einsum"))
    np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-5)
