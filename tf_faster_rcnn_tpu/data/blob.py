"""Image blob preparation.

Resize/mean-subtract semantics parity with the reference (/root/reference/
lib/utils/blob.py:17-47, lib/model/test.py:26-58): BGR channel order,
PIXEL_MEANS subtraction, shortest-side scaling to the target SCALES capped by
MAX_SIZE. The TPU difference: instead of padding each batch to its own max
shape (dynamic), images are placed top-left into a fixed canvas so every
batch compiles to the same program; the true extent travels in im_info.
"""

from __future__ import annotations

import os
from concurrent.futures import ThreadPoolExecutor
from typing import Tuple

import cv2
import numpy as np

_POOL = None


def image_pool() -> ThreadPoolExecutor:
    """Shared thread pool for per-image decode/resize/pad work. cv2 releases
    the GIL, so batch prep scales with cores — the single-producer prep was
    measured at 41 img/s host-side vs 184 img/s device-side (v5e, batch 8),
    making the host the end-to-end eval bottleneck."""
    global _POOL
    if _POOL is None:
        _POOL = ThreadPoolExecutor(
            max_workers=min(16, os.cpu_count() or 8),
            thread_name_prefix="imgprep")
    return _POOL


def transfer_dtype() -> np.dtype:
    """Host->device dtype for image batches: the compute dtype.

    The model's first op casts the image to TPU.COMPUTE_DTYPE
    (models/network.py), so shipping canvases already cast is numerically
    identical and halves PCIe/relay bytes and canvas memset cost for bf16
    runs. f32 runs are unchanged."""
    from tf_faster_rcnn_tpu.config import cfg
    name = str(cfg.TPU.COMPUTE_DTYPE)
    if name in ("float32", "float64"):
        return np.dtype(np.float32)
    import ml_dtypes
    return np.dtype(getattr(ml_dtypes, name))


def prep_im_for_blob(im, pixel_means, target_size, max_size):
    """Mean-subtract and scale an image for use in a blob.

    im: HxWx3 BGR uint8/float. Returns (float image, scale).
    """
    im = im.astype(np.float32, copy=False)
    im = im - pixel_means
    im_shape = im.shape
    im_size_min = np.min(im_shape[0:2])
    im_size_max = np.max(im_shape[0:2])
    im_scale = float(target_size) / float(im_size_min)
    # prevent the biggest axis from being more than MAX_SIZE
    if np.round(im_scale * im_size_max) > max_size:
        im_scale = float(max_size) / float(im_size_max)
    im = cv2.resize(im, None, None, fx=im_scale, fy=im_scale,
                    interpolation=cv2.INTER_LINEAR)
    return im, im_scale


def place_on_canvas(dest, im, s2d: bool):
    """Write a prepared [h, w, 3] image into one canvas slot, top-left
    anchored, applying the host space-to-depth transform when the batch
    ships in the s2d layout (see batch_image_shape). Returns (h, w), the
    true extent in IMAGE coordinates (im_info units, pre-s2d).

    Images larger than the canvas are an error — callers derive the canvas
    from SCALES/MAX_SIZE so this can't happen with consistent config.
    """
    h, w = im.shape[0], im.shape[1]
    ch, cw = (dest.shape[0] * 2, dest.shape[1] * 2) if s2d else dest.shape[:2]
    assert h <= ch and w <= cw, f"image {h}x{w} exceeds canvas {ch}x{cw}"
    if s2d:
        im = space_to_depth(im)
    dest[:im.shape[0], :im.shape[1]] = im
    return h, w


def space_to_depth(im):
    """Host-side 2x2 space-to-depth of one [H, W, C] image (odd extents are
    zero-padded to even — identical to the zeros of the canvas it lands on).

    Pairs with the ResNet 4x4 stem (models/resnet_v1.py s2d_conv1_kernel):
    the relayout costs more than the fast stem saves when done on-device, so
    under cfg.TPU.SPACE_TO_DEPTH the batch builders ship images already
    transformed ([B, H/2, W/2, 4C] canvases)."""
    h, w, c = im.shape
    ph, pw = h % 2, w % 2
    if ph or pw:
        im = np.pad(im, ((0, ph), (0, pw), (0, 0)))
        h, w = h + ph, w + pw
    im = im.reshape(h // 2, 2, w // 2, 2, c).transpose(0, 2, 1, 3, 4)
    return im.reshape(h // 2, w // 2, 4 * c)


def batch_image_shape(b: int, canvas_hw: Tuple[int, int]):
    """Shape of the image batch array the host ships: the raw canvas, or
    the 2x2 space-to-depth layout under cfg.TPU.SPACE_TO_DEPTH."""
    from tf_faster_rcnn_tpu.config import cfg
    ch, cw = canvas_hw
    if bool(cfg.TPU.SPACE_TO_DEPTH):
        assert ch % 2 == 0 and cw % 2 == 0, "canvas must be even for s2d"
        return (b, ch // 2, cw // 2, 12), True
    return (b, ch, cw, 3), False


def read_image_bgr(path):
    """cv2 imread (BGR, matching the reference's pixel means order)."""
    im = cv2.imread(path)
    assert im is not None, f"failed to read image {path}"
    return im
