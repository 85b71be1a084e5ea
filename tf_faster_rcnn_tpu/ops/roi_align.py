"""RoI feature extraction: crop_and_resize with TF-exact sampling semantics.

The reference pools RoI features with tf.image.crop_and_resize on normalized
boxes scaled by (dim-1)*feat_stride, either 14x14 followed by a 2x2 SAME
max-pool (VGG/MobileNet, /root/reference/lib/nets/network.py:141-157) or a
direct 7x7 crop (ResNet, lib/nets/resnet_v1.py:55-76). Reproducing TF's exact
sampling rules matters for weight-parity mAP (SURVEY.md "hard parts" #3):

* for crop dim > 1:   src = p1*(S-1) + i * (p2-p1)*(S-1)/(crop-1)
* for crop dim == 1:  src = 0.5*(p1+p2)*(S-1)
* a sample whose src coordinate falls outside [0, S-1] in EITHER dimension
  is the extrapolation value (0.0) — no partial blending at the border.

Implemented as a gather-free one-hot matmul pair: the bilinear kernel is
separable, so the crop is two small matrix contractions per axis — MXU work
instead of the scatter/gather lowering that is slow on TPU. All shapes are
static; rois are consumed in batched [B, R, 4] form with a batch dim carried
by vmap.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["crop_and_resize", "roi_crop_pool"]


def _axis_samples(lo, hi, size: int, crop: int, limit=None):
    """Per-output-row source coordinate info implementing TF's sampling
    rules: (i0 [R,crop] int32 floor index, frac [R,crop], in_range [R,crop]).
    Single source of truth for both the einsum and gather crop paths.

    ``limit`` (scalar, may be traced) overrides the in-range upper bound
    ``size - 1``: on a padded canvas the true image covers only the first
    ``ceil(im_h/stride)`` feature rows, and the reference — whose feature
    map IS that size — extrapolates to 0.0 beyond it. Without the override a
    sample just past the image edge would bilinearly blend padded-margin
    activations instead (reference network.py:141-157 semantics lost)."""
    # float op order matters at the extrapolation border: TF's kernel forms
    # the scale as (hi-lo)*(S-1)/(crop-1) and the coordinate as
    # lo*(S-1) + i*scale; computing (s2-s1)/(crop-1) instead rounds an ulp
    # differently and flips the in-range check for boxes that land exactly
    # on S-1 (caught by tests/test_tf_differential.py vs real TF 2.21)
    s1 = lo * (size - 1.0)
    if crop > 1:
        step = (hi - lo) * (size - 1.0) / (crop - 1.0)
        src = s1[:, None] + jnp.arange(crop, dtype=lo.dtype)[None, :] * step[:, None]
    else:
        src = (0.5 * (lo + hi) * (size - 1.0))[:, None]
    hi_bound = (size - 1.0) if limit is None else limit
    in_range = (src >= 0.0) & (src <= hi_bound)
    src_c = jnp.clip(src, 0.0, size - 1.0)
    i0 = jnp.floor(src_c)
    return i0.astype(jnp.int32), src_c - i0, in_range


def _axis_weights(lo, hi, size: int, crop: int, dtype, limit=None):
    """Interpolation matrix W: [R, crop, size] with W[r,i,s] = bilinear weight
    of source row s for output row i of roi r; rows for out-of-range samples
    are all-zero (TF extrapolation-value semantics)."""
    i0, frac, in_range = _axis_samples(lo, hi, size, crop, limit)
    i1 = jnp.minimum(i0 + 1, size - 1)
    grid = jnp.arange(size, dtype=jnp.int32)
    one0 = (grid[None, None, :] == i0[:, :, None]).astype(dtype)
    one1 = (grid[None, None, :] == i1[:, :, None]).astype(dtype)
    frac = frac.astype(dtype)
    w = one0 * (1.0 - frac)[:, :, None] + one1 * frac[:, :, None]
    return w * in_range[:, :, None].astype(dtype)


def crop_and_resize(image, boxes, crop_size, method: str = "einsum",
                    valid_hw=None):
    """TF-exact crop_and_resize for a single image.

    image: [H, W, C]; boxes: [R, 4] normalized (y1, x1, y2, x2);
    crop_size: (crop_h, crop_w). Returns [R, crop_h, crop_w, C].
    valid_hw: optional (vh, vw) scalars — the image's true extent in source
    rows/cols when ``image`` is a padded canvas; samples past it read as the
    extrapolation value 0.0 (see _axis_samples).

    method='einsum' (default): separable one-hot matmul pair — measured
    14.5 ms vs 20 ms for the 4-corner 'gather' variant on v5e at detection
    shapes (8x300 rois, 38x64x1024 features): TPU gathers lower poorly, and
    the matmuls, while K-starved, win. Both are exact; 'gather' is kept as
    the cross-check and for very wide feature maps where the [R, crop, W, C]
    intermediate would dominate.
    """
    h, w, _ = image.shape
    crop_h, crop_w = crop_size
    dtype = image.dtype
    boxes = boxes.astype(jnp.float32)
    lim_h = None if valid_hw is None else valid_hw[0] - 1.0
    lim_w = None if valid_hw is None else valid_hw[1] - 1.0
    if method == "einsum":
        wy = _axis_weights(boxes[:, 0], boxes[:, 2], h, crop_h, dtype, lim_h)
        wx = _axis_weights(boxes[:, 1], boxes[:, 3], w, crop_w, dtype, lim_w)
        # f32 inputs demand full-precision matmuls for the TF-exactness
        # claim ON TPU (default precision multiplies in bf16 — the same
        # gotcha as models/targets.py:75-83); the production bf16 path has
        # nothing to lose and keeps the fast default
        prec = (jax.lax.Precision.HIGHEST if dtype == jnp.float32 else None)
        # contract the axis that leaves the smaller intermediate first —
        # the [R, crop, other_axis, C] tmp dominates HBM traffic
        if crop_h * w <= crop_w * h:
            tmp = jnp.einsum("rih,hwc->riwc", wy, image,
                             preferred_element_type=dtype, precision=prec)
            return jnp.einsum("rjw,riwc->rijc", wx, tmp,
                              preferred_element_type=dtype, precision=prec)
        tmp = jnp.einsum("rjw,hwc->rjhc", wx, image,
                         preferred_element_type=dtype, precision=prec)
        return jnp.einsum("rih,rjhc->rijc", wy, tmp,
                          preferred_element_type=dtype, precision=prec)

    y0, fy, oky = _axis_samples(boxes[:, 0], boxes[:, 2], h, crop_h, lim_h)
    x0, fx, okx = _axis_samples(boxes[:, 1], boxes[:, 3], w, crop_w, lim_w)
    y1 = jnp.minimum(y0 + 1, h - 1)
    x1 = jnp.minimum(x0 + 1, w - 1)
    flat = image.reshape(h * w, -1)

    def flat_idx(yy, xx):  # [R,ch] x [R,cw] -> [R,ch,cw]
        return yy[:, :, None] * w + xx[:, None, :]

    g = lambda idx: jnp.take(flat, idx.reshape(-1), axis=0).reshape(
        idx.shape + (flat.shape[-1],))
    fy_ = fy[:, :, None, None].astype(dtype)
    fx_ = fx[:, None, :, None].astype(dtype)
    top = g(flat_idx(y0, x0)) * (1 - fx_) + g(flat_idx(y0, x1)) * fx_
    bot = g(flat_idx(y1, x0)) * (1 - fx_) + g(flat_idx(y1, x1)) * fx_
    out = top * (1 - fy_) + bot * fy_
    ok = (oky[:, :, None] & okx[:, None, :])[..., None]
    return jnp.where(ok, out, jnp.zeros((), dtype))


def roi_crop_pool(features, rois, feat_stride: int, pool_size: int,
                  max_pool: bool, valid_hw=None):
    """The reference's _crop_pool_layer on batched inputs.

    features: [B, Hf, Wf, C]; rois: [B, R, 4] in *image* pixel coords
    (x1, y1, x2, y2). Normalizes by (dim-1)*stride exactly as
    network.py:146-151 — the (dim-1) cancels inside the sampler, so source
    coordinates are roi/stride, independent of how large the padded canvas
    is. valid_hw: optional [B, 2] per-image valid feature extents (cells);
    samples past them extrapolate to 0.0 exactly as the reference does past
    its (unpadded) feature map edge. Then either crops 2*pool_size and 2x2
    SAME max-pools (max_pool=True: VGG/MobileNet path, and ResNet under
    RESNET.MAX_POOL) or crops pool_size directly. Returns
    [B, R, pool_size, pool_size, C].

    RoI gradients are stopped (the reference stops them too,
    network.py:153).
    """
    _, hf, wf, _ = features.shape
    stride = float(feat_stride)
    height = (hf - 1.0) * stride
    width = (wf - 1.0) * stride
    r = jax.lax.stop_gradient(rois)
    norm = jnp.stack([r[..., 1] / height, r[..., 0] / width,
                      r[..., 3] / height, r[..., 2] / width], axis=-1)
    size = pool_size * 2 if max_pool else pool_size
    if valid_hw is None:
        crops = jax.vmap(lambda f, b: crop_and_resize(f, b, (size, size)))(
            features, norm)
    else:
        crops = jax.vmap(
            lambda f, b, v: crop_and_resize(f, b, (size, size), valid_hw=v))(
                features, norm, valid_hw)
    if max_pool:
        # 2x2/2 max-pool, SAME padding (even input so SAME == VALID here)
        b, n, ch, cw, c = crops.shape
        crops = crops.reshape(b * n, ch, cw, c)
        crops = jax.lax.reduce_window(
            crops, -jnp.inf, jax.lax.max,
            window_dimensions=(1, 2, 2, 1), window_strides=(1, 2, 2, 1),
            padding="SAME")
        crops = crops.reshape(b, n, pool_size, pool_size, c)
    return crops
