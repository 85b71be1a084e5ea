"""Fixed-shape greedy non-maximum suppression.

The reference implements NMS three ways: a CUDA block-bitmask kernel
(/root/reference/lib/nms/nms_kernel.cu:34-78, +1-width IoU, suppress at
``iou > thresh``), a Cython CPU loop (lib/nms/cpu_nms.pyx:43-66, suppress at
``iou >= thresh``), and TF's in-graph non_max_suppression used by the default
E2E RPN path (lib/layer_utils/proposal_layer.py:72, standard IoU, suppress at
``iou > thresh``). All return a *dynamic* number of survivors.

This module gives exact greedy NMS as a pure function with static shapes:
a keep *mask* over N padded boxes plus gather helpers that emit a fixed
``max_out``-slot result with a validity mask. The algorithm is the same
row-block scheme as the CUDA kernel: process boxes in score order in blocks
of B; within a block run the (inherently sequential) greedy refinement; then
suppress all later boxes against the block's survivors in one vectorized op,
so the O(N^2) work is vector work and only O(N) tiny steps are sequential.

Everything here jits and vmaps; a Pallas TPU kernel with identical semantics
lives in ops/pallas_nms.py and is dispatched via ``nms_keep_mask`` when
enabled.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax

from tf_faster_rcnn_tpu.ops.boxes import bbox_overlaps

__all__ = ["nms_keep_mask", "select_top_k_mask", "sorted_nms", "class_aware_nms"]

_NEG = -1.0e10


def _pad_to(x, n, axis=0, value=0):
    pad = n - x.shape[axis]
    if pad <= 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths, constant_values=value)


def nms_keep_mask(boxes, valid, iou_threshold, *, plus_one=False,
                  suppress_eq=False, block=128, max_keep=None,
                  use_pallas="auto"):
    """Greedy NMS keep mask for boxes already sorted by descending score.

    boxes: [N, 4]; valid: [N] bool (invalid boxes are never kept and never
    suppress). Returns keep: [N] bool. Exact greedy semantics: box i is kept
    iff no kept j < i has IoU(i, j) over the threshold.

    plus_one: legacy +1-width IoU (CUDA/Cython path) vs standard IoU (TF path).
    suppress_eq: suppress at >= (Cython cpu_nms) vs > (CUDA / TF).
    max_keep: CONTRACT CHANGE — only the first max_keep survivors (in index
    order) are guaranteed exact; later keep bits may be stale (the Pallas arm
    stops refining once max_keep survivors are finalized; the jnp arm stays
    fully exact, a permitted superset of the guarantee). Callers that consume
    the whole mask must leave max_keep=None.

    The dispatch decision (Pallas vs jnp) is captured at trace time when this
    runs under jit — flip cfg.TPU.USE_PALLAS_NMS before building the program
    (spec_from_cfg snapshots it into ModelSpec), not between calls.
    """
    n0 = boxes.shape[0]
    n = -(-n0 // block) * block
    boxes = _pad_to(boxes.astype(jnp.float32), n)
    valid = _pad_to(valid, n, value=False)

    if use_pallas == "auto":
        # the dispatch role of the reference's nms_wrapper (USE_GPU_NMS):
        # Pallas kernel on TPU unless disabled, jnp block NMS otherwise
        from tf_faster_rcnn_tpu.config import cfg
        use_pallas = bool(cfg.TPU.USE_PALLAS_NMS) and _pallas_available()
    if use_pallas:
        from tf_faster_rcnn_tpu.ops.pallas_nms import pallas_nms_keep_mask
        keep = pallas_nms_keep_mask(
            boxes, valid, float(iou_threshold),
            plus_one=plus_one, suppress_eq=suppress_eq, max_keep=max_keep)
        return keep[:n0]

    thresh = jnp.float32(iou_threshold)
    num_blocks = n // block
    j_idx = lax.broadcasted_iota(jnp.int32, (n,), 0)
    blk_idx = lax.broadcasted_iota(jnp.int32, (block,), 0)

    def over(iou):
        return (iou >= thresh) if suppress_eq else (iou > thresh)

    def outer(b, keep):
        s = b * block
        blk_boxes = lax.dynamic_slice(boxes, (s, 0), (block, 4))
        iou_all = bbox_overlaps(blk_boxes, boxes, plus_one=plus_one)  # [B, N]
        iou_in = lax.dynamic_slice(iou_all, (0, s), (block, block))
        bk0 = lax.dynamic_slice(keep, (s,), (block,))

        def inner(i, bk):
            sup = bk[i] & over(iou_in[i]) & (blk_idx > i)
            return bk & ~sup

        bk = lax.fori_loop(0, block, inner, bk0)

        sup_later = jnp.any(bk[:, None] & over(iou_all), axis=0)
        keep = keep & ~(sup_later & (j_idx >= s + block))
        keep = lax.dynamic_update_slice(keep, bk, (s,))
        return keep

    keep = lax.fori_loop(0, num_blocks, outer, valid)
    return keep[:n0]


@functools.lru_cache(maxsize=1)
def _pallas_available():
    try:
        if jax.default_backend() != "tpu":
            return False
        from tf_faster_rcnn_tpu.ops import pallas_nms  # noqa: F401
        return True
    except Exception:
        return False


def select_top_k_mask(mask, k):
    """Indices of the first k True entries of mask (in index order).

    Returns (indices [k] int32, valid [k] bool). Slots past the number of
    True entries point at index 0 with valid=False — the static-shape
    replacement for the reference's dynamic ``keep[:post_nms_topN]`` slicing.
    """
    n = mask.shape[0]
    count = jnp.sum(mask.astype(jnp.int32))
    # top_k on (mask, ascending index) keys — True entries surface first, in
    # index order. Replaces a dynamic scatter, which TPU serializes.
    iota = lax.broadcasted_iota(jnp.int32, (n,), 0)
    key = jnp.where(mask, n - iota, -iota - 1)
    _, idx = lax.top_k(key, min(k, n))
    if k > n:  # degenerate: more slots than candidates
        idx = jnp.concatenate([idx, jnp.zeros((k - n,), idx.dtype)])
    valid = lax.broadcasted_iota(jnp.int32, (k,), 0) < jnp.minimum(count, k)
    idx = jnp.where(valid, idx, 0)
    return idx, valid


def sorted_nms(boxes, scores, valid, iou_threshold, max_out, *,
               plus_one=False, suppress_eq=False, pre_sort_k=None,
               use_pallas="auto"):
    """Sort by score, NMS, return top max_out survivors.

    boxes [N,4], scores [N], valid [N] -> (indices into the *input* arrays
    [max_out], out_valid [max_out]). With pre_sort_k set, only the top
    pre_sort_k scoring boxes enter NMS (the reference's RPN_PRE_NMS_TOP_N;
    the E2E TF path has no such cap so callers pass a large static cap).
    """
    n = boxes.shape[0]
    k = n if pre_sort_k is None else min(int(pre_sort_k), n)
    s = jnp.where(valid, scores, _NEG)
    top_scores, order = lax.top_k(s, k)
    boxes_s = jnp.take(boxes, order, axis=0)
    valid_s = top_scores > _NEG / 2
    keep = nms_keep_mask(boxes_s, valid_s, iou_threshold,
                         plus_one=plus_one, suppress_eq=suppress_eq,
                         max_keep=max_out, use_pallas=use_pallas)
    sel, out_valid = select_top_k_mask(keep, max_out)
    return jnp.take(order, sel), out_valid


def class_aware_nms(boxes, scores, valid, iou_threshold, max_out, *,
                    plus_one=True, suppress_eq=False):
    """Per-class NMS vmapped over a leading class axis.

    boxes [C, N, 4], scores [C, N], valid [C, N] -> (indices [C, max_out],
    valid [C, max_out]). Default +1 IoU matches the reference test-time
    per-class nms() (lib/model/test.py:162-170 -> gpu_nms).
    """
    fn = jax.vmap(
        lambda b, s, v: sorted_nms(b, s, v, iou_threshold, max_out,
                                   plus_one=plus_one, suppress_eq=suppress_eq))
    return fn(boxes, scores, valid)
