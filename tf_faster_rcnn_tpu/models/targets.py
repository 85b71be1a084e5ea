"""On-device training-target sampling with static shapes and functional RNG.

The reference computes both target layers on the host in numpy inside
tf.py_func (anchor_target_layer at /root/reference/lib/layer_utils/
anchor_target_layer.py:18-138, proposal_target_layer at
lib/layer_utils/proposal_target_layer.py:18-152), forcing a
device->host->device round-trip inside every training step. Here both are
pure jnp functions of (arrays, rng key) with fixed shapes, so they live
inside the jitted train step.

Random subsampling semantics: the reference uses npr.choice without
replacement to pick which candidates to keep. The fixed-shape equivalent is
rank-by-uniform-noise (a random permutation of the candidate set) and keep
the first k — the same uniform-without-replacement distribution. The
with-replacement fallback when candidates run short (proposal_target_layer
.py:118-135) is realized by cycling the permuted candidate list, which keeps
every candidate's multiplicity within 1 of any other's (vs iid multinomial
in the reference) — same support, near-identical marginals, and the fg/bg
mix that drives training is preserved exactly.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from tf_faster_rcnn_tpu.ops.boxes import bbox_overlaps, bbox_transform

__all__ = ["AnchorTargets", "ProposalTargets", "anchor_target",
           "proposal_target"]


class AnchorTargets(NamedTuple):
    labels: jnp.ndarray           # [N] int32: 1 fg, 0 bg, -1 ignore
    bbox_targets: jnp.ndarray     # [N, 4]
    bbox_inside_weights: jnp.ndarray   # [N, 4]
    bbox_outside_weights: jnp.ndarray  # [N, 4]


class ProposalTargets(NamedTuple):
    rois: jnp.ndarray             # [S, 4] sampled rois (image coords)
    labels: jnp.ndarray           # [S] int32 class labels (0 = bg)
    bbox_targets: jnp.ndarray     # [S, 4*num_classes]
    bbox_inside_weights: jnp.ndarray   # [S, 4*num_classes]
    bbox_outside_weights: jnp.ndarray  # [S, 4*num_classes]
    valid: jnp.ndarray            # [S] bool (False only if no candidates)


def _random_keep(rng, candidate_mask, k):
    """Keep exactly min(k, count) uniformly-random candidates; returns mask.

    rank-of-each-element = inverse permutation of the argsort; computed as a
    second argsort rather than a scatter — TPU lowers dynamic scatters to a
    serialized loop (measured ~1 ms per 21888-anchor scatter on v5e), while
    argsort is a fast XLA sort.
    """
    n = candidate_mask.shape[0]
    noise = jax.random.uniform(rng, (n,))
    key = jnp.where(candidate_mask, noise, -1.0)
    order = jnp.argsort(-key)  # candidates first, random order
    rank = jnp.argsort(order)  # rank[i] = position of i in `order`
    return candidate_mask & (rank < k)


def _take_rows(table, idx):
    """table[idx] for a small static table via a one-hot matmul.

    TPU dynamic row gathers serialize (measured 8.3 ms for a per-anchor
    gather from the [G,5] gt table at 8x21888 anchors); a [N,G]x[G,C]
    one-hot contraction is exact (each row sums one element) and rides the
    MXU/VPU. Only sensible when G is small (G = padded gt count here).

    Precision.HIGHEST is required for the exactness claim ON TPU: the
    default matmul precision multiplies in bf16, which would round the
    gathered coordinates (up to ~2px above 512px); with full precision a
    1.0 x value one-hot contraction is bit-exact. The matmul is tiny, so
    the cost is nil.
    """
    onehot = jax.nn.one_hot(idx, table.shape[0], dtype=jnp.float32)
    return jnp.matmul(onehot, table.astype(jnp.float32),
                      precision=jax.lax.Precision.HIGHEST)


def anchor_target(anchors, gt_boxes, gt_valid, im_hw, rng, *,
                  rpn_batchsize=256, rpn_fg_fraction=0.5,
                  positive_overlap=0.7, negative_overlap=0.3,
                  clobber_positives=False, positive_weight=-1.0,
                  inside_weight=(1.0, 1.0, 1.0, 1.0)) -> AnchorTargets:
    """RPN training targets for one image (anchor_target_layer parity).

    anchors: [N, 4] (static constant); gt_boxes: [G, 5] padded;
    gt_valid: [G] bool; im_hw: (h, w) floats (true image extent inside the
    padded canvas); rng: PRNG key.
    """
    n = anchors.shape[0]
    inside = ((anchors[:, 0] >= 0) & (anchors[:, 1] >= 0)
              & (anchors[:, 2] < im_hw[1]) & (anchors[:, 3] < im_hw[0]))

    overlaps = bbox_overlaps(anchors, gt_boxes[:, :4])  # [N, G]
    ov = jnp.where(inside[:, None] & gt_valid[None, :], overlaps, -1.0)
    argmax_g = jnp.argmax(ov, axis=1)                    # [N]
    max_ov = jnp.max(ov, axis=1)                         # [N]; -1 if no valid gt
    col_max = jnp.max(ov, axis=0)                        # [G]
    # anchors achieving the per-gt max (incl. the reference's tie semantics)
    is_gt_best = jnp.any(
        gt_valid[None, :] & (col_max[None, :] > -1.0) & (ov == col_max[None, :]),
        axis=1)

    neg = inside & (max_ov < negative_overlap)
    pos = is_gt_best | (inside & (max_ov >= positive_overlap))
    if clobber_positives:
        labels = jnp.full(n, -1)
        labels = jnp.where(pos, 1, labels)
        labels = jnp.where(neg, 0, labels)
    else:
        labels = jnp.where(neg, 0, -1)
        labels = jnp.where(pos, 1, labels)

    # subsample: cap fg at fg_fraction*batch, then bg at batch - num_fg
    rng_fg, rng_bg = jax.random.split(rng)
    num_fg_cap = int(rpn_fg_fraction * rpn_batchsize)
    fg_keep = _random_keep(rng_fg, labels == 1, num_fg_cap)
    labels = jnp.where((labels == 1) & ~fg_keep, -1, labels)
    num_fg = jnp.sum(labels == 1)
    bg_keep = _random_keep(rng_bg, labels == 0, rpn_batchsize - num_fg)
    labels = jnp.where((labels == 0) & ~bg_keep, -1, labels)

    targets = bbox_transform(anchors, _take_rows(gt_boxes[:, :4], argmax_g))
    targets = jnp.where(inside[:, None], targets, 0.0)

    iw = jnp.where((labels == 1)[:, None],
                   jnp.asarray(inside_weight, jnp.float32)[None, :], 0.0)
    num_examples = jnp.maximum(jnp.sum(labels >= 0), 1)
    if positive_weight < 0:
        pw = 1.0 / num_examples
        nw = 1.0 / num_examples
    else:
        pw = positive_weight / jnp.maximum(jnp.sum(labels == 1), 1)
        nw = (1.0 - positive_weight) / jnp.maximum(jnp.sum(labels == 0), 1)
    ow = jnp.where((labels == 1)[:, None], pw,
                   jnp.where((labels == 0)[:, None], nw, 0.0))
    ow = ow * jnp.ones((1, 4), jnp.float32)

    return AnchorTargets(labels.astype(jnp.int32), targets.astype(jnp.float32),
                         iw.astype(jnp.float32), ow.astype(jnp.float32))


def _cycle_pick(order, count, slot):
    """order[slot % count] with count possibly 0 (returns order[0])."""
    c = jnp.maximum(count, 1)
    return order[slot % c]


def proposal_target(rois, roi_valid, gt_boxes, gt_valid, rng, num_classes, *,
                    batch_size=128, fg_fraction=0.25, fg_thresh=0.5,
                    bg_thresh_hi=0.5, bg_thresh_lo=0.1, use_gt=False,
                    normalize_means=(0.0, 0.0, 0.0, 0.0),
                    normalize_stds=(0.1, 0.1, 0.2, 0.2),
                    normalize=True,
                    inside_weight=(1.0, 1.0, 1.0, 1.0)) -> ProposalTargets:
    """RoI-head training targets for one image (proposal_target_layer parity).

    rois: [R, 4] RPN proposals (image coords); roi_valid: [R] bool;
    gt_boxes: [G, 5]; gt_valid: [G]. Output size S = batch_size, always full
    (the reference samples with replacement to exactly BATCH_SIZE rois —
    proposal_target_layer.py:118-135).
    """
    if use_gt:
        rois = jnp.concatenate([rois, gt_boxes[:, :4]], axis=0)
        roi_valid = jnp.concatenate([roi_valid, gt_valid], axis=0)

    overlaps = bbox_overlaps(rois, gt_boxes[:, :4])      # [R', G]
    ov = jnp.where(roi_valid[:, None] & gt_valid[None, :], overlaps, -1.0)
    gt_assign = jnp.argmax(ov, axis=1)
    max_ov = jnp.max(ov, axis=1)
    roi_labels = _take_rows(gt_boxes[:, 4:5], gt_assign)[:, 0]

    fg_mask = roi_valid & (max_ov >= fg_thresh)
    bg_mask = roi_valid & (max_ov < bg_thresh_hi) & (max_ov >= bg_thresh_lo)
    fg_count = jnp.sum(fg_mask.astype(jnp.int32))
    bg_count = jnp.sum(bg_mask.astype(jnp.int32))

    fg_per_image = int(round(fg_fraction * batch_size))
    # reference branch structure (proposal_target_layer.py:119-132):
    #   both present -> fg = min(cap, fg_count), bg fills the rest
    #   fg only      -> all slots fg (with replacement)
    #   bg only      -> all slots bg, labels forced 0
    num_fg = jnp.where(
        (fg_count > 0) & (bg_count > 0),
        jnp.minimum(fg_per_image, fg_count),
        jnp.where(fg_count > 0, batch_size, 0)).astype(jnp.int32)

    rng_fg, rng_bg = jax.random.split(rng)
    rp = rois.shape[0]
    noise_fg = jax.random.uniform(rng_fg, (rp,))
    noise_bg = jax.random.uniform(rng_bg, (rp,))
    fg_order = jnp.argsort(-jnp.where(fg_mask, noise_fg, -1.0))
    bg_order = jnp.argsort(-jnp.where(bg_mask, noise_bg, -1.0))

    slots = jax.lax.broadcasted_iota(jnp.int32, (batch_size,), 0)
    is_fg_slot = slots < num_fg
    idx = jnp.where(is_fg_slot,
                    _cycle_pick(fg_order, fg_count, slots),
                    _cycle_pick(bg_order, bg_count, slots - num_fg))

    labels = jnp.where(is_fg_slot, roi_labels[idx], 0.0).astype(jnp.int32)
    out_rois = rois[idx]
    valid = jnp.broadcast_to((fg_count + bg_count) > 0, (batch_size,))
    labels = jnp.where(valid, labels, 0)

    targets = bbox_transform(
        out_rois, _take_rows(gt_boxes[:, :4], gt_assign[idx]))
    if normalize:
        targets = ((targets - jnp.asarray(normalize_means, jnp.float32))
                   / jnp.asarray(normalize_stds, jnp.float32))

    # expand to the 4K per-class layout (proposal_target_layer.py:58-80)
    onehot = jax.nn.one_hot(labels, num_classes, dtype=jnp.float32)  # [S, K]
    is_fg = (labels > 0) & valid
    t4k = (onehot[:, :, None] * targets[:, None, :]).reshape(
        batch_size, 4 * num_classes)
    iw4k = (onehot[:, :, None]
            * jnp.asarray(inside_weight, jnp.float32)[None, None, :]).reshape(
        batch_size, 4 * num_classes)
    t4k = jnp.where(is_fg[:, None], t4k, 0.0)
    iw4k = jnp.where(is_fg[:, None], iw4k, 0.0)
    ow4k = (iw4k > 0).astype(jnp.float32)

    return ProposalTargets(out_rois.astype(jnp.float32), labels,
                           t4k.astype(jnp.float32), iw4k, ow4k, valid)
