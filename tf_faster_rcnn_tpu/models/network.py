"""The Faster R-CNN detector as one fixed-shape flax module.

TPU-native counterpart of the reference's Network base class
(/root/reference/lib/nets/network.py:26-454). The whole image-to-predictions
graph — backbone head, RPN, anchor decode, NMS proposal selection, training
target sampling, RoI crop, tail, classification/regression heads, test-time
bbox un-normalization — is a single pure function and compiles to one XLA
program per mode. Differences from the reference are all shape discipline:

* batched [B, H, W, 3] input on a static padded canvas (the reference pins
  batch to 1 and uses dynamic H/W, network.py:388);
* proposals are a fixed post_nms_top_n slots + validity mask (vs the
  dynamic [None, 5] rois of network.py:128);
* both target layers run on-device (vs tf.py_func, network.py:164,187).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from tf_faster_rcnn_tpu.models import mobilenet_v1, resnet_v1, vgg16
from tf_faster_rcnn_tpu.models.layers import normal_init
from tf_faster_rcnn_tpu.models.targets import anchor_target, proposal_target
from tf_faster_rcnn_tpu.ops.anchors import anchor_grid
from tf_faster_rcnn_tpu.ops.boxes import (BBOX_XFORM_CLIP,
                                          bbox_transform_inv, clip_boxes)
from tf_faster_rcnn_tpu.ops.nms import sorted_nms
from tf_faster_rcnn_tpu.ops.roi_align import roi_crop_pool

__all__ = ["ModelSpec", "FasterRCNN", "spec_from_cfg"]

BACKBONES = ("vgg16", "res50", "res101", "res152", "mobile")


@dataclasses.dataclass(frozen=True)
class ModelSpec:
    """Static snapshot of everything the jitted graph needs from cfg."""
    backbone: str
    num_classes: int
    mode: str                      # 'TRAIN' | 'TEST'
    anchor_scales: Tuple[int, ...] = (8, 16, 32)
    anchor_ratios: Tuple[float, ...] = (0.5, 1.0, 2.0)
    feat_stride: int = 16
    rpn_channels: int = 512
    pooling_size: int = 7
    resnet_max_pool: bool = False
    depth_multiplier: float = 1.0
    truncated: bool = False
    compute_dtype: str = "float32"
    # proposal selection
    rpn_pre_nms_top_n: int = 6000
    rpn_post_nms_top_n: int = 300
    rpn_nms_thresh: float = 0.7
    test_mode: str = "nms"         # 'nms' | 'top'
    rpn_top_n: int = 5000
    use_pallas_nms: bool = True    # the reference's USE_GPU_NMS analog
    space_to_depth: bool = False   # exact 4x4 resnet stem (TPU.SPACE_TO_DEPTH)
    # freeze prefixes (RESNET.FIXED_BLOCKS / MOBILENET.FIXED_LAYERS). The
    # optimizer mask makes the updates zero; the heads ALSO stop_gradient at
    # the freeze boundary so XLA prunes the whole backward pass through the
    # frozen stem (the reference gets this from trainable=False/slim scopes)
    fixed_blocks: int = 1
    fixed_layers: int = 5
    # RPN target sampling (TRAIN)
    rpn_batchsize: int = 256
    rpn_fg_fraction: float = 0.5
    rpn_positive_overlap: float = 0.7
    rpn_negative_overlap: float = 0.3
    rpn_clobber_positives: bool = False
    rpn_positive_weight: float = -1.0
    rpn_bbox_inside_weights: Tuple[float, ...] = (1.0, 1.0, 1.0, 1.0)
    # RoI target sampling (TRAIN)
    roi_batch_size: int = 128
    fg_fraction: float = 0.25
    fg_thresh: float = 0.5
    bg_thresh_hi: float = 0.5
    bg_thresh_lo: float = 0.1
    use_gt: bool = False
    bbox_inside_weights: Tuple[float, ...] = (1.0, 1.0, 1.0, 1.0)
    bbox_normalize: bool = True
    bbox_normalize_means: Tuple[float, ...] = (0.0, 0.0, 0.0, 0.0)
    bbox_normalize_stds: Tuple[float, ...] = (0.1, 0.1, 0.2, 0.2)

    @property
    def num_anchors(self) -> int:
        return len(self.anchor_scales) * len(self.anchor_ratios)

    @property
    def dtype(self):
        return jnp.dtype(self.compute_dtype)


def spec_from_cfg(backbone: str, num_classes: int, mode: str) -> ModelSpec:
    """Snapshot the global cfg into a hashable static spec."""
    from tf_faster_rcnn_tpu.config import cfg
    phase = cfg.TRAIN if mode == "TRAIN" else cfg.TEST
    pre = int(phase.RPN_PRE_NMS_TOP_N)
    if cfg.TPU.RPN_NMS_CAP:
        pre = int(cfg.TPU.RPN_NMS_CAP)
    if cfg.TPU.SPACE_TO_DEPTH and backbone not in ("res50", "res101",
                                                   "res152"):
        raise ValueError("TPU.SPACE_TO_DEPTH supports ResNet backbones only")
    if cfg.POOLING_MODE != "crop":
        # same contract as the reference graph builder (network.py:253-260):
        # 'crop' (crop_and_resize RoI extraction) is the only mode
        raise NotImplementedError(
            f"POOLING_MODE {cfg.POOLING_MODE!r}: only 'crop' exists")
    return ModelSpec(
        backbone=backbone,
        num_classes=num_classes,
        mode=mode,
        anchor_scales=tuple(cfg.ANCHOR_SCALES),
        anchor_ratios=tuple(cfg.ANCHOR_RATIOS),
        rpn_channels=int(cfg.RPN_CHANNELS),
        pooling_size=int(cfg.POOLING_SIZE),
        resnet_max_pool=bool(cfg.RESNET.MAX_POOL),
        depth_multiplier=float(cfg.MOBILENET.DEPTH_MULTIPLIER),
        truncated=bool(cfg.TRAIN.TRUNCATED),
        compute_dtype=str(cfg.TPU.COMPUTE_DTYPE),
        rpn_pre_nms_top_n=pre,
        rpn_post_nms_top_n=int(phase.RPN_POST_NMS_TOP_N),
        rpn_nms_thresh=float(phase.RPN_NMS_THRESH),
        test_mode=str(cfg.TEST.MODE),
        rpn_top_n=int(cfg.TEST.RPN_TOP_N),
        use_pallas_nms=bool(cfg.TPU.USE_PALLAS_NMS),
        space_to_depth=bool(cfg.TPU.SPACE_TO_DEPTH),
        fixed_blocks=int(cfg.RESNET.FIXED_BLOCKS),
        fixed_layers=int(cfg.MOBILENET.FIXED_LAYERS),
        rpn_batchsize=int(cfg.TRAIN.RPN_BATCHSIZE),
        rpn_fg_fraction=float(cfg.TRAIN.RPN_FG_FRACTION),
        rpn_positive_overlap=float(cfg.TRAIN.RPN_POSITIVE_OVERLAP),
        rpn_negative_overlap=float(cfg.TRAIN.RPN_NEGATIVE_OVERLAP),
        rpn_clobber_positives=bool(cfg.TRAIN.RPN_CLOBBER_POSITIVES),
        rpn_positive_weight=float(cfg.TRAIN.RPN_POSITIVE_WEIGHT),
        rpn_bbox_inside_weights=tuple(cfg.TRAIN.RPN_BBOX_INSIDE_WEIGHTS),
        roi_batch_size=int(cfg.TRAIN.BATCH_SIZE),
        fg_fraction=float(cfg.TRAIN.FG_FRACTION),
        fg_thresh=float(cfg.TRAIN.FG_THRESH),
        bg_thresh_hi=float(cfg.TRAIN.BG_THRESH_HI),
        bg_thresh_lo=float(cfg.TRAIN.BG_THRESH_LO),
        use_gt=bool(cfg.TRAIN.USE_GT),
        bbox_inside_weights=tuple(cfg.TRAIN.BBOX_INSIDE_WEIGHTS),
        bbox_normalize=bool(cfg.TRAIN.BBOX_NORMALIZE_TARGETS_PRECOMPUTED),
        bbox_normalize_means=tuple(cfg.TRAIN.BBOX_NORMALIZE_MEANS),
        bbox_normalize_stds=tuple(cfg.TRAIN.BBOX_NORMALIZE_STDS),
    )


def build_head(spec: "ModelSpec", name: Optional[str] = "head"):
    """Backbone head module for a spec (standalone-appliable with name=None)."""
    dt = spec.dtype
    if spec.backbone == "vgg16":
        return vgg16.VGG16Head(dtype=dt, name=name)
    if spec.backbone in ("res50", "res101", "res152"):
        return resnet_v1.ResNetV1Head(int(spec.backbone[3:]), dtype=dt,
                                      space_to_depth=spec.space_to_depth,
                                      fixed_blocks=spec.fixed_blocks,
                                      name=name)
    if spec.backbone == "mobile":
        return mobilenet_v1.MobileNetV1Head(spec.depth_multiplier, dtype=dt,
                                            fixed_layers=spec.fixed_layers,
                                            name=name)
    raise ValueError(f"unknown backbone {spec.backbone}")


class FasterRCNN(nn.Module):
    spec: ModelSpec

    def _head(self):
        return build_head(self.spec)

    def _tail(self, train: bool):
        s = self.spec
        dt = s.dtype
        if s.backbone == "vgg16":
            return vgg16.VGG16Tail(deterministic=not train, dtype=dt,
                                   name="tail")
        if s.backbone in ("res50", "res101", "res152"):
            return resnet_v1.ResNetV1Tail(int(s.backbone[3:]), dtype=dt,
                                          name="tail")
        if s.backbone == "mobile":
            return mobilenet_v1.MobileNetV1Tail(s.depth_multiplier, dtype=dt,
                                                name="tail")
        raise ValueError(f"unknown backbone {s.backbone}")

    def _proposals(self, anchors, rpn_bbox, fg_scores, im_info, fw):
        """Per-batch proposal selection: decode, clip, NMS (or top-k).

        Matches the default E2E TF path (lib/layer_utils/proposal_layer.py:
        56-83): decode all anchors, clip, greedy NMS capped at
        post_nms_top_n, standard IoU, strict > suppression. The E2E path has
        no pre-NMS cap; ``rpn_pre_nms_top_n`` bounds the static NMS size
        (scores below the cap cannot influence the top post_nms survivors
        for any realistic cap/post ratio — proven exactly in
        tests/test_reference_parity.py's cap-boundary suite).

        The reference builds its anchor grid over the actual image's feature
        map, ceil(h/16) x ceil(w/16) cells (lib/layer_utils/snippets.py:
        32-49); our grid spans the padded canvas, so anchors at cells beyond
        the per-image extent are masked out of selection here — they have no
        reference counterpart and would otherwise inject padded-margin
        proposals. ``fw`` is the static canvas feature width (cell decode).
        """
        s = self.spec
        a = s.num_anchors
        cell = jnp.arange(anchors.shape[0]) // a
        cy, cx = cell // fw, cell % fw

        def one(deltas, scores, info, i):
            boxes = bbox_transform_inv(anchors, deltas,
                                       xform_clip=BBOX_XFORM_CLIP)
            boxes = clip_boxes(boxes, info[:2])
            avalid = ((cy < jnp.ceil(info[0] / s.feat_stride)) &
                      (cx < jnp.ceil(info[1] / s.feat_stride)))
            if s.mode == "TEST" and s.test_mode == "top":
                # proposal_top_layer: plain top-N scores, no NMS
                # (lib/layer_utils/proposal_top_layer.py:58-83)
                n = scores.shape[0]
                masked = jnp.where(avalid, scores, -jnp.inf)
                if n < s.rpn_top_n:
                    # fewer anchors than RPN_TOP_N: the reference pads by
                    # random choice WITH replacement over all anchors,
                    # ignoring scores (proposal_top_layer.py:30-33). Static
                    # branch; deterministic key keeps TEST reproducible.
                    key = jax.random.fold_in(jax.random.PRNGKey(0), i)
                    idx = jax.random.randint(key, (s.rpn_top_n,), 0, n)
                    return boxes[idx], scores[idx], avalid[idx]
                top_s, idx = jax.lax.top_k(masked, s.rpn_top_n)
                return boxes[idx], scores[idx], top_s > -jnp.inf
            idx, valid = sorted_nms(
                boxes, scores, avalid,
                s.rpn_nms_thresh, s.rpn_post_nms_top_n,
                plus_one=False, suppress_eq=False,
                pre_sort_k=min(s.rpn_pre_nms_top_n, scores.shape[0]),
                use_pallas="auto" if s.use_pallas_nms else False)
            return boxes[idx], scores[idx], valid

        return jax.vmap(one)(rpn_bbox, fg_scores, im_info,
                             jnp.arange(rpn_bbox.shape[0]))

    @nn.compact
    def __call__(self, image, im_info, gt_boxes=None, gt_valid=None):
        """image: [B, H, W, 3] mean-subtracted BGR on the static canvas;
        im_info: [B, 3] (h, w, scale) true extents; gt_boxes: [B, G, 5]
        (x1, y1, x2, y2, cls) padded, gt_valid: [B, G] — TRAIN only.
        """
        s = self.spec
        train = s.mode == "TRAIN"
        a = s.num_anchors
        b, hh, ww, _ = image.shape
        # with a space-to-depth input the spatial dims arrive pre-halved
        stride = s.feat_stride // 2 if s.space_to_depth else s.feat_stride
        assert hh % stride == 0 and ww % stride == 0, (
            "canvas must be a multiple of the feature stride")

        # per-image extent masking inside the head (layers.mask_valid)
        # makes the features exactly the reference's unpadded computation,
        # independent of the canvas — the invariant behind orientation-
        # bucketed batching and checkpoint-parity eval
        net_conv = self._head()(image.astype(s.dtype), im_info[:, :2])
        fh, fw = net_conv.shape[1], net_conv.shape[2]
        anchors = jnp.asarray(anchor_grid(
            fh, fw, s.feat_stride, s.anchor_scales, s.anchor_ratios))
        n_anchors = fh * fw * a

        init = normal_init(0.01, s.truncated)
        init_bbox = normal_init(0.001, s.truncated)
        rpn = nn.relu(nn.Conv(s.rpn_channels, (3, 3), padding="SAME",
                              kernel_init=init, dtype=s.dtype,
                              name="rpn_conv")(net_conv))
        rpn_cls_score = nn.Conv(2 * a, (1, 1), kernel_init=init,
                                dtype=s.dtype, name="rpn_cls_score")(rpn)
        rpn_bbox_pred = nn.Conv(4 * a, (1, 1), kernel_init=init,
                                dtype=s.dtype, name="rpn_bbox_pred")(rpn)

        # channel c in [0, A) is the bg logit and c+A the fg logit of anchor
        # c — the layout the reference's caffe-reshape/softmax realizes
        # (network.py:68-86,323-334)
        score_pairs = jnp.stack(
            [rpn_cls_score[..., :a], rpn_cls_score[..., a:]], axis=-1)
        score_pairs = score_pairs.reshape(b, n_anchors, 2).astype(jnp.float32)
        fg_prob = jax.nn.softmax(score_pairs, axis=-1)[..., 1]

        rpn_deltas = rpn_bbox_pred.reshape(b, n_anchors, 4).astype(jnp.float32)
        # proposal selection is not differentiated (the reference's rois feed
        # host target layers / stop_gradient crop, network.py:153) — and the
        # Pallas NMS kernel has no JVP rule, so gradients must stop here
        rois, roi_scores, roi_valid = self._proposals(
            anchors, jax.lax.stop_gradient(rpn_deltas),
            jax.lax.stop_gradient(fg_prob), im_info, fw)

        out = {
            "rpn_cls_score": score_pairs,    # [B, N, 2]
            "rpn_bbox_pred": rpn_deltas,     # [B, N, 4]
            "anchors": anchors,
        }

        if train:
            rng = self.make_rng("sampling")
            keys = jax.random.split(rng, 2 * b)
            at = jax.vmap(lambda g, gv, info, k: anchor_target(
                anchors, g, gv, (info[0], info[1]), k,
                rpn_batchsize=s.rpn_batchsize,
                rpn_fg_fraction=s.rpn_fg_fraction,
                positive_overlap=s.rpn_positive_overlap,
                negative_overlap=s.rpn_negative_overlap,
                clobber_positives=s.rpn_clobber_positives,
                positive_weight=s.rpn_positive_weight,
                inside_weight=s.rpn_bbox_inside_weights,
            ))(gt_boxes, gt_valid, im_info, keys[:b])
            pt = jax.vmap(lambda r, rv, g, gv, k: proposal_target(
                r, rv, g, gv, k, s.num_classes,
                batch_size=s.roi_batch_size, fg_fraction=s.fg_fraction,
                fg_thresh=s.fg_thresh, bg_thresh_hi=s.bg_thresh_hi,
                bg_thresh_lo=s.bg_thresh_lo, use_gt=s.use_gt,
                inside_weight=s.bbox_inside_weights,
                normalize=s.bbox_normalize,
                normalize_means=s.bbox_normalize_means,
                normalize_stds=s.bbox_normalize_stds,
            ))(rois, roi_valid, gt_boxes, gt_valid, keys[b:])
            rois, roi_valid = pt.rois, pt.valid
            out["anchor_targets"] = at
            out["proposal_targets"] = pt

        # RoI pooling: ResNet crops pool_size directly unless RESNET.MAX_POOL
        # (resnet_v1.py:55-76); VGG/MobileNet crop 2x then 2x2 max-pool
        # (network.py:141-157)
        if s.backbone in ("res50", "res101", "res152"):
            max_pool = s.resnet_max_pool
        else:
            max_pool = True
        # samples past the per-image feature extent extrapolate to 0.0, as
        # in the reference whose feature map ends exactly there
        feat_valid = jnp.ceil(im_info[:, :2] / float(s.feat_stride))
        pooled = roi_crop_pool(net_conv, rois, s.feat_stride, s.pooling_size,
                               max_pool=max_pool, valid_hw=feat_valid)
        r = pooled.shape[1]
        pooled = pooled.reshape(b * r, s.pooling_size, s.pooling_size, -1)

        fc7 = self._tail(train)(pooled)
        cls_score = nn.Dense(s.num_classes, kernel_init=init, dtype=s.dtype,
                             name="cls_score")(fc7).astype(jnp.float32)
        bbox_pred = nn.Dense(4 * s.num_classes, kernel_init=init_bbox,
                             dtype=s.dtype,
                             name="bbox_pred")(fc7).astype(jnp.float32)
        cls_score = cls_score.reshape(b, r, s.num_classes)
        bbox_pred = bbox_pred.reshape(b, r, 4 * s.num_classes)

        if not train and s.bbox_normalize:
            # fold target un-normalization into the graph (network.py:428-432)
            stds = jnp.tile(jnp.asarray(s.bbox_normalize_stds, jnp.float32),
                            s.num_classes)
            means = jnp.tile(jnp.asarray(s.bbox_normalize_means, jnp.float32),
                             s.num_classes)
            bbox_pred = bbox_pred * stds + means

        out.update({
            "rois": rois,                    # [B, R, 4]
            "roi_valid": roi_valid,          # [B, R]
            "roi_scores": None if train else roi_scores,
            "cls_score": cls_score,          # [B, R, K]
            "cls_prob": jax.nn.softmax(cls_score, axis=-1),
            "bbox_pred": bbox_pred,          # [B, R, 4K]
        })
        return out


def extract_head(model: FasterRCNN, params, image, valid_hw=None):
    """Head feature maps only (the reference's Network.extract_head,
    network.py:462-467) — useful for activation-parity checks against
    converted checkpoints. valid_hw: optional [B, 2] per-image pixel
    extents for margin masking (None = treat the whole canvas as image)."""
    s = model.spec
    head = build_head(s, name=None)  # standalone module, no parent scope
    head_params = {"params": params["params"]["head"]}
    return head.apply(head_params, jnp.asarray(image).astype(s.dtype),
                      valid_hw)


def trainable_mask(params, spec: ModelSpec):
    """Pytree of bools: which params the optimizer updates.

    Encodes the reference freeze rules (vgg16.py:28-32, resnet_v1.py:88-113,
    mobilenet_v1.py:214-233) plus frozen BN everywhere.
    """
    from tf_faster_rcnn_tpu.config import cfg
    fixed_blocks = int(cfg.RESNET.FIXED_BLOCKS)
    fixed_layers = int(cfg.MOBILENET.FIXED_LAYERS)

    def decide(path) -> bool:
        keys = [getattr(p, "key", str(p)) for p in path]
        if keys and keys[0] == "params":  # full variables dict passed
            keys = keys[1:]
        if keys and keys[0] in ("head", "tail"):
            if spec.backbone == "vgg16":
                return vgg16.trainable_filter(keys)
            if spec.backbone in ("res50", "res101", "res152"):
                return resnet_v1.trainable_filter(keys, fixed_blocks)
            if spec.backbone == "mobile":
                return mobilenet_v1.trainable_filter(keys, fixed_layers)
        return True

    return jax.tree_util.tree_map_with_path(lambda p, _: decide(p), params)
