"""Subprocess oracle: run real TensorFlow ops on serialized cases.

Run as ``python tf_oracle.py <cases.npz> <out.npz>``. Three case kinds,
keyed by array-name prefix:

* ``crop{i}_``: image [H,W,C], boxes [R,4] normalized (y1,x1,y2,x2),
  size [2] -> ``crop{i}_out`` from ``tf.image.crop_and_resize`` (bilinear,
  extrapolation_value=0) — the op behind the reference's RoI pooling
  (/root/reference/lib/nets/network.py:141-157, resnet_v1.py:55-76).
* ``nms{i}_``: boxes [N,4] (x1,y1,x2,y2), scores [N], params
  [max_out, iou_thresh] -> ``nms{i}_idx`` from
  ``tf.image.non_max_suppression`` — the op behind the reference's default
  E2E proposal path (lib/layer_utils/proposal_layer.py:72).
* ``post{i}_``: boxes [R,4K] (pre-decoded per-class), scores [R,K], params
  [max_per_image, nms_thresh, score_thresh] -> ``post{i}_dets`` [D,6] as
  (cls, score, x1, y1, x2, y2) — the reference's ENTIRE test-time
  detection protocol (lib/model/test.py:160-180: strict > score threshold,
  per-class NMS, max_per_image cap as a score threshold) executed with
  real ``tf.image.non_max_suppression`` as the engine.
* ``bb{i}_``: full-backbone-head twin — ``bb{i}_kind`` names the backbone
  (vgg16|res50|mobile), ``bb{i}_x`` is the input image batch and
  ``bb{i}_p__<path>`` carry the flax params (path '/'-joined). The TF side
  rebuilds the REFERENCE's conv stack from its structure tables with
  tf.nn primitives — conv2d_same explicit padding for stride 2
  (lib/nets/resnet_v1.py:78-79 semantics), frozen tf.nn.batch_normalization
  (resnet eps 1e-5, mobilenet eps 1e-3), relu6 + depthwise for mobilenet
  (lib/nets/mobilenet_v1.py:21-49), plain SAME conv+bias stacks for vgg16
  (lib/nets/vgg16.py:26-60) — and runs the same weights at f32.
* ``lyr{i}_``: single-layer twins for pinpointing — ``lyr{i}_op`` in
  {conv_same, frozen_bn, sepconv} with the arrays each op needs.
* ``prop{i}_``: anchors [N,4], deltas [N,4], scores [N], iminfo [3],
  params [post_nms, iou_thresh] -> ``prop{i}_boxes`` [K,4] and
  ``prop{i}_scores`` [K], produced by the REFERENCE'S OWN TF functions
  ``bbox_transform_inv_tf`` / ``clip_boxes_tf`` (imported read-only from
  /root/reference/lib/model/bbox_transform.py:85-115) chained into
  ``tf.image.non_max_suppression`` exactly as ``proposal_layer_tf`` does
  (lib/layer_utils/proposal_layer.py:56-83). This is the branch that
  produced the published mAPs (cfg.USE_E2E_TF defaults True).

Kept in a subprocess so TensorFlow never loads into the pytest/JAX process.
"""

import os
import sys

os.environ["CUDA_VISIBLE_DEVICES"] = "-1"
os.environ["TF_CPP_MIN_LOG_LEVEL"] = "3"

import importlib.util

import numpy as np

REF_BBOX_TRANSFORM = "/root/reference/lib/model/bbox_transform.py"


def _load_reference_bbox_transform():
    """Load the reference module by file path: its package __init__ imports
    config (needs easydict, absent here), but the module itself only needs
    numpy and tf."""
    spec = importlib.util.spec_from_file_location(
        "ref_bbox_transform", REF_BBOX_TRANSFORM)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


# Reference structure tables, transcribed from the files cited per-entry
# (NOT imported from the framework under test — the whole point is an
# independent statement of what the reference computes).
_VGG_CFG = [(2, 64), (2, 128), (3, 256), (3, 512), (3, 512)]  # vgg16.py:26-46
_RES_UNITS = {50: (3, 4, 6), 101: (3, 4, 23)}   # resnet_v1.py:127-152, blocks 1-3
_RES_DEPTHS = (64, 128, 256)
# (is_separable, stride, depth), layers 0-11 of the head; layer 12 of the
# reference table is stride-forced elsewhere and lives in the tail
# (mobilenet_v1.py:62-79)
_MOBILE_DEFS = [(False, 2, 32), (True, 1, 64), (True, 2, 128), (True, 1, 128),
                (True, 2, 256), (True, 1, 256), (True, 2, 512), (True, 1, 512),
                (True, 1, 512), (True, 1, 512), (True, 1, 512), (True, 1, 512)]


def _tf_backbone_twin(tf, kind, x, p):
    """Run the reference's conv stack for `kind` over params dict `p`
    (flax path -> array) using tf.nn primitives only."""

    def conv_same(x, kernel, stride, depthwise=False):
        # slim resnet_utils.conv2d_same: stride 1 -> SAME; stride > 1 ->
        # explicit (total//2, total-total//2) pad + VALID (resnet_v1.py:78-79,
        # mobilenet_v1.py:21-49)
        k = kernel.shape[0]
        if stride > 1:
            total = k - 1
            beg, end = total // 2, total - total // 2
            x = tf.pad(x, [[0, 0], [beg, end], [beg, end], [0, 0]])
            pad = "VALID"
        else:
            pad = "SAME"
        if depthwise:
            # flax grouped-conv kernel [k,k,1,C] -> tf depthwise [k,k,C,1]
            kernel = np.transpose(kernel, (0, 1, 3, 2))
            return tf.nn.depthwise_conv2d(x, kernel, [1, stride, stride, 1],
                                          pad)
        return tf.nn.conv2d(x, kernel, [1, stride, stride, 1], pad)

    def bn(x, prefix, eps):
        return tf.nn.batch_normalization(
            x, p[f"{prefix}/mean"], p[f"{prefix}/var"],
            p[f"{prefix}/bias"], p[f"{prefix}/scale"], eps)

    if kind == "vgg16":
        for i, (reps, _) in enumerate(_VGG_CFG):
            for r in range(reps):
                name = f"conv{i + 1}_{r + 1}"
                x = tf.nn.conv2d(x, p[f"{name}/kernel"], [1, 1, 1, 1], "SAME")
                x = tf.nn.relu(tf.nn.bias_add(x, p[f"{name}/bias"]))
            if i < len(_VGG_CFG) - 1:   # no pool after conv5 (vgg16.py:40-46)
                x = tf.nn.max_pool2d(x, 2, 2, "SAME")
        return x

    if kind.startswith("res"):
        depth = int(kind[3:])
        x = conv_same(x, p["conv1/kernel"], 2)
        x = tf.nn.relu(bn(x, "conv1_bn", 1e-5))
        # pad(1) + 3x3/2 VALID max pool (resnet_v1.py:80-86)
        x = tf.pad(x, [[0, 0], [1, 1], [1, 1], [0, 0]])
        x = tf.nn.max_pool2d(x, 3, 2, "VALID")
        strides = (2, 2, 1)             # conv4 ends at stride 16 (:127-152)
        for b in range(3):
            n_units = _RES_UNITS[depth][b]
            depth_out = _RES_DEPTHS[b] * 4
            for u in range(n_units):
                s = strides[b] if u == n_units - 1 else 1  # stride-on-LAST
                pre = f"block{b + 1}/unit_{u + 1}"
                if x.shape[-1] == depth_out:
                    shortcut = x if s == 1 else x[:, ::s, ::s, :]
                else:
                    shortcut = conv_same(x, p[f"{pre}/shortcut/conv/kernel"],
                                         s)
                    shortcut = bn(shortcut, f"{pre}/shortcut/bn", 1e-5)
                r = tf.nn.relu(bn(conv_same(x, p[f"{pre}/conv1/conv/kernel"],
                                            1), f"{pre}/conv1/bn", 1e-5))
                r = tf.nn.relu(bn(conv_same(r, p[f"{pre}/conv2/conv/kernel"],
                                            s), f"{pre}/conv2/bn", 1e-5))
                r = bn(conv_same(r, p[f"{pre}/conv3/conv/kernel"], 1),
                       f"{pre}/conv3/bn", 1e-5)
                x = tf.nn.relu(shortcut + r)
        return x

    if kind == "mobile":
        for i, (sep, stride, _) in enumerate(_MOBILE_DEFS):
            name = f"base/conv2d_{i}"
            if not sep:
                x = conv_same(x, p[f"{name}/kernel"], stride)
                x = tf.nn.relu6(bn(x, f"{name}_bn", 1e-3))
            else:
                x = conv_same(x, p[f"{name}/depthwise/kernel"], stride,
                              depthwise=True)
                x = tf.nn.relu6(bn(x, f"{name}/depthwise_bn", 1e-3))
                x = tf.nn.conv2d(x, p[f"{name}/pointwise/kernel"],
                                 [1, 1, 1, 1], "SAME")
                x = tf.nn.relu6(bn(x, f"{name}/pointwise_bn", 1e-3))
        return x

    raise ValueError(f"unknown backbone kind {kind}")


def main():
    src, dst = sys.argv[1], sys.argv[2]
    import tensorflow as tf

    ref = _load_reference_bbox_transform()
    bbox_transform_inv_tf, clip_boxes_tf = (
        ref.bbox_transform_inv_tf, ref.clip_boxes_tf)

    cases = dict(np.load(src, allow_pickle=False))
    out = {}
    idx = sorted({k.split("_", 1)[0] for k in cases})
    for tag in idx:
        a = lambda leaf: cases[f"{tag}_{leaf}"]
        if tag.startswith("crop"):
            boxes = a("boxes")
            res = tf.image.crop_and_resize(
                a("image")[None], boxes,
                box_indices=np.zeros(len(boxes), np.int32),
                crop_size=[int(s) for s in a("size")],
                method="bilinear", extrapolation_value=0.0)
            out[f"{tag}_out"] = res.numpy()
        elif tag.startswith("nms"):
            max_out, thresh = a("params")
            keep = tf.image.non_max_suppression(
                a("boxes"), a("scores"),
                max_output_size=int(max_out), iou_threshold=float(thresh))
            out[f"{tag}_idx"] = keep.numpy().astype(np.int32)
        elif tag.startswith("post"):
            # The reference's whole test-time detection protocol
            # (lib/model/test.py:160-180) run over REAL TF NMS: per-class
            # strict score threshold, per-class NMS at TEST.NMS, then the
            # global max_per_image cap realized as a score threshold.
            # Inputs are pre-decoded per-class boxes (decode/clip is the
            # prop{i}_ kind's business).
            boxes = a("boxes")          # [R, 4K]
            scores = a("scores")        # [R, K]
            max_per, nms_thr, score_thr = a("params")
            k = scores.shape[1]
            all_dets = []
            for j in range(1, k):
                inds = np.where(scores[:, j] > score_thr)[0]
                cls_boxes = boxes[inds, j * 4:(j + 1) * 4]
                cls_scores = scores[inds, j]
                keep = tf.image.non_max_suppression(
                    cls_boxes, cls_scores,
                    max_output_size=len(inds),
                    iou_threshold=float(nms_thr)).numpy()
                for kk in keep:
                    all_dets.append((float(j), float(cls_scores[kk]),
                                     *cls_boxes[kk].tolist()))
            dets = np.array(all_dets, np.float32).reshape(-1, 6)
            if max_per > 0 and len(dets) > int(max_per):
                image_thresh = np.sort(dets[:, 1])[-int(max_per)]
                dets = dets[dets[:, 1] >= image_thresh]
            out[f"{tag}_dets"] = dets
        elif tag.startswith("prop"):
            post_nms, thresh = a("params")
            proposals = bbox_transform_inv_tf(
                tf.constant(a("anchors")), tf.constant(a("deltas")))
            proposals = clip_boxes_tf(proposals, a("iminfo")[:2])
            keep = tf.image.non_max_suppression(
                proposals, a("scores"),
                max_output_size=int(post_nms), iou_threshold=float(thresh))
            out[f"{tag}_boxes"] = tf.gather(proposals, keep).numpy()
            out[f"{tag}_scores"] = tf.gather(a("scores"), keep).numpy()
            out[f"{tag}_decoded"] = proposals.numpy()
        elif tag.startswith("bb"):
            kind = str(cases[f"{tag}_kind"])
            pref = f"{tag}_p__"
            p = {k[len(pref):]: v for k, v in cases.items()
                 if k.startswith(pref)}
            res = _tf_backbone_twin(tf, kind, tf.constant(a("x")), p)
            out[f"{tag}_out"] = res.numpy()
        elif tag.startswith("lyr"):
            op = str(cases[f"{tag}_op"])
            x = tf.constant(a("x"))
            if op == "conv_same":
                stride = int(a("stride"))
                k = a("kernel")
                if stride > 1:
                    total = k.shape[0] - 1
                    beg, end = total // 2, total - total // 2
                    x = tf.pad(x, [[0, 0], [beg, end], [beg, end], [0, 0]])
                    res = tf.nn.conv2d(x, k, [1, stride, stride, 1], "VALID")
                else:
                    res = tf.nn.conv2d(x, k, [1, stride, stride, 1], "SAME")
            elif op == "frozen_bn":
                res = tf.nn.batch_normalization(
                    x, a("mean"), a("var"), a("bias"), a("scale"),
                    float(a("eps")))
            elif op == "sepconv":
                stride = int(a("stride"))
                dw = np.transpose(a("dw_kernel"), (0, 1, 3, 2))
                if stride > 1:
                    total = dw.shape[0] - 1
                    beg, end = total // 2, total - total // 2
                    x = tf.pad(x, [[0, 0], [beg, end], [beg, end], [0, 0]])
                    pad = "VALID"
                else:
                    pad = "SAME"
                x = tf.nn.depthwise_conv2d(x, dw, [1, stride, stride, 1], pad)
                x = tf.nn.relu6(tf.nn.batch_normalization(
                    x, a("dw_mean"), a("dw_var"), a("dw_bias"), a("dw_scale"),
                    1e-3))
                x = tf.nn.conv2d(x, a("pw_kernel"), [1, 1, 1, 1], "SAME")
                res = tf.nn.relu6(tf.nn.batch_normalization(
                    x, a("pw_mean"), a("pw_var"), a("pw_bias"), a("pw_scale"),
                    1e-3))
            else:
                raise ValueError(f"unknown layer op {op}")
            out[f"{tag}_out"] = res.numpy()
        else:
            raise ValueError(f"unknown case kind {tag}")
    np.savez(dst, **out)
    print(f"tf_oracle: {len(idx)} cases -> {dst}")


if __name__ == "__main__":
    main()
