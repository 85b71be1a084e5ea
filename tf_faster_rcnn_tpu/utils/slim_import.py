"""Pretrained-weight import: slim/TF checkpoint dicts -> our param trees.

Replaces the reference's restore-time variable surgery (vgg16.py:62-100,
resnet_v1.py:154-178, mobilenet_v1.py:252-278) with a one-time functional
conversion. Input is a dict of slim variable names -> numpy arrays (an .npz
or pickle exported from a TF checkpoint; TF itself is not required here).

Surgery parity:
* all first-layer conv kernels flipped RGB->BGR (reverse input-channel axis)
  because the data pipeline feeds BGR (PIXEL_MEANS order);
* VGG16 fc6 [7,7,512,4096] and fc7 [1,1,4096,4096] conv kernels reshaped to
  dense [25088,4096]/[4096,4096] (vgg16.py:95-98);
* MobileNet first conv additionally divided by 255/2 (mobilenet_v1.py:278)
  — slim MobileNet was trained on [-1,1] inputs, ours are pixel-mean
  centered;
* slim BatchNorm {gamma,beta,moving_mean,moving_variance} -> FrozenBatchNorm
  {scale,bias,mean,var};
* TF depthwise kernels [k,k,C,1] -> flax grouped-conv layout [k,k,1,C].

Detection-head variables (rpn_conv/3x3, rpn_cls_score, rpn_bbox_pred,
cls_score, bbox_pred) are mapped too, so a fully-trained reference
checkpoint converts for parity evaluation.
"""

from __future__ import annotations

import pickle
from typing import Dict

import numpy as np

__all__ = ["convert_slim_weights", "load_pretrained_into", "load_var_dict"]


def load_var_dict(path: str) -> Dict[str, np.ndarray]:
    """Slim var dict from an .npz/.pkl export or a real TF ``.ckpt``
    TensorBundle prefix (read natively — utils/tf_bundle.py)."""
    from tf_faster_rcnn_tpu.utils.tf_bundle import (is_tf_checkpoint,
                                                    read_tf_checkpoint)
    if is_tf_checkpoint(path):
        return read_tf_checkpoint(path)
    if path.endswith(".npz"):
        return dict(np.load(path, allow_pickle=True))
    with open(path, "rb") as f:
        return pickle.load(f)


def _bgr_flip(kernel):
    return kernel[:, :, ::-1, :]


def _set(tree, path, value, strict_shape=True):
    node = tree
    for k in path[:-1]:
        node = node[k]
    old = node[path[-1]]
    if strict_shape and tuple(old.shape) != tuple(value.shape):
        raise ValueError(
            f"shape mismatch at {'/'.join(path)}: "
            f"{old.shape} vs {value.shape}")
    node[path[-1]] = value.astype(np.float32)


def _bn(out, dst_prefix, var, src_prefix, missing):
    pairs = [("scale", "gamma"), ("bias", "beta"), ("mean", "moving_mean"),
             ("var", "moving_variance")]
    for ours, theirs in pairs:
        name = f"{src_prefix}/BatchNorm/{theirs}"
        if name in var:
            _set(out, dst_prefix + [ours], var[name])
        else:
            missing.append(name)


def _convert_resnet(out, var, scope, missing):
    """scope e.g. resnet_v1_101."""
    name = f"{scope}/conv1/weights"
    if name in var:
        k = _bgr_flip(var[name])
        target = out["head"]["conv1"]["kernel"]
        if tuple(np.shape(target))[:2] == (4, 4):
            # space-to-depth stem: exact kernel transform
            from tf_faster_rcnn_tpu.models.resnet_v1 import s2d_conv1_kernel
            k = s2d_conv1_kernel(k)
        _set(out, ["head", "conv1", "kernel"], k)
    else:
        missing.append(name)
    _bn(out, ["head", "conv1_bn"], var, f"{scope}/conv1", missing)

    for bi in range(1, 5):
        where = "tail" if bi == 4 else "head"
        block = out[where][f"block{bi}"]
        for unit_name in block.keys():
            base = f"{scope}/block{bi}/{unit_name}/bottleneck_v1"
            unit = block[unit_name]
            for conv in ("conv1", "conv2", "conv3"):
                name = f"{base}/{conv}/weights"
                if name in var:
                    _set(out, [where, f"block{bi}", unit_name, conv, "conv",
                               "kernel"], var[name])
                else:
                    missing.append(name)
                _bn(out, [where, f"block{bi}", unit_name, conv, "bn"], var,
                    f"{base}/{conv}", missing)
            if "shortcut" in unit:
                name = f"{base}/shortcut/weights"
                if name in var:
                    _set(out, [where, f"block{bi}", unit_name, "shortcut",
                               "conv", "kernel"], var[name])
                else:
                    missing.append(name)
                _bn(out, [where, f"block{bi}", unit_name, "shortcut", "bn"],
                    var, f"{base}/shortcut", missing)


def _convert_vgg16(out, var, missing):
    scope = "vgg_16"
    for gi, (reps, conv) in enumerate([(2, "conv1"), (2, "conv2"),
                                       (3, "conv3"), (3, "conv4"),
                                       (3, "conv5")]):
        for r in range(1, reps + 1):
            base = f"{scope}/{conv}/{conv}_{r}"
            for theirs, ours in (("weights", "kernel"), ("biases", "bias")):
                name = f"{base}/{theirs}"
                if name not in var:
                    missing.append(name)
                    continue
                v = var[name]
                if conv == "conv1" and r == 1 and ours == "kernel":
                    v = _bgr_flip(v)
                _set(out, ["head", f"{conv}_{r}", ours], v)
    # fc6/fc7: conv-shaped kernels reshape to dense
    for fc, in_dim in (("fc6", 7 * 7 * 512), ("fc7", 4096)):
        wname, bname = f"{scope}/{fc}/weights", f"{scope}/{fc}/biases"
        if wname in var:
            _set(out, ["tail", fc, "kernel"], var[wname].reshape(in_dim, 4096))
        else:
            missing.append(wname)
        if bname in var:
            _set(out, ["tail", fc, "bias"], var[bname])
        else:
            missing.append(bname)


def _convert_mobilenet(out, var, missing):
    scope = "MobilenetV1"
    for where, rng in (("head", range(0, 12)), ("tail", range(12, 14))):
        base_tree = out[where]["base"]
        for i in rng:
            key = f"conv2d_{i}"
            if key not in base_tree:
                continue
            if i == 0:
                name = f"{scope}/Conv2d_0/weights"
                if name in var:
                    v = _bgr_flip(var[name]) / (255.0 / 2.0)
                    _set(out, [where, "base", key, "kernel"], v)
                else:
                    missing.append(name)
                _bn(out, [where, "base", key + "_bn"], var,
                    f"{scope}/Conv2d_0", missing)
            else:
                dw = f"{scope}/Conv2d_{i}_depthwise/depthwise_weights"
                if dw in var:
                    # [k,k,C,1] -> [k,k,1,C]
                    _set(out, [where, "base", key, "depthwise", "kernel"],
                         np.transpose(var[dw], (0, 1, 3, 2)))
                else:
                    missing.append(dw)
                _bn(out, [where, "base", key, "depthwise_bn"], var,
                    f"{scope}/Conv2d_{i}_depthwise", missing)
                pw = f"{scope}/Conv2d_{i}_pointwise/weights"
                if pw in var:
                    _set(out, [where, "base", key, "pointwise", "kernel"],
                         var[pw])
                else:
                    missing.append(pw)
                _bn(out, [where, "base", key, "pointwise_bn"], var,
                    f"{scope}/Conv2d_{i}_pointwise", missing)


def _convert_heads(out, var, scope, missing):
    """Detection heads from a trained reference checkpoint (optional)."""
    mapping = [
        (f"{scope}/rpn_conv/3x3", ["rpn_conv"]),
        (f"{scope}/rpn_cls_score", ["rpn_cls_score"]),
        (f"{scope}/rpn_bbox_pred", ["rpn_bbox_pred"]),
        (f"{scope}/cls_score", ["cls_score"]),
        (f"{scope}/bbox_pred", ["bbox_pred"]),
    ]
    for src, dst in mapping:
        for theirs, ours in (("weights", "kernel"), ("biases", "bias")):
            name = f"{src}/{theirs}"
            if name in var:
                v = var[name]
                target = out
                for k in dst:
                    target = target[k]
                if v.shape != tuple(np.shape(target[ours])):
                    v = v.reshape(np.shape(target[ours]))
                _set(out, dst + [ours], v)


_SCOPES = {"vgg16": "vgg_16", "res50": "resnet_v1_50",
           "res101": "resnet_v1_101", "res152": "resnet_v1_152",
           "mobile": "MobilenetV1"}


def convert_slim_weights(params, var_dict: Dict[str, np.ndarray],
                         backbone: str, allow_missing: bool = True):
    """Return a new params pytree with slim weights written in.

    params: the model's variables dict ({'params': {...}}) or the inner
    params tree. Missing backbone variables raise unless allow_missing
    (ImageNet checkpoints lack the detection heads — that's normal).
    """
    import copy
    import jax
    wrapped = "params" in params and isinstance(params["params"], dict)
    tree = copy.deepcopy(params["params"] if wrapped else params)
    tree = jax.tree_util.tree_map(np.asarray, tree)
    var = {k: np.asarray(v) for k, v in var_dict.items()}
    missing = []
    scope = _SCOPES[backbone]
    if backbone == "vgg16":
        _convert_vgg16(tree, var, missing)
    elif backbone in ("res50", "res101", "res152"):
        _convert_resnet(tree, var, scope, missing)
    elif backbone == "mobile":
        _convert_mobilenet(tree, var, missing)
    else:
        raise ValueError(backbone)
    _convert_heads(tree, var, scope, missing)
    if missing and not allow_missing:
        raise KeyError(f"missing {len(missing)} variables, e.g. {missing[:5]}")
    if missing:
        print(f"convert_slim_weights: {len(missing)} variables not found in "
              f"the checkpoint (heads are expected to be missing for "
              f"ImageNet weights); e.g. {missing[:3]}")
    return {"params": tree} if wrapped else tree


def load_pretrained_into(params, path: str, backbone: str):
    return convert_slim_weights(params, load_var_dict(path), backbone)
