"""Full-detector forward: shapes, modes, freeze rules, and loss wiring
(SURVEY.md stages 6-7, 9). Small canvases and anchor scales keep CPU compile
time reasonable; semantics are scale-independent."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tf_faster_rcnn_tpu.config import cfg
from tf_faster_rcnn_tpu.engine.losses import (detection_losses,
                                              weight_decay_loss)
from tf_faster_rcnn_tpu.models.network import (FasterRCNN, spec_from_cfg,
                                               trainable_mask)

B, H, W = 1, 128, 128


def _small(spec, **kw):
    base = dict(anchor_scales=(2, 4), rpn_pre_nms_top_n=512,
                rpn_post_nms_top_n=32)
    base.update(kw)
    return dataclasses.replace(spec, **base)


def _inputs(rng):
    img = rng.randn(B, H, W, 3).astype(np.float32)
    im_info = np.array([[120.0, 124.0, 1.0]], np.float32)
    gt = np.zeros((B, 8, 5), np.float32)
    gt[0, 0] = [10, 10, 60, 80, 5]
    gt[0, 1] = [30, 20, 90, 100, 12]
    gtv = np.zeros((B, 8), bool)
    gtv[0, :2] = True
    return img, im_info, gt, gtv


@pytest.mark.parametrize("backbone", ["vgg16", "res50", "res101", "mobile"])
def test_forward_test_mode_shapes(rng, backbone):
    img, im_info, _, _ = _inputs(rng)
    spec = _small(spec_from_cfg(backbone, 21, "TEST"))
    m = FasterRCNN(spec)
    params = m.init(jax.random.PRNGKey(0), img, im_info)
    out = m.apply(params, img, im_info)
    r = spec.rpn_post_nms_top_n
    assert out["rois"].shape == (B, r, 4)
    assert out["roi_valid"].shape == (B, r)
    assert out["cls_prob"].shape == (B, r, 21)
    assert out["bbox_pred"].shape == (B, r, 84)
    assert int(out["roi_valid"].sum()) > 0
    np.testing.assert_allclose(np.asarray(out["cls_prob"]).sum(-1), 1.0,
                               rtol=1e-4)


def test_forward_top_mode(rng):
    """TEST.MODE='top': plain top-N proposals, no NMS
    (proposal_top_layer.py parity)."""
    img, im_info, _, _ = _inputs(rng)
    spec = _small(spec_from_cfg("vgg16", 21, "TEST"), test_mode="top",
                  rpn_top_n=40)
    m = FasterRCNN(spec)
    params = m.init(jax.random.PRNGKey(0), img, im_info)
    out = m.apply(params, img, im_info)
    assert out["rois"].shape == (B, 40, 4)
    assert bool(out["roi_valid"].all())
    s = np.asarray(out["roi_scores"][0])
    assert np.all(np.diff(s) <= 0)  # sorted descending


def test_forward_top_mode_pad_quirk(rng):
    """rpn_top_n > #anchors: the reference pads by random choice with
    replacement over all anchors (proposal_top_layer.py:30-33); output is
    exactly RPN_TOP_N rois, all valid."""
    img, im_info, _, _ = _inputs(rng)
    n_anchors = (H // 16) * (W // 16) * 2 * 3  # scales (2,4) x 3 ratios
    top_n = n_anchors + 37
    spec = _small(spec_from_cfg("vgg16", 21, "TEST"), test_mode="top",
                  rpn_top_n=top_n)
    m = FasterRCNN(spec)
    params = m.init(jax.random.PRNGKey(0), img, im_info)
    out = m.apply(params, img, im_info)
    assert out["rois"].shape == (B, top_n, 4)
    assert bool(out["roi_valid"].all())
    r = np.asarray(out["rois"][0])
    # clipped to the image extents, and genuinely resampled (duplicates)
    assert r[:, 0].min() >= 0 and r[:, 2].max() <= im_info[0, 1] - 1
    assert len(np.unique(r, axis=0)) < top_n


def test_train_mode_losses_and_grads(rng):
    img, im_info, gt, gtv = _inputs(rng)
    spec = _small(spec_from_cfg("vgg16", 21, "TRAIN"),
                  rpn_post_nms_top_n=64, roi_batch_size=32, rpn_batchsize=64)
    m = FasterRCNN(spec)
    rngs = {"params": jax.random.PRNGKey(0),
            "sampling": jax.random.PRNGKey(1),
            "dropout": jax.random.PRNGKey(2)}
    params = m.init(rngs, img, im_info, gt, gtv)

    @jax.jit
    def loss_fn(p, key):
        out = m.apply(p, img, im_info, gt, gtv,
                      rngs={"sampling": key,
                            "dropout": jax.random.fold_in(key, 7)})
        losses = detection_losses(out, spec)
        return losses["total_loss"], losses

    (total, losses), grads = jax.value_and_grad(
        loss_fn, has_aux=True)(params, jax.random.PRNGKey(3))
    for k in ("rpn_cross_entropy", "rpn_loss_box", "cross_entropy",
              "loss_box"):
        assert np.isfinite(float(losses[k])), k
    # with scale-2/4 anchors inside the image, RPN losses must be active
    assert float(losses["rpn_cross_entropy"]) > 0
    assert float(losses["cross_entropy"]) > 0
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in leaves)
    gnorm = sum(float(jnp.sum(g * g)) for g in leaves)
    assert gnorm > 0


@pytest.mark.parametrize("backbone,frozen,active", [
    ("vgg16", ("head", "conv1_1"), ("head", "conv3_1")),
    # resnet probes the unit's EXPAND conv: conv1/conv2 legitimately have
    # zero grad at init (the zero-init conv3 blocks backprop through the
    # residual branch until the first update moves it off zero)
    ("res50", ("head", "block1", "unit_1", "conv3", "conv"),
     ("head", "block2", "unit_1", "conv3", "conv")),
    ("mobile", ("head", "base", "conv2d_0"),
     ("head", "base", "conv2d_6", "pointwise")),
])
def test_frozen_prefix_gradients_are_pruned(rng, backbone, frozen, active):
    """Freezing is a stop_gradient at the prefix boundary, not just an
    optimizer mask: grads of frozen-prefix params must be exactly zero so
    XLA can drop their backward convolutions."""
    img, im_info, gt, gtv = _inputs(rng)
    spec = _small(spec_from_cfg(backbone, 21, "TRAIN"),
                  rpn_post_nms_top_n=64, roi_batch_size=32, rpn_batchsize=64)
    m = FasterRCNN(spec)
    rngs = {"params": jax.random.PRNGKey(0),
            "sampling": jax.random.PRNGKey(1),
            "dropout": jax.random.PRNGKey(2)}
    params = m.init(rngs, img, im_info, gt, gtv)

    def loss_fn(p):
        out = m.apply(p, img, im_info, gt, gtv,
                      rngs={"sampling": jax.random.PRNGKey(3),
                            "dropout": jax.random.PRNGKey(4)})
        return detection_losses(out, spec)["total_loss"]

    grads = jax.jit(jax.grad(loss_fn))(params)["params"]

    def leaf(tree, path):
        for k in path:
            tree = tree[k]
        return tree["kernel"]

    assert float(jnp.abs(leaf(grads, frozen)).max()) == 0.0
    assert float(jnp.abs(leaf(grads, active)).max()) > 0.0


def test_trainable_masks():
    img = np.zeros((B, H, W, 3), np.float32)
    im_info = np.array([[128.0, 128.0, 1.0]], np.float32)
    # vgg16: conv1/conv2 frozen
    spec = _small(spec_from_cfg("vgg16", 21, "TEST"))
    params = FasterRCNN(spec).init(jax.random.PRNGKey(0), img, im_info)["params"]
    mask = trainable_mask(params, spec)
    assert mask["head"]["conv1_1"]["kernel"] is False
    assert mask["head"]["conv3_1"]["kernel"] is True
    assert mask["rpn_conv"]["kernel"] is True

    # resnet: BN frozen everywhere, stem + block1 frozen (FIXED_BLOCKS=1)
    spec = _small(spec_from_cfg("res50", 21, "TEST"))
    params = FasterRCNN(spec).init(jax.random.PRNGKey(0), img, im_info)["params"]
    mask = trainable_mask(params, spec)
    assert mask["head"]["conv1"]["kernel"] is False
    assert mask["head"]["block1"]["unit_1"]["conv1"]["conv"]["kernel"] is False
    assert mask["head"]["block2"]["unit_1"]["conv1"]["conv"]["kernel"] is True
    assert mask["head"]["block2"]["unit_1"]["conv1"]["bn"]["scale"] is False
    assert mask["tail"]["block4"]["unit_1"]["conv1"]["conv"]["kernel"] is True
    assert mask["tail"]["block4"]["unit_1"]["conv1"]["bn"]["mean"] is False

    # resnet FIXED_BLOCKS=3 freezes blocks 1-3
    cfg.RESNET.FIXED_BLOCKS = 3
    mask = trainable_mask(params, spec)
    assert mask["head"]["block3"]["unit_1"]["conv1"]["conv"]["kernel"] is False
    assert mask["tail"]["block4"]["unit_1"]["conv1"]["conv"]["kernel"] is True

    # mobilenet: first FIXED_LAYERS=5 layers frozen, BN frozen
    spec = _small(spec_from_cfg("mobile", 21, "TEST"))
    params = FasterRCNN(spec).init(jax.random.PRNGKey(0), img, im_info)["params"]
    mask = trainable_mask(params, spec)
    assert mask["head"]["base"]["conv2d_0"]["kernel"] is False
    assert mask["head"]["base"]["conv2d_4"]["pointwise"]["kernel"] is False
    assert mask["head"]["base"]["conv2d_5"]["pointwise"]["kernel"] is True
    assert mask["head"]["base"]["conv2d_5"]["pointwise_bn"]["scale"] is False
    assert mask["tail"]["base"]["conv2d_12"]["pointwise"]["kernel"] is True


def test_weight_decay_loss_excludes_bn_and_bias():
    img = np.zeros((B, H, W, 3), np.float32)
    im_info = np.array([[128.0, 128.0, 1.0]], np.float32)
    spec = _small(spec_from_cfg("res50", 21, "TEST"))
    params = FasterRCNN(spec).init(jax.random.PRNGKey(0), img, im_info)["params"]
    wd = weight_decay_loss(params, 1e-4, 4e-5, "res50")
    assert float(wd) > 0
    # doubling only BN params leaves the loss unchanged
    import jax.tree_util as jtu

    def double_bn(path, x):
        keys = [getattr(p, "key", str(p)) for p in path]
        if any(k in ("mean", "var", "scale") for k in keys) or keys[-1] == "bias":
            return x * 2
        return x
    params2 = jtu.tree_map_with_path(double_bn, params)
    wd2 = weight_decay_loss(params2, 1e-4, 4e-5, "res50")
    np.testing.assert_allclose(float(wd), float(wd2), rtol=1e-6)


def test_test_mode_unnormalizes_bbox_pred(rng):
    """TEST graph folds the target std/mean back in (network.py:428-432):
    scaling stds by 2 must scale (pred - mean) by 2."""
    img, im_info, _, _ = _inputs(rng)
    spec1 = _small(spec_from_cfg("vgg16", 21, "TEST"))
    spec2 = dataclasses.replace(spec1,
                                bbox_normalize_stds=(0.2, 0.2, 0.4, 0.4))
    m1, m2 = FasterRCNN(spec1), FasterRCNN(spec2)
    params = m1.init(jax.random.PRNGKey(0), img, im_info)
    out1 = m1.apply(params, img, im_info)
    out2 = m2.apply(params, img, im_info)
    np.testing.assert_allclose(np.asarray(out2["bbox_pred"]),
                               np.asarray(out1["bbox_pred"]) * 2.0,
                               rtol=1e-4, atol=1e-5)


def test_resnet_max_pool_variant(rng):
    """RESNET.MAX_POOL=True crops 14x14 then max-pools (resnet_v1.py:68-72);
    both variants produce the same shapes and differ numerically."""
    img, im_info, _, _ = _inputs(rng)
    spec_a = _small(spec_from_cfg("res50", 21, "TEST"))
    spec_b = dataclasses.replace(spec_a, resnet_max_pool=True)
    m_a, m_b = FasterRCNN(spec_a), FasterRCNN(spec_b)
    params = m_a.init(jax.random.PRNGKey(0), img, im_info)
    out_a = m_a.apply(params, img, im_info)
    out_b = m_b.apply(params, img, im_info)
    assert out_a["cls_prob"].shape == out_b["cls_prob"].shape
    assert not np.allclose(np.asarray(out_a["cls_score"]),
                           np.asarray(out_b["cls_score"]))


def test_space_to_depth_stem_is_exact(rng):
    """The 4x4 s2d stem with the transformed kernel equals the 7x7/2 stem
    bit-for-bit semantics (up to f32 rounding)."""
    from flax import linen as nn
    from tf_faster_rcnn_tpu.models.layers import ConvSame
    from tf_faster_rcnn_tpu.models.resnet_v1 import (s2d_conv1_kernel,
                                                     space_to_depth_2x2)
    x = rng.randn(2, 64, 96, 3).astype(np.float32)
    k7 = (rng.randn(7, 7, 3, 16) * 0.1).astype(np.float32)
    ref = nn.Conv(16, (7, 7), strides=(2, 2), padding=((3, 3), (3, 3)),
                  use_bias=False).apply({"params": {"kernel": k7}}, x)
    k2 = s2d_conv1_kernel(k7)
    got = nn.Conv(16, (4, 4), strides=(1, 1), padding=((2, 1), (2, 1)),
                  use_bias=False).apply({"params": {"kernel": k2}},
                                        space_to_depth_2x2(jnp.asarray(x)))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_space_to_depth_full_model_equivalence(rng):
    """res50 detect outputs agree between s2d and plain stems when the s2d
    conv1 kernel is the transform of the plain one. The s2d model consumes
    a HOST-transformed input (data/blob.py space_to_depth) — the on-device
    relayout was measured slower than the plain stem."""
    from tf_faster_rcnn_tpu.data.blob import space_to_depth
    from tf_faster_rcnn_tpu.models.resnet_v1 import s2d_conv1_kernel
    img, im_info, _, _ = _inputs(rng)
    spec_plain = _small(spec_from_cfg("res50", 21, "TEST"),
                        space_to_depth=False)
    spec_s2d = dataclasses.replace(spec_plain, space_to_depth=True)
    m_plain, m_s2d = FasterRCNN(spec_plain), FasterRCNN(spec_s2d)
    params = m_plain.init(jax.random.PRNGKey(0), img, im_info)
    import copy
    p2 = copy.deepcopy(jax.device_get(params))
    p2["params"]["head"]["conv1"]["kernel"] = s2d_conv1_kernel(
        p2["params"]["head"]["conv1"]["kernel"])
    img_s2d = np.stack([space_to_depth(np.asarray(im)) for im in img])
    out1 = m_plain.apply(params, img, im_info)
    out2 = m_s2d.apply(p2, img_s2d, im_info)
    np.testing.assert_allclose(np.asarray(out2["cls_prob"]),
                               np.asarray(out1["cls_prob"]),
                               rtol=1e-3, atol=1e-4)


def test_space_to_depth_train_mode(rng):
    """TRAIN mode on a host-s2d input: losses finite and active, gradients
    flow, and the (always-frozen) stem produces zero conv1 gradients."""
    from tf_faster_rcnn_tpu.data.blob import space_to_depth
    img, im_info, gt, gtv = _inputs(rng)
    img_s2d = np.stack([space_to_depth(im) for im in img])
    spec = _small(spec_from_cfg("res50", 21, "TRAIN"), space_to_depth=True,
                  rpn_post_nms_top_n=64, roi_batch_size=32, rpn_batchsize=64)
    m = FasterRCNN(spec)
    rngs = {"params": jax.random.PRNGKey(0),
            "sampling": jax.random.PRNGKey(1)}
    params = m.init(rngs, img_s2d, im_info, gt, gtv)

    def loss_fn(p):
        out = m.apply(p, img_s2d, im_info, gt, gtv,
                      rngs={"sampling": jax.random.PRNGKey(3)})
        return detection_losses(out, spec)["total_loss"]

    total, grads = jax.jit(jax.value_and_grad(loss_fn))(params)
    assert np.isfinite(float(total)) and float(total) > 0
    g = grads["params"]
    assert float(np.abs(np.asarray(g["head"]["conv1"]["kernel"])).max()) == 0
    leaves = jax.tree_util.tree_leaves(g["rpn_conv"])
    assert sum(float(jnp.sum(x * x)) for x in leaves) > 0
    assert all(np.isfinite(np.asarray(x)).all()
               for x in jax.tree_util.tree_leaves(grads))
