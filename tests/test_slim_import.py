"""Weight-import surgery vs the reference's restore-time fixes
(vgg16.py:81-100, resnet_v1.py:168-178, mobilenet_v1.py:266-278)."""

import dataclasses

import jax
import numpy as np

from tf_faster_rcnn_tpu.models.network import FasterRCNN, spec_from_cfg
from tf_faster_rcnn_tpu.utils.slim_import import convert_slim_weights


def _init(backbone):
    spec = dataclasses.replace(spec_from_cfg(backbone, 21, "TEST"),
                               anchor_scales=(2, 4), rpn_pre_nms_top_n=128,
                               rpn_post_nms_top_n=16)
    model = FasterRCNN(spec)
    img = np.zeros((1, 64, 64, 3), np.float32)
    info = np.array([[64, 64, 1.0]], np.float32)
    return model.init(jax.random.PRNGKey(0), img, info)


def _fill_var_dict_from_tree(params, backbone, rng):
    """Synthesize a slim var dict shaped to match the model tree."""
    p = params["params"]
    var = {}

    def bn(prefix, tree):
        var[prefix + "/BatchNorm/gamma"] = rng.randn(*tree["scale"].shape)
        var[prefix + "/BatchNorm/beta"] = rng.randn(*tree["bias"].shape)
        var[prefix + "/BatchNorm/moving_mean"] = rng.randn(*tree["mean"].shape)
        var[prefix + "/BatchNorm/moving_variance"] = np.abs(
            rng.randn(*tree["var"].shape)) + 0.5

    if backbone == "res50":
        scope = "resnet_v1_50"
        # slim stem kernel is always [7,7,3,64] regardless of our stem layout
        var[f"{scope}/conv1/weights"] = rng.randn(7, 7, 3, 64)
        bn(f"{scope}/conv1", p["head"]["conv1_bn"])
        for bi, where in ((1, "head"), (2, "head"), (3, "head"), (4, "tail")):
            for unit_name, unit in p[where][f"block{bi}"].items():
                base = f"{scope}/block{bi}/{unit_name}/bottleneck_v1"
                for conv in ("conv1", "conv2", "conv3"):
                    var[f"{base}/{conv}/weights"] = rng.randn(
                        *unit[conv]["conv"]["kernel"].shape)
                    bn(f"{base}/{conv}", unit[conv]["bn"])
                if "shortcut" in unit:
                    var[f"{base}/shortcut/weights"] = rng.randn(
                        *unit["shortcut"]["conv"]["kernel"].shape)
                    bn(f"{base}/shortcut", unit["shortcut"]["bn"])
    elif backbone == "vgg16":
        scope = "vgg_16"
        for conv, reps in (("conv1", 2), ("conv2", 2), ("conv3", 3),
                           ("conv4", 3), ("conv5", 3)):
            for r in range(1, reps + 1):
                k = p["head"][f"{conv}_{r}"]
                var[f"{scope}/{conv}/{conv}_{r}/weights"] = rng.randn(
                    *k["kernel"].shape)
                var[f"{scope}/{conv}/{conv}_{r}/biases"] = rng.randn(
                    *k["bias"].shape)
        var[f"{scope}/fc6/weights"] = rng.randn(7, 7, 512, 4096)
        var[f"{scope}/fc6/biases"] = rng.randn(4096)
        var[f"{scope}/fc7/weights"] = rng.randn(1, 1, 4096, 4096)
        var[f"{scope}/fc7/biases"] = rng.randn(4096)
    elif backbone == "mobile":
        scope = "MobilenetV1"
        var[f"{scope}/Conv2d_0/weights"] = rng.randn(
            *p["head"]["base"]["conv2d_0"]["kernel"].shape)
        bn(f"{scope}/Conv2d_0", p["head"]["base"]["conv2d_0_bn"])
        for where, rng_ in (("head", range(1, 12)), ("tail", range(12, 14))):
            for i in rng_:
                t = p[where]["base"][f"conv2d_{i}"]
                c = t["depthwise"]["kernel"].shape[-1]
                var[f"{scope}/Conv2d_{i}_depthwise/depthwise_weights"] = \
                    rng.randn(3, 3, c, 1)
                bn(f"{scope}/Conv2d_{i}_depthwise", t["depthwise_bn"])
                var[f"{scope}/Conv2d_{i}_pointwise/weights"] = rng.randn(
                    *t["pointwise"]["kernel"].shape)
                bn(f"{scope}/Conv2d_{i}_pointwise", t["pointwise_bn"])
    return var


def test_resnet_import_bgr_flip(rng):
    from tf_faster_rcnn_tpu.models.resnet_v1 import s2d_conv1_kernel
    params = _init("res50")
    var = _fill_var_dict_from_tree(params, "res50", rng)
    out = convert_slim_weights(params, var, "res50")
    got = np.asarray(out["params"]["head"]["conv1"]["kernel"])
    want = var["resnet_v1_50/conv1/weights"][:, :, ::-1, :]
    if got.shape[:2] == (4, 4):  # space-to-depth stem (default)
        want = s2d_conv1_kernel(want)
    np.testing.assert_allclose(got, want, rtol=1e-6)
    # BN mapped
    got_var = np.asarray(
        out["params"]["head"]["block1"]["unit_1"]["conv1"]["bn"]["var"])
    want_var = var[
        "resnet_v1_50/block1/unit_1/bottleneck_v1/conv1/BatchNorm/"
        "moving_variance"]
    np.testing.assert_allclose(got_var, want_var, rtol=1e-6)
    # untouched heads remain (random init, not zeroed)
    assert np.abs(np.asarray(out["params"]["rpn_conv"]["kernel"])).sum() > 0


def test_vgg16_import_fc_reshape_and_flip(rng):
    params = _init("vgg16")
    var = _fill_var_dict_from_tree(params, "vgg16", rng)
    out = convert_slim_weights(params, var, "vgg16")
    got = np.asarray(out["params"]["tail"]["fc6"]["kernel"])
    np.testing.assert_allclose(
        got, var["vgg_16/fc6/weights"].reshape(25088, 4096), rtol=1e-6)
    got1 = np.asarray(out["params"]["head"]["conv1_1"]["kernel"])
    np.testing.assert_allclose(
        got1, var["vgg_16/conv1/conv1_1/weights"][:, :, ::-1, :], rtol=1e-6)
    # conv1_2 NOT flipped
    got2 = np.asarray(out["params"]["head"]["conv1_2"]["kernel"])
    np.testing.assert_allclose(got2, var["vgg_16/conv1/conv1_2/weights"],
                               rtol=1e-6)


def test_mobilenet_import_scale_and_depthwise_layout(rng):
    params = _init("mobile")
    var = _fill_var_dict_from_tree(params, "mobile", rng)
    out = convert_slim_weights(params, var, "mobile")
    got0 = np.asarray(out["params"]["head"]["base"]["conv2d_0"]["kernel"])
    want0 = var["MobilenetV1/Conv2d_0/weights"][:, :, ::-1, :] / 127.5
    np.testing.assert_allclose(got0, want0, rtol=1e-6)
    gotd = np.asarray(
        out["params"]["head"]["base"]["conv2d_3"]["depthwise"]["kernel"])
    wantd = np.transpose(
        var["MobilenetV1/Conv2d_3_depthwise/depthwise_weights"], (0, 1, 3, 2))
    np.testing.assert_allclose(gotd, wantd, rtol=1e-6)


def test_import_shape_mismatch_raises(rng):
    params = _init("vgg16")
    var = _fill_var_dict_from_tree(params, "vgg16", rng)
    var["vgg_16/conv1/conv1_1/weights"] = rng.randn(3, 3, 3, 128)
    import pytest
    with pytest.raises(ValueError):
        convert_slim_weights(params, var, "vgg16")
