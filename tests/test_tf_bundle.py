"""The native TensorBundle checkpoint reader (utils/tf_bundle.py) vs real
TensorFlow: a TF1 Saver checkpoint written by actual TF (subprocess, see
tf_ckpt_writer.py) must read back byte-identical, and must flow through the
slim weight converter end to end — the real-checkpoint readiness drill for
the reference's released models (data/scripts/fetch_faster_rcnn_models.sh,
snapshot format train_val.py:52-55)."""

import os.path as osp
import subprocess
import sys

import numpy as np
import pytest

from test_slim_import import _fill_var_dict_from_tree, _init

_HERE = osp.dirname(osp.abspath(__file__))


def _write_ckpt(arrays, prefix):
    src = prefix + "_src.npz"
    np.savez(src, **arrays)
    proc = subprocess.run(
        [sys.executable, osp.join(_HERE, "tf_ckpt_writer.py"), src, prefix],
        capture_output=True, text=True, timeout=600)
    if proc.returncode != 0:
        if "No module named 'tensorflow'" in proc.stderr:
            pytest.skip("tensorflow not available to write the fixture")
        raise RuntimeError(f"ckpt writer failed:\n{proc.stderr[-2000:]}")
    return prefix


@pytest.fixture(scope="module")
def mixed_ckpt(tmp_path_factory):
    """Checkpoint with every dtype class the reader handles."""
    rng = np.random.RandomState(0)
    arrays = {
        "resnet_v1_50/conv1/weights": rng.randn(7, 7, 3, 64).astype(
            np.float32),
        "resnet_v1_50/conv1/BatchNorm/gamma": rng.rand(64).astype(np.float32),
        "a/large": rng.randn(300, 1200).astype(np.float32),  # spans blocks
        "global_step": np.array(70000, np.int64),
        "misc/int32": rng.randint(0, 9, (5,), np.int32),
        "misc/double": rng.randn(3, 2),
        "misc/bool": np.array([True, False, True]),
        "misc/empty": np.zeros((0, 4), np.float32),
    }
    prefix = str(tmp_path_factory.mktemp("ckpt") / "model.ckpt")
    return _write_ckpt(arrays, prefix), arrays


def test_reader_matches_tf_byte_for_byte(mixed_ckpt):
    from tf_faster_rcnn_tpu.utils.tf_bundle import (is_tf_checkpoint,
                                                    read_tf_checkpoint)
    prefix, _ = mixed_ckpt
    assert is_tf_checkpoint(prefix)
    assert not is_tf_checkpoint(prefix + "_nope")
    ours = read_tf_checkpoint(prefix)
    ref = dict(np.load(prefix + "_tfdump.npz"))
    assert set(ours) == set(ref)
    for k in ref:
        assert ours[k].dtype == ref[k].dtype, k
        np.testing.assert_array_equal(ours[k], ref[k], err_msg=k)


def test_list_without_reading_data(mixed_ckpt):
    from tf_faster_rcnn_tpu.utils.tf_bundle import list_tf_checkpoint
    prefix, arrays = mixed_ckpt
    listing = list_tf_checkpoint(prefix)
    assert set(listing) == set(arrays)
    assert listing["a/large"][0] == (300, 1200)
    assert listing["global_step"][0] == ()


def test_ckpt_to_converted_params_end_to_end(tmp_path):
    """The RUNBOOK chain: real .ckpt -> load_var_dict -> slim surgery ->
    params, with the forward pass finite (mobile: exercises the depthwise
    layout transpose and the /127.5 first-conv scale)."""
    import jax
    import numpy as np
    rng = np.random.RandomState(1)
    params = _init("mobile")
    var = _fill_var_dict_from_tree(params, "mobile", rng)
    var = {k: np.asarray(v, np.float32) for k, v in var.items()}
    prefix = _write_ckpt(var, str(tmp_path / "mobile.ckpt"))

    from tf_faster_rcnn_tpu.utils.slim_import import (convert_slim_weights,
                                                      load_var_dict)
    loaded = load_var_dict(prefix)  # dispatches to the bundle reader
    assert set(loaded) == set(var)
    converted = convert_slim_weights(params, loaded, "mobile")
    # first conv carries the BGR flip + /127.5 scale of the reference's
    # fix_variables (mobilenet_v1.py:266-278)
    k = np.asarray(converted["params"]["head"]["base"]["conv2d_0"]["kernel"])
    np.testing.assert_allclose(
        k, var["MobilenetV1/Conv2d_0/weights"][:, :, ::-1, :] / 127.5,
        rtol=1e-6)

    from tf_faster_rcnn_tpu.models.network import FasterRCNN, spec_from_cfg
    import dataclasses
    spec = dataclasses.replace(spec_from_cfg("mobile", 21, "TEST"),
                               anchor_scales=(2, 4), rpn_pre_nms_top_n=128,
                               rpn_post_nms_top_n=16)
    model = FasterRCNN(spec)
    out = model.apply(converted, np.zeros((1, 64, 64, 3), np.float32),
                      np.array([[64, 64, 1.0]], np.float32))
    assert np.isfinite(np.asarray(out["cls_prob"])).all()
