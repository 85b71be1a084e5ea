"""Fast unit tests for the mesh/sharding layout rules (parallel/mesh.py) —
no model compiles; the end-to-end equality runs live in test_multichip.py."""

import jax
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from tf_faster_rcnn_tpu.parallel.mesh import (DATA_AXIS, MODEL_AXIS,
                                              data_axis_size,
                                              make_hybrid_mesh, make_mesh,
                                              model_axis_size, shard_batch,
                                              tp_pspec)


def test_hybrid_mesh_shape_and_degeneration():
    m = make_hybrid_mesh(data=2, model=4)
    assert m.axis_names == (DATA_AXIS, MODEL_AXIS)
    assert data_axis_size(m) == 2 and model_axis_size(m) == 4

    m1 = make_hybrid_mesh(data=4, model=1)
    assert m1.axis_names == (DATA_AXIS,)
    assert data_axis_size(m1) == 4 and model_axis_size(m1) == 1

    assert model_axis_size(make_mesh(8)) == 1

    with pytest.raises(ValueError):
        make_hybrid_mesh(data=8, model=4)  # 32 > 8 virtual devices


def test_tp_rules_vgg16_megatron_pair():
    assert tp_pspec("params/tail/fc6/kernel", "vgg16") == P(None, MODEL_AXIS)
    assert tp_pspec("params/tail/fc6/bias", "vgg16") == P(MODEL_AXIS)
    assert tp_pspec("params/tail/fc7/kernel", "vgg16") == P(MODEL_AXIS, None)
    assert tp_pspec("params/tail/fc7/bias", "vgg16") == P()
    # head convs / heads stay replicated
    assert tp_pspec("params/head/conv5_3/kernel", "vgg16") == P()
    assert tp_pspec("params/cls_score/kernel", "vgg16") == P()


def test_tp_rules_apply_to_momentum_trace_paths():
    # optax trace paths embed the param path — same rule table places both
    trace = "opt_state/1/trace/params/tail/fc6/kernel"
    assert tp_pspec(trace, "vgg16") == P(None, MODEL_AXIS)
    assert tp_pspec("opt_state/2/count", "vgg16") == P()


def test_tp_rules_resnet_bottleneck():
    base = "params/tail/block4/unit_2/"
    assert tp_pspec(base + "conv1/conv/kernel", "res101") == \
        P(None, None, None, MODEL_AXIS)
    assert tp_pspec(base + "conv1/bn/scale", "res101") == P(MODEL_AXIS)
    assert tp_pspec(base + "conv2/conv/kernel", "res101") == \
        P(None, None, MODEL_AXIS, None)
    # conv3 / shortcut / non-tail blocks replicated
    assert tp_pspec(base + "conv3/conv/kernel", "res101") == P()
    assert tp_pspec(base + "shortcut/conv/kernel", "res101") == P()
    assert tp_pspec("params/head/block3/unit_1/conv1/conv/kernel",
                    "res101") == P()


def test_tp_rules_mobilenet_replicated():
    assert tp_pspec("params/tail/conv13/pointwise/kernel",
                    "mobile") == P()


def test_shard_batch_spatial_divisibility_gate():
    mesh = make_hybrid_mesh(data=2, model=4)
    batch = {
        "image": np.zeros((2, 64, 48, 3), np.float32),
        "im_info": np.zeros((2, 3), np.float32),
    }
    with mesh:
        out = shard_batch(mesh, batch, spatial=True)
    assert out["image"].sharding.spec[1] == MODEL_AXIS
    assert out["im_info"].sharding.spec == P(DATA_AXIS, None)

    # H = 66 not divisible by 4 -> image falls back to data-only sharding
    batch["image"] = np.zeros((2, 66, 48, 3), np.float32)
    with mesh:
        out = shard_batch(mesh, batch, spatial=True)
    assert out["image"].sharding.spec[1] is None

    # spatial off -> data-only regardless
    batch["image"] = np.zeros((2, 64, 48, 3), np.float32)
    with mesh:
        out = shard_batch(mesh, batch, spatial=False)
    assert out["image"].sharding.spec[1] is None


def test_shard_params_places_and_reassembles():
    from tf_faster_rcnn_tpu.parallel.mesh import shard_params
    mesh = make_hybrid_mesh(data=2, model=4)
    params = {"params": {"tail": {"fc6": {
        "kernel": np.arange(32.0, dtype=np.float32).reshape(4, 8),
        "bias": np.arange(8.0, dtype=np.float32)}}}}
    out = shard_params(mesh, params, "vgg16")
    k = out["params"]["tail"]["fc6"]["kernel"]
    assert k.sharding.spec[1] == MODEL_AXIS
    # a sharded place-then-gather is lossless
    np.testing.assert_array_equal(
        np.asarray(k), params["params"]["tail"]["fc6"]["kernel"])
    np.testing.assert_array_equal(
        np.asarray(out["params"]["tail"]["fc6"]["bias"]),
        params["params"]["tail"]["fc6"]["bias"])
