"""Optimizer semantics: LR schedule boundaries, DOUBLE_BIAS, momentum form,
freeze masks in updates (reference train_val.py:116-153, 267-274)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from tf_faster_rcnn_tpu.engine.train import (TrainState, lr_schedule,
                                             make_optimizer)
from tf_faster_rcnn_tpu.models.network import spec_from_cfg


def test_lr_schedule_gamma_steps():
    lr = lr_schedule(0.001, 0.1, [50000])
    np.testing.assert_allclose(float(lr(0)), 0.001, rtol=1e-6)
    np.testing.assert_allclose(float(lr(49999)), 0.001, rtol=1e-6)
    np.testing.assert_allclose(float(lr(50000)), 0.0001, rtol=1e-5)
    # multiple boundaries (config supports a list)
    lr2 = lr_schedule(0.01, 0.5, [10, 20])
    np.testing.assert_allclose([float(lr2(s)) for s in (5, 10, 25)],
                               [0.01, 0.005, 0.0025])


def _toy_state(double_bias, params=None):
    spec = dataclasses.replace(spec_from_cfg("vgg16", 2, "TRAIN"))
    params = params or {
        "params": {
            "rpn_conv": {"kernel": jnp.ones((2, 2)), "bias": jnp.ones((2,))},
            # vgg16 conv1 is frozen by the mask rules
            "head": {"conv1_1": {"kernel": jnp.ones((2, 2)),
                                 "bias": jnp.ones((2,))}},
        }
    }
    tx = make_optimizer(spec, params, learning_rate=0.1, momentum=0.9,
                        gamma=0.1, stepsizes=[1000], double_bias=double_bias)
    return TrainState(step=jnp.zeros((), jnp.int32), params=params,
                      opt_state=tx.init(params), key=jax.random.PRNGKey(0),
                      tx=tx), params


def _ones_like(params):
    return jax.tree_util.tree_map(jnp.ones_like, params)


def test_momentum_update_matches_tf_form():
    """TF MomentumOptimizer: acc = m*acc + g; var -= lr*acc."""
    state, params = _toy_state(double_bias=False)
    g = _ones_like(params)
    s1 = state.apply_gradients(g)
    k1 = np.asarray(s1.params["params"]["rpn_conv"]["kernel"])
    np.testing.assert_allclose(k1, 1.0 - 0.1 * 1.0, rtol=1e-6)
    s2 = s1.apply_gradients(g)
    k2 = np.asarray(s2.params["params"]["rpn_conv"]["kernel"])
    # acc after 2 steps = 0.9*1 + 1 = 1.9 -> var = 0.9 - 0.1*1.9
    np.testing.assert_allclose(k2, 0.9 - 0.1 * 1.9, rtol=1e-6)


def test_double_bias_doubles_bias_updates():
    state, params = _toy_state(double_bias=True)
    g = _ones_like(params)
    s1 = state.apply_gradients(g)
    k = np.asarray(s1.params["params"]["rpn_conv"]["kernel"])
    b = np.asarray(s1.params["params"]["rpn_conv"]["bias"])
    np.testing.assert_allclose(1.0 - k, 0.1, rtol=1e-6)
    np.testing.assert_allclose(1.0 - b, 0.2, rtol=1e-6)  # x2 for bias


def test_frozen_params_not_updated():
    state, params = _toy_state(double_bias=False)
    g = _ones_like(params)
    s1 = state.apply_gradients(g)
    frozen = np.asarray(s1.params["params"]["head"]["conv1_1"]["kernel"])
    np.testing.assert_array_equal(frozen, 1.0)  # vgg conv1 frozen
    live = np.asarray(s1.params["params"]["rpn_conv"]["kernel"])
    assert (live != 1.0).all()


def test_lr_decay_applied_at_boundary():
    spec = dataclasses.replace(spec_from_cfg("vgg16", 2, "TRAIN"))
    params = {"params": {"rpn_conv": {"kernel": jnp.ones((2, 2))}}}
    tx = make_optimizer(spec, params, learning_rate=0.1, momentum=0.0,
                        gamma=0.1, stepsizes=[1], double_bias=False)
    state = TrainState(step=jnp.zeros((), jnp.int32), params=params,
                       opt_state=tx.init(params), key=jax.random.PRNGKey(0),
                       tx=tx)
    g = _ones_like(params)
    s1 = state.apply_gradients(g)   # step 0: lr 0.1
    s2 = s1.apply_gradients(g)      # step 1: lr 0.01
    k1 = float(s1.params["params"]["rpn_conv"]["kernel"][0, 0])
    k2 = float(s2.params["params"]["rpn_conv"]["kernel"][0, 0])
    np.testing.assert_allclose(1.0 - k1, 0.1, rtol=1e-6)
    np.testing.assert_allclose(k1 - k2, 0.01, rtol=1e-5)


def test_nan_guard_skips_nonfinite_steps():
    """TPU.NAN_GUARD semantics: a non-finite loss/grad leaves params and
    momentum untouched (step/key still advance); finite steps update."""
    from tests.test_multichip import _tiny_setup
    from tf_faster_rcnn_tpu.engine.train import create_train_state, \
        make_train_step
    spec, model, params, batch = _tiny_setup(1)
    state = create_train_state(spec, params, jax.random.PRNGKey(3))
    step_fn = make_train_step(model, spec, weight_decay=1e-4,
                              mobile_weight_decay=4e-5, donate=False,
                              nan_guard=True)

    # finite case: update applies, not skipped
    s1, m1 = step_fn(state, batch)
    assert float(m1["step_skipped"]) == 0.0
    k0 = np.asarray(state.params["params"]["rpn_conv"]["kernel"])
    k1 = np.asarray(s1.params["params"]["rpn_conv"]["kernel"])
    assert not np.array_equal(k0, k1)

    # poison one parameter -> non-finite loss -> whole update skipped
    bad = jax.tree_util.tree_map(lambda x: x, state.params)
    bad["params"]["rpn_conv"]["kernel"] = (
        bad["params"]["rpn_conv"]["kernel"].at[0].set(jnp.nan))
    bad_state = state.replace(params=bad)
    s2, m2 = step_fn(bad_state, batch)
    assert float(m2["step_skipped"]) == 1.0
    assert int(s2.step) == int(bad_state.step) + 1
    for a, b in zip(jax.tree_util.tree_leaves(bad_state.params),
                    jax.tree_util.tree_leaves(s2.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree_util.tree_leaves(bad_state.opt_state),
                    jax.tree_util.tree_leaves(s2.opt_state)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_param_dtype_bf16_state():
    """TPU.PARAM_DTYPE='bfloat16' casts params and momentum to bf16 and the
    update still applies (the ROADMAP study documents the accuracy cost)."""
    from tf_faster_rcnn_tpu.config import cfg
    from tf_faster_rcnn_tpu.engine.train import create_train_state
    cfg.TPU.PARAM_DTYPE = 'bfloat16'
    spec = dataclasses.replace(spec_from_cfg("vgg16", 2, "TRAIN"))
    params = {"params": {
        "rpn_conv": {"kernel": jnp.ones((2, 2)), "bias": jnp.ones((2,))}}}
    state = create_train_state(spec, params, jax.random.PRNGKey(0))
    assert state.params["params"]["rpn_conv"]["kernel"].dtype == jnp.bfloat16
    def _float_leaves(tree):
        return [l for l in jax.tree_util.tree_leaves(tree)
                if jnp.issubdtype(l.dtype, jnp.floating)]

    assert all(l.dtype == jnp.bfloat16 for l in _float_leaves(state.opt_state))
    s1 = state.apply_gradients(_ones_like(state.params))
    k1 = s1.params["params"]["rpn_conv"]["kernel"]
    assert k1.dtype == jnp.bfloat16
    # the momentum trace stays bf16 after an update (half the state HBM)
    assert all(l.dtype == jnp.bfloat16 for l in _float_leaves(s1.opt_state))
    np.testing.assert_allclose(np.asarray(k1, np.float32),
                               1.0 - 0.001 * 1.0, rtol=1e-2)
