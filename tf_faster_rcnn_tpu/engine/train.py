"""Training engine: optimizer, train state, and the jitted train step.

Optimizer parity with the reference SolverWrapper (/root/reference/lib/model/
train_val.py:116-153): SGD with momentum 0.9; learning rate with gamma step
decay at the STEPSIZE boundaries (:267-274, computed here as a pure function
of the step counter so resume needs no LR bookkeeping); the DOUBLE_BIAS
gradient-x2 rewrite for bias terms (:133-143); weight decay realized as an
L2 loss term like slim's regularizers; frozen params receive zero updates
via the trainable mask (the reference freezes by building non-trainable
variables).

The train step is a single pjit-able pure function (state, batch, key) ->
(state, metrics): forward, losses, grad, optimizer — sharded over the data
axis of the mesh with parameters replicated; XLA inserts the ICI gradient
all-reduce.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from tf_faster_rcnn_tpu.engine.losses import detection_losses, weight_decay_loss
from tf_faster_rcnn_tpu.models.network import (FasterRCNN, ModelSpec,
                                               trainable_mask)

__all__ = ["TrainState", "create_train_state", "make_train_step",
           "lr_schedule", "make_optimizer", "scale_recipe"]


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    opt_state: Any
    key: jnp.ndarray
    tx: optax.GradientTransformation = struct.field(pytree_node=False)

    def apply_gradients(self, grads):
        updates, new_opt = self.tx.update(grads, self.opt_state, self.params)
        return self.replace(step=self.step + 1,
                            params=optax.apply_updates(self.params, updates),
                            opt_state=new_opt)


def lr_schedule(base_lr: float, gamma: float, stepsizes,
                warmup_steps: int = 0,
                warmup_factor: float = 1.0) -> Callable:
    """Piecewise-constant gamma decay at each stepsize boundary
    (train_val.py:267-274; config TRAIN.STEPSIZE supports a list), with an
    optional linear warmup over the first ``warmup_steps`` steps from
    ``warmup_factor * base_lr`` — the standard companion of the linear
    batch-scaling rule (scale_recipe)."""
    boundaries = jnp.asarray(sorted(int(s) for s in stepsizes))

    def lr(step):
        n = jnp.sum(step >= boundaries)
        value = base_lr * jnp.power(gamma, n.astype(jnp.float32))
        if warmup_steps > 0:
            frac = jnp.minimum(step.astype(jnp.float32) / warmup_steps, 1.0)
            value = value * (warmup_factor + (1.0 - warmup_factor) * frac)
        return value

    return lr


def scale_recipe(batch_size: int):
    """Map the reference's 1-image/step schedule onto a global batch.

    Linear-scaling rule (Goyal et al. 2017): returns a dict with the scaled
    learning rate, STEPSIZE boundaries and warmup (in batched steps), and
    ``iters(n)`` converting reference iteration counts (images) to batched
    steps. Identity when batch_size == 1 or TPU.AUTO_SCALE_SCHEDULE is off,
    so single-image runs follow the reference exactly
    (train_faster_rcnn.sh:18-44 semantics).
    """
    from tf_faster_rcnn_tpu.config import cfg
    b = max(1, int(batch_size))
    scale = b if bool(cfg.TPU.AUTO_SCALE_SCHEDULE) else 1

    def iters(n):
        return max(1, -(-int(n) // scale))

    warmup = 0
    if scale > 1 and int(cfg.TPU.WARMUP_ITERS) > 0:
        warmup = iters(cfg.TPU.WARMUP_ITERS)
    return {
        "learning_rate": float(cfg.TRAIN.LEARNING_RATE) * scale,
        "stepsizes": [iters(s) for s in cfg.TRAIN.STEPSIZE],
        "warmup_steps": warmup,
        "warmup_factor": float(cfg.TPU.WARMUP_FACTOR) if warmup else 1.0,
        "iters": iters,
        "scale": scale,
    }


def _double_bias() -> optax.GradientTransformation:
    """Reference DOUBLE_BIAS: gradient x2 for bias params (train_val.py:
    133-143). BN affine params keep their 'bias'/'scale' names but are
    frozen anyway, so doubling them is a no-op after masking."""

    def init(params):
        return optax.EmptyState()

    def update(updates, state, params=None):
        def f(path, g):
            name = getattr(path[-1], "key", str(path[-1]))
            return g * 2.0 if name == "bias" else g
        return jax.tree_util.tree_map_with_path(f, updates), state

    return optax.GradientTransformation(init, update)


def make_optimizer(spec: ModelSpec, params, *, learning_rate: float,
                   momentum: float, gamma: float, stepsizes,
                   double_bias: bool, warmup_steps: int = 0,
                   warmup_factor: float = 1.0) -> optax.GradientTransformation:
    mask = trainable_mask(params, spec)
    sched = lr_schedule(learning_rate, gamma, stepsizes,
                        warmup_steps, warmup_factor)
    chain = []
    if double_bias:
        chain.append(_double_bias())
    chain += [
        optax.trace(decay=momentum),          # TF MomentumOptimizer form
        optax.scale_by_schedule(lambda s: -sched(s)),
        optax.masked(optax.set_to_zero(), jax.tree_util.tree_map(
            lambda t: not t, mask)),           # freeze rules
    ]
    return optax.chain(*chain)


def create_train_state(spec: ModelSpec, params, key,
                       batch_size: int = 1) -> TrainState:
    """Build state from the global cfg's TRAIN options.

    batch_size: the GLOBAL images/step; > 1 applies the linear-scaling
    recipe mapping (scale_recipe) so the reference schedule semantics are
    preserved per image seen.

    TPU.PARAM_DTYPE='bfloat16' casts params (and therefore the optimizer's
    momentum trace) to bf16 — half the state HBM, but SGD updates smaller
    than ~1/256 of a parameter's magnitude are rounded away; see the
    ROADMAP study.
    """
    from tf_faster_rcnn_tpu.config import cfg
    pdtype = jnp.dtype(str(cfg.TPU.PARAM_DTYPE))
    if pdtype != jnp.float32:
        params = jax.tree_util.tree_map(
            lambda x: x.astype(pdtype)
            if jnp.issubdtype(x.dtype, jnp.floating) else x, params)
    recipe = scale_recipe(batch_size)
    tx = make_optimizer(
        spec, params,
        learning_rate=recipe["learning_rate"],
        momentum=float(cfg.TRAIN.MOMENTUM),
        gamma=float(cfg.TRAIN.GAMMA),
        stepsizes=recipe["stepsizes"],
        double_bias=bool(cfg.TRAIN.DOUBLE_BIAS),
        warmup_steps=recipe["warmup_steps"],
        warmup_factor=recipe["warmup_factor"])
    return TrainState(step=jnp.zeros((), jnp.int32), params=params,
                      opt_state=tx.init(params), key=key, tx=tx)


def make_train_step(model: FasterRCNN, spec: ModelSpec, *,
                    weight_decay: float, mobile_weight_decay: float,
                    bias_decay: bool = False, lr_fn: Optional[Callable] = None,
                    donate: bool = True, nan_guard: bool = False) -> Callable:
    """Returns jitted (state, batch) -> (state, metrics).

    batch: dict with 'image' [B,H,W,3], 'im_info' [B,3], 'gt_boxes'
    [B,G,5], 'gt_valid' [B,G]. All batch entries may be sharded over the
    mesh data axis; state is replicated.

    nan_guard: on-device failure detection the reference lacks (NaN blowups
    are a README pointer there, README.md:170). When the loss or any
    gradient is non-finite, the params/momentum update is skipped entirely
    (step still advances, RNG key still splits) and metrics report
    step_skipped=1 so the driver can count and abort on persistent failure.
    """

    def loss_fn(params, batch, key):
        out = model.apply(
            params, batch["image"], batch["im_info"], batch["gt_boxes"],
            batch["gt_valid"],
            rngs={"sampling": key, "dropout": jax.random.fold_in(key, 1)})
        losses = detection_losses(out, spec)
        reg = weight_decay_loss(params["params"], weight_decay,
                                mobile_weight_decay, spec.backbone,
                                bias_decay=bias_decay)
        total = losses["total_loss"] + reg
        metrics = dict(losses)
        metrics["regularization_loss"] = reg
        metrics["total_loss"] = total
        return total, metrics

    def step(state: TrainState, batch) -> Tuple[TrainState, Dict]:
        key, new_key = jax.random.split(state.key)
        grads, metrics = jax.grad(loss_fn, has_aux=True)(
            state.params, batch, key)
        if nan_guard:
            finite = jnp.isfinite(metrics["total_loss"])
            finite &= jax.tree_util.tree_reduce(
                lambda a, g: a & jnp.all(jnp.isfinite(g)), grads,
                jnp.asarray(True))
            new_state = jax.lax.cond(
                finite,
                lambda s: s.apply_gradients(grads),
                lambda s: s.replace(step=s.step + 1),
                state)
            metrics["step_skipped"] = 1.0 - finite.astype(jnp.float32)
        else:
            new_state = state.apply_gradients(grads)
        new_state = new_state.replace(key=new_key)
        if lr_fn is not None:
            metrics["learning_rate"] = lr_fn(state.step)
        return new_state, metrics

    return jax.jit(step, donate_argnums=(0,) if donate else ())
