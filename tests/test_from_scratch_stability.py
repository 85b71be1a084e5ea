"""Divergence-class regression tests: from-scratch training at the SCALED
recipe must keep finite losses and actually learn.

The reference only ever fine-tunes from ImageNet checkpoints
(/root/reference/lib/model/train_val.py:177-202), so from-scratch numerics
are new surface — and the only training regime this environment can fully
exercise (no hosted checkpoints). Round 3's one hardware run of the COCO
rehearsal (from-scratch res101, batch 8, linear-scaled LR with warmup) went
non-finite at iter 4: frozen identity-BN propagated raw-pixel-scale O(100)
activations into the 0.01-std RPN/head initializers, whose logit/delta
outputs then sat at the exp() overflow boundary while head-weight updates
ran ~20x the weights' own scale per step. These tests pin the fix
(models/layers.py::stem_init + the ops/boxes.py BBOX_XFORM_CLIP decode
clamp): they fail on the pre-fix math, at CI scale, for the ResNet family
the COCO headlines use.
"""

import numpy as np
import pytest

from tf_faster_rcnn_tpu.config import cfg

BATCH = 2          # > 1 so scale_recipe engages (LR x B + warmup)
CANVAS = (96, 128)
STEPS = 16


def _scene_batch(rng, canvas, batch, max_gt):
    """Color-rectangle scenes with matching gt, like the rehearsal task."""
    h, w = canvas
    images = np.zeros((batch, h, w, 3), np.float32)
    gt = np.zeros((batch, max_gt, 5), np.float32)
    gv = np.zeros((batch, max_gt), bool)
    info = np.zeros((batch, 3), np.float32)
    for b in range(batch):
        im = rng.randint(0, 60, (h, w, 3)).astype(np.float32)
        for g in range(rng.randint(1, 4)):
            x1, y1 = rng.randint(4, w - 40), rng.randint(4, h - 40)
            x2, y2 = x1 + rng.randint(16, 36), y1 + rng.randint(16, 36)
            im[y1:y2, x1:x2] = rng.randint(150, 255, 3)
            gt[b, g] = (x1, y1, x2 - 1, y2 - 1, rng.randint(1, 4))
            gv[b, g] = True
        images[b] = im - cfg.PIXEL_MEANS
        info[b] = (h, w, 1.0)
    return {"image": images, "im_info": info, "gt_boxes": gt,
            "gt_valid": gv}


def _run_steps(net, steps=STEPS, batch=BATCH, fixed_batch=False):
    import jax
    from tf_faster_rcnn_tpu.engine.train import (create_train_state,
                                                 lr_schedule, make_train_step,
                                                 scale_recipe)
    from tf_faster_rcnn_tpu.models.network import FasterRCNN, spec_from_cfg

    cfg.TPU.MAX_GT = 8
    cfg.ANCHOR_SCALES = [2, 4, 8]
    cfg.TRAIN.RPN_PRE_NMS_TOP_N = 256
    cfg.TRAIN.RPN_POST_NMS_TOP_N = 48
    cfg.TRAIN.BATCH_SIZE = 32
    cfg.TRAIN.RPN_BATCHSIZE = 64
    # the rehearsal's scaled-recipe semantics: LR x global batch, warmup
    cfg.TPU.WARMUP_ITERS = 4 * batch     # a few warmup steps inside the run
    spec = spec_from_cfg(net, 4, "TRAIN")
    model = FasterRCNN(spec)
    rng = np.random.RandomState(0)
    batch0 = _scene_batch(rng, CANVAS, batch, cfg.TPU.MAX_GT)
    key = jax.random.PRNGKey(cfg.RNG_SEED)
    params = jax.jit(model.init)(
        {"params": key, "sampling": key, "dropout": key},
        batch0["image"], batch0["im_info"], batch0["gt_boxes"],
        batch0["gt_valid"])
    state = create_train_state(spec, params, jax.random.PRNGKey(1),
                               batch_size=batch)
    recipe = scale_recipe(batch)
    assert recipe["scale"] == batch and recipe["warmup_steps"] > 0
    lr_fn = lr_schedule(recipe["learning_rate"], float(cfg.TRAIN.GAMMA),
                        recipe["stepsizes"], recipe["warmup_steps"],
                        recipe["warmup_factor"])
    step_fn = make_train_step(
        model, spec, weight_decay=float(cfg.TRAIN.WEIGHT_DECAY),
        mobile_weight_decay=float(cfg.MOBILENET.WEIGHT_DECAY),
        lr_fn=lr_fn, nan_guard=True)
    losses, skipped = [], 0
    for it in range(steps):
        # fixed_batch: pure-overfit regime (same scenes every step) — the
        # regime that exposes LEARNING-SPEED regressions (see the gate below)
        b = batch0 if fixed_batch else _scene_batch(rng, CANVAS, batch,
                                                    cfg.TPU.MAX_GT)
        state, metrics = step_fn(state, b)
        skipped += int(float(metrics["step_skipped"]))
        losses.append(float(metrics["total_loss"]))
    return losses, skipped


@pytest.mark.parametrize("net", ["res50"])
def test_from_scratch_scaled_recipe_stays_finite_and_learns(net):
    """ResNet from random init at the scaled recipe: every step finite
    (nan_guard never trips) and the loss trends down over 16 steps."""
    losses, skipped = _run_steps(net)
    assert skipped == 0, f"non-finite steps at the scaled recipe: {losses}"
    assert all(np.isfinite(losses)), losses
    head = float(np.mean(losses[:4]))
    tail = float(np.mean(losses[-4:]))
    assert tail < head, (
        f"no learning signal from scratch: first4={head:.4f} "
        f"last4={tail:.4f} losses={losses}")


@pytest.mark.slow
@pytest.mark.parametrize("net", ["res101", "mobile"])
def test_from_scratch_scaled_recipe_deep_nets(net):
    """The headline backbones (heavier compiles — slow marker)."""
    losses, skipped = _run_steps(net)
    assert skipped == 0, f"non-finite steps at the scaled recipe: {losses}"
    assert float(np.mean(losses[-4:])) < float(np.mean(losses[:4])), losses


@pytest.mark.parametrize("net", ["vgg16", "res50", "mobile"])
def test_from_scratch_init_feature_scale(net):
    """Backbone features at INIT must be O(1) on pixel-scale inputs.

    Divergence (res101 NaN at iter 4) and collapse are the two from-scratch
    failure flavors, and both are visible at init: O(100) features overflow
    the decode/updates (fixed by layers.stem_init), while vanishing features
    starve the 0.01-std heads of signal until they settle into an
    all-background equilibrium — the mobile rehearsal's measured AP 0.0004
    (backbone-output std 0.011 from flax's default lecun gain on the
    pointwise convs: each post-relu conv sheds x0.5 variance and nothing
    re-normalizes under identity frozen BN). Finite-steps tests cannot see
    the second flavor — losses stay finite and flat at the bg fixed point —
    so pin the init scale directly, both-sided.
    """
    import dataclasses

    import jax
    from tf_faster_rcnn_tpu.models.network import (FasterRCNN, extract_head,
                                                   spec_from_cfg)
    spec = dataclasses.replace(
        spec_from_cfg(net, 4, "TEST"),
        anchor_scales=(2, 4), rpn_pre_nms_top_n=64, rpn_post_nms_top_n=16)
    model = FasterRCNN(spec)
    rng = np.random.RandomState(0)
    h, w = 96, 128
    # raw-pixel-scale input, mean-subtracted like data/blob.py ships it
    im = (rng.rand(1, h, w, 3).astype(np.float32) * 255.0
          ) - cfg.PIXEL_MEANS.reshape(1, 1, 1, 3)
    info = np.array([[h, w, 1.0]], np.float32)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), im, info)
    feats = np.asarray(extract_head(model, params, im, info[:, :2]),
                       np.float32)
    std = float(feats.std())
    assert 0.05 < std < 20.0, (
        f"{net} init backbone-output std {std:.4g}: outside the O(1) "
        f"regime — from-scratch training will diverge (>>1) or collapse "
        f"to all-background (<<1)")


# Backbone-specific trailing-loss bounds for the 24-step fixed-batch overfit
# below, calibrated 2026-08-21 on the then-healthy inits with ~30% headroom:
# measured vgg16 0.70 / res50 1.23 / mobile 0.49. The round-4 vgg16 init
# regression (8c2e007: stem_init on conv1_1 + He conv2-5) measures 1.10 on
# the same task — above its bound — so this gate fails on that commit's
# init and passes on the per-backbone inits that fixed it.
_OVERFIT_BOUNDS = {"vgg16": 0.90, "res50": 1.45, "mobile": 0.75}


@pytest.mark.parametrize("net", ["vgg16", "res50", "mobile"])
def test_from_scratch_learning_speed(net):
    """From-scratch learning SPEED per backbone — not just finiteness.

    Round 4 proved the gap (VERDICT r4 weak #5): three init-fix rounds were
    each gated on init statistics or few-step finiteness, and a change that
    slowed vgg16's convergence ~40% (and added saturation spikes: cls-head
    CE pinned at exact 0 until a resampled hard proposal costs ~7) shipped
    green through all of them. Init-scale gates bound the STARTING point;
    this bounds the RATE: 24 steps of the scaled recipe on one fixed scene
    batch (the pure-overfit regime, where saturation dynamics are visible —
    fresh-scenes-per-step runs showed only 0.81-vs-1.04 separation on the
    same regression) must bring the trailing-4 mean loss under a calibrated
    backbone-specific bound.
    """
    losses, skipped = _run_steps(net, steps=24, fixed_batch=True)
    assert skipped == 0, f"non-finite steps: {losses}"
    tail = float(np.mean(losses[-4:]))
    assert tail < _OVERFIT_BOUNDS[net], (
        f"{net} from-scratch learning slower than calibrated: trailing-4 "
        f"loss {tail:.4f} >= {_OVERFIT_BOUNDS[net]} — an init/optimizer "
        f"change degraded convergence rate (losses={losses})")
