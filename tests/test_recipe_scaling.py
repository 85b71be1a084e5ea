"""Batched-training recipe mapping (engine/train.py::scale_recipe): the
reference's 1-image/step schedule tables (train_faster_rcnn.sh:18-44,
lib/model/train_val.py:267-274) map onto a global batch B by the linear-
scaling rule — LR x B with warmup, iteration counts / B — so --iters and
TRAIN.STEPSIZE keep their reference (image-count) semantics at any batch."""

import numpy as np
import pytest

from tf_faster_rcnn_tpu.config import cfg
from tf_faster_rcnn_tpu.engine.train import lr_schedule, scale_recipe


def test_scale_recipe_identity_at_batch_1():
    r = scale_recipe(1)
    assert r["learning_rate"] == cfg.TRAIN.LEARNING_RATE
    assert r["stepsizes"] == list(cfg.TRAIN.STEPSIZE)
    assert r["warmup_steps"] == 0 and r["warmup_factor"] == 1.0
    assert r["iters"](70000) == 70000


def test_scale_recipe_linear_rule():
    r = scale_recipe(8)
    assert r["learning_rate"] == pytest.approx(0.001 * 8)
    assert r["stepsizes"] == [3750]             # ceil(30000/8)
    assert r["warmup_steps"] == -(-500 // 8)    # ceil
    assert r["iters"](70000) == 8750
    assert r["iters"](1) == 1                   # never rounds to zero


def test_scale_recipe_disabled():
    cfg.TPU.AUTO_SCALE_SCHEDULE = False
    r = scale_recipe(8)
    assert r["learning_rate"] == cfg.TRAIN.LEARNING_RATE
    assert r["iters"](70000) == 70000
    assert r["warmup_steps"] == 0


def test_lr_schedule_warmup_then_gamma():
    import jax.numpy as jnp
    lr = lr_schedule(0.008, 0.1, [100], warmup_steps=10, warmup_factor=0.25)
    # step 0: factor * lr
    assert float(lr(jnp.int32(0))) == pytest.approx(0.002)
    # midway: linear ramp
    assert float(lr(jnp.int32(5))) == pytest.approx(0.008 * (0.25 + 0.75 / 2))
    # past warmup: full scaled LR
    assert float(lr(jnp.int32(10))) == pytest.approx(0.008)
    assert float(lr(jnp.int32(99))) == pytest.approx(0.008)
    # gamma boundary still honored
    assert float(lr(jnp.int32(100))) == pytest.approx(0.0008)


def test_lr_schedule_no_warmup_matches_reference():
    import jax.numpy as jnp
    lr = lr_schedule(0.001, 0.1, [30000])
    assert float(lr(jnp.int32(0))) == pytest.approx(0.001)
    assert float(lr(jnp.int32(29999))) == pytest.approx(0.001)
    assert float(lr(jnp.int32(30000))) == pytest.approx(0.0001)


def _train(tmp_path, tag, ims_per_device, iters):
    """Short overfit run on the mini-VOC; returns per-step total losses."""
    import jax
    from tf_faster_rcnn_tpu.data.roidb import prepare_roidb
    from tf_faster_rcnn_tpu.datasets.factory import get_imdb
    from tf_faster_rcnn_tpu.engine.train_loop import train_net
    cfg.TPU.IMS_PER_DEVICE = ims_per_device
    cfg.TRAIN.SNAPSHOT_ITERS = 10 ** 9
    cfg.TRAIN.DISPLAY = 1
    cfg.TRAIN.SUMMARY_INTERVAL = 10 ** 9
    imdb = get_imdb('voc_2007_trainval')
    imdb.set_proposal_method('gt')
    prepare_roidb(imdb)
    roidb = imdb.roidb
    out = str(tmp_path / f'out_{tag}')
    tb = str(tmp_path / f'tb_{tag}')
    state = train_net('vgg16', imdb, roidb, list(roidb), out, tb,
                      max_iters=iters)
    return state


def _trailing_losses(captured: str, n_steps: int):
    """Per-iter 'total loss' values printed by the train loop (DISPLAY=1),
    trailing n_steps of them."""
    import re
    vals = [float(m) for m in re.findall(r"total loss: ([0-9.]+)", captured)]
    assert len(vals) >= n_steps, captured[-2000:]
    return vals[-n_steps:]


def test_batched_recipe_trains_equivalently(tmp_path, capsys):
    """Overfit-task mapping check (VERDICT r1 item 5): a batch-2 run under
    the scaled recipe covers the same image budget in half the steps and
    ends in the same loss regime as the batch-1 reference recipe.

    Compared on the trailing in-train loss average over the same trailing
    image budget (last 4 images of each run) — a single post-hoc forward at
    the batch-1 endpoint is dominated by the last per-image momentum step
    and flakes."""
    from test_pipeline import _make_voc, _tiny_cfg
    _make_voc(str(tmp_path), 'trainval', n=2, seed=3)
    _tiny_cfg(tmp_path)
    cfg.TPU.WARMUP_ITERS = 4  # reference units -> 2 batched warmup steps

    REF_ITERS = 16
    s1 = _train(tmp_path, 'b1', 1, REF_ITERS)
    assert int(np.asarray(s1.step)) == REF_ITERS
    l1 = float(np.mean(_trailing_losses(capsys.readouterr().out, 4)))

    s2 = _train(tmp_path, 'b2', 2, REF_ITERS)
    assert int(np.asarray(s2.step)) == REF_ITERS // 2  # ceil(16/2)
    l2 = float(np.mean(_trailing_losses(capsys.readouterr().out, 2)))

    # both recipes saw the same 16-image budget; trailing losses must sit
    # in the same overfit regime (loose band: tiny-model training is noisy)
    assert np.isfinite(l1) and np.isfinite(l2)
    # both actually trained: well below the untrained loss (> 2.5 here)
    assert l1 < 2.5 and l2 < 2.5
    assert l2 < 2.0 * l1 + 0.5
    assert l1 < 2.0 * l2 + 0.5
