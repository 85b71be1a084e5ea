"""Snapshot/restore roundtrips, retention, LR-boundary skip, and the
flexible params loader (bare export vs training snapshot)."""

import os

import jax
import jax.numpy as jnp
import numpy as np

from tf_faster_rcnn_tpu.config import cfg
from tf_faster_rcnn_tpu.engine.train import TrainState
from tf_faster_rcnn_tpu.utils import checkpoint as ckpt


def _state(step=0):
    import optax
    params = {"params": {"w": jnp.arange(6.0).reshape(2, 3),
                         "b": jnp.ones((3,)) * step}}
    tx = optax.sgd(0.1, momentum=0.9)
    return TrainState(step=jnp.asarray(step, jnp.int32), params=params,
                      opt_state=tx.init(params), key=jax.random.PRNGKey(step),
                      tx=tx)


def test_snapshot_restore_roundtrip(tmp_path):
    s = _state(7)
    data_state = {"cur": 3, "perm": np.arange(5),
                  "rng_state": np.random.RandomState(0).get_state()}
    sp, mp = ckpt.snapshot(str(tmp_path), "net", s, data_state)
    s2 = ckpt.restore(_state(0), sp)
    assert int(s2.step) == 7
    np.testing.assert_array_equal(np.asarray(s2.params["params"]["b"]),
                                  np.ones(3) * 7)
    np.testing.assert_array_equal(np.asarray(s2.key), np.asarray(s.key))
    meta = ckpt.restore_meta(mp)
    assert meta["data_state"]["cur"] == 3


def test_find_previous_picks_newest_including_boundaries(tmp_path):
    """Boundary snapshots are valid here (LR is a pure function of step);
    the reference-only skip would lose work — see find_previous docstring."""
    cfg.TRAIN.STEPSIZE = [20]
    for step in (10, 20, 15):
        ckpt.snapshot(str(tmp_path), "net", _state(step), {})
    found = ckpt.find_previous(str(tmp_path), "net")
    assert found is not None and found[0] == 20


def test_retention(tmp_path):
    for step in (1, 2, 3, 4, 5):
        ckpt.snapshot(str(tmp_path), "net", _state(step), {})
    ckpt.remove_old_snapshots(str(tmp_path), "net", keep=2)
    left = sorted(f for f in os.listdir(tmp_path) if f.endswith(".msgpack"))
    assert left == ["net_iter_4.msgpack", "net_iter_5.msgpack"]
    assert not os.path.exists(tmp_path / "net_iter_1.pkl")


def test_load_params_accepts_both_formats(tmp_path):
    s = _state(9)
    # format 1: bare params export
    bare = str(tmp_path / "bare.msgpack")
    ckpt.save_params(bare, s.params)
    template = jax.tree_util.tree_map(jnp.zeros_like, s.params)
    p1 = ckpt.load_params(bare, template)
    np.testing.assert_array_equal(np.asarray(p1["params"]["b"]),
                                  np.ones(3) * 9)
    # format 2: full training snapshot
    sp, _ = ckpt.snapshot(str(tmp_path), "net", s, {})
    p2 = ckpt.load_params(sp, template)
    np.testing.assert_array_equal(np.asarray(p2["params"]["b"]),
                                  np.ones(3) * 9)


def test_orbax_backend_roundtrip_and_mixed_discovery(tmp_path):
    """cfg.TPU.CHECKPOINT_BACKEND='orbax' writes directory snapshots that
    restore identically; find_previous/retention see both formats."""
    import pytest
    pytest.importorskip("orbax.checkpoint")
    # one msgpack snapshot first, then switch backends mid-run
    ckpt.snapshot(str(tmp_path), "net", _state(5), {})
    cfg.TPU.CHECKPOINT_BACKEND = "orbax"
    s = _state(9)
    sp, mp = ckpt.snapshot(str(tmp_path), "net", s,
                           {"cur": 1, "perm": np.arange(3),
                            "rng_state": np.random.RandomState(1).get_state()})
    assert sp.endswith(".orbax") and os.path.isdir(sp)

    found = ckpt.find_previous(str(tmp_path), "net")
    assert found is not None and found[0] == 9 and found[1] == sp
    s2 = ckpt.restore(_state(0), found[1])
    assert int(s2.step) == 9
    np.testing.assert_array_equal(np.asarray(s2.params["params"]["b"]),
                                  np.ones(3) * 9)
    np.testing.assert_array_equal(np.asarray(s2.key), np.asarray(s.key))

    # load_params understands a full orbax snapshot too
    loaded = ckpt.load_params(sp, _state(0).params)
    np.testing.assert_array_equal(np.asarray(loaded["params"]["b"]),
                                  np.ones(3) * 9)

    # retention removes whole orbax directories across formats
    cfg.TPU.CHECKPOINT_BACKEND = "msgpack"
    ckpt.snapshot(str(tmp_path), "net", _state(11), {})
    ckpt.remove_old_snapshots(str(tmp_path), "net", keep=1)
    left = sorted(f for f in os.listdir(tmp_path)
                  if f.endswith((".msgpack", ".orbax")))
    assert left == ["net_iter_11.msgpack"]


def test_async_orbax_snapshot(tmp_path):
    """TPU.ASYNC_CHECKPOINT=True returns before the disk commit; after
    wait_for_async the snapshot restores identically and ordering across
    successive saves holds (the process-wide checkpointer serializes)."""
    import pytest
    pytest.importorskip("orbax.checkpoint")
    cfg.TPU.CHECKPOINT_BACKEND = "orbax"
    cfg.TPU.ASYNC_CHECKPOINT = True
    try:
        paths = [ckpt.snapshot(str(tmp_path), "net", _state(s), {})[0]
                 for s in (3, 7)]
        ckpt.wait_for_async()
    finally:
        cfg.TPU.ASYNC_CHECKPOINT = False
        cfg.TPU.CHECKPOINT_BACKEND = "msgpack"
    for s, sp in zip((3, 7), paths):
        assert os.path.isdir(sp)
        restored = ckpt.restore(_state(0), sp)
        assert int(restored.step) == s
        np.testing.assert_array_equal(
            np.asarray(restored.params["params"]["b"]), np.ones(3) * s)
    found = ckpt.find_previous(str(tmp_path), "net")
    assert found is not None and found[0] == 7
    # flush with nothing in flight is a no-op
    ckpt.wait_for_async()
