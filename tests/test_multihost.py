"""Multi-host (multi-process) data parallelism.

The reference has no distributed support at all (SURVEY.md 2.3); this is
framework-added surface. Two layers of coverage:

* loader process slicing — every pseudo-host holds identical iterator state
  but materializes only its slice; concatenating the slices reproduces the
  single-process global batch exactly (pure host-side, fast);
* a real 2-process jax.distributed run (gloo CPU collectives, 4 virtual
  devices per process => one 8-device global mesh) executing the actual DP
  train step, compared against the same steps run single-process on the
  8-device mesh.
"""

import json
import os
import socket
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

from tf_faster_rcnn_tpu.config import cfg

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


def test_two_process_dp_matches_single_process(tmp_path):
    """Spawn 2 real processes; gloo collectives over a global 8-device mesh
    must produce the same training result as one process with 8 devices."""
    sys.path.insert(0, str(TESTS_DIR))
    import multihost_worker

    port = _free_port()
    out = tmp_path / "proc0.json"
    env = dict(os.environ)
    env["PYTHONPATH"] = f"{REPO_ROOT}:{env.get('PYTHONPATH', '')}"
    env.pop("XLA_FLAGS", None)  # worker sets its own 4-device flag
    procs = [
        subprocess.Popen(
            [sys.executable, str(TESTS_DIR / "multihost_worker.py"),
             str(pid), "2", str(port), str(out)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
        for pid in range(2)
    ]
    logs = []
    for p in procs:
        stdout, _ = p.communicate(timeout=900)
        logs.append(stdout.decode(errors="replace"))
    for i, p in enumerate(procs):
        assert p.returncode == 0, f"worker {i} failed:\n{logs[i][-4000:]}"
    assert out.exists(), "coordinator wrote no result"
    got = json.loads(out.read_text())

    # single-process reference on the parent's 8 virtual devices
    ref_metrics, ref_checksum, ref_step = multihost_worker.run(
        global_batch=8, steps=2, local_slice=None)

    assert got["step"] == ref_step == 2
    np.testing.assert_allclose(got["total_loss"],
                               ref_metrics["total_loss"], rtol=1e-5)
    np.testing.assert_allclose(got["checksum"], ref_checksum, rtol=1e-6)
