"""End-to-end pipeline tests on a synthetic mini-VOC dataset: data layer,
full test_net eval (detections.pkl + voc_eval mAP), short training loop with
snapshot/resume (SURVEY.md stages 8-9)."""

import os
import os.path as osp
import pickle

import cv2
import numpy as np
import pytest

from tf_faster_rcnn_tpu.config import cfg

N_IMAGES = 6
CLASSES_USED = ['aeroplane', 'car', 'person']


def _make_voc(root, image_set='test', n=N_IMAGES, seed=0):
    """Tiny VOCdevkit2007 tree with solid-color rectangles as objects."""
    rng = np.random.RandomState(seed)
    voc = osp.join(root, 'VOCdevkit2007', 'VOC2007')
    os.makedirs(osp.join(voc, 'JPEGImages'), exist_ok=True)
    os.makedirs(osp.join(voc, 'Annotations'), exist_ok=True)
    os.makedirs(osp.join(voc, 'ImageSets', 'Main'), exist_ok=True)
    names = []
    for i in range(n):
        name = f'{i:06d}'
        names.append(name)
        h, w = 96, 128
        im = rng.randint(0, 60, (h, w, 3), np.uint8)
        objs = []
        for _ in range(rng.randint(1, 3)):
            x1, y1 = rng.randint(5, 60), rng.randint(5, 40)
            x2, y2 = x1 + rng.randint(20, 50), y1 + rng.randint(20, 40)
            x2, y2 = min(x2, w - 2), min(y2, h - 2)
            cls = CLASSES_USED[rng.randint(len(CLASSES_USED))]
            im[y1:y2, x1:x2] = rng.randint(150, 255, 3)
            objs.append((cls, x1 + 1, y1 + 1, x2 + 1, y2 + 1))  # 1-based VOC
        cv2.imwrite(osp.join(voc, 'JPEGImages', name + '.jpg'), im)
        xml_objs = "".join(
            f"<object><name>{c}</name><pose>Left</pose>"
            f"<truncated>0</truncated><difficult>0</difficult>"
            f"<bndbox><xmin>{x1}</xmin><ymin>{y1}</ymin>"
            f"<xmax>{x2}</xmax><ymax>{y2}</ymax></bndbox></object>"
            for c, x1, y1, x2, y2 in objs)
        with open(osp.join(voc, 'Annotations', name + '.xml'), 'w') as f:
            f.write(f"<annotation><size><width>{w}</width>"
                    f"<height>{h}</height><depth>3</depth></size>"
                    f"{xml_objs}</annotation>")
    with open(osp.join(voc, 'ImageSets', 'Main', image_set + '.txt'),
              'w') as f:
        f.write("\n".join(names) + "\n")
    return voc


def _tiny_cfg(tmp_path):
    cfg.DATA_DIR = str(tmp_path)
    cfg.ROOT_DIR = str(tmp_path)
    cfg.TPU.CANVAS_SIZE = [96, 128]
    cfg.TPU.MAX_GT = 8
    cfg.TRAIN.SCALES = (64,)
    cfg.TRAIN.MAX_SIZE = 96
    cfg.TEST.SCALES = (64,)
    cfg.TEST.MAX_SIZE = 96
    cfg.ANCHOR_SCALES = [2, 4]
    cfg.TEST.RPN_POST_NMS_TOP_N = 32
    cfg.TEST.RPN_PRE_NMS_TOP_N = 256
    cfg.TRAIN.RPN_POST_NMS_TOP_N = 48
    cfg.TRAIN.RPN_PRE_NMS_TOP_N = 256
    cfg.TRAIN.BATCH_SIZE = 16
    cfg.TRAIN.RPN_BATCHSIZE = 32
    cfg.TRAIN.SNAPSHOT_ITERS = 4
    cfg.TRAIN.DISPLAY = 2


@pytest.fixture
def mini_voc(tmp_path):
    _make_voc(str(tmp_path), 'test')
    _make_voc(str(tmp_path), 'trainval')
    _tiny_cfg(tmp_path)
    return tmp_path


def test_data_layer_shapes_and_flip(mini_voc):
    from tf_faster_rcnn_tpu.data.loader import RoIDataLayer
    from tf_faster_rcnn_tpu.data.roidb import prepare_roidb
    from tf_faster_rcnn_tpu.datasets.factory import get_imdb
    imdb = get_imdb('voc_2007_trainval')
    imdb.set_proposal_method('gt')
    imdb.append_flipped_images()
    prepare_roidb(imdb)
    assert len(imdb.roidb) == 2 * N_IMAGES

    layer = RoIDataLayer(imdb.roidb, batch_size=2)
    batch = layer.forward()
    assert batch['image'].shape == (2, 96, 128, 3)
    assert batch['im_info'].shape == (2, 3)
    assert batch['gt_boxes'].shape == (2, 8, 5)
    assert batch['gt_valid'].any()
    # gt boxes are scaled into the canvas
    scale = batch['im_info'][0, 2]
    valid_boxes = batch['gt_boxes'][0][batch['gt_valid'][0]]
    assert (valid_boxes[:, 2] <= batch['im_info'][0, 1]).all()
    assert (valid_boxes[:, 4] > 0).all()

    # iteration state roundtrip
    state = layer.get_state()
    b1 = layer.forward()
    layer.set_state(state)
    b2 = layer.forward()
    np.testing.assert_array_equal(b1['image'], b2['image'])


def test_full_eval_pipeline(mini_voc):
    """test_net end to end: batched detect, detections.pkl, voc_eval mAP."""
    import jax
    from tf_faster_rcnn_tpu.datasets.factory import get_imdb
    from tf_faster_rcnn_tpu.engine.test_engine import test_net
    from tf_faster_rcnn_tpu.models.network import FasterRCNN, spec_from_cfg

    imdb = get_imdb('voc_2007_test')
    spec = spec_from_cfg('vgg16', imdb.num_classes, 'TEST')
    model = FasterRCNN(spec)
    dummy = np.zeros((1, 96, 128, 3), np.float32)
    info = np.array([[96, 128, 1.0]], np.float32)
    params = model.init(jax.random.PRNGKey(0), dummy, info)

    out_dir = str(mini_voc / 'eval_out')
    mean_ap = test_net(model, spec, params, imdb, 'random', max_per_image=20,
                       batch_size=2, output_dir=out_dir)
    assert osp.exists(osp.join(out_dir, 'detections.pkl'))
    assert 0.0 <= mean_ap <= 1.0
    with open(osp.join(out_dir, 'detections.pkl'), 'rb') as f:
        all_boxes = pickle.load(f)
    assert len(all_boxes) == imdb.num_classes
    assert len(all_boxes[1]) == N_IMAGES
    # reval path: re-NMS the pickled detections
    from tf_faster_rcnn_tpu.engine.test_engine import apply_nms
    nmsed = apply_nms(all_boxes, 0.3)
    assert len(nmsed) == imdb.num_classes


def test_training_loop_snapshot_and_resume(mini_voc):
    from tf_faster_rcnn_tpu.datasets.factory import get_imdb
    from tf_faster_rcnn_tpu.data.roidb import prepare_roidb
    from tf_faster_rcnn_tpu.engine.train_loop import train_net

    cfg.TRAIN.USE_FLIPPED = False
    imdb = get_imdb('voc_2007_trainval')
    imdb.set_proposal_method('gt')
    prepare_roidb(imdb)
    roidb = imdb.roidb

    out_dir = str(mini_voc / 'train_out')
    tb_dir = str(mini_voc / 'tb')
    state = train_net('vgg16', imdb, roidb, list(roidb), out_dir, tb_dir,
                      max_iters=5)
    assert int(state.step) == 5
    snaps = [f for f in os.listdir(out_dir) if f.endswith('.msgpack')]
    assert snaps, 'no snapshot written'
    assert osp.exists(osp.join(tb_dir, 'metrics.jsonl'))
    # real TensorBoard event files in train/val sibling dirs
    # (train_val.py:149-151 parity)
    assert [f for f in os.listdir(tb_dir)
            if f.startswith('events.out.tfevents.')]
    assert [f for f in os.listdir(tb_dir + '_val')
            if f.startswith('events.out.tfevents.')]

    # resume continues from the newest snapshot (iter 5 -> 7)
    state2 = train_net('vgg16', imdb, roidb, list(roidb), out_dir, tb_dir,
                       max_iters=7)
    assert int(state2.step) == 7


def test_eval_prefetch_slow_decode_ordering(mini_voc, monkeypatch):
    """The eval producer pipeline (batch window + image pool) under a slow,
    jittered decode: batches complete out of submission order, yet test_net
    must neither deadlock nor mis-assign detections to images (VERDICT r1
    weak-item 6: producer pipeline vs slow-decode stall)."""
    import time

    import jax
    from tf_faster_rcnn_tpu import engine
    from tf_faster_rcnn_tpu.datasets.factory import get_imdb
    from tf_faster_rcnn_tpu.engine.test_engine import test_net
    from tf_faster_rcnn_tpu.models.network import FasterRCNN, spec_from_cfg

    imdb = get_imdb('voc_2007_test')
    spec = spec_from_cfg('vgg16', imdb.num_classes, 'TEST')
    model = FasterRCNN(spec)
    dummy = np.zeros((1, 96, 128, 3), np.float32)
    info = np.array([[96, 128, 1.0]], np.float32)
    params = model.init(jax.random.PRNGKey(0), dummy, info)

    fast_dir = str(mini_voc / 'fast_out')
    test_net(model, spec, params, imdb, 'fast', max_per_image=10,
             batch_size=1, output_dir=fast_dir)

    real_read = engine.test_engine.read_image_bgr
    delays = iter([0.3, 0.0, 0.2, 0.0, 0.1, 0.0] * 4)

    def slow_read(path):
        time.sleep(next(delays, 0.0))
        return real_read(path)

    monkeypatch.setattr(engine.test_engine, 'read_image_bgr', slow_read)
    cfg.TPU.EVAL_PREFETCH_THREADS = 3  # whole schedule in flight at batch 1
    slow_dir = str(mini_voc / 'slow_out')
    test_net(model, spec, params, imdb, 'slow', max_per_image=10,
             batch_size=1, output_dir=slow_dir)

    with open(osp.join(fast_dir, 'detections.pkl'), 'rb') as f:
        fast = pickle.load(f)
    with open(osp.join(slow_dir, 'detections.pkl'), 'rb') as f:
        slow = pickle.load(f)
    for c in range(1, imdb.num_classes):
        for i in range(N_IMAGES):
            np.testing.assert_array_equal(
                np.asarray(fast[c][i]), np.asarray(slow[c][i]),
                err_msg=f'class {c} image {i}')


def test_aspect_grouping_permutation(mini_voc):
    """ASPECT_GROUPING pairs same-orientation images (layer.py:43-56)."""
    from tf_faster_rcnn_tpu.data.loader import RoIDataLayer
    from tf_faster_rcnn_tpu.data.roidb import prepare_roidb
    from tf_faster_rcnn_tpu.datasets.factory import get_imdb
    cfg.TRAIN.ASPECT_GROUPING = True
    imdb = get_imdb('voc_2007_trainval')
    imdb.set_proposal_method('gt')
    prepare_roidb(imdb)
    layer = RoIDataLayer(imdb.roidb, batch_size=2)
    assert len(layer._perm) == len(imdb.roidb)
    assert sorted(layer._perm.tolist()) == list(range(len(imdb.roidb)))
    batch = layer.forward()
    assert batch['image'].shape[0] == 2


def test_aspect_grouping_odd_count(mini_voc):
    """An odd (unflipped) roidb still yields a complete permutation — the
    reference's pair reshape would fail on it (layer.py:52)."""
    from tf_faster_rcnn_tpu.data.loader import RoIDataLayer
    from tf_faster_rcnn_tpu.data.roidb import prepare_roidb
    from tf_faster_rcnn_tpu.datasets.factory import get_imdb
    cfg.TRAIN.ASPECT_GROUPING = True
    imdb = get_imdb('voc_2007_test')  # 6 entries, unflipped
    imdb.set_proposal_method('gt')
    prepare_roidb(imdb)
    roidb = imdb.roidb[:5]
    layer = RoIDataLayer(roidb, batch_size=1)
    assert sorted(layer._perm.tolist()) == list(range(5))


def test_tiny_roidb_wraps_to_full_batch(mini_voc):
    """batch_size > len(roidb) wraps instead of emitting a short batch
    (a short batch would recompile the jitted step / break sharding)."""
    from tf_faster_rcnn_tpu.data.loader import RoIDataLayer
    from tf_faster_rcnn_tpu.data.roidb import prepare_roidb
    from tf_faster_rcnn_tpu.datasets.factory import get_imdb
    imdb = get_imdb('voc_2007_trainval')
    imdb.set_proposal_method('gt')
    prepare_roidb(imdb)
    layer = RoIDataLayer(imdb.roidb[:3], batch_size=8)
    for _ in range(3):
        batch = layer.forward()
        assert batch['image'].shape[0] == 8


def test_eval_pipeline_top_mode(mini_voc):
    """TEST.MODE='top' (proposal_top_layer path) through the full engine."""
    import jax
    from tf_faster_rcnn_tpu.datasets.factory import get_imdb
    from tf_faster_rcnn_tpu.engine.test_engine import test_net
    from tf_faster_rcnn_tpu.models.network import FasterRCNN, spec_from_cfg
    cfg.TEST.MODE = 'top'
    cfg.TEST.RPN_TOP_N = 40
    imdb = get_imdb('voc_2007_test')
    spec = spec_from_cfg('vgg16', imdb.num_classes, 'TEST')
    assert spec.test_mode == 'top'
    model = FasterRCNN(spec)
    dummy = np.zeros((1, 96, 128, 3), np.float32)
    info = np.array([[96, 128, 1.0]], np.float32)
    params = model.init(jax.random.PRNGKey(0), dummy, info)
    out_dir = str(mini_voc / 'top_out')
    mean_ap = test_net(model, spec, params, imdb, 'top', max_per_image=10,
                       batch_size=2, output_dir=out_dir)
    assert 0.0 <= mean_ap <= 1.0


def test_transfer_dtype_bf16_equivalence(mini_voc):
    """Under bf16 compute the loader ships bf16 canvases; values must equal
    the f32 canvases cast to bf16 (the cast merely moves across the PCIe
    boundary — the model's first op did it before)."""
    import ml_dtypes
    from tf_faster_rcnn_tpu.data.loader import RoIDataLayer
    from tf_faster_rcnn_tpu.data.roidb import prepare_roidb
    from tf_faster_rcnn_tpu.datasets.factory import get_imdb
    imdb = get_imdb('voc_2007_trainval')
    imdb.set_proposal_method('gt')
    prepare_roidb(imdb)

    layer = RoIDataLayer(imdb.roidb, batch_size=2)
    f32 = layer.forward()
    assert f32['image'].dtype == np.float32

    cfg.TPU.COMPUTE_DTYPE = 'bfloat16'
    layer2 = RoIDataLayer(imdb.roidb, batch_size=2)
    bf16 = layer2.forward()
    assert bf16['image'].dtype == ml_dtypes.bfloat16
    np.testing.assert_array_equal(
        f32['image'].astype(ml_dtypes.bfloat16), bf16['image'])
    for k in ('im_info', 'gt_boxes', 'gt_valid'):
        np.testing.assert_array_equal(f32[k], bf16[k])


def test_loader_space_to_depth_batches(mini_voc):
    """Under TPU.SPACE_TO_DEPTH the loader ships [B, H/2, W/2, 12] canvases
    that are exactly the 2x2 space-to-depth of the plain canvases."""
    from tf_faster_rcnn_tpu.data.blob import space_to_depth
    from tf_faster_rcnn_tpu.data.loader import RoIDataLayer
    from tf_faster_rcnn_tpu.data.roidb import prepare_roidb
    from tf_faster_rcnn_tpu.datasets.factory import get_imdb
    imdb = get_imdb('voc_2007_trainval')
    imdb.set_proposal_method('gt')
    prepare_roidb(imdb)

    plain = RoIDataLayer(imdb.roidb, batch_size=2).forward()
    cfg.TPU.SPACE_TO_DEPTH = True
    s2d = RoIDataLayer(imdb.roidb, batch_size=2).forward()
    assert s2d['image'].shape == (2, 48, 64, 12)
    want = np.stack([space_to_depth(im) for im in plain['image']])
    np.testing.assert_array_equal(want, s2d['image'])
    np.testing.assert_array_equal(plain['im_info'], s2d['im_info'])


def test_in_training_validation_map(mini_voc):
    """TPU.EVAL_ITERS runs the full TEST-mode eval during training and
    records val_mAP (no reference counterpart — it only summarizes val
    losses, train_val.py:198-210)."""
    import json

    from tf_faster_rcnn_tpu.data.roidb import prepare_roidb
    from tf_faster_rcnn_tpu.datasets.factory import get_imdb
    from tf_faster_rcnn_tpu.engine.train_loop import train_net
    imdb = get_imdb('voc_2007_trainval')
    imdb.set_proposal_method('gt')
    prepare_roidb(imdb)
    valimdb = get_imdb('voc_2007_test')
    valimdb.set_proposal_method('gt')
    prepare_roidb(valimdb)

    cfg.TPU.EVAL_ITERS = 3
    out_dir = str(mini_voc / 'train_eval_out')
    tb_dir = str(mini_voc / 'tb_eval')
    train_net('vgg16', imdb, list(imdb.roidb), list(valimdb.roidb),
              out_dir, tb_dir, max_iters=3, valimdb=valimdb)

    assert osp.isdir(osp.join(out_dir, 'val_eval_iter_3'))
    rows = [json.loads(l) for l in open(osp.join(tb_dir, 'metrics.jsonl'))]
    vals = [r for r in rows if 'val_mAP' in r]
    assert vals and vals[-1]['step'] == 3
    assert 0.0 <= vals[-1]['val_mAP'] <= 1.0
    # best-so-far params land where test_net/demo can consume them
    best = osp.join(out_dir, cfg.TRAIN.SNAPSHOT_PREFIX + '_best.msgpack')
    assert osp.exists(best)
    from tf_faster_rcnn_tpu.models.network import FasterRCNN, spec_from_cfg
    import jax
    spec = spec_from_cfg('vgg16', valimdb.num_classes, 'TEST')
    tmpl = jax.eval_shape(
        lambda: FasterRCNN(spec).init(
            jax.random.PRNGKey(0), np.zeros((1, 96, 128, 3), np.float32),
            np.array([[96, 128, 1.0]], np.float32)))
    from tf_faster_rcnn_tpu.utils import checkpoint as ckpt_mod
    loaded = ckpt_mod.load_params(
        best, jax.tree_util.tree_map(
            lambda s: np.zeros(s.shape, s.dtype), tmpl))
    assert loaded is not None


def test_demo_cli_on_reference_images(mini_voc, monkeypatch, tmp_path):
    """tools/demo.py end to end on a real reference demo image (read-only
    set): random-init model, headless figure saved per image."""
    import shutil
    import sys
    sys.path.insert(0, osp.join(osp.dirname(__file__), '..', 'tools'))
    import demo as demo_mod

    src = '/root/reference/data/demo/000456.jpg'
    if not osp.exists(src):
        pytest.skip('reference demo images unavailable')
    demo_dir = tmp_path / 'demo_imgs'
    demo_dir.mkdir()
    shutil.copy(src, demo_dir / '000456.jpg')
    out_dir = tmp_path / 'demo_out'
    monkeypatch.setattr(sys, 'argv', [
        'demo.py', '--net', 'mobile',
        '--demo-dir', str(demo_dir), '--out-dir', str(out_dir)])
    demo_mod.main()
    assert (out_dir / 'det_000456.jpg.png').exists()


def test_day1_parity_script_reaches_data_boundary(tmp_path):
    """tools/day1_parity.sh (RUNBOOK.md as one command): in a container
    with no released weights and no VOC data it must validate the local
    environment and stop at the data boundary with exit 3 and a precise
    list of what is missing."""
    import subprocess
    import sys as _sys

    root = osp.join(osp.dirname(__file__), '..')
    env = dict(os.environ)
    # JAX_PLATFORMS env is ignored on machines whose sitecustomize
    # registers the TPU plugin first; the script's DAY1_FORCE_CPU hook
    # applies the in-process config update instead (a test touching the
    # real TPU here could collide with a concurrent hardware run)
    env['DAY1_FORCE_CPU'] = '1'
    env['PYTHONPATH'] = osp.abspath(root)
    proc = subprocess.run(
        ['bash', osp.join(root, 'tools', 'day1_parity.sh'),
         '--workdir', str(tmp_path)],
        capture_output=True, text=True, timeout=300, env=env,
        cwd=root)
    assert proc.returncode == 3, proc.stdout + proc.stderr
    assert 'framework imports ok' in proc.stdout
    assert 'data boundary' in proc.stdout
    assert 'trained weights' in proc.stdout
    assert 'VOC data' in proc.stdout


def test_demo_cli_generates_bundled_images(mini_voc, monkeypatch, tmp_path):
    """With an empty --demo-dir, demo.py generates the bundled synthetic
    scenes (tools/make_demo_images.py) and runs on them — the demo works in
    any checkout with no downloads (VERDICT r2 missing item 4; the
    reference bundles photographs instead, demo.py:148-155)."""
    import sys
    sys.path.insert(0, osp.join(osp.dirname(__file__), '..', 'tools'))
    import demo as demo_mod

    demo_dir = tmp_path / 'gen_demo'
    out_dir = tmp_path / 'gen_out'
    monkeypatch.setattr(sys, 'argv', [
        'demo.py', '--net', 'mobile',
        '--demo-dir', str(demo_dir), '--out-dir', str(out_dir)])
    demo_mod.main()
    made = sorted(p.name for p in demo_dir.glob('*.jpg'))
    assert len(made) == 5
    for name in made:
        assert (out_dir / f'det_{name}.png').exists()


def test_sigterm_preemption_snapshots_and_resumes(mini_voc):
    """SIGTERM mid-training (TPU maintenance/spot reclaim) finishes the
    in-flight step, snapshots, and exits 0; a rerun resumes from it."""
    import signal
    import subprocess
    import sys

    child = f'''
import sys
sys.path.insert(0, {repr(osp.join(osp.dirname(__file__), ".."))})
sys.path.insert(0, {repr(osp.dirname(__file__))})
import jax; jax.config.update("jax_platforms", "cpu")
from test_pipeline import _tiny_cfg
from tf_faster_rcnn_tpu.config import cfg
_tiny_cfg({repr(str(mini_voc))})
cfg.TRAIN.USE_FLIPPED = False
cfg.TRAIN.SNAPSHOT_ITERS = 10000
from tf_faster_rcnn_tpu.data.roidb import prepare_roidb
from tf_faster_rcnn_tpu.datasets.factory import get_imdb
from tf_faster_rcnn_tpu.engine.train_loop import train_net
imdb = get_imdb("voc_2007_trainval")
imdb.set_proposal_method("gt")
prepare_roidb(imdb)
train_net("vgg16", imdb, list(imdb.roidb), list(imdb.roidb),
          {repr(str(mini_voc / "preempt_out"))},
          {repr(str(mini_voc / "preempt_tb"))}, max_iters=10000)
print("TRAIN_RETURNED", flush=True)
'''
    import threading
    proc = subprocess.Popen([sys.executable, '-u', '-c', child],
                            stdout=subprocess.PIPE,
                            stderr=subprocess.STDOUT, text=True)
    # hard backstop: readline below blocks, so a silently-hung child must
    # be killed from outside or the suite would hang forever
    killer = threading.Timer(420, proc.kill)
    killer.start()
    for line in proc.stdout:
        if line.startswith('iter: 2 '):
            break
    proc.send_signal(signal.SIGTERM)
    out = proc.stdout.read()
    rc = proc.wait(timeout=300)
    killer.cancel()
    assert rc == 0, out
    assert 'snapshot' in out.lower()
    assert 'TRAIN_RETURNED' in out
    out_dir = str(mini_voc / 'preempt_out')
    snaps = [f for f in os.listdir(out_dir) if f.endswith('.msgpack')]
    assert snaps, 'no preemption snapshot written'

    # the snapshot is resumable: two more iters in-process
    from tf_faster_rcnn_tpu.utils import checkpoint as ckpt_mod
    found = ckpt_mod.find_previous(out_dir, cfg.TRAIN.SNAPSHOT_PREFIX)
    assert found is not None and found[0] >= 2


def test_coco_rehearsal_chain_smoke(tmp_path, capsys):
    """The COCO-scale rehearsal chain (tools/coco_rehearsal.py) at toy
    shapes on CPU: 81-class synthetic devkit (non-contiguous category ids,
    crowd regions, dense-gt images, both orientations) -> combined
    train+valminusminival roidb -> short train -> test_net on minival ->
    COCO results json -> COCOeval. The AP gate at real headline shapes
    (600/800px, 1000 proposals) runs on TPU via the script itself."""
    import sys
    sys.path.insert(0, osp.join(osp.dirname(__file__), '..', 'tools'))
    from make_synthetic_coco import make_synthetic_coco

    out = make_synthetic_coco(str(tmp_path), n_train=4, n_valminusminival=2,
                              n_minival=3, max_gt=8, dense_every=3,
                              base_hw=(96, 128))
    # category ids must be gappy like real COCO's (exercises the
    # label<->cat-id maps, reference lib/datasets/coco.py:78-93)
    cat_ids = [c['id'] for c in out['train2014']['categories']]
    assert cat_ids != list(range(1, len(cat_ids) + 1))
    assert any(a['iscrowd'] for a in out['train2014']['annotations'])

    _tiny_cfg(tmp_path)
    cfg.TRAIN.USE_FLIPPED = False
    cfg.ANCHOR_SCALES = [1, 2, 4]
    # pin explicitly: the frozen-prefix warning assertion below must not
    # depend on the process-global default surviving sibling tests
    cfg.MOBILENET.FIXED_LAYERS = 5

    from tf_faster_rcnn_tpu.data.roidb import prepare_roidb
    from tf_faster_rcnn_tpu.datasets.factory import get_imdb
    from tf_faster_rcnn_tpu.engine.train_loop import (get_training_roidb,
                                                      train_net)

    # the coco recipe trains on train+valminusminival combined
    roidb = []
    for name in ('coco_2014_train', 'coco_2014_valminusminival'):
        ds = get_imdb(name)
        ds.set_proposal_method('gt')
        roidb.extend(get_training_roidb(ds))
    assert len(roidb) == 6
    assert ds.num_classes == 81

    state = train_net('mobile', ds, roidb, list(roidb),
                      str(tmp_path / 'coco_train_out'),
                      str(tmp_path / 'coco_tb'), max_iters=3)
    assert int(state.step) == 3
    # from-scratch + frozen prefix = a permanent random projection; the
    # loop must call that out (train_loop.py, from-scratch warning)
    assert 'MOBILENET.FIXED_LAYERS' in capsys.readouterr().out

    import jax
    from tf_faster_rcnn_tpu.engine.test_engine import test_net
    from tf_faster_rcnn_tpu.models.network import FasterRCNN, spec_from_cfg
    minival = get_imdb('coco_2014_minival')
    spec = spec_from_cfg('mobile', minival.num_classes, 'TEST')
    model = FasterRCNN(spec)
    params = jax.device_get(state.params)
    eval_dir = str(tmp_path / 'coco_eval_out')
    ap = test_net(model, spec, params, minival, 'iter_3', max_per_image=20,
                  batch_size=2, output_dir=eval_dir)
    # 3 train iters cannot learn; the gate is that the full 81-class COCO
    # eval protocol ran and produced a finite AP in range
    assert ap is not None and 0.0 <= ap <= 1.0
    with open(osp.join(eval_dir, 'detection_results.pkl'), 'rb') as f:
        evaluator = pickle.load(f)
    assert float(evaluator.stats[0]) == ap


@pytest.mark.slow
def test_coco_rehearsal_driver_invocation(tmp_path):
    """Drive tools/coco_rehearsal.py THROUGH the real shell drivers at toy
    shapes on CPU — the in-process smoke above validates the engine chain
    but not the arg plumbing (driver scripts emit their own `--set`; the
    rehearsal must pass bare KEY VALUE pairs). Covers: devkit generation ->
    train_faster_rcnn.sh (env hooks, recipe override) -> chained
    test_faster_rcnn.sh (numeric snapshot resolution) -> COCOeval AP."""
    import subprocess
    import sys
    repo = osp.join(osp.dirname(__file__), '..')
    tiny_sets = [
        'TPU.CANVAS_SIZE', '[96,128]', 'TPU.MAX_GT', '8',
        'TRAIN.SCALES', '(64,)', 'TRAIN.MAX_SIZE', '96',
        'TEST.SCALES', '(64,)', 'TEST.MAX_SIZE', '96',
        'ANCHOR_SCALES', '[2,4]',
        'TRAIN.RPN_PRE_NMS_TOP_N', '256', 'TRAIN.RPN_POST_NMS_TOP_N', '48',
        'TEST.RPN_PRE_NMS_TOP_N', '256', 'TEST.RPN_POST_NMS_TOP_N', '32',
        'TRAIN.BATCH_SIZE', '16', 'TRAIN.RPN_BATCHSIZE', '32',
        'TRAIN.USE_FLIPPED', 'False',
    ]
    proc = subprocess.run(
        [sys.executable, osp.join('tools', 'coco_rehearsal.py'),
         '--net', 'mobile', '--iters', '4', '--train-images', '4',
         '--val-images', '2', '--max-gt', '8', '--base-hw', '96', '128',
         '--ims-per-device', '2', '--skip-lg', '--min-ap', '0',
         '--no-record',
         '--workdir', str(tmp_path / 'wd'), '--set'] + tiny_sets,
        cwd=repo, capture_output=True, text=True, timeout=2400)
    tail = proc.stdout[-3000:] + proc.stderr[-3000:]
    assert proc.returncode == 0, tail
    assert '[rehearsal] PASS' in proc.stdout, tail
