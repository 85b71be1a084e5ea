"""Orientation/resolution bucketing (config.canvas_buckets and its
engine wiring): the static canvas per batch is the tight orientation bucket
instead of the square MAX_SIZE^2 fallback, and detections are canvas-
invariant — the padded margin cannot influence results because anchors and
RoI samples beyond the per-image extent are masked to the reference's own
semantics (lib/layer_utils/snippets.py:32-49 grid, network.py:141-157
crop extrapolation)."""

import os.path as osp
import pickle

import cv2
import numpy as np
import pytest

from tf_faster_rcnn_tpu.config import (bucket_index, canvas_buckets, cfg,
                                       mixed_canvas)

from test_pipeline import CLASSES_USED, _make_voc


def test_canvas_buckets_defaults():
    # VOC default: SCALES=(600,), MAX_SIZE=1000
    assert canvas_buckets(cfg.TEST) == ((608, 1024), (1024, 608))
    assert canvas_buckets(cfg.TRAIN) == ((608, 1024), (1024, 608))
    # res101-lg: 800px / 1333 (800 is already a multiple of 32)
    cfg.TEST.SCALES = (800,)
    cfg.TEST.MAX_SIZE = 1333
    assert canvas_buckets(cfg.TEST) == ((800, 1344), (1344, 800))
    # mixed fallback covers both buckets
    assert mixed_canvas(canvas_buckets(cfg.TEST)) == (1344, 1344)


def test_canvas_buckets_fallbacks():
    # explicit canvas pins a single bucket
    cfg.TPU.CANVAS_SIZE = [416, 640]
    assert canvas_buckets(cfg.TEST) == ((416, 640),)
    cfg.TPU.CANVAS_SIZE = [0, 0]
    # bucketing off -> the square canvas
    cfg.TPU.BUCKETING = False
    assert canvas_buckets(cfg.TEST) == ((1024, 1024),)
    cfg.TPU.BUCKETING = True
    # degenerate: SCALES >= MAX_SIZE collapses to one square
    cfg.TEST.SCALES = (1000,)
    assert canvas_buckets(cfg.TEST) == ((1024, 1024),)


def test_bucket_index_orientation():
    buckets = ((608, 1024), (1024, 608))
    assert bucket_index(375, 500, buckets) == 0   # landscape
    assert bucket_index(500, 375, buckets) == 1   # portrait
    assert bucket_index(500, 500, buckets) == 0   # square -> landscape
    assert bucket_index(500, 375, ((1024, 1024),)) == 0


def _make_mixed_voc(root, image_set, sizes, seed=0):
    """Mini-VOC where image i has shape sizes[i] (mixed orientations)."""
    rng = np.random.RandomState(seed)
    voc = _make_voc(root, image_set, n=len(sizes), seed=seed)
    for i, (h, w) in enumerate(sizes):
        im = rng.randint(0, 60, (h, w, 3), np.uint8)
        objs = []
        for _ in range(2):
            x1, y1 = rng.randint(2, w // 2), rng.randint(2, h // 2)
            x2 = min(x1 + rng.randint(16, w // 2), w - 2)
            y2 = min(y1 + rng.randint(16, h // 2), h - 2)
            cls = CLASSES_USED[rng.randint(len(CLASSES_USED))]
            im[y1:y2, x1:x2] = rng.randint(150, 255, 3)
            objs.append((cls, x1 + 1, y1 + 1, x2 + 1, y2 + 1))
        cv2.imwrite(osp.join(voc, 'JPEGImages', f'{i:06d}.jpg'), im)
        xml_objs = "".join(
            f"<object><name>{c}</name><pose>Left</pose>"
            f"<truncated>0</truncated><difficult>0</difficult>"
            f"<bndbox><xmin>{x1}</xmin><ymin>{y1}</ymin>"
            f"<xmax>{x2}</xmax><ymax>{y2}</ymax></bndbox></object>"
            for c, x1, y1, x2, y2 in objs)
        with open(osp.join(voc, 'Annotations', f'{i:06d}.xml'), 'w') as f:
            f.write(f"<annotation><size><width>{w}</width>"
                    f"<height>{h}</height><depth>3</depth></size>"
                    f"{xml_objs}</annotation>")
    return voc


# 4 landscape + 4 portrait: even per-orientation counts keep the
# aspect-grouped pairs orientation-pure (odd counts straddle one pair, in
# the reference's grouping too, layer.py:43-57)
SIZES = [(96, 128), (128, 96), (96, 128), (128, 96),
         (72, 100), (100, 72), (64, 96), (96, 64)]


def _mixed_cfg(tmp_path):
    cfg.DATA_DIR = str(tmp_path)
    cfg.ROOT_DIR = str(tmp_path)
    cfg.TPU.MAX_GT = 8
    cfg.TRAIN.SCALES = (64,)
    cfg.TRAIN.MAX_SIZE = 96
    cfg.TEST.SCALES = (64,)
    cfg.TEST.MAX_SIZE = 96
    cfg.ANCHOR_SCALES = [2, 4]
    cfg.TEST.RPN_POST_NMS_TOP_N = 32
    cfg.TEST.RPN_PRE_NMS_TOP_N = 256


@pytest.fixture
def mixed_voc(tmp_path):
    _make_mixed_voc(str(tmp_path), 'test', SIZES)
    _make_mixed_voc(str(tmp_path), 'trainval', SIZES)
    _mixed_cfg(tmp_path)
    return tmp_path


def _run_eval(tmp_path, tag):
    import jax
    from tf_faster_rcnn_tpu.datasets.factory import get_imdb
    from tf_faster_rcnn_tpu.engine.test_engine import test_net
    from tf_faster_rcnn_tpu.models.network import FasterRCNN, spec_from_cfg
    imdb = get_imdb('voc_2007_test')
    spec = spec_from_cfg('vgg16', imdb.num_classes, 'TEST')
    model = FasterRCNN(spec)
    dummy = np.zeros((1, 64, 96, 3), np.float32)
    info = np.array([[64, 96, 1.0]], np.float32)
    # random init: flax Conv/Dense biases are zero, so padded-margin
    # activations are exactly 0 through every layer and canvas invariance
    # is bit-exact, not just approximate
    params = model.init(jax.random.PRNGKey(0), dummy, info)
    out_dir = str(tmp_path / f'eval_{tag}')
    test_net(model, spec, params, imdb, 'random', max_per_image=20,
             batch_size=2, output_dir=out_dir)
    with open(osp.join(out_dir, 'detections.pkl'), 'rb') as f:
        return pickle.load(f)


def test_eval_bucketed_equals_single_canvas(mixed_voc):
    """Bucketed test_net == square-canvas test_net, detection for detection,
    on a mixed-orientation set (VERDICT round-1 item 2 done-criterion)."""
    assert canvas_buckets(cfg.TEST) == ((64, 96), (96, 64))
    bucketed = _run_eval(mixed_voc, 'bucketed')

    cfg.TPU.BUCKETING = False
    assert canvas_buckets(cfg.TEST) == ((96, 96),)
    single = _run_eval(mixed_voc, 'single')

    n_cls = len(bucketed)
    assert n_cls == len(single)
    total = 0
    for c in range(1, n_cls):
        for i in range(len(SIZES)):
            a, b = np.asarray(bucketed[c][i]), np.asarray(single[c][i])
            assert a.shape == b.shape, (c, i, a.shape, b.shape)
            if a.size:
                np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-3,
                                           err_msg=f'class {c} image {i}')
                total += len(a)
    assert total > 0  # the comparison actually saw detections


def test_train_loader_per_batch_bucket_canvas(mixed_voc):
    """RoIDataLayer picks each batch's canvas from its orientation bucket;
    ASPECT_GROUPING keeps batches orientation-pure."""
    from tf_faster_rcnn_tpu.data.loader import RoIDataLayer
    from tf_faster_rcnn_tpu.data.roidb import prepare_roidb
    from tf_faster_rcnn_tpu.datasets.factory import get_imdb
    cfg.TRAIN.ASPECT_GROUPING = True
    imdb = get_imdb('voc_2007_trainval')
    imdb.set_proposal_method('gt')
    prepare_roidb(imdb)
    layer = RoIDataLayer(imdb.roidb, batch_size=2)
    seen = set()
    for _ in range(6):
        batch = layer.forward()
        shape = batch['image'].shape[1:3]
        seen.add(shape)
        # every image's true extent fits its batch canvas
        assert (batch['im_info'][:, 0] <= shape[0]).all()
        assert (batch['im_info'][:, 1] <= shape[1]).all()
    # aspect-grouped pairs are orientation-pure: only the two bucket
    # canvases appear, never the mixed fallback
    assert seen <= {(64, 96), (96, 64)}
    assert len(seen) == 2


def test_train_loader_mixed_batch_falls_back(mixed_voc):
    """Without aspect grouping a mixed-orientation batch lands on the union
    canvas and still fits every image."""
    from tf_faster_rcnn_tpu.data.loader import RoIDataLayer
    from tf_faster_rcnn_tpu.data.roidb import prepare_roidb
    from tf_faster_rcnn_tpu.datasets.factory import get_imdb
    imdb = get_imdb('voc_2007_trainval')
    imdb.set_proposal_method('gt')
    prepare_roidb(imdb)
    layer = RoIDataLayer(imdb.roidb, batch_size=4)
    shapes = {layer.forward()['image'].shape[1:3] for _ in range(6)}
    assert shapes <= {(64, 96), (96, 64), (96, 96)}
    assert (96, 96) in shapes  # mixed batches exist at batch 4 over 6 images


def test_resnet_canvas_invariance_nonzero_bn(rng):
    """res50 outputs are canvas-invariant with NONZERO FrozenBatchNorm
    shifts — the regime real pretrained weights live in, where every BN
    repopulates the padded margin and only the pre-3x3 + head-end masks
    (models/resnet_v1.py) keep it out of the valid region. vgg16's zero
    init biases keep margins at exact 0, so the e2e eval test above cannot
    see a deferred-masking bug; this one can."""
    import dataclasses

    import jax
    from tf_faster_rcnn_tpu.models.network import FasterRCNN, spec_from_cfg

    spec = dataclasses.replace(
        spec_from_cfg('res50', 6, 'TEST'),
        anchor_scales=(2, 4), rpn_pre_nms_top_n=256, rpn_post_nms_top_n=16)
    model = FasterRCNN(spec)
    content = (rng.randn(60, 90, 3) * 40).astype(np.float32)
    im_info = np.array([[60.0, 90.0, 1.0]], np.float32)

    params = model.init(jax.random.PRNGKey(0),
                        np.zeros((1, 64, 96, 3), np.float32), im_info)

    def _perturb(path, leaf):
        name = getattr(path[-1], 'key', str(path[-1]))
        if name in ('mean', 'bias'):
            return leaf + rng.randn(*leaf.shape).astype(leaf.dtype) * 0.3
        return leaf
    params = jax.tree_util.tree_map_with_path(_perturb, params)

    outs = []
    for ch, cw in ((64, 96), (96, 96), (64, 128)):
        canvas = np.zeros((1, ch, cw, 3), np.float32)
        canvas[0, :60, :90] = content
        outs.append(model.apply(params, canvas, im_info))
    for key in ('rois', 'cls_prob', 'bbox_pred'):
        ref = np.asarray(outs[0][key])
        for o in outs[1:]:
            np.testing.assert_allclose(np.asarray(o[key]), ref,
                                       rtol=1e-4, atol=1e-4, err_msg=key)
    assert int(np.asarray(outs[0]['roi_valid']).sum()) > 0
