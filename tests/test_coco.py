"""COCO dataset + pure-numpy COCOeval fallback on synthetic data."""

import json
import os
import os.path as osp

import cv2
import numpy as np
import pytest

from tf_faster_rcnn_tpu.config import cfg
from tf_faster_rcnn_tpu.datasets.pycoco_lite import COCO, COCOeval

CATS = [{"id": 1, "name": "cat"}, {"id": 7, "name": "dog"}]


def _synth_coco(root, n_images=4, seed=0, with_crowd=True):
    rng = np.random.RandomState(seed)
    osp_join = osp.join
    img_dir = osp_join(root, "coco", "images", "val2014")
    ann_dir = osp_join(root, "coco", "annotations")
    os.makedirs(img_dir, exist_ok=True)
    os.makedirs(ann_dir, exist_ok=True)
    images, annotations = [], []
    aid = 1
    for i in range(1, n_images + 1):
        h, w = 120, 160
        im = rng.randint(0, 255, (h, w, 3), np.uint8)
        name = "COCO_val2014_%012d.jpg" % i
        cv2.imwrite(osp_join(img_dir, name), im)
        images.append({"id": i, "width": w, "height": h, "file_name": name})
        for _ in range(rng.randint(1, 3)):
            x, y = rng.randint(5, 80), rng.randint(5, 60)
            bw, bh = rng.randint(20, 60), rng.randint(20, 50)
            annotations.append({
                "id": aid, "image_id": i,
                "category_id": CATS[rng.randint(2)]["id"],
                "bbox": [float(x), float(y), float(bw), float(bh)],
                "area": float(bw * bh), "iscrowd": 0})
            aid += 1
        if with_crowd and i == 1:
            annotations.append({
                "id": aid, "image_id": i, "category_id": 1,
                "bbox": [0.0, 0.0, 40.0, 40.0], "area": 1600.0,
                "iscrowd": 1})
            aid += 1
    ds = {"images": images, "annotations": annotations, "categories": CATS}
    with open(osp_join(ann_dir, "instances_minival2014.json"), "w") as f:
        json.dump(ds, f)
    return ds


def test_cocoeval_perfect_detections(tmp_path):
    ds = _synth_coco(str(tmp_path), with_crowd=False)
    gt = COCO(ds)
    dts = [{"image_id": a["image_id"], "category_id": a["category_id"],
            "bbox": list(a["bbox"]), "score": 0.9}
           for a in ds["annotations"]]
    dt = gt.loadRes(dts)
    E = COCOeval(gt, dt)
    E.evaluate()
    E.accumulate()
    E.summarize()
    assert E.stats[0] > 0.99  # AP@[0.5:0.95] = 1 for exact detections
    assert E.stats[1] > 0.99


def test_cocoeval_iou_threshold_behavior(tmp_path):
    """A detection at IoU ~0.6 counts at 0.5 but not at 0.75."""
    ds = {"images": [{"id": 1, "width": 200, "height": 200,
                      "file_name": "x.jpg"}],
          "annotations": [{"id": 1, "image_id": 1, "category_id": 1,
                           "bbox": [50.0, 50.0, 40.0, 40.0], "area": 1600.0,
                           "iscrowd": 0}],
          "categories": [CATS[0]]}
    gt = COCO(ds)
    # shift by 10px: IoU = (30*40)/(40*40*2 - 30*40) = 1200/2000 = 0.6
    dt = gt.loadRes([{"image_id": 1, "category_id": 1,
                      "bbox": [60.0, 50.0, 40.0, 40.0], "score": 0.8}])
    E = COCOeval(gt, dt)
    E.evaluate()
    E.accumulate()
    E.summarize()
    assert E.stats[1] > 0.99      # AP@0.5 = 1
    assert E.stats[2] < 0.01      # AP@0.75 = 0
    # overall AP = fraction of thresholds the IoU-0.6 match clears:
    # {0.50, 0.55, 0.60} -> 3/10
    np.testing.assert_allclose(E.stats[0], 0.3, atol=0.02)


def test_cocoeval_crowd_not_counted(tmp_path):
    """Crowd gt is ignored: matching it neither helps nor hurts."""
    ds = {"images": [{"id": 1, "width": 200, "height": 200,
                      "file_name": "x.jpg"}],
          "annotations": [
              {"id": 1, "image_id": 1, "category_id": 1,
               "bbox": [10.0, 10.0, 30.0, 30.0], "area": 900.0, "iscrowd": 0},
              {"id": 2, "image_id": 1, "category_id": 1,
               "bbox": [100.0, 100.0, 60.0, 60.0], "area": 3600.0,
               "iscrowd": 1}],
          "categories": [CATS[0]]}
    gt = COCO(ds)
    dt = gt.loadRes([
        {"image_id": 1, "category_id": 1, "bbox": [10.0, 10.0, 30.0, 30.0],
         "score": 0.9},
        # detection inside the crowd region: ignored, not a false positive
        {"image_id": 1, "category_id": 1, "bbox": [110.0, 110.0, 40.0, 40.0],
         "score": 0.8}])
    E = COCOeval(gt, dt)
    E.evaluate()
    E.accumulate()
    E.summarize()
    assert E.stats[0] > 0.99


def test_coco_imdb_end_to_end(tmp_path):
    """coco imdb: load, roidb with crowd marking, evaluate_detections."""
    _synth_coco(str(tmp_path))
    cfg.DATA_DIR = str(tmp_path)
    from tf_faster_rcnn_tpu.datasets.factory import get_imdb
    imdb = get_imdb("coco_2014_minival")
    assert imdb.num_classes == 3  # bg + 2
    roidb = imdb.gt_roidb()
    assert len(roidb) == imdb.num_images
    # the crowd box in image 1 has overlaps -1
    crowd_rows = [i for e in roidb[:1]
                  for i in range(len(e["gt_classes"]))
                  if (e["gt_overlaps"].toarray()[i] == -1).all()]
    assert crowd_rows
    # evaluate perfect detections -> AP 1.0 printed; returns without error
    n = imdb.num_images
    all_boxes = [[[] for _ in range(n)] for _ in range(imdb.num_classes)]
    for i in range(n):
        e = roidb[i]
        for b, c, crowd in zip(e["boxes"], e["gt_classes"],
                               e["gt_overlaps"].toarray().min(1) < 0):
            if crowd:
                continue
            cls_ind = c  # gt_classes are contiguous 1..2 here
            all_boxes[cls_ind][i].append(
                [b[0], b[1], b[2], b[3], 0.95])
    all_boxes = [[np.array(v, np.float32).reshape(-1, 5) for v in row]
                 for row in all_boxes]
    out = str(tmp_path / "coco_out")
    os.makedirs(out, exist_ok=True)
    imdb.competition_mode(False)
    imdb.evaluate_detections(all_boxes, out)
    # flip augmentation uses annotation widths (train-time path)
    imdb.append_flipped_images()
    assert len(imdb.roidb) == 2 * n


def test_coco_prepare_roidb_with_crowds(tmp_path):
    """prepare_roidb on a COCO roidb with crowd annotations: crowd rois
    carry overlap -1 for every class (coco.py crowd semantics) and must be
    exempt from the fg/bg class invariants exactly as the reference's
    `max_overlaps > 0` check exempts them (reference roidb.py:43-49).
    Regression test for the 80-class rehearsal failure (round 3)."""
    from tf_faster_rcnn_tpu.data.roidb import prepare_roidb
    from tf_faster_rcnn_tpu.datasets.factory import get_imdb

    _synth_coco(str(tmp_path), with_crowd=True)
    cfg.DATA_DIR = str(tmp_path)
    imdb = get_imdb("coco_2014_minival")
    imdb.set_proposal_method("gt")
    prepare_roidb(imdb)  # raised "foreground roi mapped to class 0" before
    e = imdb.roidb[0]
    crowd = e["gt_overlaps"].toarray().min(axis=1) < 0
    assert crowd.any()
    # crowd rows surface as max_overlap -1, never as bg (0) or fg (>0)
    assert (e["max_overlaps"][crowd] == -1).all()
    assert (e["max_overlaps"][~crowd] > 0).all()


def test_coco_test_net_end_to_end(tmp_path):
    """The full eval engine through the COCO path: batched detect ->
    detections.pkl -> COCO results json -> pycoco_lite COCOeval. Closes the
    gap between the hand-built-boxes eval test above and what test_net
    actually feeds the evaluator."""
    import jax
    from tf_faster_rcnn_tpu.datasets.factory import get_imdb
    from tf_faster_rcnn_tpu.engine.test_engine import test_net
    from tf_faster_rcnn_tpu.models.network import FasterRCNN, spec_from_cfg

    _synth_coco(str(tmp_path))
    cfg.DATA_DIR = str(tmp_path)
    cfg.TEST.SCALES = (64,)
    cfg.TEST.MAX_SIZE = 96
    cfg.ANCHOR_SCALES = [2, 4]
    cfg.TEST.RPN_PRE_NMS_TOP_N = 256
    cfg.TEST.RPN_POST_NMS_TOP_N = 16

    imdb = get_imdb("coco_2014_minival")
    imdb.competition_mode(True)  # unsalted, kept results json
    spec = spec_from_cfg("mobile", imdb.num_classes, "TEST")
    model = FasterRCNN(spec)
    dummy = np.zeros((1, 64, 96, 3), np.float32)
    info = np.array([[64, 96, 1.0]], np.float32)
    params = model.init(jax.random.PRNGKey(0), dummy, info)

    out = str(tmp_path / "coco_eval_out")
    test_net(model, spec, params, imdb, "random", max_per_image=10,
             batch_size=2, output_dir=out)
    assert osp.exists(osp.join(out, "detections.pkl"))
    results = [f for f in os.listdir(out) if f.endswith(".json")]
    assert results, "no COCO results json written"
    rows = json.load(open(osp.join(out, results[0])))
    assert rows and {"image_id", "category_id", "bbox", "score"} <= \
        set(rows[0])
