"""MS COCO dataset (pycocotools-backed).

Behavior parity with the reference (/root/reference/lib/datasets/coco.py:
27-316): minival/valminusminival view mapping onto val2014 images, annotation
sanitization (clip to image, drop zero-area), crowd boxes marked with
gt_overlaps = -1 (so the target layers can exclude them under
TRAIN.USE_ALL_GT=False), width-based flip augmentation, and COCO-json results
+ COCOeval bbox evaluation with the per-class AP printout.

pycocotools is not bundled in this environment; the import is deferred so
everything else works without it and a clear error points at the dependency
when COCO is actually requested.
"""

from __future__ import annotations

import json
import os
import os.path as osp
import pickle
import uuid

import numpy as np
import scipy.sparse

from tf_faster_rcnn_tpu.config import cfg
from tf_faster_rcnn_tpu.datasets.imdb import imdb


def _require_pycocotools():
    """Real pycocotools when installed, else the bundled pure-numpy bbox
    implementation (datasets/pycoco_lite.py)."""
    try:
        from pycocotools.coco import COCO
        from pycocotools.cocoeval import COCOeval
        return COCO, COCOeval
    except ImportError:
        from tf_faster_rcnn_tpu.datasets.pycoco_lite import COCO, COCOeval
        return COCO, COCOeval


class coco(imdb):
    def __init__(self, image_set, year):
        imdb.__init__(self, 'coco_' + year + '_' + image_set)
        COCO, _ = _require_pycocotools()
        # COCO specific config options
        self.config = {'use_salt': True, 'cleanup': True}
        self._year = year
        self._image_set = image_set
        self._data_path = osp.join(cfg.DATA_DIR, 'coco')
        self._COCO = COCO(self._get_ann_file())
        cats = self._COCO.loadCats(self._COCO.getCatIds())
        self._classes = tuple(['__background__']
                              + [c['name'] for c in cats])
        self._class_to_ind = dict(zip(self.classes, range(self.num_classes)))
        self._class_to_coco_cat_id = dict(
            zip([c['name'] for c in cats], self._COCO.getCatIds()))
        self._image_index = self._load_image_set_index()
        # Default to roidb handler
        self.set_proposal_method('gt')
        self.competition_mode(False)

        # view maps: some "datasets" are views of others (coco.py:52-60)
        self._view_map = {
            'minival2014': 'val2014',
            'valminusminival2014': 'val2014',
            'test-dev2015': 'test2015',
        }
        coco_name = image_set + year  # e.g. train2014
        self._data_name = self._view_map.get(coco_name, coco_name)
        # test split has no gt
        self._gt_splits = ('train', 'val', 'minival')

    def _get_ann_file(self):
        prefix = ('instances' if self._image_set.find('test') == -1
                  else 'image_info')
        return osp.join(self._data_path, 'annotations',
                        prefix + '_' + self._image_set + self._year + '.json')

    def _load_image_set_index(self):
        return self._COCO.getImgIds()

    def _get_widths(self):
        anns = self._COCO.loadImgs(self._image_index)
        return [ann['width'] for ann in anns]

    def image_path_at(self, i):
        return self.image_path_from_index(self._image_index[i])

    def image_path_from_index(self, index):
        # images are e.g. images/train2014/COCO_train2014_000000119993.jpg
        file_name = ('COCO_' + self._data_name + '_'
                     + str(index).zfill(12) + '.jpg')
        image_path = osp.join(self._data_path, 'images', self._data_name,
                              file_name)
        assert osp.exists(image_path), \
            'Path does not exist: {}'.format(image_path)
        return image_path

    def gt_roidb(self):
        cache_file = osp.join(self.cache_path, self.name + '_gt_roidb.pkl')
        if osp.exists(cache_file):
            with open(cache_file, 'rb') as fid:
                roidb = pickle.load(fid)
            print('{} gt roidb loaded from {}'.format(self.name, cache_file))
            return roidb
        gt_roidb = [self._load_coco_annotation(index)
                    for index in self._image_index]
        with open(cache_file, 'wb') as fid:
            pickle.dump(gt_roidb, fid, pickle.HIGHEST_PROTOCOL)
        print('wrote gt roidb to {}'.format(cache_file))
        return gt_roidb

    def _load_coco_annotation(self, index):
        """Annotation -> roidb entry; crowds get gt_overlaps -1
        (coco.py:123-179)."""
        im_ann = self._COCO.loadImgs(index)[0]
        width = im_ann['width']
        height = im_ann['height']

        ann_ids = self._COCO.getAnnIds(imgIds=index, iscrowd=None)
        objs = self._COCO.loadAnns(ann_ids)
        # sanitize: clip to image, require positive area
        valid_objs = []
        for obj in objs:
            x1 = np.max((0, obj['bbox'][0]))
            y1 = np.max((0, obj['bbox'][1]))
            x2 = np.min((width - 1, x1 + np.max((0, obj['bbox'][2] - 1))))
            y2 = np.min((height - 1, y1 + np.max((0, obj['bbox'][3] - 1))))
            if obj['area'] > 0 and x2 >= x1 and y2 >= y1:
                obj['clean_bbox'] = [x1, y1, x2, y2]
                valid_objs.append(obj)
        objs = valid_objs
        num_objs = len(objs)

        boxes = np.zeros((num_objs, 4), dtype=np.uint16)
        gt_classes = np.zeros((num_objs), dtype=np.int32)
        overlaps = np.zeros((num_objs, self.num_classes), dtype=np.float32)
        seg_areas = np.zeros((num_objs), dtype=np.float32)

        coco_cat_id_to_class_ind = dict(
            [(self._class_to_coco_cat_id[cls], self._class_to_ind[cls])
             for cls in self._classes[1:]])
        for ix, obj in enumerate(objs):
            cls = coco_cat_id_to_class_ind[obj['category_id']]
            boxes[ix, :] = obj['clean_bbox']
            gt_classes[ix] = cls
            seg_areas[ix] = obj['area']
            if obj['iscrowd']:
                # crowd: overlap with ALL classes set to -1 so these boxes
                # are excluded from training (minibatch gt filter)
                overlaps[ix, :] = -1.0
            else:
                overlaps[ix, cls] = 1.0

        return {'width': width,
                'height': height,
                'boxes': boxes,
                'gt_classes': gt_classes,
                'gt_overlaps': scipy.sparse.csr_matrix(overlaps),
                'flipped': False,
                'seg_areas': seg_areas}

    def append_flipped_images(self):
        """Width comes from the annotation, not from opening the image
        (coco.py:184-203)."""
        num_images = self.num_images
        widths = self._get_widths()
        for i in range(num_images):
            boxes = self.roidb[i]['boxes'].copy()
            oldx1 = boxes[:, 0].copy()
            oldx2 = boxes[:, 2].copy()
            boxes[:, 0] = widths[i] - oldx2 - 1
            boxes[:, 2] = widths[i] - oldx1 - 1
            assert (boxes[:, 2] >= boxes[:, 0]).all()
            entry = {'width': widths[i],
                     'height': self.roidb[i]['height'],
                     'boxes': boxes,
                     'gt_classes': self.roidb[i]['gt_classes'],
                     'gt_overlaps': self.roidb[i]['gt_overlaps'],
                     'flipped': True,
                     'seg_areas': self.roidb[i]['seg_areas']}
            self.roidb.append(entry)
        self._image_index = self._image_index * 2

    # ------------------------- evaluation -------------------------

    def _print_detection_eval_metrics(self, coco_eval):
        IoU_lo_thresh = 0.5
        IoU_hi_thresh = 0.95

        def _get_thr_ind(coco_eval, thr):
            ind = np.where((coco_eval.params.iouThrs > thr - 1e-5)
                           & (coco_eval.params.iouThrs < thr + 1e-5))[0][0]
            assert np.isclose(coco_eval.params.iouThrs[ind], thr)
            return ind

        ind_lo = _get_thr_ind(coco_eval, IoU_lo_thresh)
        ind_hi = _get_thr_ind(coco_eval, IoU_hi_thresh)
        precision = coco_eval.eval['precision'][
            ind_lo:(ind_hi + 1), :, :, 0, 2]
        ap_default = np.mean(precision[precision > -1])
        print('~~~~ Mean and per-category AP @ IoU=[{:.2f},{:.2f}] '
              '~~~~'.format(IoU_lo_thresh, IoU_hi_thresh))
        print('{:.1f}'.format(100 * ap_default))
        for cls_ind, cls in enumerate(self.classes):
            if cls == '__background__':
                continue
            precision = coco_eval.eval['precision'][
                ind_lo:(ind_hi + 1), :, cls_ind - 1, 0, 2]
            ap = np.mean(precision[precision > -1])
            print('{:.1f}'.format(100 * ap))
        print('~~~~ Summary metrics ~~~~')
        coco_eval.summarize()

    def _do_detection_eval(self, res_file, output_dir):
        _, COCOeval = _require_pycocotools()
        ann_type = 'bbox'
        coco_dt = self._COCO.loadRes(res_file)
        coco_eval = COCOeval(self._COCO, coco_dt)
        coco_eval.params.useSegm = (ann_type == 'segm')
        coco_eval.evaluate()
        coco_eval.accumulate()
        self._print_detection_eval_metrics(coco_eval)
        eval_file = osp.join(output_dir, 'detection_results.pkl')
        with open(eval_file, 'wb') as fid:
            pickle.dump(coco_eval, fid, pickle.HIGHEST_PROTOCOL)
        print('Wrote COCO eval results to: {}'.format(eval_file))
        return coco_eval

    def _coco_results_one_category(self, boxes, cat_id):
        results = []
        for im_ind, index in enumerate(self.image_index):
            dets = boxes[im_ind]
            if len(dets) == 0:
                continue
            dets = dets.astype(float)
            scores = dets[:, -1]
            xs = dets[:, 0]
            ys = dets[:, 1]
            ws = dets[:, 2] - xs + 1
            hs = dets[:, 3] - ys + 1
            results.extend(
                [{'image_id': index,
                  'category_id': cat_id,
                  'bbox': [xs[k], ys[k], ws[k], hs[k]],
                  'score': scores[k]} for k in range(dets.shape[0])])
        return results

    def _write_coco_results_file(self, all_boxes, res_file):
        results = []
        for cls_ind, cls in enumerate(self.classes):
            if cls == '__background__':
                continue
            print('Collecting {} results ({:d}/{:d})'.format(
                cls, cls_ind, self.num_classes - 1))
            coco_cat_id = self._class_to_coco_cat_id[cls]
            results.extend(self._coco_results_one_category(
                all_boxes[cls_ind], coco_cat_id))
        print('Writing results json to {}'.format(res_file))
        with open(res_file, 'w') as fid:
            json.dump(results, fid)

    def evaluate_detections(self, all_boxes, output_dir):
        """Returns the COCO AP@[0.5:0.95] (stats[0]) like pascal_voc returns
        its mAP; None for gt-less test splits."""
        res_file = osp.join(
            output_dir,
            'detections_' + self._image_set + self._year + '_results')
        if self.config['use_salt']:
            res_file += '_{}'.format(str(uuid.uuid4()))
        res_file += '.json'
        self._write_coco_results_file(all_boxes, res_file)
        ap = None
        # only evaluate on splits with gt annotations
        if self._image_set.find('test') == -1:
            coco_eval = self._do_detection_eval(res_file, output_dir)
            if getattr(coco_eval, 'stats', None) is not None \
                    and len(coco_eval.stats):
                ap = float(coco_eval.stats[0])
        if self.config['cleanup']:
            os.remove(res_file)
        return ap

    def competition_mode(self, on):
        if on:
            self.config['use_salt'] = False
            self.config['cleanup'] = False
        else:
            self.config['use_salt'] = True
            self.config['cleanup'] = True
