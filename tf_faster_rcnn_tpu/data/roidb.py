"""roidb enrichment and filtering.

Parity with /root/reference/lib/roi_data_layer/roidb.py:19-49 (add image
path/size and per-roi max class/overlap) and lib/model/train_val.py:338-360
(drop images with neither usable fg nor bg rois).
"""

from __future__ import annotations

import numpy as np
from PIL import Image

from tf_faster_rcnn_tpu.config import cfg


def prepare_roidb(imdb):
    """Enrich the imdb's roidb with image metadata and max-overlap stats."""
    roidb = imdb.roidb
    if not (imdb.name.startswith('coco')):
        sizes = [Image.open(imdb.image_path_at(i)).size
                 for i in range(imdb.num_images)]
    for i in range(len(imdb.image_index)):
        roidb[i]['image'] = imdb.image_path_at(i)
        if not (imdb.name.startswith('coco')):
            roidb[i]['width'] = sizes[i % imdb.num_images][0]
            roidb[i]['height'] = sizes[i % imdb.num_images][1]
        gt_overlaps = roidb[i]['gt_overlaps'].toarray()
        max_overlaps = gt_overlaps.max(axis=1)
        max_classes = gt_overlaps.argmax(axis=1)
        roidb[i]['max_classes'] = max_classes
        roidb[i]['max_overlaps'] = max_overlaps
        # sanity: background rois have overlap 0, foreground > 0
        zero_inds = np.where(max_overlaps == 0)[0]
        assert all(max_classes[zero_inds] == 0)
        nonzero_inds = np.where(max_overlaps > 0)[0]
        assert all(max_classes[nonzero_inds] != 0)


def filter_roidb(roidb):
    """Remove entries that have no usable RoIs (train_val.py:338-360)."""

    def is_valid(entry):
        overlaps = entry['max_overlaps']
        fg_inds = np.where(overlaps >= cfg.TRAIN.FG_THRESH)[0]
        bg_inds = np.where((overlaps < cfg.TRAIN.BG_THRESH_HI)
                           & (overlaps >= cfg.TRAIN.BG_THRESH_LO))[0]
        return len(fg_inds) > 0 or len(bg_inds) > 0

    num = len(roidb)
    filtered_roidb = [entry for entry in roidb if is_valid(entry)]
    num_after = len(filtered_roidb)
    print('Filtered {} roidb entries: {} -> {}'.format(
        num - num_after, num, num_after))
    return filtered_roidb
