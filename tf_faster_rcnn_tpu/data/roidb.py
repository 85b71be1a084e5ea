"""roidb enrichment and filtering.

Behavioral coverage of /root/reference/lib/roi_data_layer/roidb.py:19-49
(attach image path/size and per-roi argmax class/overlap) and
lib/model/train_val.py:338-360 (drop images with neither usable fg nor bg
rois). Flip-augmented entries (index >= num_images) share their base
image's size, and COCO entries arrive with width/height already present in
the annotation record, so sizes are only probed from disk where needed.
"""

from __future__ import annotations

import numpy as np

from tf_faster_rcnn_tpu.config import cfg


def _image_size(path):
    from PIL import Image
    with Image.open(path) as im:
        return im.size


def prepare_roidb(imdb):
    """Attach image metadata and max-overlap stats to every roidb entry."""
    n_base = imdb.num_images
    probe_sizes = not imdb.name.startswith("coco")
    sizes = ([_image_size(imdb.image_path_at(i)) for i in range(n_base)]
             if probe_sizes else None)

    for i, entry in enumerate(imdb.roidb):
        entry["image"] = imdb.image_path_at(i)
        if sizes is not None:
            entry["width"], entry["height"] = sizes[i % n_base]

        overlaps = entry["gt_overlaps"].toarray()
        entry["max_overlaps"] = overlaps.max(axis=1)
        entry["max_classes"] = overlaps.argmax(axis=1)

        # invariants (reference roidb.py:43-49): zero overlap -> background
        # class 0; positive overlap -> a foreground class. COCO crowd rois
        # carry overlap -1 for every class (coco.py crowd semantics) and are
        # exempt from both checks, exactly as the reference's ">0" test
        # exempts them.
        is_bg = entry["max_overlaps"] == 0
        if not (entry["max_classes"][is_bg] == 0).all():
            raise AssertionError("background roi with nonzero class")
        is_fg = entry["max_overlaps"] > 0
        if not (entry["max_classes"][is_fg] != 0).all():
            raise AssertionError("foreground roi mapped to class 0")


def _has_usable_rois(entry) -> bool:
    ov = entry["max_overlaps"]
    any_fg = bool((ov >= cfg.TRAIN.FG_THRESH).any())
    any_bg = bool(((ov < cfg.TRAIN.BG_THRESH_HI)
                   & (ov >= cfg.TRAIN.BG_THRESH_LO)).any())
    return any_fg or any_bg


def filter_roidb(roidb):
    """Drop entries with no sampleable fg or bg roi (train_val.py:338-360)."""
    kept = [e for e in roidb if _has_usable_rois(e)]
    print("Filtered {} roidb entries: {} -> {}".format(
        len(roidb) - len(kept), len(roidb), len(kept)))
    return kept
