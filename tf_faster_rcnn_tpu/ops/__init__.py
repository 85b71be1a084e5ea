from tf_faster_rcnn_tpu.ops.boxes import (
    bbox_transform,
    bbox_transform_inv,
    clip_boxes,
    bbox_overlaps,
)
from tf_faster_rcnn_tpu.ops.anchors import generate_anchors, anchor_grid
