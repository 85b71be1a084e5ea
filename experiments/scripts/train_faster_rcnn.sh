#!/bin/bash
# Train-then-eval experiment driver (covers the reference's
# experiments/scripts/train_faster_rcnn.sh surface: dataset recipe tables,
# log capture, chaining into the eval driver).
#
#   ./experiments/scripts/train_faster_rcnn.sh DEVICES DATASET NET [--set overrides...]
#
#   DEVICES  data-parallel chip count (replaces the reference's single-GPU
#            CUDA_VISIBLE_DEVICES pick)
#   DATASET  pascal_voc | pascal_voc_0712 | coco
#   NET      vgg16 | res50 | res101 | res152 | mobile
#
# Batched-recipe semantics: the recipe tables (recipes.sh) are in IMAGES.
# At global batch B = DEVICES x TPU.IMS_PER_DEVICE the engine applies the
# linear-scaling rule automatically (LR x B with warmup, steps / B — same
# image budget; engine/train.py::scale_recipe). Pass
# `--set TPU.AUTO_SCALE_SCHEDULE False` to treat the tables as raw steps.
set -euo pipefail
set -x

export PYTHONUNBUFFERED=True

here="$(cd "$(dirname "$0")" && pwd)"
. "$here/recipes.sh"

[ $# -ge 3 ] || { echo "usage: $0 DEVICES DATASET NET [extra --set args]" >&2; exit 2; }
devices="$1"; dataset="$2"; net="$3"; shift 3
extra=("$@")
# rehearsal/CI hooks (tools/coco_rehearsal.py): pin the run tag (the slug
# of path-valued --set overrides is not filesystem-safe), swap the config
# file, or train from random init with FRCNN_WEIGHT=""
tag="${FRCNN_TAG-$(slug ${extra[@]+"${extra[@]}"})}"
cfg="${FRCNN_CFG:-experiments/cfgs/${net}.yml}"
weight="${FRCNN_WEIGHT-data/imagenet_weights/${net}.npz}"

recipe "$dataset"

start_log "train_${net}_${train_imdb}${tag:+_$tag}"

time python ./tools/trainval_net.py \
  --weight "$weight" \
  --imdb "$train_imdb" \
  --imdbval "$test_imdb" \
  --iters "$iters" \
  --cfg "$cfg" \
  --net "$net" \
  --devices "$devices" \
  ${tag:+--tag "$tag"} \
  --set ANCHOR_SCALES "$scales" ANCHOR_RATIOS "$ratios" \
        TRAIN.STEPSIZE "$stepsize" ${extra[@]+"${extra[@]}"}

"$here/test_faster_rcnn.sh" "$devices" "$dataset" "$net" ${extra[@]+"${extra[@]}"}
