#!/bin/bash
# Train+test driver (reference experiments/scripts/train_faster_rcnn.sh
# parity): dataset -> (imdbs, iters, stepsize, anchors) table, log tee-ing,
# chain into the test script. Device selection: DEVICES (data-parallel
# count) replaces the reference's CUDA_VISIBLE_DEVICES single-GPU pick.
#
# Usage: ./experiments/scripts/train_faster_rcnn.sh DEVICES DATASET NET [extra --set args]
# DATASET in {pascal_voc, pascal_voc_0712, coco}
# NET in {vgg16, res50, res101, res152, mobile}
#
# Batched-recipe semantics: the ITERS/STEPSIZE tables below are the
# reference's, counted in IMAGES (1 image/step there). With DEVICES > 1
# (global batch B = DEVICES x TPU.IMS_PER_DEVICE) the engine applies the
# linear-scaling rule automatically (LR x B with warmup, steps / B — same
# image budget, engine/train.py::scale_recipe), so these tables stay valid
# verbatim at any device count. Disable with
#   --set TPU.AUTO_SCALE_SCHEDULE False
# to interpret ITERS as raw step counts instead.

set -x
set -e

export PYTHONUNBUFFERED="True"

DEVICES=$1
DATASET=$2
NET=$3

array=( $@ )
len=${#array[@]}
EXTRA_ARGS=${array[@]:3:$len}
EXTRA_ARGS_SLUG=${EXTRA_ARGS// /_}

case ${DATASET} in
  pascal_voc)
    TRAIN_IMDB="voc_2007_trainval"
    TEST_IMDB="voc_2007_test"
    STEPSIZE="[50000]"
    ITERS=70000
    ANCHORS="[8,16,32]"
    RATIOS="[0.5,1,2]"
    ;;
  pascal_voc_0712)
    TRAIN_IMDB="voc_2007_trainval+voc_2012_trainval"
    TEST_IMDB="voc_2007_test"
    STEPSIZE="[80000]"
    ITERS=110000
    ANCHORS="[8,16,32]"
    RATIOS="[0.5,1,2]"
    ;;
  coco)
    TRAIN_IMDB="coco_2014_train+coco_2014_valminusminival"
    TEST_IMDB="coco_2014_minival"
    STEPSIZE="[350000]"
    ITERS=490000
    ANCHORS="[4,8,16,32]"
    RATIOS="[0.5,1,2]"
    ;;
  *)
    echo "No dataset given"
    exit
    ;;
esac

mkdir -p experiments/logs
LOG="experiments/logs/${NET}_${TRAIN_IMDB}_${EXTRA_ARGS_SLUG}_${NET}.txt.`date +'%Y-%m-%d_%H-%M-%S'`"
exec &> >(tee -a "$LOG")
echo Logging output to "$LOG"

if [[ ! -z ${EXTRA_ARGS_SLUG} ]]; then
  TAG_ARGS="--tag ${EXTRA_ARGS_SLUG}"
else
  TAG_ARGS=""
fi

time python ./tools/trainval_net.py \
  --weight data/imagenet_weights/${NET}.npz \
  --imdb ${TRAIN_IMDB} \
  --imdbval ${TEST_IMDB} \
  --iters ${ITERS} \
  --cfg experiments/cfgs/${NET}.yml \
  --net ${NET} \
  --devices ${DEVICES} \
  ${TAG_ARGS} \
  --set ANCHOR_SCALES ${ANCHORS} ANCHOR_RATIOS ${RATIOS} \
  TRAIN.STEPSIZE ${STEPSIZE} ${EXTRA_ARGS}

./experiments/scripts/test_faster_rcnn.sh $@
