#!/bin/bash
# Checkpoint-migration driver (reference experiments/scripts/convert_vgg16.sh
# parity): maps DATASET to the released-snapshot naming and converts a
# TF/slim variable dict (.npz/.pkl export of the checkpoint) into the params
# msgpack that tools/{test_net,demo}.py consume.
#
# Usage: ./experiments/scripts/convert_weights.sh DATASET NET SRC_VAR_DICT [extra --set args]
# DATASET in {pascal_voc, pascal_voc_0712, coco}

set -x
set -e

export PYTHONUNBUFFERED="True"

DATASET=$1
NET=$2
SRC=$3

array=( $@ )
len=${#array[@]}
EXTRA_ARGS=${array[@]:3:$len}

case ${DATASET} in
  pascal_voc)
    TRAIN_IMDB="voc_2007_trainval"
    ITERS=70000
    ANCHORS="[8,16,32]"
    RATIOS="[0.5,1,2]"
    NUM_CLASSES=21
    ;;
  pascal_voc_0712)
    TRAIN_IMDB="voc_2007_trainval+voc_2012_trainval"
    ITERS=110000
    ANCHORS="[8,16,32]"
    RATIOS="[0.5,1,2]"
    NUM_CLASSES=21
    ;;
  coco)
    TRAIN_IMDB="coco_2014_train+coco_2014_valminusminival"
    ITERS=490000
    ANCHORS="[4,8,16,32]"
    RATIOS="[0.5,1,2]"
    NUM_CLASSES=81
    ;;
  *)
    echo "No dataset given"
    exit
    ;;
esac

OUT_DIR="output/${NET}/${TRAIN_IMDB}/default"
NET_FINAL="${OUT_DIR}/${NET}_faster_rcnn_iter_${ITERS}.msgpack"
mkdir -p ${OUT_DIR}

if [ ! -f ${NET_FINAL} ]; then
  time python ./tools/convert_weights.py \
    --net ${NET} \
    --src ${SRC} \
    --dst ${NET_FINAL} \
    --num-classes ${NUM_CLASSES} \
    --cfg experiments/cfgs/${NET}.yml \
    --set ANCHOR_SCALES ${ANCHORS} ANCHOR_RATIOS ${RATIOS} ${EXTRA_ARGS}
fi
