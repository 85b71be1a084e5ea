#!/bin/bash
# Checkpoint-migration driver (covers the reference's convert_vgg16.sh
# surface): converts a released/trained TF checkpoint — a Saver-V2 .ckpt
# bundle read natively by utils/tf_bundle.py, or a .npz/.pkl variable-dict
# export — into the params msgpack that tools/{test_net,demo}.py consume,
# placed where the eval driver expects the final snapshot.
#
#   ./experiments/scripts/convert_weights.sh DATASET NET SRC [--set overrides...]
set -euo pipefail
set -x

export PYTHONUNBUFFERED=True

here="$(cd "$(dirname "$0")" && pwd)"
. "$here/recipes.sh"

[ $# -ge 3 ] || { echo "usage: $0 DATASET NET SRC_CKPT_OR_DICT [extra --set args]" >&2; exit 2; }
dataset="$1"; net="$2"; src="$3"; shift 3
extra=("$@")

recipe "$dataset"

rundir="output/${net}/${train_imdb}/default"
dst="$rundir/${net}_faster_rcnn_iter_${iters}.msgpack"
mkdir -p "$rundir"

if [ -f "$dst" ]; then
  echo "already converted: $dst"
  exit 0
fi

time python ./tools/convert_weights.py \
  --net "$net" \
  --src "$src" \
  --dst "$dst" \
  --num-classes "$num_classes" \
  --cfg "experiments/cfgs/${net}.yml" \
  --set ANCHOR_SCALES "$scales" ANCHOR_RATIOS "$ratios" ${extra[@]+"${extra[@]}"}
