# Shared dataset recipes + helpers for the experiment drivers.
# Sourced by train_faster_rcnn.sh / test_faster_rcnn.sh — not executable.
#
# Schedules are the reference's published tables (its driver scripts carry
# the same numbers), counted in IMAGES: the reference trains 1 image/step,
# and our engine's linear-scaling rule (engine/train.py::scale_recipe)
# re-derives step counts from the image budget at any global batch size.

# recipe DATASET -> sets train_imdb test_imdb iters stepsize scales ratios
recipe() {
  local name="$1"
  scales="[8,16,32]"        # VOC anchor sweep; COCO widens below
  ratios="[0.5,1,2]"
  num_classes=21
  case "$name" in
    pascal_voc)
      train_imdb=voc_2007_trainval
      test_imdb=voc_2007_test
      iters=70000  stepsize="[50000]"
      ;;
    pascal_voc_0712)
      train_imdb=voc_2007_trainval+voc_2012_trainval
      test_imdb=voc_2007_test
      iters=110000 stepsize="[80000]"
      ;;
    coco)
      train_imdb=coco_2014_train+coco_2014_valminusminival
      test_imdb=coco_2014_minival
      iters=490000 stepsize="[350000]"
      scales="[4,8,16,32]"
      num_classes=81
      ;;
    *)
      echo "unknown dataset '$name' (expected pascal_voc|pascal_voc_0712|coco)" >&2
      return 1
      ;;
  esac
  # rehearsal/CI hooks: shrink the published schedule without forking the
  # driver code path (tools/coco_rehearsal.py drives the real scripts)
  iters="${FRCNN_ITERS:-$iters}"
  stepsize="${FRCNN_STEPSIZE:-$stepsize}"
}

# start_log FILE — tee all further stdout/stderr into FILE under
# experiments/logs (single source of truth for the log layout).
start_log() {
  mkdir -p experiments/logs
  local log="experiments/logs/$1.$(date +%Y-%m-%d_%H-%M-%S).log"
  exec > >(tee -a "$log") 2>&1
  echo "logging to $log"
}

# slug ARGS... — filesystem-safe tag from the extra --set arguments
slug() { local s="$*"; echo "${s// /_}"; }
