#!/bin/bash
# Eval experiment driver (covers the reference's
# experiments/scripts/test_faster_rcnn.sh surface): resolves the final
# snapshot the train driver produced for DATASET/NET[/tag] and runs
# tools/test_net.py on the recipe's test imdb.
#
#   ./experiments/scripts/test_faster_rcnn.sh DEVICES DATASET NET [--set overrides...]
set -euo pipefail
set -x

export PYTHONUNBUFFERED=True

here="$(cd "$(dirname "$0")" && pwd)"
. "$here/recipes.sh"

[ $# -ge 3 ] || { echo "usage: $0 DEVICES DATASET NET [extra --set args]" >&2; exit 2; }
devices="$1"; dataset="$2"; net="$3"; shift 3
extra=("$@")
# rehearsal/CI hooks (tools/coco_rehearsal.py): pin the tag to the TRAIN
# run's, evaluate under a different cfg (e.g. res101-lg shapes on a res101
# snapshot), or point at a relocated output root (--set ROOT_DIR)
tag="${FRCNN_TAG-$(slug ${extra[@]+"${extra[@]}"})}"
cfg="${FRCNN_CFG:-experiments/cfgs/${net}.yml}"

recipe "$dataset"

start_log "test_${net}_${train_imdb}${tag:+_$tag}"

# Resolve the final snapshot by NUMERIC iter (batched runs divide the image
# budget by the global batch, so the step count in the filename depends on
# DEVICES — never assume iter_${iters}, and never sort lexically).
rundir="${FRCNN_OUTPUT_ROOT:-.}/output/${net}/${train_imdb}/${tag:-default}"
snapshot="$(python - "$rundir" "$net" <<'PY'
import re, sys, glob, os
rundir, net = sys.argv[1], sys.argv[2]
snaps = glob.glob(os.path.join(rundir, f"{net}_faster_rcnn_iter_*.msgpack"))
if not snaps:
    sys.exit(f"no snapshots under {rundir}")
print(max(snaps, key=lambda p: int(re.search(r"_iter_(\d+)", p).group(1))))
PY
)"

time python ./tools/test_net.py \
  --imdb "$test_imdb" \
  --model "$snapshot" \
  --cfg "$cfg" \
  --net "$net" \
  --devices "$devices" \
  --set ANCHOR_SCALES "$scales" ANCHOR_RATIOS "$ratios" \
        ${extra[@]+"${extra[@]}"}
