#!/bin/bash
# Day-1 real-data parity drill, as one command (RUNBOOK.md made executable).
#
# fetch (or take) a released reference checkpoint -> convert_weights ->
# demo spot-check (machine-readable, must produce confident detections) ->
# full VOC mAP with an acceptance gate.
#
# Usage:
#   tools/day1_parity.sh [--net res101] [--ckpt <tf-ckpt-prefix>]
#                        [--model <params.msgpack>] [--imdb voc_2007_test]
#                        [--gate 75.5] [--workdir data]
#
# Inputs it needs from the outside world (the reference's own artifacts):
#   * a trained checkpoint: either --model (already-converted msgpack),
#     --ckpt (TF TensorBundle prefix, converted here), or FETCH_URL/
#     FETCH_MD5 for data/scripts/fetch_faster_rcnn_models.sh;
#   * VOCdevkit2007 under <workdir> for the mAP step (reference README
#     layout).
# Every local step is pinned by tests (see RUNBOOK.md); in a container
# with neither artifacts nor data this script validates what it can and
# exits 3 at the data boundary with a precise list of what is missing.

set -euo pipefail

ROOT="$(cd "$(dirname "${BASH_SOURCE[0]}")/.." && pwd)"
cd "$ROOT"

NET=res101
CKPT=""
MODEL=""
IMDB=voc_2007_test
GATE=75.5
WORKDIR=data
CFG=""
while [ $# -gt 0 ]; do
  case "$1" in
    --net) NET=$2; shift 2;;
    --ckpt) CKPT=$2; shift 2;;
    --model) MODEL=$2; shift 2;;
    --imdb) IMDB=$2; shift 2;;
    --gate) GATE=$2; shift 2;;
    --workdir) WORKDIR=$2; shift 2;;
    --cfg) CFG=$2; shift 2;;
    *) echo "unknown arg $1"; exit 2;;
  esac
done
CFG=${CFG:-experiments/cfgs/${NET}.yml}
mkdir -p "$WORKDIR"

missing=()

# ---- step 0: local environment sanity (always runs) -----------------------
# DAY1_FORCE_CPU=1: pin JAX to CPU (tests; the machine's sitecustomize
# registers the TPU plugin before JAX_PLATFORMS env is read, so only the
# in-process config update works)
python - <<'EOF'
import os
import jax
if os.environ.get("DAY1_FORCE_CPU"):
    jax.config.update("jax_platforms", "cpu")
import tf_faster_rcnn_tpu  # noqa: F401
from tf_faster_rcnn_tpu.config import cfg  # noqa: F401
print(f"day1: framework imports ok; devices: {jax.devices()}")
EOF
[ -f "$CFG" ] || { echo "day1: missing config $CFG"; exit 2; }

# ---- step 1: obtain weights ------------------------------------------------
if [ -z "$MODEL" ]; then
  if [ -n "$CKPT" ]; then
    [ -f "${CKPT}.index" ] || { echo "day1: ${CKPT}.index not found"; exit 2; }
    MODEL="$WORKDIR/${NET}_day1.msgpack"
    echo "day1: converting $CKPT -> $MODEL"
    python tools/convert_weights.py --net "$NET" --src "$CKPT" \
      --dst "$MODEL" --cfg "$CFG"
  elif [ -n "${FETCH_URL:-}" ]; then
    FILE="${NET}_faster_rcnn_voc0712.msgpack"
    bash data/scripts/fetch_faster_rcnn_models.sh "$FILE"
    MODEL="$WORKDIR/$FILE"
  else
    missing+=("trained weights: pass --model/--ckpt or set FETCH_URL (data/scripts/fetch_faster_rcnn_models.sh)")
  fi
fi

# ---- step 2: demo spot-check ----------------------------------------------
if [ -n "$MODEL" ]; then
  DEMO_OUT="$WORKDIR/day1_demo"
  python tools/demo.py --net "$NET" --model "$MODEL" --cfg "$CFG" \
    --out-dir "$DEMO_OUT" --json "$DEMO_OUT/dets.json"
  # a trained checkpoint must produce confident detections on most images;
  # a conversion/surgery bug produces (near-)empty output here, long before
  # the mAP run could reveal it
  python - "$DEMO_OUT/dets.json" <<'EOF'
import json
import sys
dets = json.load(open(sys.argv[1]))
nonempty = sum(1 for v in dets.values() if v)
print(f"day1: demo detections on {nonempty}/{len(dets)} images")
if nonempty * 2 < len(dets):
    sys.exit("day1: FAIL - converted weights detect (almost) nothing; "
             "suspect weight conversion/surgery")
EOF
fi

# ---- step 3: full mAP -----------------------------------------------------
DEVKIT="$WORKDIR/VOCdevkit2007"
if [ ! -d "$DEVKIT" ]; then
  missing+=("VOC data: VOCdevkit2007 under $WORKDIR (reference README layout)")
fi
if [ -n "$MODEL" ] && [ -d "$DEVKIT" ]; then
  LOG="$WORKDIR/day1_eval.log"
  python tools/test_net.py --imdb "$IMDB" --net "$NET" \
    --model "$MODEL" --cfg "$CFG" | tee "$LOG"
  MAP=$(grep -oE "Mean AP = [0-9.]+" "$LOG" | tail -1 | grep -oE "[0-9.]+")
  echo "day1: mAP=$MAP gate=$GATE"
  python - "$MAP" "$GATE" <<'EOF'
import sys
ok = float(sys.argv[1]) * 100 >= float(sys.argv[2]) or \
     float(sys.argv[1]) >= float(sys.argv[2])
sys.exit(0 if ok else f"day1: FAIL - mAP {sys.argv[1]} below gate {sys.argv[2]}")
EOF
  echo "day1: PASS"
  exit 0
fi

echo "day1: reached the data boundary. Everything local is validated;"
echo "provide the following and re-run:"
for m in "${missing[@]}"; do echo "  - $m"; done
exit 3
