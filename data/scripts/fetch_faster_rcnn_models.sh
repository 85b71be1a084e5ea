#!/bin/bash
# Fetch converted Faster R-CNN model weights (role of the reference's
# data/scripts/fetch_faster_rcnn_models.sh, with md5 verification).
#
# This framework consumes either its own params .msgpack files or slim/TF
# variable dicts (.npz) converted via tools/convert_weights.py. Hosted
# artifacts are not published yet; point URL/MD5 at your own storage. The
# md5-checked download skeleton matches the reference's.

set -e

DIR="$( cd "$( dirname "${BASH_SOURCE[0]}" )" && cd .. && pwd )"
cd "$DIR"

FILE=${1:-res101_faster_rcnn_voc0712.msgpack}
URL=${FETCH_URL:-""}
CHECKSUM=${FETCH_MD5:-""}

if [ -z "$URL" ]; then
  echo "Set FETCH_URL (and optionally FETCH_MD5) to the artifact location, e.g."
  echo "  FETCH_URL=https://example.com/$FILE FETCH_MD5=<md5> $0 $FILE"
  echo "Or convert reference/slim weights locally:"
  echo "  python tools/convert_weights.py --net res101 --src res101.npz --dst data/$FILE"
  exit 1
fi

if [ -f "$FILE" ] && [ -n "$CHECKSUM" ]; then
  os=$(uname -s)
  if [ "$os" = "Linux" ]; then
    checksum=$(md5sum "$FILE" | awk '{ print $1 }')
  else
    checksum=$(cat "$FILE" | md5)
  fi
  if [ "$checksum" = "$CHECKSUM" ]; then
    echo "$FILE exists and checksum matches; skipping download"
    exit 0
  fi
fi

echo "Downloading $FILE from $URL ..."
wget "$URL" -O "$FILE"
echo "Done. Please verify the checksum."
