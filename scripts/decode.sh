#!/usr/bin/env bash
# Decode a V3C stream to PLYs + metrics (decode.sh analog).
set -e
REPO=$(cd "$(dirname "$0")/.." && pwd)
STREAM=${1:-"$PWD"/data/transcoded.bin}
rabbit-decode \
    --compressedStreamPath="$STREAM" \
    --reconstructedDataPath="$PWD"/data/dec_%04d.ply \
    --computeChecksum
