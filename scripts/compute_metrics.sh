#!/usr/bin/env bash
# Standalone metrics between two PLY sequences (compute_metrics.sh analog).
set -e
REPO=$(cd "$(dirname "$0")/.." && pwd)
rabbit-metrics \
    --uncompressedDataPath="${1:-"$PWD"/data/cloud_%04d.ply}" \
    --reconstructedDataPath="${2:-"$PWD"/data/dec_%04d.ply}" \
    --resolution=1023 \
    --frameCount="${3:-4}"
