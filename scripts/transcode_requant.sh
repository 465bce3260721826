#!/usr/bin/env bash
# DCT-domain fast-path transcode (the RBV-only requantisation mode; the
# analog slot of the reference's transcode_gpu.sh NVENC fast path).
set -e
REPO=$(cd "$(dirname "$0")/.." && pwd)
rabbit-transcode \
    --compressedStreamPath="${1:-"$PWD"/data/sphere_r5.bin}" \
    --outStreamPath="${2:-"$PWD"/data/transcoded_rq.bin}" \
    --mode=requant \
    --geometryQP=32 \
    --attributeQP=42 \
    --test_name=test_transcode_requant
