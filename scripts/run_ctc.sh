#!/usr/bin/env bash
# CTC-style rate ladder run (BASELINE config #3): encode once at high
# quality, transcode to r1..r5 with the cfg cascade, decode + metrics per
# rate point.  Mirrors test/runme_linux.sh's cond/rate parameterisation.
set -e
REPO=$(cd "$(dirname "$0")/.." && pwd)
WORK=${WORK:-./data_ctc}
FRAMES=${FRAMES:-4}
COND=${COND:-ctc-random-access}
mkdir -p "$WORK"

python -m rabbit_transcoding_tpu.testdata --frames "$FRAMES" \
    --out "$WORK/cloud_%04d.ply"

rabbit-encode \
    --config="$REPO/cfg/common/ctc-common.cfg" \
    --config="$REPO/cfg/condition/$COND.cfg" \
    --uncompressedDataPath="$WORK/cloud_%04d.ply" \
    --frameCount="$FRAMES" \
    --minimumImageWidth=512 \
    --geometryQP=8 --attributeQP=12 --occupancyPrecision=2 \
    --compressedStreamPath="$WORK/hq.bin"

echo "rate;stream_bytes;d1_psnr;d2_psnr;y_psnr" > "$WORK/ladder.csv"
for R in r1 r2 r3 r4 r5; do
    GQP=$(grep geometryQP "$REPO/cfg/rate/ctc-$R.cfg" | cut -d: -f2 | tr -d ' ')
    AQP=$(grep attributeQP "$REPO/cfg/rate/ctc-$R.cfg" | cut -d: -f2 | tr -d ' ')
    OCC=$(grep occupancyPrecision "$REPO/cfg/rate/ctc-$R.cfg" | cut -d: -f2 | tr -d ' ')
    rabbit-transcode \
        --compressedStreamPath="$WORK/hq.bin" \
        --outStreamPath="$WORK/$R.bin" \
        --geometryQP="$GQP" --attributeQP="$AQP" \
        --occupancyPrecision="$OCC" \
        --test_name="ctc_$R" > "$WORK/$R.log"
    rabbit-decode \
        --compressedStreamPath="$WORK/$R.bin" \
        --reconstructedDataPath="$WORK/${R}_dec_%04d.ply" > /dev/null
    rabbit-metrics \
        --uncompressedDataPath="$WORK/cloud_%04d.ply" \
        --reconstructedDataPath="$WORK/${R}_dec_%04d.ply" \
        --frameCount="$FRAMES" --csvFile="$WORK/${R}_metrics.csv" > /dev/null
    SIZE=$(stat -c%s "$WORK/$R.bin")
    AVG=$(tail -1 "$WORK/${R}_metrics.csv")
    D1=$(echo "$AVG" | cut -d';' -f2)
    D2=$(echo "$AVG" | cut -d';' -f3)
    Y=$(echo "$AVG" | cut -d';' -f5)
    echo "$R;$SIZE;$D1;$D2;$Y" >> "$WORK/ladder.csv"
done
echo "=== rate ladder ==="
awk -F';' '{printf "%-6s %-14s %-10s %-10s %-10s\n", $1, $2, $3, $4, $5}' \
    "$WORK/ladder.csv"
