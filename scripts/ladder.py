#!/usr/bin/env python
"""In-process CTC rate-ladder runner (the fast path to RESULTS.md).

Same protocol as scripts/run_ctc.sh (encode once at high quality, transcode
to r1..r5 in all three modes, decode + D1/D2/Y metrics vs the source), but
one process: the CLI loop re-imports and re-jits per invocation, which
multiplies the wall time ~6x on this 1-core host.  run_ctc.sh remains the
CLI-parity smoke; this is the measurement tool.

    python scripts/ladder.py [sphere|blobs] [frames] [points]

Prints the RESULTS.md tables as CSV on stdout (progress on stderr).
"""

from __future__ import annotations

import os
import sys
import time

import jax

jax.config.update("jax_platforms", "cpu")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
RATES = {  # cfg/rate/ctc-r*.cfg: (geometryQP, attributeQP, occupancyPrecision)
    "r1": (32, 42, 4),
    "r2": (28, 37, 4),
    "r3": (24, 32, 4),
    "r4": (20, 27, 4),
    "r5": (16, 22, 2),
}
MODES = ("reencode", "requant", "auto")


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def main() -> int:
    scene = sys.argv[1] if len(sys.argv) > 1 else "sphere"
    frames = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    points = int(sys.argv[3]) if len(sys.argv) > 3 else 40000

    from rabbit_transcoding_tpu.bitstream import V3CReader, V3CWriter
    from rabbit_transcoding_tpu.core.gof import GroupOfFrames
    from rabbit_transcoding_tpu.decoder.decoder import Decoder
    from rabbit_transcoding_tpu.encoder.encoder import Encoder
    from rabbit_transcoding_tpu.encoder.params import EncoderParameters
    from rabbit_transcoding_tpu.metrics.metrics import (
        MetricsParams,
        compute_sequence_metrics,
    )
    from rabbit_transcoding_tpu.testdata import SCENES
    from rabbit_transcoding_tpu.transcoder.params import TranscoderParameters
    from rabbit_transcoding_tpu.transcoder.transcoder import Transcoder

    t0 = time.time()
    sources = GroupOfFrames(
        [SCENES[scene](i, n=points) for i in range(frames)]
    )
    log(f"{scene}: {frames} frames, "
        f"{[s.point_count for s in sources]} points")
    enc = Encoder(EncoderParameters(
        minimumImageWidth=512, minimumImageHeight=128,
        geometryQP=8, attributeQP=12, occupancyPrecision=2,
        frameCount=frames, groupOfFramesSize=frames,
    ))
    context, _ = enc.encode(sources)
    writer = V3CWriter()
    hq = writer.write(writer.encode(context))
    log(f"hq.bin: {len(hq)} bytes ({time.time() - t0:.0f}s)")

    reader = V3CReader()
    mparams = MetricsParams(resolution=1023)

    print("scene;rate;mode;stream_bytes;d1_psnr;d2_psnr;y_psnr")
    d1 = {}
    ypsnr = {}
    for rate, (gqp, aqp, occ) in RATES.items():
        for mode in MODES:
            t1 = time.time()
            tc = Transcoder(TranscoderParameters(
                geometryQP=gqp, attributeQP=aqp, occupancyPrecision=occ,
                mode=mode, computeHashSei=False,
            ))
            ctx = reader.decode(reader.read(hq)[0])
            tc.transcode(ctx)
            out = writer.write(writer.encode(ctx))
            clouds = Decoder().decode(reader.decode(reader.read(out)[0]))
            _, m = compute_sequence_metrics(list(sources), clouds, mparams)
            print(f"{scene};{rate};{mode};{len(out)};{m.d1_psnr:.4f};"
                  f"{m.d2_psnr:.4f};{m.color_psnr[0]:.4f}", flush=True)
            d1[(rate, mode)] = m.d1_psnr
            ypsnr[(rate, mode)] = m.color_psnr[0]
            log(f"  {rate}/{mode}: {time.time() - t1:.0f}s")

    # within-bar table: auto must hold D1 delta <= 0.05 dB AND Y delta
    # <= 0.1 dB vs the full-re-encode baseline (round-4 verdict task 6)
    print("scene;rate;d1_reencode;d1_requant;d1_delta;d1_auto;d1_delta_auto"
          ";y_reencode;y_requant;y_delta;y_auto;y_delta_auto")
    for rate in RATES:
        base = d1[(rate, "reencode")]
        ybase = ypsnr[(rate, "reencode")]
        print(f"{scene};{rate};{base:.4f};{d1[(rate, 'requant')]:.4f};"
              f"{base - d1[(rate, 'requant')]:+.4f};"
              f"{d1[(rate, 'auto')]:.4f};{base - d1[(rate, 'auto')]:+.4f};"
              f"{ybase:.4f};{ypsnr[(rate, 'requant')]:.4f};"
              f"{ybase - ypsnr[(rate, 'requant')]:+.4f};"
              f"{ypsnr[(rate, 'auto')]:.4f};"
              f"{ybase - ypsnr[(rate, 'auto')]:+.4f}",
              flush=True)
    log(f"total {time.time() - t0:.0f}s")
    return 0


if __name__ == "__main__":
    sys.exit(main())
