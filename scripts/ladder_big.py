#!/usr/bin/env python
"""Reference-scale CTC rate-ladder runner (round-3 verdict task 2).

scripts/ladder.py measures 4-8-frame ~40k-point clouds; the reference's
CTC operates on vox10 content — ~300k-800k points/frame, GOF 32
(/root/reference/cfg/sequence/longdress_vox10.cfg:5-12).  This runs the
same encode-once / transcode-r1..r5 protocol at that scale, with two
differences forced by the multi-hour runtime on this 1-core host:

  * RESUMABLE: the high-quality encode is cached to --workdir, and every
    completed (rate, mode) cell is appended to the CSV immediately; a
    re-run skips cells already present, so the job survives restarts.
  * progress + per-cell timing go to stderr; the CSV is the artifact.

    nohup python scripts/ladder_big.py --scene dense --frames 32 \
        --gof 32 --out results/ladder_dense32.csv &
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import jax

jax.config.update("jax_platforms", "cpu")

RATES = {  # cfg/rate/ctc-r*.cfg: (geometryQP, attributeQP, occupancyPrecision)
    "r1": (32, 42, 4),
    "r2": (28, 37, 4),
    "r3": (24, 32, 4),
    "r4": (20, 27, 4),
    "r5": (16, 22, 2),
}
MODES = ("reencode", "requant", "auto")
HEADER = "scene;rate;mode;stream_bytes;bpp;d1_psnr;d2_psnr;y_psnr;cell_s"


def log(msg: str) -> None:
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", file=sys.stderr, flush=True)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scene", default="dense")
    ap.add_argument("--frames", type=int, default=32)
    ap.add_argument("--points", type=int, default=0,
                    help="0 = the scene's own default density")
    ap.add_argument("--gof", type=int, default=32)
    ap.add_argument("--out", default="results/ladder_dense32.csv")
    ap.add_argument("--workdir", default="/tmp/ladder_big")
    ap.add_argument("--modes", default=",".join(MODES))
    args = ap.parse_args()
    modes = args.modes.split(",")

    from rabbit_transcoding_tpu.bitstream import V3CReader, V3CWriter
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

    os.makedirs(args.workdir, exist_ok=True)
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)

    t0 = time.time()
    kw = {"n": args.points} if args.points else {}
    sources = [SCENES[args.scene](i, **kw) for i in range(args.frames)]
    total_points = sum(s.point_count for s in sources)
    log(f"{args.scene}: {args.frames} frames, "
        f"{sources[0].point_count}..{sources[-1].point_count} pts/frame "
        f"({time.time() - t0:.0f}s)")

    tag = f"{args.scene}_{args.frames}f_{args.gof}g{args.points or 'def'}"
    hq_path = os.path.join(args.workdir, f"hq_{tag}.bin")
    if os.path.exists(hq_path):
        hq = open(hq_path, "rb").read()
        log(f"hq encode cached: {hq_path} ({len(hq)} bytes)")
    else:
        t1 = time.time()
        enc = Encoder(EncoderParameters(
            minimumImageWidth=1024, minimumImageHeight=256,
            geometryQP=8, attributeQP=12, occupancyPrecision=2,
            frameCount=args.frames, groupOfFramesSize=args.gof,
        ))
        from rabbit_transcoding_tpu.core.gof import GroupOfFrames

        context, _ = enc.encode(GroupOfFrames(sources))
        writer = V3CWriter()
        hq = writer.write(writer.encode(context))
        tmp = hq_path + ".part"
        with open(tmp, "wb") as f:
            f.write(hq)
        os.replace(tmp, hq_path)
        log(f"hq encode: {len(hq)} bytes in {time.time() - t1:.0f}s")

    done = set()
    if os.path.exists(args.out):
        for line in open(args.out):
            parts = line.strip().split(";")
            if len(parts) >= 3 and parts[1] in RATES:
                done.add((parts[1], parts[2]))
        log(f"resume: {len(done)} cells already in {args.out}")
    else:
        with open(args.out, "w") as f:
            f.write(HEADER + "\n")

    reader, writer = V3CReader(), V3CWriter()
    mparams = MetricsParams(resolution=1023)
    for rate, (gqp, aqp, occ) in RATES.items():
        for mode in modes:
            if (rate, mode) in done:
                continue
            t1 = time.time()
            tc = Transcoder(TranscoderParameters(
                geometryQP=gqp, attributeQP=aqp, occupancyPrecision=occ,
                mode=mode, computeHashSei=False,
            ))
            ctx = reader.decode(reader.read(hq)[0])
            tc.transcode(ctx)
            out = writer.write(writer.encode(ctx))
            clouds = Decoder().decode(reader.decode(reader.read(out)[0]))
            _, m = compute_sequence_metrics(sources, clouds, mparams)
            cell_s = time.time() - t1
            row = (f"{args.scene};{rate};{mode};{len(out)};"
                   f"{8 * len(out) / total_points:.4f};{m.d1_psnr:.4f};"
                   f"{m.d2_psnr:.4f};{m.color_psnr[0]:.4f};{cell_s:.0f}")
            with open(args.out, "a") as f:
                f.write(row + "\n")
            log(f"  {rate}/{mode}: D1 {m.d1_psnr:.3f} dB, "
                f"{len(out)} B, {cell_s:.0f}s")

    # delta summary (reencode is the in-family anchor); bars: auto D1
    # delta <= 0.05 dB AND Y delta <= 0.1 dB (round-4 verdict task 6)
    rows = {}
    yrows = {}
    for line in open(args.out):
        parts = line.strip().split(";")
        if len(parts) >= 8 and parts[1] in RATES:
            rows[(parts[1], parts[2])] = float(parts[5])
            yrows[(parts[1], parts[2])] = float(parts[7])
    print("scene;rate;d1_reencode;d1_requant;d1_delta;d1_auto;d1_delta_auto"
          ";y_reencode;y_requant;y_delta;y_auto;y_delta_auto")
    nan = float("nan")
    for rate in RATES:
        base = rows.get((rate, "reencode"))
        rq = rows.get((rate, "requant"))
        au = rows.get((rate, "auto"))
        if base is None:
            continue
        ybase = yrows[(rate, "reencode")]
        yrq = yrows.get((rate, "requant"))
        yau = yrows.get((rate, "auto"))
        print(f"{args.scene};{rate};{base:.4f};"
              f"{rq if rq is not None else nan:.4f};"
              f"{(base - rq) if rq is not None else nan:+.4f};"
              f"{au if au is not None else nan:.4f};"
              f"{(base - au) if au is not None else nan:+.4f};"
              f"{ybase:.4f};"
              f"{yrq if yrq is not None else nan:.4f};"
              f"{(ybase - yrq) if yrq is not None else nan:+.4f};"
              f"{yau if yau is not None else nan:.4f};"
              f"{(ybase - yau) if yau is not None else nan:+.4f}",
              flush=True)
    log(f"total {time.time() - t0:.0f}s")
    return 0


if __name__ == "__main__":
    sys.exit(main())
