"""rabbit-decode — the PccAppDecoder analog.

Parity with PccAppDecoder.cpp:276-375: parse -> per-atlas decode -> write
PLYs, optional metrics vs the source sequence, hash-SEI self check, per-stage
timings into timings_decoder.txt.
"""

from __future__ import annotations

import os
import sys

from ..bitstream import V3CReader
from ..codec.hash import verify_hash_sei
from ..codec.patch_frame import decode_patch_frames
from ..core.gof import GroupOfFrames
from ..decoder.decoder import Decoder, DecoderParameters
from ..metrics.metrics import MetricsParams, compute_sequence_metrics
from ..utils.timing import Stopwatch, print_run_footer
from .common import build_registry, parse_or_help


def main(argv=None) -> int:
    argv = sys.argv[1:] if argv is None else argv
    params = DecoderParameters()
    reg = build_registry(
        params,
        extra={
            "uncompressedDataFolder": ("", "base folder for the source PLYs"),
            "resolution": (1023, "geometry PSNR peak resolution"),
            "nbThread": (0, "thread count (0 = auto)"),
            "trace": (False, "write dec_* conformance trace logs"),
            "profileDir": ("", "write a JAX profiler trace to this directory"),
        },
    )
    if parse_or_help(reg, argv, params, "rabbit-decode") is None:
        return 0
    if not params.compressedStreamPath:
        print("error: --compressedStreamPath is required", file=sys.stderr)
        return 1

    profiler_cm = None
    if reg["profileDir"]:
        import jax

        profiler_cm = jax.profiler.trace(reg["profileDir"])
        profiler_cm.__enter__()

    sw = Stopwatch()
    sw.start()
    reader = V3CReader()
    gofs = reader.read_file(params.compressedStreamPath)
    decoder = Decoder(params)
    tracer = None
    if reg["trace"]:
        from ..utils.tracing import TraceCategory, Tracer

        tracer = Tracer(prefix="dec_").enable(*TraceCategory)
    all_clouds = []
    frame0 = params.startFrameNumber
    for gof in gofs:
        context = reader.decode(gof)
        for atlas in context.atlases:
            ok, sei = verify_hash_sei(
                atlas, decode_patch_frames(atlas)
            )
            if sei is not None:
                print(f"hash SEI check: {'OK' if ok else 'MISMATCH'}")
                if not ok:
                    print("error: decoded atlas hash mismatch", file=sys.stderr)
            clouds = decoder.decode(context, atlas.atlas_id)
            if tracer is not None:
                from ..codec.trace import emit_conformance_traces

                emit_conformance_traces(
                    tracer, atlas, decode_patch_frames(atlas), clouds
                )
            all_clouds.extend(clouds)
    if params.reconstructedDataPath:
        GroupOfFrames(all_clouds).write(params.reconstructedDataPath, frame0)
    if params.computeChecksum:
        for i, ps in enumerate(all_clouds):
            print(f"checksum frame {frame0 + i}: {ps.compute_checksum().hex()}")
    sw.stop()

    if params.computeMetrics and params.uncompressedDataPath:
        template = os.path.join(
            reg["uncompressedDataFolder"], params.uncompressedDataPath
        )
        sources = GroupOfFrames.load(template, frame0, len(all_clouds))
        _, summary = compute_sequence_metrics(
            list(sources), all_clouds, MetricsParams(resolution=reg["resolution"])
        )
        print(summary.print())

    if tracer is not None:
        tracer.close()
    if profiler_cm is not None:
        profiler_cm.__exit__(None, None, None)
        print(f"profiler trace written to {reg['profileDir']}")
    decoder.timer.write("timings_decoder.txt")
    print(decoder.timer.report())
    print_run_footer("rabbit-decode", sw)
    return 0


if __name__ == "__main__":
    sys.exit(main())
