"""rabbit-stream — resumable live transcoding driver.

The GOF is the framework's natural checkpoint/batch unit (SURVEY.md §5.4:
each GOF is an independent context; the reference's only resilience is that
granularity, and its failure model is printf+exit, §5.3).  This driver makes
that explicit and robust:

 * completed GOFs append to the output immediately; a sidecar
   ``<out>.state.json`` records input identity (md5), parameters, and the
   completed-GOF count + output size;
 * ``--resume`` continues from the first unfinished GOF after a crash or
   restart (state and partial output are validated first);
 * ``--onError=skip`` drops a failing GOF and keeps the stream alive
   (``abort`` preserves reference behaviour);
 * multiple input streams (comma-separated) are transcoded concurrently —
   per-stream threads overlap host entropy with device compute
   (the BASELINE config-5 multi-stream mode).
"""

from __future__ import annotations

import concurrent.futures as cf
import dataclasses
import hashlib
import json
import os
import sys
import time

from ..bitstream import V3CReader, V3CWriter
from ..bitstream.v3c import sample_stream_header, write_sample_stream_units
from ..transcoder.params import TranscoderParameters
from ..transcoder.transcoder import Transcoder
from ..utils.timing import Stopwatch, print_run_footer
from .common import build_registry, parse_or_help


@dataclasses.dataclass
class StreamParams(TranscoderParameters):
    resume: bool = False
    onError: str = "abort"   # abort | skip
    # GOFs in flight: >1 overlaps host entropy of one GOF with device
    # compute of the next (GOFs are independent; writes stay ordered)
    pipelineDepth: int = 2


def _params_key(params: StreamParams) -> str:
    d = dataclasses.asdict(params)
    for k in ("compressedStreamPath", "outStreamPath", "resume"):
        d.pop(k, None)
    return hashlib.md5(json.dumps(d, sort_keys=True).encode()).hexdigest()


def _state_path(out_path: str) -> str:
    return out_path + ".state.json"


def transcode_stream(path_in: str, path_out: str, params: StreamParams) -> dict:
    """Transcode one stream GOF-by-GOF with checkpointed progress."""
    with open(path_in, "rb") as f:
        data = f.read()
    input_md5 = hashlib.md5(data).hexdigest()
    reader = V3CReader()
    gofs = reader.read(data)
    pkey = _params_key(params)

    done = 0
    mode = "wb"
    spath = _state_path(path_out)
    if params.resume and os.path.exists(spath):
        try:
            state = json.load(open(spath))
            if (
                state.get("input_md5") == input_md5
                and state.get("params") == pkey
                and os.path.exists(path_out)
                and os.path.getsize(path_out) == state.get("out_bytes", -1)
            ):
                done = state.get("gofs_done", 0)
                mode = "ab"
            else:
                print(f"{path_out}: stale state, restarting", file=sys.stderr)
        except (json.JSONDecodeError, OSError):
            print(f"{spath}: unreadable state, restarting", file=sys.stderr)

    transcoder = Transcoder(params)
    failures = []
    t0 = time.perf_counter()

    def write_state(done_now: int, out_bytes: int) -> None:
        # atomic replace so a crash mid-dump never leaves a torn sidecar
        tmp = spath + ".tmp"
        with open(tmp, "w") as sf:
            json.dump(
                {
                    "input": path_in,
                    "input_md5": input_md5,
                    "params": pkey,
                    "gofs_done": done_now,
                    "gofs_total": len(gofs),
                    "out_bytes": out_bytes,
                    "failures": failures,
                },
                sf,
            )
        os.replace(tmp, spath)

    def process(gi: int) -> bytes | None:
        context = reader.decode(gofs[gi])
        for atlas in list(context.atlases):
            transcoder.transcode(context, atlas.atlas_id)
        writer = V3CWriter()
        return write_sample_stream_units(writer.encode(context), 4)

    depth = max(1, params.pipelineDepth)
    with open(path_out, mode) as out_f:
        if mode == "wb":
            # one sample-stream header per FILE; GOFs append units only
            out_f.write(sample_stream_header(4))
        with cf.ThreadPoolExecutor(max_workers=depth) as ex:
            futures = {
                gi: ex.submit(process, gi) for gi in range(done, len(gofs))
            }
            for gi in range(done, len(gofs)):
                try:
                    blob = futures[gi].result()
                    out_f.write(blob)
                    out_f.flush()
                except Exception as e:  # per-GOF failure containment
                    if params.onError == "abort":
                        raise
                    failures.append({"gof": gi, "error": repr(e)})
                    print(f"{path_in} GOF {gi}: skipped ({e})",
                          file=sys.stderr)
                done = gi + 1
                # checkpoint AFTER each GOF's write+flush, not once at the
                # end: a mid-run crash must leave a state that --resume can
                # continue from (the documented contract)
                write_state(done, out_f.tell())
    return {
        "stream": path_in,
        "gofs": len(gofs),
        "failures": len(failures),
        "seconds": time.perf_counter() - t0,
        "out_bytes": os.path.getsize(path_out),
    }


def main(argv=None) -> int:
    argv = sys.argv[1:] if argv is None else argv
    params = StreamParams()
    reg = build_registry(params)
    if parse_or_help(reg, argv, params, "rabbit-stream") is None:
        return 0
    if not params.compressedStreamPath:
        print("error: --compressedStreamPath is required", file=sys.stderr)
        return 1
    inputs = [p for p in params.compressedStreamPath.split(",") if p]
    outputs = (
        [p for p in params.outStreamPath.split(",") if p]
        if "," in params.outStreamPath
        else [
            params.outStreamPath
            if len(inputs) == 1
            else f"{os.path.splitext(params.outStreamPath)[0]}_{i}.bin"
            for i in range(len(inputs))
        ]
    )
    if len(outputs) != len(inputs):
        print("error: input/output stream count mismatch", file=sys.stderr)
        return 1

    sw = Stopwatch()
    sw.start()
    results = []
    if len(inputs) == 1:
        results.append(transcode_stream(inputs[0], outputs[0], params))
    else:
        # concurrent streams: threads overlap host entropy with device work
        with cf.ThreadPoolExecutor(max_workers=len(inputs)) as ex:
            futures = [
                ex.submit(transcode_stream, i, o, params)
                for i, o in zip(inputs, outputs)
            ]
            for fu in futures:
                results.append(fu.result())
    sw.stop()
    total_failures = sum(r["failures"] for r in results)
    for r in results:
        print(
            f"{r['stream']}: {r['gofs']} GOFs -> {r['out_bytes']} bytes "
            f"in {r['seconds']:.2f}s ({r['failures']} failures)"
        )
    print_run_footer("rabbit-stream", sw)
    return 0 if total_failures == 0 else 2


if __name__ == "__main__":
    sys.exit(main())
