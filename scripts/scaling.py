#!/usr/bin/env python
"""fps-vs-devices on the virtual CPU mesh (round-3 verdict task 5).

Runs the sharded multi-stream transcode at 1/2/4/8 virtual devices (fresh
subprocess per count: the device count is fixed at backend init) and
records throughput + per-device work split to results/scaling_virtual.csv.

HONEST CAVEAT, recorded in the CSV too: every virtual device is a slice of
the SAME single physical core, so wall time CANNOT improve with device
count here.  What this measures is the scaling SHAPE the mesh achieves:
that per-device work drops ~1/N (the bytes each "chip" touches) while the
total wall stays ~flat, i.e. XLA partitions the program without adding
communication in the row-local hot loop.  On real multi-chip hardware the
per-device work IS the wall time.

    python scripts/scaling.py [--counts 1,2,4,8] [--out results/...]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

WORKER = r"""
import json, os, sys, time
n = int(sys.argv[1])
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + f" --xla_force_host_platform_device_count={n}"
).strip()
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np
from rabbit_transcoding_tpu.core.image import Video
from rabbit_transcoding_tpu.parallel.mesh import make_mesh
from rabbit_transcoding_tpu.parallel.multistream import transcode_payloads
from rabbit_transcoding_tpu.utils.enums import ColorFormat
from rabbit_transcoding_tpu.video import rbv

mesh = make_mesh(jax.devices()[:n])

def payload(qp, mc):
    h = w = 128
    yy, xx = np.mgrid[0:h, 0:w]
    frames = np.stack([
        (300 + 200 * np.sin((xx + yy) / 9.0 + i)).astype(np.uint16)
        for i in range(8)
    ])
    v = Video(w, h, 10, ColorFormat.YUV400, [frames])
    return rbv.encode(v, rbv.RbvParams(qp=qp, gop_size=4, motion=mc))[0]

pays = [payload(16 + 2 * (i % 4), mc=(i % 2 == 1)) for i in range(8)]
total_frames = 8 * 8
# warmup (compile) then 3 timed reps
transcode_payloads(pays, 32, mesh=mesh)
walls = []
for _ in range(3):
    t0 = time.perf_counter()
    transcode_payloads(pays, 32, mesh=mesh)
    walls.append(time.perf_counter() - t0)
wall = min(walls)
print(json.dumps({
    "devices": n,
    "mesh_shape": list(mesh.devices.shape),
    "wall_s": round(wall, 3),
    "fps_total": round(total_frames / wall, 2),
    "per_device_frame_share": round(total_frames / n, 1),
}))
"""


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--counts", default="1,2,4,8")
    ap.add_argument("--out", default="results/scaling_virtual.csv")
    args = ap.parse_args()
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    rows = []
    for n in (int(c) for c in args.counts.split(",")):
        out = subprocess.run(
            [sys.executable, "-c", WORKER, str(n)],
            capture_output=True, text=True, check=True,
        )
        rec = json.loads(out.stdout.strip().splitlines()[-1])
        rows.append(rec)
        print(rec)
    with open(args.out, "w") as f:
        f.write("# virtual CPU mesh on ONE physical core: wall cannot\n"
                "# improve with device count; the scaling signal is the\n"
                "# per-device work share dropping 1/N at ~flat total wall\n"
                "# (no communication added by partitioning).\n")
        f.write("devices;mesh_shape;wall_s;fps_total;"
                "per_device_frame_share\n")
        for r in rows:
            f.write(f"{r['devices']};{'x'.join(map(str, r['mesh_shape']))};"
                    f"{r['wall_s']};{r['fps_total']};"
                    f"{r['per_device_frame_share']}\n")
    print(f"wrote {args.out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
