"""rabbit-normals — PccAppNormalGenerator analog: estimate per-point normals
for a PLY sequence and write '*_n.ply' companions used by D2 metrics."""

from __future__ import annotations

import dataclasses
import sys

from ..core.gof import GroupOfFrames
from ..encoder.normals import compute_normals
from .common import build_registry, parse_or_help


@dataclasses.dataclass
class NormalsParams:
    uncompressedDataPath: str = ""
    outputDataPath: str = ""     # default: input with _n suffix
    startFrameNumber: int = 0
    frameCount: int = 1
    knnCount: int = 16


def main(argv=None) -> int:
    argv = sys.argv[1:] if argv is None else argv
    params = NormalsParams()
    reg = build_registry(params)
    if parse_or_help(reg, argv, params, "rabbit-normals") is None:
        return 0
    if not params.uncompressedDataPath:
        print("error: --uncompressedDataPath is required", file=sys.stderr)
        return 1
    out_tpl = params.outputDataPath or params.uncompressedDataPath.replace(
        ".ply", "_n.ply"
    )
    gof = GroupOfFrames.load(
        params.uncompressedDataPath, params.startFrameNumber, params.frameCount
    )
    for i, ps in enumerate(gof):
        normals, _ = compute_normals(
            ps.positions.astype("float32"), k=params.knnCount
        )
        ps.normals = normals
        ps.write_ply(out_tpl % (params.startFrameNumber + i))
        print(f"frame {params.startFrameNumber + i}: {ps.point_count} normals")
    return 0


if __name__ == "__main__":
    sys.exit(main())
