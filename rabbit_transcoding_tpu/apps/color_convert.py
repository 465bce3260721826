"""rabbit-color-convert — PccAppColorConverter analog: raw video color-space
and chroma-format conversion via the device color kernels."""

from __future__ import annotations

import dataclasses
import sys

import numpy as np
import jax.numpy as jnp

from ..core.image import Video
from ..ops.color import rgb8_to_yuv420, yuv420_to_rgb8
from ..utils.enums import ColorFormat
from .common import build_registry, parse_or_help


@dataclasses.dataclass
class ColorConvertParams:
    inPath: str = ""
    outPath: str = "out.raw"
    width: int = 0
    height: int = 0
    frameCount: int = 1
    inputBitDepth: int = 8
    conversion: str = "rgb444toyuv420"  # or yuv420torgb444
    # filter bank selection (ops/color: _DOWN_FILTERS / _UP_FILTERS —
    # the PCCInternalColorConverter g_filter tables)
    downsampleFilter: int = 1   # 0 DF_F0 | 1 DF_F1 | 2 DF_TM5 | 3 DF_FV
    upsampleFilter: int = 0     # 0 UF_F0 | 3 UF_LS3 | 4 UF_LS4 | 5 UF_TM


def main(argv=None) -> int:
    argv = sys.argv[1:] if argv is None else argv
    params = ColorConvertParams()
    reg = build_registry(params)
    if parse_or_help(reg, argv, params, "rabbit-color-convert") is None:
        return 0
    if not params.inPath or not params.width or not params.height:
        print("error: --inPath, --width, --height required", file=sys.stderr)
        return 1
    if params.conversion == "rgb444toyuv420":
        video = Video().read(
            params.inPath, params.width, params.height, params.frameCount,
            params.inputBitDepth, ColorFormat.RGB444,
        )
        rgb = np.stack(video.planes, axis=-1)
        y, u, v = rgb8_to_yuv420(
            jnp.asarray(rgb), down_filter=params.downsampleFilter
        )
        out = Video(params.width, params.height, 8, ColorFormat.YUV420,
                    [np.asarray(y), np.asarray(u), np.asarray(v)])
    elif params.conversion == "yuv420torgb444":
        video = Video().read(
            params.inPath, params.width, params.height, params.frameCount,
            params.inputBitDepth, ColorFormat.YUV420,
        )
        rgb = np.asarray(
            yuv420_to_rgb8(
                *[jnp.asarray(p) for p in video.planes],
                up_filter=params.upsampleFilter,
            )
        )
        out = Video(params.width, params.height, 8, ColorFormat.RGB444,
                    [rgb[..., 0], rgb[..., 1], rgb[..., 2]])
    else:
        print(f"error: unknown conversion {params.conversion}", file=sys.stderr)
        return 1
    out.write(params.outPath)
    print(f"{params.outPath}: {params.conversion} done "
          f"({out.frame_count} frames)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
