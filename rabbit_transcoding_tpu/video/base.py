"""Virtual video codec factory.

Capability parity with PCCVirtualVideoEncoder/Decoder (/root/reference/source/
lib/PccLibVideoEncoder/include/PCCVirtualVideoEncoder.h:42-76,
PccLibVideoDecoder/include/PCCVirtualVideoDecoder.h:43-55): pipelines request
a codec by ``CodecId`` and get a uniform encode/decode interface.  The
primary backend is RBV (TPU-native); external app backends (HM TAppEncoder /
ffmpeg) plug in behind the same interface when their binaries exist on the
host — mirroring the reference's *APP codec modes which shell out
(PCCHMAppVideoEncoder.cpp:60-69).
"""

from __future__ import annotations

import dataclasses
import shutil

from ..core.image import Video
from ..utils.enums import CodecId
from . import rbv


@dataclasses.dataclass
class VideoEncoderParams:
    """Uniform encoder knobs (PCCVideoEncoderParameters analog,
    PCCVirtualVideoEncoder.h:42-64)."""

    qp: int = 32
    input_bitdepth: int = 8
    internal_bitdepth: int = 8
    output_bitdepth: int = 8
    gop_size: int = 2
    all_intra: bool = False
    lossless: bool = False
    block_size: int = 16
    motion: bool = False   # motion-compensated P frames
    # reserved for external backends
    config_path: str = ""
    extra_args: str = ""


class VideoEncoder:
    def encode(self, video: Video, params: VideoEncoderParams) -> tuple[bytes, Video]:
        """Returns (payload bytes, reconstructed video as a decoder sees it)."""
        raise NotImplementedError

    @staticmethod
    def create(codec_id: CodecId) -> "VideoEncoder":
        if codec_id in (CodecId.RBV, CodecId.RBV_LOSSLESS):
            return RbvVideoEncoder(force_lossless=codec_id == CodecId.RBV_LOSSLESS)
        if codec_id == CodecId.HM_APP:
            binary = shutil.which("TAppEncoder")
            if binary is None:
                raise RuntimeError(
                    "codec HM_APP requested but no TAppEncoder binary on PATH"
                )
            from .external import ExternalVideoEncoder

            return ExternalVideoEncoder(binary)
        if codec_id == CodecId.FFMPEG_APP:
            binary = shutil.which("ffmpeg")
            if binary is None:
                raise RuntimeError(
                    "codec FFMPEG_APP requested but no ffmpeg binary on PATH"
                )
            from .external import ExternalVideoEncoder, HM_ENCODER_TEMPLATE

            template = (
                "{binary} -y -f rawvideo -pix_fmt yuv420p -s {width}x{height}"
                " -i {input} -c:v libx265 -x265-params qp={qp} {output}"
            )
            return ExternalVideoEncoder(binary, template)
        raise ValueError(f"unsupported codec id {codec_id}")


class VideoDecoder:
    def decode(self, payload: bytes, output_bitdepth: int | None = None) -> Video:
        raise NotImplementedError

    @staticmethod
    def create(codec_id: CodecId) -> "VideoDecoder":
        if codec_id in (CodecId.RBV, CodecId.RBV_LOSSLESS):
            return RbvVideoDecoder()
        raise ValueError(f"unsupported codec id {codec_id}")


class RbvVideoEncoder(VideoEncoder):
    def __init__(self, force_lossless: bool = False) -> None:
        self.force_lossless = force_lossless

    def encode(self, video: Video, params: VideoEncoderParams) -> tuple[bytes, Video]:
        rp = rbv.RbvParams(
            qp=params.qp,
            block_size=params.block_size,
            gop_size=1 if params.all_intra else params.gop_size,
            lossless=params.lossless or self.force_lossless,
            motion=params.motion and not params.all_intra,
        )
        return rbv.encode(video, rp)


class RbvVideoDecoder(VideoDecoder):
    def decode(self, payload: bytes, output_bitdepth: int | None = None) -> Video:
        video = rbv.decode(payload)
        if output_bitdepth is not None and output_bitdepth != video.bitdepth:
            video = video.convert_bitdepth(output_bitdepth)
        return video
