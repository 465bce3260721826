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


# external app backends (PCCCodecId JMAPP/HMAPP/SHMAPP/FFMPEG analog,
# PCCCommon.h:93-116): (default binary name, env override, template names).
# Binary resolution order: RABBIT_<ID>_{ENCODER,DECODER} env var, then PATH.
_EXTERNAL_APPS = {
    CodecId.HM_APP: ("TAppEncoder", "TAppDecoder",
                     "HM_ENCODER_TEMPLATE", "HM_DECODER_TEMPLATE"),
    CodecId.JM_APP: ("lencod", "ldecod",
                     "JM_ENCODER_TEMPLATE", "JM_DECODER_TEMPLATE"),
    CodecId.SHM_APP: ("TAppEncoderSHM", "TAppDecoderSHM",
                      "SHM_ENCODER_TEMPLATE", "SHM_DECODER_TEMPLATE"),
    CodecId.VTM_APP: ("EncoderApp", "DecoderApp",
                      "VTM_ENCODER_TEMPLATE", "VTM_DECODER_TEMPLATE"),
}

FFMPEG_ENCODER_TEMPLATE = (
    "{binary} -y -f rawvideo -pix_fmt yuv420p -s {width}x{height}"
    " -i {input} -c:v libx265 -x265-params qp={qp} {output}"
)
FFMPEG_DECODER_TEMPLATE = (
    "{binary} -y -i {input} -f rawvideo -pix_fmt yuv420p {output}"
)


def _resolve_binary(codec_id: CodecId, name: str, role: str) -> str:
    import os

    env = os.environ.get(f"RABBIT_{codec_id.name}_{role}")
    binary = env or shutil.which(name)
    if binary is None:
        raise RuntimeError(
            f"codec {codec_id.name} requested but no {name} binary on PATH "
            f"(set RABBIT_{codec_id.name}_{role} to override)"
        )
    return binary


class VideoEncoder:
    def encode(self, video: Video, params: VideoEncoderParams) -> tuple[bytes, Video]:
        """Returns (payload bytes, reconstructed video as a decoder sees it)."""
        raise NotImplementedError

    @staticmethod
    def create(codec_id: CodecId) -> "VideoEncoder":
        if codec_id in (CodecId.RBV, CodecId.RBV_LOSSLESS):
            return RbvVideoEncoder(force_lossless=codec_id == CodecId.RBV_LOSSLESS)
        if codec_id in _EXTERNAL_APPS:
            from . import external
            from .external import ExternalVideoEncoder

            name, _, tmpl, _ = _EXTERNAL_APPS[codec_id]
            binary = _resolve_binary(codec_id, name, "ENCODER")
            return ExternalVideoEncoder(binary, getattr(external, tmpl))
        if codec_id == CodecId.FFMPEG_APP:
            from .external import ExternalVideoEncoder

            binary = _resolve_binary(codec_id, "ffmpeg", "ENCODER")
            return ExternalVideoEncoder(binary, FFMPEG_ENCODER_TEMPLATE)
        raise ValueError(f"unsupported codec id {codec_id}")


class VideoDecoder:
    def decode(self, payload: bytes, output_bitdepth: int | None = None) -> Video:
        raise NotImplementedError

    @staticmethod
    def create(codec_id: CodecId) -> "VideoDecoder":
        if codec_id in (CodecId.RBV, CodecId.RBV_LOSSLESS):
            return RbvVideoDecoder()
        if codec_id in _EXTERNAL_APPS:
            from . import external
            from .external import ExternalVideoDecoder

            _, name, _, tmpl = _EXTERNAL_APPS[codec_id]
            binary = _resolve_binary(codec_id, name, "DECODER")
            return ExternalVideoDecoder(binary, getattr(external, tmpl))
        if codec_id == CodecId.FFMPEG_APP:
            from .external import ExternalVideoDecoder

            binary = _resolve_binary(codec_id, "ffmpeg", "DECODER")
            return ExternalVideoDecoder(binary, FFMPEG_DECODER_TEMPLATE)
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
