"""External codec shell-out plumbing, tested with mock binaries.

No HM/ffmpeg exists in this environment, so the template/file-IPC path
(the reference's PCCHMAppVideoEncoder.cpp:60-69 pattern) is validated with
/bin/sh fake codecs: a 'store-raw' encoder whose decode is the identity,
plus failure-path binaries."""

import os
import stat

import numpy as np
import pytest

from rabbit_transcoding_tpu.core.image import Video
from rabbit_transcoding_tpu.utils.enums import ColorFormat
from rabbit_transcoding_tpu.video.base import VideoEncoderParams
from rabbit_transcoding_tpu.video.external import (
    ExternalVideoDecoder,
    ExternalVideoEncoder,
)


def _script(path: str, body: str) -> str:
    with open(path, "w") as f:
        f.write("#!/bin/sh\n" + body)
    os.chmod(path, os.stat(path).st_mode | stat.S_IEXEC)
    return path


@pytest.fixture()
def fake_codec(tmp_path):
    """A 'codec' that stores the raw YUV as the bitstream: encoder copies
    input->output and input->recon; decoder copies back."""
    enc = _script(
        str(tmp_path / "fakeenc.sh"),
        'in=""; out=""; rec=""\n'
        'while [ $# -gt 0 ]; do\n'
        '  case "$1" in\n'
        '    -i) in="$2"; shift 2;;\n'
        '    -b) out="$2"; shift 2;;\n'
        '    -o) rec="$2"; shift 2;;\n'
        '    *) shift;;\n'
        '  esac\n'
        'done\n'
        'cp "$in" "$out" && cp "$in" "$rec"\n',
    )
    dec = _script(
        str(tmp_path / "fakedec.sh"),
        'in=""; out=""\n'
        'while [ $# -gt 0 ]; do\n'
        '  case "$1" in\n'
        '    -b) in="$2"; shift 2;;\n'
        '    -o) out="$2"; shift 2;;\n'
        '    *) shift;;\n'
        '  esac\n'
        'done\n'
        'cp "$in" "$out"\n',
    )
    return enc, dec


def _video(frames=2, w=16, h=8):
    rng = np.random.default_rng(0)
    y = rng.integers(0, 256, size=(frames, h, w)).astype(np.uint8)
    u = rng.integers(0, 256, size=(frames, h // 2, w // 2)).astype(np.uint8)
    v = rng.integers(0, 256, size=(frames, h // 2, w // 2)).astype(np.uint8)
    return Video(w, h, 8, ColorFormat.YUV420, [y, u, v])


class TestExternalCodecPlumbing:
    def test_encode_decode_roundtrip(self, fake_codec):
        enc_bin, dec_bin = fake_codec
        video = _video()
        payload, recon = ExternalVideoEncoder(enc_bin).encode(
            video, VideoEncoderParams(qp=32)
        )
        # the fake 'bitstream' is the raw planar YUV
        assert len(payload) == sum(p.nbytes for p in video.planes)
        # recon was read back through the file IPC
        np.testing.assert_array_equal(recon.planes[0], video.planes[0])

        dec = ExternalVideoDecoder(
            dec_bin, width=video.width, height=video.height,
            frames=video.frame_count, bitdepth=8, fmt=ColorFormat.YUV420,
        )
        out = dec.decode(payload)
        for a, b in zip(out.planes, video.planes):
            np.testing.assert_array_equal(a, b)

    def test_template_placeholders_expanded(self, fake_codec, tmp_path):
        """All template placeholders reach the binary's argv."""
        log = str(tmp_path / "argv.txt")
        spy = _script(
            str(tmp_path / "spy.sh"),
            f'echo "$@" > {log}\n'
            'in=""; out=""; rec=""\n'
            'while [ $# -gt 0 ]; do\n'
            '  case "$1" in\n'
            '    -i) in="$2"; shift 2;;\n'
            '    -b) out="$2"; shift 2;;\n'
            '    -o) rec="$2"; shift 2;;\n'
            '    *) shift;;\n'
            '  esac\n'
            'done\n'
            'cp "$in" "$out" && cp "$in" "$rec"\n',
        )
        video = _video(frames=3, w=32, h=16)
        ExternalVideoEncoder(spy).encode(video, VideoEncoderParams(qp=27))
        argv = open(log).read()
        for token in ["-wdt 32", "-hgt 16", "-f 3", "-q 27",
                      "--InputBitDepth=8", "--InputChromaFormat=420"]:
            assert token in argv, f"missing {token!r} in {argv!r}"

    def test_encoder_failure_raises(self, tmp_path):
        bad = _script(str(tmp_path / "bad.sh"), "echo boom >&2; exit 3\n")
        with pytest.raises(RuntimeError, match="external encoder failed"):
            ExternalVideoEncoder(bad).encode(
                _video(), VideoEncoderParams(qp=32)
            )

    def test_encoder_missing_output_raises(self, tmp_path):
        noout = _script(str(tmp_path / "noout.sh"), "exit 0\n")
        with pytest.raises(RuntimeError, match="external encoder failed"):
            ExternalVideoEncoder(noout).encode(
                _video(), VideoEncoderParams(qp=32)
            )

    def test_decoder_failure_raises(self, tmp_path):
        bad = _script(str(tmp_path / "bad.sh"), "exit 1\n")
        dec = ExternalVideoDecoder(bad, width=16, height=8, frames=1)
        with pytest.raises(RuntimeError, match="external decoder failed"):
            dec.decode(b"xx")

    def test_custom_template(self, fake_codec, tmp_path):
        """encoderCommand-style template override (cfg cascade hook)."""
        enc_bin, _ = fake_codec
        payload, _ = ExternalVideoEncoder(
            enc_bin,
            template="{binary} -i {input} -b {output} -o {recon}",
        ).encode(_video(), VideoEncoderParams(qp=32))
        assert payload


class TestExternalFactory:
    """Factory resolution for the full app-codec family (reference
    PCCCodecId JMAPP/HMAPP/SHMAPP/VTM, PCCCommon.h:93-116) via
    RABBIT_<ID>_{ENCODER,DECODER} env overrides, with mock binaries."""

    def _kv_codec(self, tmp_path):
        """JM-style fake (key=value args after -p): store-raw."""
        enc = _script(
            str(tmp_path / "lencod.sh"),
            'in=""; out=""; rec=""\n'
            'for a in "$@"; do\n'
            '  case "$a" in\n'
            '    InputFile=*) in="${a#*=}";;\n'
            '    OutputFile=*) out="${a#*=}";;\n'
            '    ReconFile=*) rec="${a#*=}";;\n'
            '  esac\n'
            'done\n'
            'cp "$in" "$out"; [ -n "$rec" ] && cp "$in" "$rec" || true\n',
        )
        dec = _script(
            str(tmp_path / "ldecod.sh"),
            'in=""; out=""\n'
            'for a in "$@"; do\n'
            '  case "$a" in\n'
            '    InputFile=*) in="${a#*=}";;\n'
            '    OutputFile=*) out="${a#*=}";;\n'
            '  esac\n'
            'done\n'
            'cp "$in" "$out"\n',
        )
        return enc, dec

    def _flag_codec(self, tmp_path):
        """HM/SHM/VTM-style fake (-i/-i0/-b/-o/-o0 flag pairs): store-raw."""
        enc = _script(
            str(tmp_path / "appenc.sh"),
            'in=""; out=""; rec=""\n'
            'while [ $# -gt 0 ]; do\n'
            '  case "$1" in\n'
            '    -i|-i0) in="$2"; shift 2;;\n'
            '    -b) out="$2"; shift 2;;\n'
            '    -o|-o0) rec="$2"; shift 2;;\n'
            '    *) shift;;\n'
            '  esac\n'
            'done\n'
            'cp "$in" "$out" && cp "$in" "$rec"\n',
        )
        dec = _script(
            str(tmp_path / "appdec.sh"),
            'in=""; out=""\n'
            'while [ $# -gt 0 ]; do\n'
            '  case "$1" in\n'
            '    -b) in="$2"; shift 2;;\n'
            '    -o|-o0) out="$2"; shift 2;;\n'
            '    *) shift;;\n'
            '  esac\n'
            'done\n'
            'cp "$in" "$out"\n',
        )
        return enc, dec

    @pytest.mark.parametrize("codec_name,style", [
        ("JM_APP", "kv"), ("SHM_APP", "flag"), ("VTM_APP", "flag"),
        ("HM_APP", "flag"),
    ])
    def test_factory_roundtrip(self, tmp_path, monkeypatch, codec_name, style):
        from rabbit_transcoding_tpu.utils.enums import CodecId
        from rabbit_transcoding_tpu.video.base import (
            VideoDecoder,
            VideoEncoder,
        )

        enc_bin, dec_bin = (
            self._kv_codec(tmp_path) if style == "kv"
            else self._flag_codec(tmp_path)
        )
        monkeypatch.setenv(f"RABBIT_{codec_name}_ENCODER", enc_bin)
        monkeypatch.setenv(f"RABBIT_{codec_name}_DECODER", dec_bin)
        cid = CodecId[codec_name]
        video = _video()
        payload, recon = VideoEncoder.create(cid).encode(
            video, VideoEncoderParams(qp=30)
        )
        assert len(payload) > 0
        for a, b in zip(recon.planes, video.planes):
            np.testing.assert_array_equal(a, b)
        dec = VideoDecoder.create(cid)
        dec.width, dec.height, dec.frames = video.width, video.height, 2
        out = dec.decode(payload)
        for a, b in zip(out.planes, video.planes):
            np.testing.assert_array_equal(a, b)

    @pytest.mark.parametrize("codec_name", ["JM_APP", "SHM_APP", "VTM_APP"])
    def test_factory_missing_binary_raises(self, monkeypatch, codec_name):
        from rabbit_transcoding_tpu.utils.enums import CodecId
        from rabbit_transcoding_tpu.video.base import VideoEncoder

        monkeypatch.delenv(f"RABBIT_{codec_name}_ENCODER", raising=False)
        monkeypatch.setenv("PATH", "/nonexistent")
        with pytest.raises(RuntimeError, match="binary on PATH"):
            VideoEncoder.create(CodecId[codec_name])


class TestHdrToolsConverter:
    """External HDRConvert wrapper (PCCHDRToolsAppColorConverter analog)
    with a mock binary + real cfg-key parsing."""

    def test_identity_conversion(self, tmp_path, monkeypatch):
        from rabbit_transcoding_tpu.video.hdrtools import (
            ExternalColorConverter,
        )

        binary = _script(
            str(tmp_path / "HDRConvert.sh"),
            'in=""; out=""\n'
            'for a in "$@"; do\n'
            '  case "$a" in\n'
            '    SourceFile=*) in="${a#*=}";;\n'
            '    OutputFile=*) out="${a#*=}";;\n'
            '  esac\n'
            'done\n'
            'cp "$in" "$out"\n',
        )
        cfg = tmp_path / "conv.cfg"
        cfg.write_text(
            "SourceBitDepthCmp0: 8\nSourceChromaFormat: 1\n"
            "SourceColorSpace: 0\nOutputBitDepthCmp0: 8\n"
            "OutputChromaFormat: 1\nOutputColorSpace: 0\n"
        )
        conv = ExternalColorConverter(binary, str(cfg))
        from rabbit_transcoding_tpu.utils.enums import ColorFormat

        assert conv.src_format == ColorFormat.YUV420
        assert conv.out_format == ColorFormat.YUV420
        video = _video()
        out = conv.convert(video)
        for a, b in zip(out.planes, video.planes):
            np.testing.assert_array_equal(a, b)

    def test_cfg_output_format_parsing(self, tmp_path):
        from rabbit_transcoding_tpu.utils.enums import ColorFormat
        from rabbit_transcoding_tpu.video.hdrtools import (
            ExternalColorConverter,
        )

        cfg = tmp_path / "conv.cfg"
        cfg.write_text(
            "SourceBitDepthCmp0: 8\nSourceChromaFormat: 1\n"
            "SourceColorSpace: 0\nOutputBitDepthCmp0: 10\n"
            "OutputChromaFormat: 3\nOutputColorSpace: 1\n"
        )
        conv = ExternalColorConverter("/bin/true", str(cfg))
        assert conv.out_format == ColorFormat.RGB444
        assert conv.out_bitdepth == 10

    def test_find_hdrconvert_env(self, monkeypatch):
        from rabbit_transcoding_tpu.video.hdrtools import find_hdrconvert

        monkeypatch.setenv("RABBIT_HDRCONVERT_BIN", "/x/HDRConvert")
        assert find_hdrconvert() == "/x/HDRConvert"
