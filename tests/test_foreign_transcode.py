"""Foreign-codec (baseline) transcode route, e2e with mock binaries.

The reference's headline capability is re-encoding HEVC sub-streams of a
V3C bitstream (PCCTranscoder::transcodeBaseline, PCCTranscoder.cpp:170-336).
No codec binary exists in this environment, so the route runs against
tests/mock_hevc.py — a stand-in codec whose streams are genuine Annex-B
(valid SPS + escaped payload NAL) behind the HM CLI conventions.
"""

import os
import stat
import sys

import numpy as np
import pytest

import mock_hevc
from rabbit_transcoding_tpu.bitstream import V3CReader, V3CWriter, VideoBitstream
from rabbit_transcoding_tpu.bitstream.hls import Context
from rabbit_transcoding_tpu.bitstream.syntax import (
    AtlasFrameParameterSetRbsp,
    AtlasSequenceParameterSetRbsp,
    V3CParameterSet,
)
from rabbit_transcoding_tpu.core.image import Video
from rabbit_transcoding_tpu.transcoder.params import TranscoderParameters
from rabbit_transcoding_tpu.transcoder.transcoder import Transcoder
from rabbit_transcoding_tpu.utils.enums import ColorFormat, VideoType
from rabbit_transcoding_tpu.video.hevc_probe import probe_hevc

MOCK = os.path.join(os.path.dirname(os.path.abspath(__file__)), "mock_hevc.py")


@pytest.fixture()
def mock_bins(tmp_path):
    """Encoder/decoder wrapper scripts over tests/mock_hevc.py."""
    enc = tmp_path / "TAppEncoder.sh"
    enc.write_text(f'#!/bin/sh\nexec "{sys.executable}" "{MOCK}" encode "$@"\n')
    dec = tmp_path / "TAppDecoder.sh"
    dec.write_text(f'#!/bin/sh\nexec "{sys.executable}" "{MOCK}" decode "$@"\n')
    for p in (enc, dec):
        os.chmod(p, os.stat(p).st_mode | stat.S_IEXEC)
    return str(enc), str(dec)


def make_foreign_context(frames=2, width=64, height=64, occ_precision=2):
    """A V3C context whose occupancy/geometry/attribute sub-streams are
    mock-HEVC Annex-B payloads (a 'foreign' V-PCC stream)."""
    yy, xx = np.mgrid[0:height, 0:width]
    occ = np.stack([
        ((xx + yy + 8 * f) % 48 < 24).astype(np.uint8) * 255
        for f in range(frames)
    ])
    geo = np.stack([
        (300 + 120 * np.sin((xx + 5 * f) / 9.0) * np.cos(yy / 7.0)).astype(
            np.uint16
        )
        for f in range(frames)
    ])
    ay = np.stack([
        np.clip(128 + 90 * np.sin((xx + 3 * f) / 6.0), 0, 255).astype(np.uint8)
        for f in range(frames)
    ])
    au = np.full((frames, height // 2, width // 2), 128, np.uint8)

    occ_small = occ.reshape(
        frames, height // occ_precision, occ_precision,
        width // occ_precision, occ_precision,
    ).max(axis=(2, 4))
    occ_payload, _ = mock_hevc.encode(
        Video(width // occ_precision, height // occ_precision, 8,
              ColorFormat.YUV400, [occ_small]), qp=4,
    )
    geo_payload, _ = mock_hevc.encode(
        Video(width, height, 10, ColorFormat.YUV400, [geo]), qp=8,
    )
    attr_payload, _ = mock_hevc.encode(
        Video(width, height, 8, ColorFormat.YUV420, [ay, au, au.copy()]),
        qp=8,
    )
    context = Context()
    vps = V3CParameterSet()
    vps.atlas(0).vps_frame_width = width
    vps.atlas(0).vps_frame_height = height
    context.vps_list.append(vps)
    atlas = context.atlas(0)
    atlas.asps_list.append(AtlasSequenceParameterSetRbsp(
        asps_frame_width=width, asps_frame_height=height,
    ))
    atlas.afps_list.append(AtlasFrameParameterSetRbsp())
    atlas.set_video_bitstream(VideoBitstream(VideoType.OCCUPANCY, occ_payload))
    atlas.set_video_bitstream(VideoBitstream(VideoType.GEOMETRY, geo_payload))
    atlas.set_video_bitstream(VideoBitstream(VideoType.ATTRIBUTE, attr_payload))
    return context


def roundtrip(context):
    w = V3CWriter()
    data = w.write(w.encode(context))
    r = V3CReader()
    return data, r.decode(r.read(data)[0])


class TestForeignPassthrough:
    def test_unconfigured_passthrough_untouched(self, monkeypatch):
        """No external codec configured: foreign payloads pass through
        byte-identical (the pre-round-3 behavior, still the default)."""
        for role in ("ENCODER", "DECODER"):
            monkeypatch.delenv(f"RABBIT_HM_APP_{role}", raising=False)
        monkeypatch.setenv("PATH", "/nonexistent")
        context = make_foreign_context()
        before = {
            t: context.atlas(0).get_video_bitstream(t).data
            for t in (VideoType.OCCUPANCY, VideoType.GEOMETRY,
                      VideoType.ATTRIBUTE)
        }
        Transcoder(TranscoderParameters(
            geometryQP=32, attributeQP=40, occupancyPrecision=4,
            computeHashSei=False,
        )).transcode(context)
        for t, data in before.items():
            assert context.atlas(0).get_video_bitstream(t).data == data


class TestForeignReencode:
    def _params(self, enc, dec, **kw):
        return TranscoderParameters(
            geometryQP=32, attributeQP=40, occupancyMapQP=4,
            videoDecoderOccupancyPath=dec, videoEncoderOccupancyPath=enc,
            videoDecoderGeometryPath=dec, videoEncoderGeometryPath=enc,
            videoDecoderAttributePath=dec, videoEncoderAttributePath=enc,
            computeHashSei=False, **kw,
        )

    def test_e2e_rate_reduction(self, mock_bins):
        """Foreign V3C stream -> smaller valid stream with re-encoded
        Annex-B sub-streams (the transcodeBaseline analog)."""
        enc, dec = mock_bins
        context = make_foreign_context()
        in_data, _ = roundtrip(make_foreign_context())

        Transcoder(self._params(enc, dec)).transcode(context)
        out_data, re_context = roundtrip(context)

        assert len(out_data) < 0.8 * len(in_data), (len(out_data), len(in_data))
        for t in (VideoType.GEOMETRY, VideoType.ATTRIBUTE):
            payload = re_context.atlas(0).get_video_bitstream(t).data
            assert payload[:4] == b"\x00\x00\x00\x01"
            info = probe_hevc(payload)
            assert info is not None and info["width"] == 64

        # content survives: decode the re-encoded geometry and compare
        geo_out = mock_hevc.decode(
            re_context.atlas(0).get_video_bitstream(VideoType.GEOMETRY).data
        )
        geo_in = mock_hevc.decode(
            make_foreign_context().atlas(0)
            .get_video_bitstream(VideoType.GEOMETRY).data
        )
        err = (geo_out.planes[0].astype(np.int32)
               - geo_in.planes[0].astype(np.int32))
        rms = float(np.sqrt(np.mean(err.astype(np.float64) ** 2)))
        # QP 32 -> qstep ~25: re-quantisation error stays on that order
        assert rms < 32, rms

    def test_occupancy_downscale(self, mock_bins):
        """occupancyPrecision 2 -> 4: the occupancy video halves in
        resolution via max-pool (resize_frame2 analog) and every occupied
        pixel survives the pooling."""
        enc, dec = mock_bins
        context = make_foreign_context(occ_precision=2)
        occ_in = mock_hevc.decode(
            context.atlas(0).get_video_bitstream(VideoType.OCCUPANCY).data
        )
        Transcoder(self._params(enc, dec, occupancyPrecision=4)).transcode(
            context
        )
        payload = context.atlas(0).get_video_bitstream(VideoType.OCCUPANCY).data
        info = probe_hevc(payload)
        assert (info["width"], info["height"]) == (16, 16)
        occ_out = mock_hevc.decode(payload)
        pooled = (occ_in.planes[0].reshape(2, 16, 2, 16, 2).max(axis=(2, 4))
                  > 0)
        assert np.array_equal(occ_out.planes[0] > 0, pooled)

    def test_env_var_resolution(self, mock_bins, monkeypatch):
        """RABBIT_HM_APP_{ENCODER,DECODER} env alone routes the re-encode
        (no explicit path params) — the factory-style override."""
        enc, dec = mock_bins
        monkeypatch.setenv("RABBIT_HM_APP_ENCODER", enc)
        monkeypatch.setenv("RABBIT_HM_APP_DECODER", dec)
        context = make_foreign_context()
        geo_before = context.atlas(0).get_video_bitstream(
            VideoType.GEOMETRY
        ).data
        Transcoder(TranscoderParameters(
            geometryQP=32, attributeQP=40, computeHashSei=False,
        )).transcode(context)
        geo_after = context.atlas(0).get_video_bitstream(
            VideoType.GEOMETRY
        ).data
        assert geo_after != geo_before
        assert len(geo_after) < len(geo_before)
        assert probe_hevc(geo_after)["width"] == 64

    def test_explicit_path_beats_env(self, mock_bins, tmp_path, monkeypatch):
        """Explicit videoEncoder*Path wins over the env override
        (PCCTranscoderParameters videoEncoder*Path_ semantics)."""
        from rabbit_transcoding_tpu.transcoder import foreign

        enc, dec = mock_bins
        monkeypatch.setenv("RABBIT_HM_APP_ENCODER", "/env/encoder")
        monkeypatch.setenv("RABBIT_HM_APP_DECODER", "/env/decoder")
        params = TranscoderParameters(
            videoEncoderGeometryPath=enc, videoDecoderGeometryPath=dec,
        )
        codec = foreign.resolve(params, VideoType.GEOMETRY)
        assert codec.encoder_binary == enc
        assert codec.decoder_binary == dec
        # and without the explicit path, env wins over PATH lookup
        codec2 = foreign.resolve(
            TranscoderParameters(), VideoType.GEOMETRY
        )
        assert codec2.encoder_binary == "/env/encoder"

    def test_bad_codec_id_raises(self):
        from rabbit_transcoding_tpu.transcoder import foreign

        with pytest.raises(ValueError, match="not a codec id"):
            foreign.resolve(
                TranscoderParameters(videoEncoderGeometryCodecId="NOPE"),
                VideoType.GEOMETRY,
            )


class TestMockCodec:
    """The mock itself must be a faithful Annex-B citizen."""

    def test_probe_parses_mock_sps(self):
        v = Video(48, 32, 10, ColorFormat.YUV400,
                  [np.zeros((1, 32, 48), np.uint16)])
        payload, _ = mock_hevc.encode(v, qp=10)
        info = probe_hevc(payload)
        assert (info["width"], info["height"]) == (48, 32)
        assert info["bitdepth"] == 10
        assert info["chroma_format_idc"] == 0

    def test_roundtrip_matches_recon(self):
        rng = np.random.default_rng(0)
        y = rng.integers(0, 1024, size=(3, 16, 16)).astype(np.uint16)
        v = Video(16, 16, 10, ColorFormat.YUV400, [y])
        payload, recon = mock_hevc.encode(v, qp=20)
        out = mock_hevc.decode(payload)
        np.testing.assert_array_equal(out.planes[0], recon.planes[0])

    def test_higher_qp_smaller(self):
        rng = np.random.default_rng(1)
        y = rng.integers(0, 1024, size=(2, 32, 32)).astype(np.uint16)
        v = Video(32, 32, 10, ColorFormat.YUV400, [y])
        lo, _ = mock_hevc.encode(v, qp=8)
        hi, _ = mock_hevc.encode(v, qp=36)
        assert len(hi) < len(lo)
