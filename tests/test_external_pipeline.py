"""External codec selection reachable from the ENCODE and DECODE pipelines.

The reference encoder/decoder route every video sub-stream through the
virtual codec factory, selectable per component
(videoEncoder{Occupancy,Geometry,Attribute}CodecId + cfg files,
PccAppEncoder.cpp:298-556; decoder binaries PccAppDecoder.cpp:124-134).
These tests drive our encoder/decoder through the same options against the
mock HM binaries (tests/mock_hevc.py), proving:

  * the encoder emits genuine Annex-B sub-streams through the wrapper and
    keeps its closed loop on the binary's reconstruction;
  * the stream signals the codec family (codec-group idc / CCM SEI);
  * the decoder resolves the external decoder from that signalling and
    reproduces the encoder-side reconstruction exactly;
  * all-RBV streams now signal CODEC_GROUP_MP4RA with an 'rbv1' CCM entry.
"""

import os
import stat
import sys

import numpy as np
import pytest

from rabbit_transcoding_tpu.bitstream import V3CReader, V3CWriter
from rabbit_transcoding_tpu.bitstream.sei import SeiComponentCodecMapping
from rabbit_transcoding_tpu.core.gof import GroupOfFrames
from rabbit_transcoding_tpu.decoder.decoder import Decoder, DecoderParameters
from rabbit_transcoding_tpu.encoder.encoder import Encoder
from rabbit_transcoding_tpu.encoder.params import EncoderParameters
from rabbit_transcoding_tpu.utils.enums import VideoType
from rabbit_transcoding_tpu.video import codec_group as cg
from rabbit_transcoding_tpu.video.hevc_probe import probe_hevc

from test_e2e_codec import make_sphere_cloud

MOCK = os.path.join(os.path.dirname(os.path.abspath(__file__)), "mock_hevc.py")


@pytest.fixture(scope="module")
def mock_bins(tmp_path_factory):
    td = tmp_path_factory.mktemp("mockhm")
    enc = td / "TAppEncoder.sh"
    enc.write_text(f'#!/bin/sh\nexec "{sys.executable}" "{MOCK}" encode "$@"\n')
    dec = td / "TAppDecoder.sh"
    dec.write_text(f'#!/bin/sh\nexec "{sys.executable}" "{MOCK}" decode "$@"\n')
    for p in (enc, dec):
        os.chmod(p, os.stat(p).st_mode | stat.S_IEXEC)
    return str(enc), str(dec)


def _roundtrip(context, tmp_path, name):
    writer = V3CWriter()
    path = str(tmp_path / name)
    writer.write_file(writer.encode(context), path)
    gofs = V3CReader().read_file(path)
    return V3CReader().decode(gofs[0])


def _assert_same_clouds(clouds, recon):
    assert len(clouds) == len(recon)
    for dec_ps, enc_ps in zip(clouds, recon):
        a = dec_ps.compute_checksum()
        b = enc_ps.compute_checksum()
        assert a == b


class TestExternalEncodePipeline:
    """Encoder -> external (mock HM) codec for every component."""

    @pytest.fixture(scope="class")
    def encoded(self, mock_bins, tmp_path_factory):
        enc_bin, dec_bin = mock_bins
        params = EncoderParameters(
            minimumImageWidth=256,
            minimumImageHeight=64,
            geometryQP=8,
            attributeQP=12,
            frameCount=2,
            groupOfFramesSize=2,
            videoEncoderOccupancyCodecId="HM_APP",
            videoEncoderGeometryCodecId="HM_APP",
            videoEncoderAttributeCodecId="HM_APP",
            videoEncoderOccupancyPath=enc_bin,
            videoEncoderGeometryPath=enc_bin,
            videoEncoderAttributePath=enc_bin,
        )
        sources = GroupOfFrames([make_sphere_cloud(seed=i) for i in range(2)])
        context, recon = Encoder(params).encode(sources)
        return sources, context, recon

    def test_substreams_are_annexb_with_sps(self, encoded):
        _, context, _ = encoded
        atlas = context.atlas(0)
        for t in (VideoType.OCCUPANCY, VideoType.GEOMETRY,
                  VideoType.ATTRIBUTE):
            data = atlas.get_video_bitstream(t).data
            assert data[:4] == b"\x00\x00\x00\x01", t
            info = probe_hevc(data)
            assert info is not None, t

    def test_codec_group_signalled(self, encoded):
        _, context, _ = encoded
        ptl = context.vps.profile_tier_level
        assert ptl.ptl_profile_codec_group_idc == cg.CODEC_GROUP_HEVC_MAIN10

    def test_decode_resolves_external_and_matches_closed_loop(
        self, encoded, mock_bins, tmp_path
    ):
        _, context, recon = encoded
        _, dec_bin = mock_bins
        context2 = _roundtrip(context, tmp_path, "hm_stream.bin")
        decoder = Decoder(DecoderParameters(
            videoDecoderOccupancyPath=dec_bin,
            videoDecoderGeometryPath=dec_bin,
            videoDecoderAttributePath=dec_bin,
        ))
        clouds = decoder.decode(context2)
        _assert_same_clouds(clouds, recon)

    def test_decode_via_env_resolution(self, encoded, mock_bins, tmp_path,
                                       monkeypatch):
        """No explicit paths: RABBIT_HM_APP_DECODER env resolves the binary
        from the stream's codec-group signalling alone."""
        _, context, recon = encoded
        _, dec_bin = mock_bins
        monkeypatch.setenv("RABBIT_HM_APP_DECODER", dec_bin)
        context2 = _roundtrip(context, tmp_path, "hm_stream_env.bin")
        clouds = Decoder().decode(context2)
        _assert_same_clouds(clouds, recon)


class TestMixedCodecs:
    """RBV occupancy riding an HEVC-family stream: the CCM SEI maps its
    coded id to 'rbv1' and the decoder dispatches per payload."""

    def test_mixed_stream(self, mock_bins, tmp_path):
        enc_bin, dec_bin = mock_bins
        params = EncoderParameters(
            minimumImageWidth=256,
            minimumImageHeight=64,
            geometryQP=8,
            attributeQP=12,
            frameCount=1,
            groupOfFramesSize=1,
            videoEncoderGeometryCodecId="HM_APP",
            videoEncoderGeometryPath=enc_bin,
        )
        sources = GroupOfFrames([make_sphere_cloud(seed=3)])
        context, recon = Encoder(params).encode(sources)
        atlas = context.atlas(0)
        assert atlas.get_video_bitstream(
            VideoType.GEOMETRY).data[:4] == b"\x00\x00\x00\x01"
        assert atlas.get_video_bitstream(
            VideoType.OCCUPANCY).data[:4] == b"RBV2"
        ptl = context.vps.profile_tier_level
        assert ptl.ptl_profile_codec_group_idc == cg.CODEC_GROUP_HEVC_MAIN10
        ccm = [s for s in atlas.seis_prefix
               if isinstance(s, SeiComponentCodecMapping)]
        assert ccm and "rbv1" in ccm[0].ccm_codec_4cc

        context2 = _roundtrip(context, tmp_path, "mixed.bin")
        clouds = Decoder(DecoderParameters(
            videoDecoderGeometryPath=dec_bin,
        )).decode(context2)
        _assert_same_clouds(clouds, recon)


class TestRbvSignalling:
    def test_default_stream_signals_mp4ra_rbv1(self, tmp_path):
        params = EncoderParameters(
            minimumImageWidth=256, minimumImageHeight=64,
            geometryQP=8, attributeQP=12,
            frameCount=1, groupOfFramesSize=1,
        )
        sources = GroupOfFrames([make_sphere_cloud(seed=5)])
        context, recon = Encoder(params).encode(sources)
        ptl = context.vps.profile_tier_level
        assert ptl.ptl_profile_codec_group_idc == cg.CODEC_GROUP_MP4RA
        atlas = context.atlas(0)
        ccm = [s for s in atlas.seis_prefix
               if isinstance(s, SeiComponentCodecMapping)]
        assert ccm and ccm[0].ccm_codec_4cc == ["rbv1"]
        # signalling survives serialization and plain decode still works
        context2 = _roundtrip(context, tmp_path, "rbv.bin")
        assert (context2.vps.profile_tier_level.ptl_profile_codec_group_idc
                == cg.CODEC_GROUP_MP4RA)
        clouds = Decoder().decode(context2)
        _assert_same_clouds(clouds, recon)


class TestFamilyDerivation:
    """Transcoder/decoder derive the foreign codec family from the stream
    itself (codec-group idc + CCM SEI + payload SPS sniffing) — the
    getCodedCodecId analog."""

    def _ctx(self, group):
        from rabbit_transcoding_tpu.bitstream.syntax import V3CParameterSet
        from rabbit_transcoding_tpu.bitstream.hls import Context

        ctx = Context()
        vps = V3CParameterSet()
        vps.profile_tier_level.ptl_profile_codec_group_idc = group
        vps.atlas(0)
        ctx.vps_list.append(vps)
        return ctx

    def test_group_picks_family(self):
        from rabbit_transcoding_tpu.utils.enums import CodecId

        assert cg.signalled_codec(
            self._ctx(cg.CODEC_GROUP_VVC_MAIN10), None, VideoType.GEOMETRY
        ) == CodecId.VTM_APP
        assert cg.signalled_codec(
            self._ctx(cg.CODEC_GROUP_HEVC_MAIN10), None, VideoType.ATTRIBUTE
        ) == CodecId.HM_APP

    def test_legacy_group0_resolved_by_payload_sps(self):
        """Group 0 is ambiguous (AVC vs legacy default): a parseable HEVC
        SPS in the payload wins; a genuine AVC payload lands on JM."""
        import mock_hevc
        from rabbit_transcoding_tpu.utils.enums import CodecId
        from rabbit_transcoding_tpu.core.image import Video
        from rabbit_transcoding_tpu.utils.enums import ColorFormat

        v = Video(16, 8, 8, ColorFormat.YUV400,
                  [np.zeros((1, 8, 16), np.uint8)])
        hevc_payload, _ = mock_hevc.encode(v, qp=10)
        assert cg.signalled_codec(
            self._ctx(0), None, VideoType.GEOMETRY, hevc_payload
        ) == CodecId.HM_APP
        assert cg.family_from_payload(hevc_payload) == CodecId.HM_APP

    def test_resolve_auto_uses_stream_family(self, monkeypatch):
        """foreign.resolve with the auto default ('' codec ids) routes a
        VVC-signalled stream to the VTM binaries."""
        from rabbit_transcoding_tpu.transcoder import foreign
        from rabbit_transcoding_tpu.transcoder.params import (
            TranscoderParameters,
        )

        monkeypatch.setenv("RABBIT_VTM_APP_DECODER", "/opt/vtm/dec")
        monkeypatch.setenv("RABBIT_VTM_APP_ENCODER", "/opt/vtm/enc")
        monkeypatch.delenv("RABBIT_HM_APP_DECODER", raising=False)
        monkeypatch.delenv("RABBIT_HM_APP_ENCODER", raising=False)
        codec = foreign.resolve(
            TranscoderParameters(), VideoType.GEOMETRY,
            self._ctx(cg.CODEC_GROUP_VVC_MAIN10), None,
        )
        assert codec is not None
        assert codec.decoder_binary == "/opt/vtm/dec"
        assert codec.encoder_binary == "/opt/vtm/enc"


class TestConfigPassthrough:
    def test_cfg_file_reaches_the_binary(self, tmp_path):
        """The role cfg file is inserted as `-c <path>` ahead of the CLI
        options (HM last-wins semantics)."""
        from rabbit_transcoding_tpu.core.image import Video
        from rabbit_transcoding_tpu.utils.enums import ColorFormat
        from rabbit_transcoding_tpu.video.base import VideoEncoderParams
        from rabbit_transcoding_tpu.video.external import ExternalVideoEncoder

        log = tmp_path / "argv.txt"
        script = tmp_path / "argenc.sh"
        script.write_text(
            "#!/bin/sh\n"
            f'echo "$@" > "{log}"\n'
            'out=""; in=""\n'
            'while [ $# -gt 0 ]; do case "$1" in\n'
            '  -i) in="$2"; shift 2;; -b) out="$2"; shift 2;;\n'
            '  *) shift;; esac; done\n'
            'cp "$in" "$out"\n'
        )
        os.chmod(script, os.stat(script).st_mode | stat.S_IEXEC)
        cfg = tmp_path / "geo.cfg"
        cfg.write_text("QP: 30\n")
        video = Video(16, 8, 8, ColorFormat.YUV400,
                      [np.zeros((1, 8, 16), np.uint8)])
        enc = ExternalVideoEncoder(str(script), config_path=str(cfg))
        enc.encode(video, VideoEncoderParams(qp=32))
        argv = log.read_text().split()
        assert argv[0] == "-c" and argv[1] == str(cfg)

    def test_component_encoder_selection(self, tmp_path):
        """component_encoder honors role cfg + explicit binary path."""
        from rabbit_transcoding_tpu.video.base import (
            component_encoder,
            component_codec_id,
        )
        from rabbit_transcoding_tpu.utils.enums import CodecId

        params = EncoderParameters(
            videoEncoderGeometryCodecId="HM_APP",
            videoEncoderGeometryPath="/bin/true",
            geometryConfig="geo.cfg",
            geometryMPConfig="geo_mp.cfg",
        )
        assert component_codec_id(params, "Geometry") == CodecId.HM_APP
        enc = component_encoder(params, "geometry")
        assert enc.binary == "/bin/true"
        assert enc.config_path == "geo.cfg"
        mp = component_encoder(params, "geometryMP")
        assert mp.config_path == "geo_mp.cfg"
        # RBV default untouched
        assert component_codec_id(EncoderParameters(), "Geometry") == CodecId.RBV

    def test_bad_codec_id_rejected(self):
        from rabbit_transcoding_tpu.video.base import component_codec_id

        with pytest.raises(ValueError, match="videoEncoderGeometryCodecId"):
            component_codec_id(
                EncoderParameters(videoEncoderGeometryCodecId="NOPE"),
                "Geometry",
            )


class TestReflectanceCodecSignalling:
    def test_refl_maps_to_rbv_under_external_group(self, mock_bins):
        """Reflectance is always RBV-lossless: when the main components use
        an external codec family, the reflectance AI entry must resolve to
        rbv1 through the CCM SEI, not inherit the group codec's id 0."""
        enc_bin, _ = mock_bins
        src = make_sphere_cloud(seed=4)
        src.reflectances = (
            (src.positions[:, 1].astype(np.uint32) * 31) % 60000
        ).astype(np.uint16)
        context, _ = Encoder(EncoderParameters(
            minimumImageWidth=256, minimumImageHeight=64,
            geometryQP=16, attributeQP=24, occupancyPrecision=2,
            frameCount=1, groupOfFramesSize=1,
            videoEncoderOccupancyCodecId="HM_APP",
            videoEncoderGeometryCodecId="HM_APP",
            videoEncoderAttributeCodecId="HM_APP",
            videoEncoderOccupancyPath=enc_bin,
            videoEncoderGeometryPath=enc_bin,
            videoEncoderAttributePath=enc_bin,
        )).encode(GroupOfFrames([src]))
        ai = context.vps.atlas(0).attribute_information
        assert ai.ai_attribute_count == 2
        main_cid, refl_cid = ai.ai_attribute_codec_id
        assert refl_cid != main_cid
        ccm = [s for s in context.atlas(0).seis_prefix
               if isinstance(s, SeiComponentCodecMapping)]
        assert ccm, "external+RBV mix must emit a CCM SEI"
        mapping = dict(zip(ccm[0].ccm_codec_id, ccm[0].ccm_codec_4cc))
        assert mapping.get(refl_cid) == "rbv1"
