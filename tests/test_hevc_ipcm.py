"""In-tree HEVC I-slice/IPCM subset codec (video/hevc_ipcm.py).

The reference ships a full HEVC NAL parser (dependencies/PccLibHevcParser)
and re-encodes HEVC sub-streams through HM
(PCCTranscoder.cpp:374-517).  No HEVC binary exists in this environment,
so hevc_ipcm.py gives the foreign route real Annex-B NAL/slice syntax:
a conformant encoder producing IDR slices whose CTUs are all IPCM
(lossless), and the matching decoder.  These tests cover the codec
roundtrip, subset gating, interop with our own SPS probe/SHVC filter,
the foreign transcode route with NO external binary, and (when the
reference tree is present) validation of our streams by the reference's
own HEVC parser.
"""

import numpy as np
import pytest

from rabbit_transcoding_tpu.core.image import Video
from rabbit_transcoding_tpu.utils.enums import ColorFormat
from rabbit_transcoding_tpu.video import hevc_ipcm
from rabbit_transcoding_tpu.video.hevc_probe import (
    filter_hevc_layers,
    hevc_layer_ids,
    probe_hevc,
)


def make_video(w=96, h=64, frames=2, mono=False, seed=0):
    rng = np.random.default_rng(seed)
    planes = [rng.integers(0, 256, (frames, h, w)).astype(np.uint8)]
    fmt = ColorFormat.YUV400
    if not mono:
        planes += [
            rng.integers(0, 256, (frames, h // 2, w // 2)).astype(np.uint8),
            rng.integers(0, 256, (frames, h // 2, w // 2)).astype(np.uint8),
        ]
        fmt = ColorFormat.YUV420
    return Video(w, h, 8, fmt, planes)


class TestRoundtrip:
    @pytest.mark.parametrize("mono", [False, True])
    def test_lossless(self, mono):
        vid = make_video(mono=mono)
        data = hevc_ipcm.encode(vid)
        back = hevc_ipcm.decode(data)
        assert (back.width, back.height) == (96, 64)
        assert back.format == vid.format
        for p_in, p_out in zip(vid.planes, back.planes):
            assert np.array_equal(np.asarray(p_in), np.asarray(p_out))

    def test_non_ctu_multiple_dims_crop(self):
        """conformance_window crops the CTU padding back off."""
        vid = make_video(w=70, h=42, frames=1)
        back = hevc_ipcm.decode(hevc_ipcm.encode(vid))
        assert (back.width, back.height) == (70, 42)
        assert np.array_equal(np.asarray(back.planes[0]),
                              np.asarray(vid.planes[0]))

    def test_flat_content_emulation_prevention(self):
        """All-zero PCM samples force 00-run sequences in the slice RBSP;
        emulation prevention must keep the stream parseable."""
        z = np.zeros((2, 32, 48), np.uint8)
        vid = Video(48, 32, 8, ColorFormat.YUV400, [z])
        data = hevc_ipcm.encode(vid)
        # no start-code emulation inside NAL payloads
        for nal_type, nal in hevc_ipcm._split_nals(data):
            body = nal[2:]  # past the 2-byte NAL header
            assert b"\x00\x00\x00" not in body
            assert b"\x00\x00\x01" not in body
        back = hevc_ipcm.decode(data)
        assert np.array_equal(np.asarray(back.planes[0]), z)

    def test_eight_bit_only(self):
        vid = make_video(mono=True)
        vid.bitdepth = 10
        with pytest.raises(ValueError):
            hevc_ipcm.encode(vid)


class TestSubsetGate:
    def test_own_stream_in_subset(self):
        assert hevc_ipcm.is_ipcm_subset(hevc_ipcm.encode(make_video()))

    def test_rbv_payload_rejected(self):
        assert not hevc_ipcm.is_ipcm_subset(b"RBV1" + b"\x00" * 64)

    def test_non_pcm_hevc_rejected(self):
        """A valid Annex-B HEVC stream whose SPS does not enable PCM (the
        mock codec's) is OUTSIDE the subset."""
        import mock_hevc

        payload, _ = mock_hevc.encode(make_video(mono=True), qp=4)
        assert not hevc_ipcm.is_ipcm_subset(payload)

    def test_truncated_rejected(self):
        data = hevc_ipcm.encode(make_video())
        assert not hevc_ipcm.is_ipcm_subset(data[:40])


class TestProbeInterop:
    def test_own_sps_probe(self):
        """video/hevc_probe.py (the PccLibHevcParser analog) reads our
        SPS: dims, bitdepth, chroma."""
        info = probe_hevc(hevc_ipcm.encode(make_video(w=128, h=80)))
        assert info is not None
        assert (info["width"], info["height"]) == (128, 80)
        assert info["bitdepth"] == 8

    def test_shvc_layer_filter_passthrough(self):
        """All NALs are layer 0: the SHVC base-layer filter keeps the
        stream decodable."""
        data = hevc_ipcm.encode(make_video(frames=2))
        assert hevc_layer_ids(data) == {0}
        kept = filter_hevc_layers(data, 0)
        back = hevc_ipcm.decode(kept)
        assert back.frame_count == 2


class TestForeignFallback:
    def test_resolve_returns_ipcm_codec(self, monkeypatch):
        """No binary anywhere + IPCM payload -> the in-tree fallback."""
        from rabbit_transcoding_tpu.transcoder import foreign
        from rabbit_transcoding_tpu.transcoder.params import (
            TranscoderParameters,
        )
        from rabbit_transcoding_tpu.utils.enums import VideoType

        monkeypatch.setenv("PATH", "/nonexistent")
        payload = hevc_ipcm.encode(make_video(mono=True))
        codec = foreign.resolve(
            TranscoderParameters(), VideoType.GEOMETRY, payload=payload
        )
        assert isinstance(codec, foreign.IpcmCodec)
        # non-IPCM Annex-B still gets no codec (passthrough behavior)
        import mock_hevc

        other, _ = mock_hevc.encode(make_video(mono=True), qp=4)
        assert foreign.resolve(
            TranscoderParameters(), VideoType.GEOMETRY, payload=other
        ) is None

    def test_e2e_transcode_without_binaries(self, monkeypatch):
        """A V3C stream whose sub-streams are real HEVC (IPCM) Annex-B
        transcodes with NO external codec: occupancy downscales through
        decode->maxpool->re-encode, geometry/attribute re-encode
        losslessly, and every output payload is again valid HEVC."""
        from rabbit_transcoding_tpu.bitstream import (
            V3CReader,
            V3CWriter,
            VideoBitstream,
        )
        from rabbit_transcoding_tpu.bitstream.hls import Context
        from rabbit_transcoding_tpu.bitstream.syntax import (
            AtlasFrameParameterSetRbsp,
            AtlasSequenceParameterSetRbsp,
            V3CParameterSet,
        )
        from rabbit_transcoding_tpu.transcoder.params import (
            TranscoderParameters,
        )
        from rabbit_transcoding_tpu.transcoder.transcoder import Transcoder
        from rabbit_transcoding_tpu.utils.enums import VideoType

        monkeypatch.setenv("PATH", "/nonexistent")
        frames, w, h = 2, 64, 64
        rng = np.random.default_rng(3)
        occ = (rng.random((frames, h // 2, w // 2)) < 0.4).astype(
            np.uint8
        ) * 255
        geo = rng.integers(0, 256, (frames, h, w)).astype(np.uint8)
        ay = rng.integers(0, 256, (frames, h, w)).astype(np.uint8)
        ac = np.full((frames, h // 2, w // 2), 128, np.uint8)

        context = Context()
        vps = V3CParameterSet()
        vps.atlas(0).vps_frame_width = w
        vps.atlas(0).vps_frame_height = h
        context.vps_list.append(vps)
        atlas = context.atlas(0)
        atlas.asps_list.append(AtlasSequenceParameterSetRbsp(
            asps_frame_width=w, asps_frame_height=h,
        ))
        atlas.afps_list.append(AtlasFrameParameterSetRbsp())
        atlas.set_video_bitstream(VideoBitstream(
            VideoType.OCCUPANCY,
            hevc_ipcm.encode(Video(w // 2, h // 2, 8, ColorFormat.YUV400,
                                   [occ])),
        ))
        atlas.set_video_bitstream(VideoBitstream(
            VideoType.GEOMETRY,
            hevc_ipcm.encode(Video(w, h, 8, ColorFormat.YUV400, [geo])),
        ))
        atlas.set_video_bitstream(VideoBitstream(
            VideoType.ATTRIBUTE,
            hevc_ipcm.encode(Video(w, h, 8, ColorFormat.YUV420,
                                   [ay, ac, ac.copy()])),
        ))

        Transcoder(TranscoderParameters(
            geometryQP=32, attributeQP=40, occupancyMapQP=4,
            occupancyPrecision=4, computeHashSei=False,
        )).transcode(context)

        w3, r3 = V3CWriter(), V3CReader()
        re_context = r3.decode(r3.read(w3.write(w3.encode(context)))[0])
        re_atlas = re_context.atlas(0)

        # occupancy: downscaled 2x by max-pool, every occupied pixel kept
        occ_payload = re_atlas.get_video_bitstream(VideoType.OCCUPANCY).data
        assert hevc_ipcm.is_ipcm_subset(occ_payload)
        occ_out = hevc_ipcm.decode(occ_payload)
        assert (occ_out.width, occ_out.height) == (w // 4, h // 4)
        pooled = occ.reshape(frames, h // 4, 2, w // 4, 2).max(axis=(2, 4))
        assert np.array_equal(
            np.asarray(occ_out.planes[0]) > 0, pooled > 0
        )

        # geometry/attribute: IPCM is lossless, content survives exactly
        geo_out = hevc_ipcm.decode(
            re_atlas.get_video_bitstream(VideoType.GEOMETRY).data
        )
        assert np.array_equal(np.asarray(geo_out.planes[0]), geo)
        attr_out = hevc_ipcm.decode(
            re_atlas.get_video_bitstream(VideoType.ATTRIBUTE).data
        )
        assert np.array_equal(np.asarray(attr_out.planes[0]), ay)


# ---------------------------------------------------------------------------
# Reference-parser validation (skipped without /root/reference + g++)
# ---------------------------------------------------------------------------
import shutil  # noqa: E402

from rabbit_transcoding_tpu.conformance import refgate  # noqa: E402

needs_ref = pytest.mark.skipif(
    not (refgate.reference_available() and refgate.hevc_parser_available())
    or shutil.which("g++") is None,
    reason="reference PccLibHevcParser or g++ not available",
)


@needs_ref
class TestReferenceParser:
    @pytest.mark.parametrize(
        "w,h,mono,frames", [(128, 80, False, 3), (96, 64, True, 2),
                            (70, 42, False, 1)]
    )
    def test_reference_parses_our_stream(self, tmp_path, w, h, mono, frames):
        """The reference's own HEVC parser (TDecCavlc::parseSPS via
        PccHevcParser::getVideoSize) reads our SPS and NAL layout."""
        data = hevc_ipcm.encode(make_video(w=w, h=h, mono=mono,
                                           frames=frames))
        p = tmp_path / "s.265"
        p.write_bytes(data)
        fields = refgate.run_hevcparse(p)
        # getOutputWidth applies the conformance window: exact source dims
        assert fields["width"] == w
        assert fields["height"] == h
        assert fields["bitdepth"] == 8
        assert fields["is444"] == 0
        assert fields["vps_count"] == 1
        assert fields["sps_count"] == 1
        assert fields["pps_count"] == 1
        assert fields["slice_count"] == frames
