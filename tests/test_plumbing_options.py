"""Semantics of the round-3 CLI-plumbing options: forcedSsvhUnitSize-
PrecisionBytes, oneV3CFrameOnlyFlag, *CodecIdIndex, colorTransform,
byteStreamVideoCoder*, maxNumRefAtlasFrame/maxNumRefAtalsList,
per-map cfg roles, keepIntermediateFiles."""

import os

import numpy as np
import pytest

from rabbit_transcoding_tpu.bitstream.v3c import (
    V3CUnit,
    V3CUnitHeader,
    V3CUnitType,
    read_sample_stream_v3c,
    write_sample_stream_v3c,
)
from rabbit_transcoding_tpu.core.pointset import PointSet


class TestForcedPrecision:
    def _units(self):
        return [
            V3CUnit(V3CUnitHeader(unit_type=V3CUnitType.V3C_VPS), b"x" * 10),
            V3CUnit(V3CUnitHeader(unit_type=V3CUnitType.V3C_AD), b"y" * 300),
        ]

    def test_forced_wider_roundtrips(self):
        units = self._units()
        data = write_sample_stream_v3c(units, forced_precision=4)
        # header carries precision-1 in the top 3 bits
        assert (data[0] >> 5) + 1 == 4
        back = read_sample_stream_v3c(data)
        assert [u.payload for u in back] == [u.payload for u in units]

    def test_derived_is_minimal(self):
        data = write_sample_stream_v3c(self._units())
        assert (data[0] >> 5) + 1 == 2  # 304-byte unit needs 2 bytes

    def test_too_narrow_raises(self):
        with pytest.raises(ValueError):
            write_sample_stream_v3c(self._units(), forced_precision=1)


class TestPtlToolsetConstraints:
    def test_one_v3c_frame_only_roundtrip(self):
        from rabbit_transcoding_tpu.bitstream.bitio import BitReader, BitWriter
        from rabbit_transcoding_tpu.bitstream.syntax import (
            ProfileTierLevel,
            ProfileToolsetConstraintsInformation,
        )

        ptl = ProfileTierLevel(
            ptl_tool_constraints_present_flag=True,
            ptl_toolset_constraints=ProfileToolsetConstraintsInformation(
                ptc_one_v3c_frame_only_flag=True,
            ),
        )
        bw = BitWriter()
        ptl.write(bw)
        back = ProfileTierLevel.read(BitReader(bw.data()))
        assert back.ptl_tool_constraints_present_flag
        assert back.ptl_toolset_constraints.ptc_one_v3c_frame_only_flag


class TestCodecIdIndices:
    def test_pinned_mp4ra_uses_indices(self):
        from rabbit_transcoding_tpu.utils.enums import CodecId
        from rabbit_transcoding_tpu.video.codec_group import (
            CODEC_GROUP_MP4RA,
            signalling,
        )

        sig = signalling(
            CodecId.RBV, CodecId.HM_APP, CodecId.HM_APP,
            pinned_group=CODEC_GROUP_MP4RA,
            codec_id_index={CodecId.HM_APP: 5},
        )
        assert sig.profile_codec_group_idc == CODEC_GROUP_MP4RA
        assert sig.component_ids == {
            "occupancy": 0, "geometry": 5, "attribute": 5,
        }
        assert sorted(sig.ccm_entries) == [(0, "rbv1"), (5, "hev1")]

    def test_index_collision_rejected(self):
        from rabbit_transcoding_tpu.utils.enums import CodecId
        from rabbit_transcoding_tpu.video.codec_group import (
            CODEC_GROUP_MP4RA,
            signalling,
        )

        with pytest.raises(ValueError):
            signalling(
                CodecId.RBV, CodecId.HM_APP, CodecId.HM_APP,
                pinned_group=CODEC_GROUP_MP4RA,
                codec_id_index={CodecId.HM_APP: 0},  # collides with rbv1
            )

    def test_unpinned_behavior_unchanged(self):
        from rabbit_transcoding_tpu.utils.enums import CodecId
        from rabbit_transcoding_tpu.video.codec_group import (
            CODEC_GROUP_MP4RA,
            signalling,
        )

        sig = signalling(CodecId.RBV, CodecId.RBV, CodecId.RBV)
        assert sig.profile_codec_group_idc == CODEC_GROUP_MP4RA
        assert sig.ccm_entries == [(0, "rbv1")]


class TestColorTransform:
    def test_point_roundtrip(self):
        rng = np.random.default_rng(3)
        colors = rng.integers(0, 256, (500, 3)).astype(np.uint8)
        ps = PointSet(
            positions=rng.integers(0, 100, (500, 3)).astype(np.int32),
            colors=colors.copy(),
        )
        ps.convert_rgb_to_yuv()
        assert not np.array_equal(ps.colors, colors)
        ps.convert_yuv_to_rgb()
        # BT.709 integer round trip is within 2 codes
        assert np.abs(ps.colors.astype(int) - colors.astype(int)).max() <= 2

    def test_gof_load_write_transform(self, tmp_path):
        rng = np.random.default_rng(4)
        ps = PointSet(
            positions=rng.integers(0, 64, (100, 3)).astype(np.int32),
            colors=rng.integers(0, 256, (100, 3)).astype(np.uint8),
        )
        tpl = str(tmp_path / "f%04d.ply")
        from rabbit_transcoding_tpu.core.gof import GroupOfFrames

        GroupOfFrames([ps]).write(tpl, 0)
        loaded = GroupOfFrames.load(tpl, 0, 1, color_transform=1)
        expect = ps.copy()
        expect.convert_rgb_to_yuv()
        assert np.array_equal(loaded[0].colors, expect.colors)
        # writing with the transform inverts back (within rounding)
        GroupOfFrames(list(loaded)).write(tpl, 10, color_transform=1)
        back = GroupOfFrames.load(tpl, 10, 1)
        assert np.abs(
            back[0].colors.astype(int) - ps.colors.astype(int)
        ).max() <= 2


class TestByteStreamFraming:
    def test_external_encoder_samplestream_output_converted(self, tmp_path):
        """byte_stream=False: the mock binary emits a NAL sample stream;
        the wrapper must hand back Annex-B."""
        from rabbit_transcoding_tpu.bitstream.video_bitstream import (
            byte_stream_to_sample_stream,
            split_annexb,
        )

        nals = [b"\x40\x01payload1", b"\x42\x01payload2"]
        annexb = b"".join(b"\x00\x00\x00\x01" + n for n in nals)
        ss = byte_stream_to_sample_stream(annexb)
        # emulate what the wrapper does on read-back
        from rabbit_transcoding_tpu.bitstream.video_bitstream import (
            sample_stream_to_byte_stream,
        )

        out = sample_stream_to_byte_stream(ss)
        assert split_annexb(out) == nals


class TestRefListSignalling:
    @pytest.mark.parametrize("nlists,nframes", [(2, 3)])
    def test_asps_ref_lists_match_params(self, nlists, nframes):
        from rabbit_transcoding_tpu.core.pointset import PointSet as PS
        from rabbit_transcoding_tpu.encoder.encoder import Encoder
        from rabbit_transcoding_tpu.encoder.params import EncoderParameters

        rng = np.random.default_rng(0)
        n = 500
        pos = np.zeros((n, 3), np.int32)
        pos[:, 0] = rng.integers(0, 32, n)
        pos[:, 1] = rng.integers(0, 32, n)
        pos[:, 2] = 5
        ps = PS(positions=pos,
                colors=np.full((n, 3), 128, np.uint8)).remove_duplicates()
        p = EncoderParameters(
            minimumImageWidth=128, minimumImageHeight=64,
            frameCount=1, groupOfFramesSize=1,
            maxNumRefAtalsList=nlists, maxNumRefAtlasFrame=nframes,
            oneV3CFrameOnlyFlag=True,
        )
        ctx, _ = Encoder(p).encode([ps])
        asps = ctx.atlas(0).asps_list[0]
        assert len(asps.ref_list_structs) == nlists
        assert asps.ref_list_structs[0].num_ref_entries == nframes
        assert asps.ref_list_structs[0].abs_delta_afoc_st == [1, 2, 3]
        ptl = ctx.vps.profile_tier_level
        assert ptl.ptl_tool_constraints_present_flag
        assert ptl.ptl_toolset_constraints.ptc_one_v3c_frame_only_flag


class TestPerMapCfgRoles:
    def test_role_cfg_fallback(self):
        from rabbit_transcoding_tpu.encoder.params import EncoderParameters
        from rabbit_transcoding_tpu.video import base as vb

        p = EncoderParameters(geometryConfig="g.cfg", geometry1Config="g1.cfg")
        assert vb._ROLE_CFG["geometry0"] == "geometry0Config"
        # geometry0 falls back to geometryConfig; geometry1 uses its own
        cfg0 = getattr(p, vb._ROLE_CFG["geometry0"], "") or getattr(
            p, vb._ROLE_CFG_FALLBACK["geometry0"]
        )
        cfg1 = getattr(p, vb._ROLE_CFG["geometry1"], "")
        assert (cfg0, cfg1) == ("g.cfg", "g1.cfg")


class TestKeepIntermediateFiles:
    def test_workdir_persists(self):
        from rabbit_transcoding_tpu.video.external import _workdir

        with _workdir(True) as td:
            path = td
            with open(os.path.join(td, "x"), "w") as fh:
                fh.write("1")
        assert os.path.exists(os.path.join(path, "x"))
        import shutil

        shutil.rmtree(path)

    def test_workdir_cleans(self):
        from rabbit_transcoding_tpu.video.external import _workdir

        with _workdir(False) as td:
            path = td
        assert not os.path.exists(path)
