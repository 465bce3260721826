"""Unit tests: bit I/O, NAL/V3C framing, syntax struct roundtrips."""

import numpy as np
import pytest

from rabbit_transcoding_tpu.bitstream.bitio import BitReader, BitWriter
from rabbit_transcoding_tpu.bitstream.hls import AtlasHLS, Context
from rabbit_transcoding_tpu.bitstream.nal import (
    NalUnit,
    read_sample_stream_nal,
    write_sample_stream_nal,
)
from rabbit_transcoding_tpu.bitstream.reader import V3CReader
from rabbit_transcoding_tpu.bitstream.sei import (
    RawSei,
    SeiComponentCodecMapping,
    SeiDecodedAtlasInformationHash,
    SeiGeometrySmoothing,
    read_sei_rbsp,
    write_sei_rbsp,
)
from rabbit_transcoding_tpu.bitstream.syntax import (
    AtlasFrameParameterSetRbsp,
    AtlasSequenceParameterSetRbsp,
    AtlasTileDataUnit,
    AtlasTileHeader,
    AtlasTileLayerRbsp,
    AttributeInformation,
    InterPatchDataUnit,
    MergePatchDataUnit,
    PatchDataUnit,
    PatchInformationData,
    RefListStruct,
    SyntaxContext,
    V3CParameterSet,
)
from rabbit_transcoding_tpu.bitstream.video_bitstream import (
    VideoBitstream,
    byte_stream_to_sample_stream,
    sample_stream_to_byte_stream,
    split_annexb,
)
from rabbit_transcoding_tpu.bitstream.writer import V3CWriter
from rabbit_transcoding_tpu.utils.enums import (
    AtlasTileType,
    NalUnitType,
    PatchModeITile,
    PatchModePTile,
    V3CUnitType,
    VideoType,
)


class TestBitIO:
    def test_u_roundtrip(self):
        bw = BitWriter()
        vals = [(1, 1), (3, 5), (7, 100), (16, 65535), (32, 12345678), (5, 0)]
        for n, v in vals:
            bw.u(n, v)
        bw.zero_align()
        br = BitReader(bw.data())
        for n, v in vals:
            assert br.u(n) == v

    def test_ue_se_roundtrip(self):
        rng = np.random.default_rng(0)
        ues = [0, 1, 2, 3, 7, 255, 65535] + list(rng.integers(0, 1 << 20, 50))
        ses = [0, 1, -1, 2, -2, 100, -100] + list(rng.integers(-1000, 1000, 50))
        bw = BitWriter()
        for v in ues:
            bw.ue(int(v))
        for v in ses:
            bw.se(int(v))
        bw.zero_align()
        br = BitReader(bw.data())
        for v in ues:
            assert br.ue() == v
        for v in ses:
            assert br.se() == v

    def test_golden_ue(self):
        # spec golden values: 0 -> '1', 1 -> '010', 2 -> '011', 3 -> '00100'
        bw = BitWriter()
        bw.ue(3)
        bw.zero_align()
        assert bw.data() == bytes([0b00100000])

    def test_byte_align(self):
        bw = BitWriter()
        bw.u(3, 5)
        bw.byte_align()
        data = bw.data()
        assert len(data) == 1 and data[0] == 0b10110000

    def test_overflow_raises(self):
        bw = BitWriter()
        with pytest.raises(ValueError):
            bw.u(3, 8)

    def test_eof_raises(self):
        br = BitReader(b"\x01")
        br.u(8)
        with pytest.raises(EOFError):
            br.u(1)


class TestFraming:
    def test_nal_roundtrip(self):
        nals = [
            NalUnit(NalUnitType.NAL_ASPS, payload=b"\x01\x02\x03"),
            NalUnit(NalUnitType.NAL_IDR_N_LP, payload=b"\xff" * 300),
            NalUnit(NalUnitType.NAL_TRAIL_R, payload=b""),
        ]
        data = write_sample_stream_nal(nals)
        nals2 = read_sample_stream_nal(data)
        assert [n.nal_unit_type for n in nals2] == [n.nal_unit_type for n in nals]
        assert [n.payload for n in nals2] == [n.payload for n in nals]

    def test_annexb_reframing(self):
        nal1 = b"\x40\x01" + b"payload-one"
        nal2 = b"\x42\x01" + b"payload-two\x00"
        annexb = b"\x00\x00\x00\x01" + nal1 + b"\x00\x00\x01" + nal2
        assert split_annexb(annexb) == [nal1, nal2]
        ss = byte_stream_to_sample_stream(annexb, 4)
        back = sample_stream_to_byte_stream(ss, 4)
        assert split_annexb(back) == [nal1, nal2]


def make_vps():
    vps = V3CParameterSet()
    a = vps.atlas(0)
    a.vps_frame_width = 1024
    a.vps_frame_height = 1024
    a.attribute_information = AttributeInformation(
        ai_attribute_count=1,
        ai_attribute_type_id=[0],
        ai_attribute_codec_id=[0],
        ai_attribute_dimension_minus1=[2],
        ai_attribute_2d_bitdepth_minus1=[7],
        ai_attribute_msb_align_flag=[False],
    )
    return vps


class TestSyntax:
    def test_vps_roundtrip(self):
        vps = make_vps()
        bw = BitWriter()
        vps.write(bw)
        vps2 = V3CParameterSet.read(BitReader(bw.data()))
        assert vps2.atlas(0).vps_frame_width == 1024
        assert vps2.atlas(0).attribute_information.ai_attribute_count == 1
        assert vps2.atlas(0).attribute_information.ai_attribute_dimension_minus1 == [2]

    def test_asps_roundtrip(self):
        asps = AtlasSequenceParameterSetRbsp(
            asps_frame_width=512,
            asps_frame_height=768,
            asps_log2_patch_packing_block_size=4,
            ref_list_structs=[
                RefListStruct(num_ref_entries=1, abs_delta_afoc_st=[1],
                              straf_entry_sign_flag=[True])
            ],
        )
        bw = BitWriter()
        asps.write(bw)
        asps2 = AtlasSequenceParameterSetRbsp.read(BitReader(bw.data()))
        assert asps2.asps_frame_width == 512
        assert asps2.asps_frame_height == 768
        assert asps2.ref_list_structs[0].num_ref_entries == 1
        assert asps2.asps_vpcc_surface_thickness_minus1 == 3

    def test_afps_roundtrip(self):
        asps = AtlasSequenceParameterSetRbsp()
        afps = AtlasFrameParameterSetRbsp(afps_num_ref_idx_default_active_minus1=2)
        bw = BitWriter()
        afps.write(bw, asps)
        afps2 = AtlasFrameParameterSetRbsp.read(
            BitReader(bw.data()), lambda _id: asps
        )
        assert afps2.afps_num_ref_idx_default_active_minus1 == 2
        assert afps2.atlas_frame_tile_information.afti_single_tile_in_atlas_frame_flag

    def test_patch_data_unit_roundtrip(self):
        ctx = SyntaxContext(normal_axis_max_delta=True)
        pdus = [
            PatchDataUnit(
                pdu_2d_pos_x=3, pdu_2d_pos_y=5, pdu_2d_size_x_minus1=15,
                pdu_2d_size_y_minus1=31, pdu_3d_offset_u=100, pdu_3d_offset_v=200,
                pdu_3d_offset_d=50, pdu_3d_range_d=12, pdu_projection_id=4,
                pdu_orientation_index=6,
            )
        ]
        bw = BitWriter()
        for p in pdus:
            p.write(bw, ctx)
        bw.zero_align()
        br = BitReader(bw.data())
        p2 = PatchDataUnit.read(br, ctx)
        assert p2 == pdus[0]

    def test_inter_patch_roundtrip(self):
        ctx = SyntaxContext(num_ref_idx_active=2, normal_axis_max_delta=True)
        ipdu = InterPatchDataUnit(
            ipdu_ref_index=1, ipdu_patch_index=-3, ipdu_2d_pos_x=-5,
            ipdu_2d_pos_y=7, ipdu_2d_delta_size_x=2, ipdu_2d_delta_size_y=-2,
            ipdu_3d_offset_u=1, ipdu_3d_offset_v=-1, ipdu_3d_offset_d=0,
            ipdu_3d_range_d=3,
        )
        bw = BitWriter()
        ipdu.write(bw, ctx)
        bw.zero_align()
        assert InterPatchDataUnit.read(BitReader(bw.data()), ctx) == ipdu


class TestSei:
    def test_hash_sei_roundtrip(self):
        sei = SeiDecodedAtlasInformationHash(
            high_level_md5=bytes(range(16)), atlas_md5=bytes(range(16, 32))
        )
        bw = BitWriter()
        write_sei_rbsp(bw, [sei])
        seis = read_sei_rbsp(BitReader(bw.data()), prefix=True)
        assert isinstance(seis[0], SeiDecodedAtlasInformationHash)
        assert seis[0].high_level_md5 == bytes(range(16))
        assert seis[0].atlas_md5 == bytes(range(16, 32))

    def test_codec_mapping_and_raw_passthrough(self):
        seis_in = [
            SeiComponentCodecMapping(ccm_codec_id=[0], ccm_codec_4cc=["rbv1"]),
            RawSei(payload_type=99, payload=b"opaque-bytes"),
            SeiGeometrySmoothing(gs_smoothing_threshold=32),
        ]
        bw = BitWriter()
        write_sei_rbsp(bw, seis_in)
        seis = read_sei_rbsp(BitReader(bw.data()), prefix=True)
        assert isinstance(seis[0], SeiComponentCodecMapping)
        assert seis[0].ccm_codec_4cc == ["rbv1"]
        assert isinstance(seis[1], RawSei) and seis[1].payload == b"opaque-bytes"
        assert seis[2].gs_smoothing_threshold == 32


def make_context(n_frames=3, n_patches=4):
    ctx = Context()
    ctx.vps_list.append(make_vps())
    atlas = ctx.atlas(0)
    asps = AtlasSequenceParameterSetRbsp(
        ref_list_structs=[
            RefListStruct(num_ref_entries=1, abs_delta_afoc_st=[1],
                          straf_entry_sign_flag=[True])
        ]
    )
    atlas.asps_list.append(asps)
    atlas.afps_list.append(AtlasFrameParameterSetRbsp())
    for f in range(n_frames):
        header = AtlasTileHeader(
            ath_type=AtlasTileType.I_TILE if f == 0 else AtlasTileType.P_TILE,
            ath_atlas_frm_order_cnt_lsb=f,
        )
        du = AtlasTileDataUnit()
        for p in range(n_patches):
            if f == 0:
                du.patches.append(
                    PatchInformationData(
                        patch_mode=int(PatchModeITile.I_INTRA),
                        data=PatchDataUnit(
                            pdu_2d_pos_x=p, pdu_2d_pos_y=p * 2,
                            pdu_2d_size_x_minus1=15, pdu_2d_size_y_minus1=15,
                            pdu_3d_offset_u=p * 10, pdu_3d_offset_v=0,
                            pdu_3d_offset_d=0, pdu_3d_range_d=8,
                            pdu_projection_id=p % 6, pdu_orientation_index=p % 8,
                        ),
                    )
                )
            else:
                du.patches.append(
                    PatchInformationData(
                        patch_mode=int(PatchModePTile.P_INTER),
                        data=InterPatchDataUnit(ipdu_patch_index=0,
                                                ipdu_2d_pos_x=1),
                    )
                )
        atl = AtlasTileLayerRbsp(header=header, data_unit=du)
        atl.afoc = f
        atlas.atlas_tile_layers.append(atl)
    atlas.set_video_bitstream(VideoBitstream(VideoType.OCCUPANCY, b"OCC" * 100))
    atlas.set_video_bitstream(VideoBitstream(VideoType.GEOMETRY, b"GEO" * 500))
    atlas.set_video_bitstream(VideoBitstream(VideoType.ATTRIBUTE, b"ATT" * 700))
    atlas.seis_prefix.append(SeiDecodedAtlasInformationHash())
    return ctx


class TestFullStream:
    def test_context_roundtrip(self):
        ctx = make_context()
        writer = V3CWriter()
        units = writer.encode(ctx)
        data = writer.write(units)

        reader = V3CReader()
        gofs = reader.read(data)
        assert len(gofs) == 1
        ctx2 = reader.decode(gofs[0])

        atlas2 = ctx2.atlas(0)
        assert len(atlas2.atlas_tile_layers) == 3
        assert atlas2.atlas_tile_layers[0].header.ath_type == AtlasTileType.I_TILE
        assert atlas2.atlas_tile_layers[1].header.ath_type == AtlasTileType.P_TILE
        du0 = atlas2.atlas_tile_layers[0].data_unit
        assert len(du0.patches) == 4
        pdu = du0.patches[2].data
        assert pdu.pdu_2d_pos_x == 2 and pdu.pdu_3d_offset_u == 20
        assert atlas2.get_video_bitstream(VideoType.GEOMETRY).data == b"GEO" * 500
        assert isinstance(atlas2.seis_prefix[0], SeiDecodedAtlasInformationHash)

    def test_multi_gof_stream(self):
        writer = V3CWriter()
        units = writer.encode(make_context(n_frames=2)) + writer.encode(
            make_context(n_frames=3)
        )
        data = writer.write(units)
        reader = V3CReader()
        gofs = reader.read(data)
        assert len(gofs) == 2
        assert len(reader.decode(gofs[0]).atlas(0).atlas_tile_layers) == 2
        assert len(reader.decode(gofs[1]).atlas(0).atlas_tile_layers) == 3

    def test_stat_accounting(self):
        writer = V3CWriter()
        units = writer.encode(make_context())
        writer.write(units)
        assert writer.stat.sizes[V3CUnitType.V3C_AVD] > 0
        assert writer.stat.total() > 0


class TestExtendedSei:
    def test_all_typed_seis_roundtrip(self):
        from rabbit_transcoding_tpu.bitstream import sei as sei_mod

        seis_in = [
            sei_mod.SeiUserDataUnregistered(uuid=bytes(range(16)),
                                            user_data=b"hello"),
            sei_mod.SeiRecoveryPoint(rp_recovery_afoc_cnt=-2),
            sei_mod.SeiNoReconstruction(),
            sei_mod.SeiTimeCode(tc_hours=12, tc_minutes=34, tc_seconds=56,
                                tc_n_frames=7),
            sei_mod.SeiActiveSubBitstreams(
                asb_active_attributes_changes_flag=True,
                asb_all_attributes_active_flag=False,
                asb_active_attribute_idx=[0, 1],
            ),
            sei_mod.SeiObjectLabelInformation(
                oli_labels=[(0, False, "person"), (3, False, "chair")]
            ),
            sei_mod.SeiVolumetricRectangleInformation(
                vri_log2_max_object_idx_tracked=4,
                vri_log2_max_rectangle_idx_updated=3,
                rectangles=[(0, False, True, (1, 2, 100, 200), [5])],
            ),
            sei_mod.SeiViewportCameraParameters(vcp_camera_id=7,
                                                vcp_camera_type=1),
            sei_mod.SeiViewportPosition(vp_viewport_id=1,
                                        vp_position=(10, 20, 30)),
            sei_mod.SeiAttributeTransformationParams(
                atp_params=[(0, 2, [(True, True, 65536, -5),
                                    (False, False, 0, 0)])]
            ),
            sei_mod.SeiSceneObjectInformation(
                soi_simple_objects_flag=False,
                soi_3d_bounding_box_present_flag=True,
                soi_log2_max_object_idx_updated=4,
                objects=[
                    {"idx": 0, "cancel": True,
                     "bbox": (1, 2, 3, 10, 20, 30)},
                    {"idx": 1, "cancel": False},
                ],
            ),
            sei_mod.SeiManifest(entries=[(21, 1), (66, 2)]),
            sei_mod.SeiFillerPayload(size=5),
            sei_mod.SeiUserDataRegisteredItuTT35(
                country_code=0xB5, user_data=b"\x00\x01t35"
            ),
            sei_mod.SeiAtlasObjectInformation(
                aoi_num_atlases_minus1=1,
                aoi_log2_max_object_idx_tracked=4,
                updates=[(5, [True, False]), (9, [False, True])],
            ),
            sei_mod.SeiPatchInformation(
                pi_log2_max_object_idx_tracked=4,
                pi_log2_max_patch_idx_updated=6,
                tiles=[(0, False, [(7, False, [5, 9]), (8, True, [])])],
            ),
        ]
        bw = BitWriter()
        sei_mod.write_sei_rbsp(bw, seis_in)
        seis_out = sei_mod.read_sei_rbsp(BitReader(bw.data()), prefix=True)
        assert len(seis_out) == len(seis_in)
        for a, b in zip(seis_in, seis_out):
            assert type(a) is type(b), (type(a), type(b))
        assert seis_out[0].user_data == b"hello"
        assert seis_out[1].rp_recovery_afoc_cnt == -2
        assert seis_out[3].tc_minutes == 34
        assert seis_out[4].asb_active_attribute_idx == [0, 1]
        assert seis_out[5].oli_labels == [(0, False, "person"),
                                          (3, False, "chair")]
        assert seis_out[6].rectangles == [
            (0, False, True, (1, 2, 100, 200), [5])
        ]
        assert seis_out[8].vp_position == (10, 20, 30)
        assert seis_out[9].atp_params == [(0, 2, [(True, True, 65536, -5),
                                                  (False, False, 0, 0)])]
        assert seis_out[10].objects[0]["bbox"] == (1, 2, 3, 10, 20, 30)
        assert seis_out[11].entries == [(21, 1), (66, 2)]
        assert seis_out[12].size == 5
        assert seis_out[13].user_data == b"\x00\x01t35"
        assert seis_out[14].updates == [(5, [True, False]),
                                        (9, [False, True])]
        assert seis_out[15].tiles == [
            (0, False, [(7, False, [5, 9]), (8, True, [])])
        ]


class TestHrdSeis:
    """The HRD trio (F.2.12-F.2.14): buffering period, atlas frame timing
    (widths from the active buffering period), SEI prefix indication."""

    def _bp(self):
        from rabbit_transcoding_tpu.bitstream import sei as sei_mod

        return sei_mod.SeiBufferingPeriod(
            bp_nal_hrd_params_present_flag=True,
            bp_acl_hrd_params_present_flag=True,
            bp_irap_cab_params_present_flag=True,
            bp_initial_cab_removal_delay_length_minus1=17,
            bp_au_cab_removal_delay_length_minus1=9,
            bp_dab_output_delay_length_minus1=11,
            bp_cab_delay_offset=100,
            bp_dab_delay_offset=200,
            bp_atlas_cab_removal_delay_delta_minus1=3,
            bp_max_sub_layers_minus1=1,
            bp_hrd_cab_cnt_minus1=[1, 0],
            bp_nal_initial_cab_removal_delay=[[11, 12], [13]],
            bp_nal_initial_cab_removal_offset=[[21, 22], [23]],
            bp_nal_initial_alt_cab_removal_delay=[[31, 32], [33]],
            bp_nal_initial_alt_cab_removal_offset=[[41, 42], [43]],
            bp_acl_initial_cab_removal_delay=[[51, 52], [53]],
            bp_acl_initial_cab_removal_offset=[[61, 62], [63]],
            bp_acl_initial_alt_cab_removal_delay=[[71, 72], [73]],
            bp_acl_initial_alt_cab_removal_offset=[[81, 82], [83]],
        )

    def test_buffering_period_roundtrip(self):
        from rabbit_transcoding_tpu.bitstream import sei as sei_mod

        bw = BitWriter()
        sei_mod.write_sei_rbsp(bw, [self._bp()])
        out = sei_mod.read_sei_rbsp(BitReader(bw.data()), prefix=True)[0]
        assert isinstance(out, sei_mod.SeiBufferingPeriod)
        assert out.bp_max_sub_layers_minus1 == 1
        assert out.bp_hrd_cab_cnt_minus1 == [1, 0]
        assert out.bp_nal_initial_cab_removal_delay == [[11, 12], [13]]
        assert out.bp_acl_initial_alt_cab_removal_offset == [[81, 82], [83]]
        assert out.bp_cab_delay_offset == 100

    def test_atlas_frame_timing_uses_active_bp(self):
        from rabbit_transcoding_tpu.bitstream import sei as sei_mod

        bp = self._bp()
        aft = sei_mod.SeiAtlasFrameTiming(
            aft_cab_removal_delay_minus1=[5, 6],
            aft_dab_output_delay=[7, 8],
            au_cab_len=bp.bp_au_cab_removal_delay_length_minus1 + 1,
            dab_len=bp.bp_dab_output_delay_length_minus1 + 1,
        )
        bw = BitWriter()
        sei_mod.write_sei_rbsp(bw, [bp, aft])
        out = sei_mod.read_sei_rbsp(BitReader(bw.data()), prefix=True)
        assert isinstance(out[1], sei_mod.SeiAtlasFrameTiming)
        assert out[1].aft_cab_removal_delay_minus1 == [5, 6]
        assert out[1].aft_dab_output_delay == [7, 8]

    def test_atlas_frame_timing_without_bp_stays_raw(self):
        from rabbit_transcoding_tpu.bitstream import sei as sei_mod
        from rabbit_transcoding_tpu.utils.enums import SeiPayloadType

        aft = sei_mod.SeiAtlasFrameTiming(
            aft_cab_removal_delay_minus1=[5], aft_dab_output_delay=[7],
        )
        bw = BitWriter()
        sei_mod.write_sei_rbsp(bw, [aft])
        out = sei_mod.read_sei_rbsp(BitReader(bw.data()), prefix=True)[0]
        # no buffering period in the rbsp: byte-exact passthrough
        assert isinstance(out, sei_mod.RawSei)
        assert out.payload_type == int(SeiPayloadType.ATLAS_FRAME_TIMING)
        assert out.payload == aft.payload_bytes()

    def test_prefix_indication_roundtrip(self):
        from rabbit_transcoding_tpu.bitstream import sei as sei_mod

        spi = sei_mod.SeiPrefixIndication(
            spi_prefix_sei_payload_type=14,
            spi_prefix_data_bits=[[1, 0, 1], [0] * 11 + [1]],
        )
        bw = BitWriter()
        sei_mod.write_sei_rbsp(bw, [spi])
        out = sei_mod.read_sei_rbsp(BitReader(bw.data()), prefix=True)[0]
        assert isinstance(out, sei_mod.SeiPrefixIndication)
        assert out.spi_prefix_sei_payload_type == 14
        assert out.spi_prefix_data_bits == [[1, 0, 1], [0] * 11 + [1]]


class TestProfileToolsetConstraints:
    """PTL toolset constraints info (8.3.4.6) + Context.check_profile
    (PCCHighLevelSyntax::checkProfile, PCCHighLevelSyntax.cpp:89-160)."""

    def _ctx(self, **ptc_kw):
        from rabbit_transcoding_tpu.bitstream.hls import Context
        from rabbit_transcoding_tpu.bitstream.syntax import (
            AtlasSequenceParameterSetRbsp,
            ProfileToolsetConstraintsInformation,
            V3CParameterSet,
        )

        ctx = Context()
        vps = V3CParameterSet()
        vps.atlas(0)
        vps.profile_tier_level.ptl_tool_constraints_present_flag = True
        vps.profile_tier_level.ptl_toolset_constraints = (
            ProfileToolsetConstraintsInformation(**ptc_kw)
        )
        ctx.vps_list.append(vps)
        ctx.atlas(0).asps_list.append(AtlasSequenceParameterSetRbsp())
        return ctx

    def test_ptci_roundtrip(self):
        from rabbit_transcoding_tpu.bitstream.syntax import ProfileTierLevel
        from rabbit_transcoding_tpu.bitstream.syntax import (
            ProfileToolsetConstraintsInformation,
        )

        ptl = ProfileTierLevel(
            ptl_tool_constraints_present_flag=True,
            ptl_toolset_constraints=ProfileToolsetConstraintsInformation(
                ptc_eom_constraint_flag=True,
                ptc_max_map_count_minus1=1,
                ptc_plr_constraint_flag=True,
            ),
        )
        bw = BitWriter()
        ptl.write(bw)
        bw.zero_align()
        out = ProfileTierLevel.read(BitReader(bw.data()))
        assert out.ptl_toolset_constraints is not None
        assert out.ptl_toolset_constraints.ptc_eom_constraint_flag
        assert out.ptl_toolset_constraints.ptc_max_map_count_minus1 == 1
        assert out.ptl_toolset_constraints.ptc_plr_constraint_flag

    def test_check_profile_clean(self):
        assert self._ctx().check_profile() == 0

    def test_check_profile_eom_violation(self):
        ctx = self._ctx(ptc_eom_constraint_flag=True)
        ctx.atlas(0).asps_list[0].asps_eom_patch_enabled_flag = True
        assert ctx.check_profile() == 2

    def test_check_profile_map_count_violation(self):
        ctx = self._ctx(ptc_max_map_count_minus1=0)
        ctx.vps.atlas(0).vps_map_count_minus1 = 1
        assert ctx.check_profile() == 7

    def test_check_profile_45deg_violation(self):
        ctx = self._ctx(ptc_no_45degree_projection_patch_constraint_flag=True)
        ctx.atlas(0).asps_list[0].asps_extended_projection_enabled_flag = True
        assert ctx.check_profile() == 8

    def test_no_constraints_always_passes(self):
        from rabbit_transcoding_tpu.bitstream.hls import Context
        from rabbit_transcoding_tpu.bitstream.syntax import (
            AtlasSequenceParameterSetRbsp,
            V3CParameterSet,
        )

        ctx = Context()
        vps = V3CParameterSet()
        vps.atlas(0)
        ctx.vps_list.append(vps)
        asps = AtlasSequenceParameterSetRbsp(asps_eom_patch_enabled_flag=True)
        ctx.atlas(0).asps_list.append(asps)
        assert ctx.check_profile() == 0


class TestVuiAndPlrInterMerge:
    """Round-4 verdict task 3: ASPS VUI and plrData on inter/merge patch
    units.  Cross-implementation fidelity is gated in test_refgate*.py;
    these cover the combinations the TMC2 oracle cannot carry (HRD-bearing
    VUI segfaults its reader, merge override-3d+plr desyncs its writer)."""

    def _vui(self):
        from rabbit_transcoding_tpu.bitstream.syntax import (
            CoordinateSystemParameters,
            HrdParameters,
            HrdSubLayerParameters,
            VUIParameters,
        )

        return VUIParameters(
            vui_timing_info_present_flag=True,
            vui_num_units_in_tick=1001,
            vui_time_scale=60000,
            vui_poc_proportional_to_timing_flag=True,
            vui_num_ticks_poc_diff_one_minus1=3,
            vui_hrd_parameters_present_flag=True,
            hrd_parameters=HrdParameters(
                hrd_nal_parameters_present_flag=True,
                hrd_acl_parameters_present_flag=True,
                hrd_bit_rate_scale=4,
                hrd_cab_size_scale=2,
                hrd_cab_cnt_minus1=1,
                hrd_sub_layer_nal=HrdSubLayerParameters(
                    [9, 5], [99, 55], [True, False]
                ),
                hrd_sub_layer_acl=HrdSubLayerParameters(
                    [1, 2], [3, 4], [False, True]
                ),
            ),
            vui_tile_restrictions_present_flag=True,
            vui_fixed_atlas_tile_structure_flag=True,
            vui_constrained_tiles_across_v3c_components_idc=2,
            vui_max_num_tiles_per_atlas_minus1=5,
            vui_coordinate_system_parameters_present_flag=True,
            coordinate_system_parameters=CoordinateSystemParameters(
                2, 1, 1, 0, 1
            ),
            vui_unit_in_metres_flag=True,
            vui_display_box_info_present_flag=True,
            vui_display_box_origin=[1, 2, 3],
            vui_display_box_size=[10, 20, 30],
            vui_anchor_point_present_flag=True,
            vui_anchor_point=[4, 5, 6],
        )

    def test_vui_hrd_roundtrip(self):
        from rabbit_transcoding_tpu.bitstream.syntax import VUIParameters

        vui = self._vui()
        bw = BitWriter()
        vui.write(bw)
        bw.zero_align()
        assert VUIParameters.read(BitReader(bw.data())) == vui

    def test_vui_in_asps_roundtrip(self):
        asps = AtlasSequenceParameterSetRbsp(
            asps_frame_width=256, asps_frame_height=128,
            asps_vui_parameters_present_flag=True,
        )
        asps.vui_parameters = self._vui()
        bw = BitWriter()
        asps.write(bw)
        a2 = AtlasSequenceParameterSetRbsp.read(BitReader(bw.data()))
        assert a2.vui_parameters == asps.vui_parameters

    def _plr_ctx(self):
        return SyntaxContext(
            plr_enabled=True, plr_mode_bits=1, plr_block_threshold_plus1=3,
        )

    def test_inter_patch_plr_roundtrip(self):
        """Inter plrData sized from the ref patch's map + 2D deltas
        (PCCBitstreamReader.cpp:1182-1218)."""
        ref_pdu = PatchDataUnit(pdu_2d_size_x_minus1=2, pdu_2d_size_y_minus1=1)
        ref_pdu.plrd_bu, ref_pdu.plrd_bv = 3, 2
        ref = [PatchInformationData(patch_mode=0, data=ref_pdu)]
        ipdu = InterPatchDataUnit(
            ipdu_patch_index=0, ipdu_2d_delta_size_x=1,
            ipdu_2d_delta_size_y=0, plrd_mode=1,
            plrd_block_modes=[1, 0, 0, 2, 0, 0, 1, 0],
        )
        ctx = self._plr_ctx()
        ctx.ref_patches = ref
        bw = BitWriter()
        ipdu.write(bw, ctx)
        bw.zero_align()
        assert (ipdu.plrd_bu, ipdu.plrd_bv) == (4, 2)
        assert (ctx.prev_patch_size_u, ctx.prev_patch_size_v) == (4, 2)
        assert ctx.pred_patch_index == 1
        ctx2 = self._plr_ctx()
        ctx2.ref_patches = ref
        i2 = InterPatchDataUnit.read(BitReader(bw.data()), ctx2)
        assert i2.plrd_block_modes == ipdu.plrd_block_modes
        assert (i2.plrd_bu, i2.plrd_bv) == (4, 2)

    def test_inter_patch_plr_missing_ref_raises(self):
        ipdu = InterPatchDataUnit(ipdu_patch_index=5)
        ctx = self._plr_ctx()
        ctx.ref_patches = []
        with pytest.raises(ValueError, match="does not exist"):
            ipdu.write(BitWriter(), ctx)

    def test_merge_override2d_plr_roundtrip(self):
        """Merge with override-2d carries plrData implicitly, sized from
        the running prev patch size + deltas (PCCBitstreamReader.cpp
        :1093-1135)."""
        m = MergePatchDataUnit(
            mpdu_override_2d_params_flag=True, mpdu_2d_pos_x=2,
            mpdu_2d_pos_y=-2, mpdu_2d_delta_size_x=-1,
            mpdu_2d_delta_size_y=0, plrd_mode=1,
            plrd_block_modes=None,
        )
        ctx = self._plr_ctx()
        ctx.prev_patch_size_u, ctx.prev_patch_size_v = 2, 1
        bw = BitWriter()
        m.write(bw, ctx)
        bw.zero_align()
        # (2,1) + (-1,0) -> 1x1 <= threshold -> patch-level signalling
        assert (m.plrd_bu, m.plrd_bv) == (1, 1)
        assert (ctx.prev_patch_size_u, ctx.prev_patch_size_v) == (1, 1)
        ctx2 = self._plr_ctx()
        ctx2.prev_patch_size_u, ctx2.prev_patch_size_v = 2, 1
        m2 = MergePatchDataUnit.read(BitReader(bw.data()), ctx2)
        assert m2.plrd_mode == 1
        assert (m2.plrd_bu, m2.plrd_bv) == (1, 1)

    def test_merge_override3d_plr_roundtrip(self):
        """Merge with override-3d + mpdu_override_plr_flag=1 — the branch
        TMC2's own writer cannot serialize (its local overridePlrFlag is
        only set in the override-2d branch, PCCBitstreamWriter.cpp
        :1277-1291); we follow the reader (= final 23090-5 semantics)."""
        m = MergePatchDataUnit(
            mpdu_override_2d_params_flag=False,
            mpdu_override_3d_params_flag=True,
            mpdu_3d_offset_u=6, mpdu_3d_offset_v=-6, mpdu_3d_offset_d=7,
            mpdu_override_plr_flag=True, plrd_mode=0,
            plrd_block_modes=[0, 1, 0, 2, 1, 0],
        )
        ctx = self._plr_ctx()
        ctx.prev_patch_size_u, ctx.prev_patch_size_v = 3, 2
        bw = BitWriter()
        m.write(bw, ctx)
        bw.zero_align()
        ctx2 = self._plr_ctx()
        ctx2.prev_patch_size_u, ctx2.prev_patch_size_v = 3, 2
        m2 = MergePatchDataUnit.read(BitReader(bw.data()), ctx2)
        assert m2.mpdu_override_plr_flag
        assert m2.plrd_block_modes == [0, 1, 0, 2, 1, 0]
        assert (m2.plrd_bu, m2.plrd_bv) == (3, 2)

    def test_merge_degenerate_map_raises(self):
        m = MergePatchDataUnit(
            mpdu_override_2d_params_flag=True,
            mpdu_2d_delta_size_x=-5, mpdu_2d_delta_size_y=0,
        )
        ctx = self._plr_ctx()
        ctx.prev_patch_size_u, ctx.prev_patch_size_v = 3, 2
        with pytest.raises(ValueError, match="degenerate"):
            m.write(BitWriter(), ctx)
