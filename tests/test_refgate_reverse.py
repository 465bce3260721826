"""Reverse cross-implementation gate: reference-writer -> our reader.

tools/refgate/refwrite.cpp populates the TMC2 reference high-level-syntax
structures with known values and serializes them with the REFERENCE
PCCBitstreamWriter; this test parses the result with our V3CReader and
asserts every planted value — proving the reader consumes
reference-written syntax, not just our own writer's output.
"""

import shutil
import subprocess

import pytest

from rabbit_transcoding_tpu.bitstream import V3CReader
from rabbit_transcoding_tpu.bitstream.sei import SeiGeometrySmoothing
from rabbit_transcoding_tpu.bitstream.syntax import (
    InterPatchDataUnit,
    PatchDataUnit,
    SkipPatchDataUnit,
)
from rabbit_transcoding_tpu.conformance import refgate
from rabbit_transcoding_tpu.utils.enums import (
    AtlasTileType,
    PatchModeITile,
    PatchModePTile,
    VideoType,
)

pytestmark = pytest.mark.skipif(
    not refgate.reference_available() or shutil.which("g++") is None,
    reason="reference sources or g++ not available",
)


@pytest.fixture(scope="module")
def ref_stream(tmp_path_factory):
    refgate.build_refgate()
    path = tmp_path_factory.mktemp("refgate") / "ref_stream.bin"
    subprocess.run(
        [str(refgate.BUILD_DIR / "refwrite"), str(path)],
        check=True, capture_output=True,
    )
    return path.read_bytes()


@pytest.fixture(scope="module")
def ref_stream_plr(tmp_path_factory):
    """refwrite's 'plr' mode: single-map stream with PLR enabled and
    plrData planted on intra (block- and patch-level), inter, and merge
    patch data units — the syntax families the round-4 review flagged."""
    refgate.build_refgate()
    path = tmp_path_factory.mktemp("refgate") / "ref_stream_plr.bin"
    subprocess.run(
        [str(refgate.BUILD_DIR / "refwrite"), str(path), "plr"],
        check=True, capture_output=True,
    )
    return path.read_bytes()


class TestReferenceWriterToOurReader:
    def test_vps(self, ref_stream):
        r = V3CReader()
        gofs = r.read(ref_stream)
        assert len(gofs) == 1
        ctx = r.decode(gofs[0])
        vps = ctx.vps_list[0]
        assert vps.profile_tier_level.ptl_profile_codec_group_idc == 127
        assert vps.profile_tier_level.ptl_level_idc == 30
        a = vps.atlas(0)
        assert (a.vps_frame_width, a.vps_frame_height) == (256, 128)
        assert a.vps_map_count_minus1 == 1
        assert not a.vps_multiple_map_streams_present_flag
        assert a.geometry_information.gi_geometry_3d_coordinates_bitdepth_minus1 == 9
        assert a.occupancy_information.oi_occupancy_2d_bitdepth_minus1 == 7
        ai = a.attribute_information
        assert ai.ai_attribute_count == 1
        assert ai.ai_attribute_dimension_minus1 == [2]
        assert ai.ai_attribute_2d_bitdepth_minus1 == [7]

    def test_asps_afps(self, ref_stream):
        r = V3CReader()
        ctx = r.decode(r.read(ref_stream)[0])
        atlas = ctx.atlases[0]
        asps = atlas.asps(0)
        assert (asps.asps_frame_width, asps.asps_frame_height) == (256, 128)
        assert asps.asps_use_eight_orientations_flag
        assert asps.asps_normal_axis_limits_quantization_enabled_flag
        assert not asps.asps_normal_axis_max_delta_value_enabled_flag
        assert asps.asps_log2_patch_packing_block_size == 4
        assert asps.asps_map_count_minus1 == 1
        assert len(asps.ref_list_structs) == 1
        assert asps.ref_list_structs[0].num_ref_entries == 1
        assert asps.ref_list_structs[0].abs_delta_afoc_st == [1]
        afps = atlas.afps(0)
        assert afps.afps_num_ref_idx_default_active_minus1 == 0
        assert not afps.afps_raw_3d_offset_bit_count_explicit_mode_flag
        afti = afps.atlas_frame_tile_information
        assert afti.afti_single_tile_in_atlas_frame_flag

    def test_i_tile_patches(self, ref_stream):
        r = V3CReader()
        atlas = r.decode(r.read(ref_stream)[0]).atlases[0]
        atl0 = atlas.atlas_tile_layers[0]
        assert atl0.header.ath_type == AtlasTileType.I_TILE
        assert atl0.header.ath_pos_min_d_quantizer == 2
        modes = [p.patch_mode for p in atl0.data_unit.patches]
        assert modes == [int(PatchModeITile.I_INTRA)] * 2
        p0 = atl0.data_unit.patches[0].data
        assert isinstance(p0, PatchDataUnit)
        assert (p0.pdu_2d_pos_x, p0.pdu_2d_pos_y) == (3, 1)
        assert (p0.pdu_2d_size_x_minus1, p0.pdu_2d_size_y_minus1) == (15, 7)
        assert (p0.pdu_3d_offset_u, p0.pdu_3d_offset_v, p0.pdu_3d_offset_d) \
            == (11, 22, 33)
        assert p0.pdu_projection_id == 2
        assert p0.pdu_orientation_index == 5
        p1 = atl0.data_unit.patches[1].data
        assert (p1.pdu_3d_offset_u, p1.pdu_3d_offset_v, p1.pdu_3d_offset_d) \
            == (44, 55, 66)
        assert p1.pdu_projection_id == 4

    def test_p_tile_patches(self, ref_stream):
        r = V3CReader()
        atlas = r.decode(r.read(ref_stream)[0]).atlases[0]
        atl1 = atlas.atlas_tile_layers[1]
        assert atl1.header.ath_type == AtlasTileType.P_TILE
        assert atl1.header.ath_atlas_frm_order_cnt_lsb == 1
        pats = atl1.data_unit.patches
        assert [p.patch_mode for p in pats] == [
            int(PatchModePTile.P_SKIP),
            int(PatchModePTile.P_INTER),
            int(PatchModePTile.P_INTRA),
        ]
        assert isinstance(pats[0].data, SkipPatchDataUnit)
        ip = pats[1].data
        assert isinstance(ip, InterPatchDataUnit)
        assert (ip.ipdu_2d_pos_x, ip.ipdu_2d_pos_y) == (1, -1)
        assert (ip.ipdu_2d_delta_size_x, ip.ipdu_2d_delta_size_y) == (2, -2)
        assert (ip.ipdu_3d_offset_u, ip.ipdu_3d_offset_v, ip.ipdu_3d_offset_d) \
            == (3, -3, 4)
        pp = pats[2].data
        assert (pp.pdu_3d_offset_u, pp.pdu_3d_offset_v, pp.pdu_3d_offset_d) \
            == (77, 88, 99)
        assert pp.pdu_orientation_index == 3

    def test_sei_and_videos(self, ref_stream):
        r = V3CReader()
        atlas = r.decode(r.read(ref_stream)[0]).atlases[0]
        gs = [s for s in atlas.seis_prefix
              if isinstance(s, SeiGeometrySmoothing)]
        assert len(gs) == 1
        assert gs[0].gs_smoothing_method_type == 1
        assert gs[0].gs_smoothing_grid_size_minus2 == 6
        assert gs[0].gs_smoothing_threshold == 64
        vids = {k: len(v.data) for k, v in atlas.video_bitstreams.items()}
        assert vids[VideoType.OCCUPANCY] == 13
        assert vids[VideoType.GEOMETRY] == 24
        assert vids[VideoType.ATTRIBUTE] == 13
        assert atlas.video_bitstreams[VideoType.OCCUPANCY].data \
            == b"OCCUPANCYDATA"


class TestReferencePLRStream:
    """TMC2-written PLR stream -> our reader (round-4 verdict task 3).

    Field values mirror the plr-mode plantings in tools/refgate/refwrite.cpp;
    block-map sizing follows PCCBitstreamReader.cpp:1067-1218 (intra from
    coded sizes, inter from the ref patch's map + deltas, merge from the
    running prev size + deltas).
    """

    def test_asps_plri(self, ref_stream_plr):
        r = V3CReader()
        atlas = r.decode(r.read(ref_stream_plr)[0]).atlases[0]
        asps = atlas.asps(0)
        assert asps.asps_plr_enabled_flag
        assert asps.asps_map_count_minus1 == 0
        assert asps.asps_plr_number_of_modes_minus1 == 2
        assert asps.plri_block_threshold_per_patch_minus1 == 2
        assert asps.plri_interpolate_flag == [True, False]
        assert asps.plri_filling_flag == [False, True]
        assert asps.plri_minimum_depth == [1, 2]
        assert asps.plri_neighbour_minus1 == [1, 0]

    def test_intra_plr(self, ref_stream_plr):
        r = V3CReader()
        atlas = r.decode(r.read(ref_stream_plr)[0]).atlases[0]
        atl0 = atlas.atlas_tile_layers[0]
        assert atl0.header.ath_type == AtlasTileType.I_TILE
        p0 = atl0.data_unit.patches[0].data
        assert isinstance(p0, PatchDataUnit)
        # 3x2 blocks > threshold+1(3) -> block-level signalling
        assert (p0.plrd_bu, p0.plrd_bv) == (3, 2)
        assert p0.plrd_block_modes == [0, 1, 0, 2, 1, 0]
        p1 = atl0.data_unit.patches[1].data
        # 1 block <= threshold -> patch-level, mode_minus1=1 -> mode 2
        assert (p1.plrd_bu, p1.plrd_bv) == (1, 1)
        assert p1.plrd_block_modes is None
        assert p1.plrd_mode == 2

    def test_inter_merge_plr(self, ref_stream_plr):
        r = V3CReader()
        atlas = r.decode(r.read(ref_stream_plr)[0]).atlases[0]
        atl1 = atlas.atlas_tile_layers[1]
        assert atl1.header.ath_type == AtlasTileType.P_TILE
        pats = atl1.data_unit.patches
        assert [p.patch_mode for p in pats] == [
            int(PatchModePTile.P_INTER),
            int(PatchModePTile.P_MERGE),
            int(PatchModePTile.P_MERGE),
        ]
        ip = pats[0].data
        assert isinstance(ip, InterPatchDataUnit)
        # ref = ATL0 patch0 (3x2 map), delta (+1, 0) -> 4x2
        assert (ip.plrd_bu, ip.plrd_bv) == (4, 2)
        assert ip.plrd_block_modes == [1, 0, 0, 2, 0, 0, 1, 0]
        m1 = pats[1].data
        # merge overriding 2D: prev (4,2) + delta (-1,0) -> 3x2
        assert m1.mpdu_override_2d_params_flag
        assert (m1.plrd_bu, m1.plrd_bv) == (3, 2)
        assert m1.plrd_block_modes == [0, 2, 0, 2, 0, 2]
        m2 = pats[2].data
        # merge overriding 3D with override_plr=0 (TMC2's writer cannot
        # emit plrData in this branch -- see refwrite.cpp); no PLR carried
        assert m2.mpdu_override_3d_params_flag
        assert not m2.mpdu_override_plr_flag
        assert (m2.plrd_bu, m2.plrd_bv) == (0, 0)

    def test_plr_stream_reserializes_field_identical(self, ref_stream_plr):
        """Parse the TMC2 PLR stream, re-serialize with OUR writer, and
        field-diff the result through the reference parser — proving the
        writer side of the new syntax against the same oracle."""
        import numpy as np

        from rabbit_transcoding_tpu.bitstream import V3CWriter

        r = V3CReader()
        ctx = r.decode(r.read(ref_stream_plr)[0])
        data = V3CWriter().write(V3CWriter().encode(ctx))
        path = refgate.BUILD_DIR / "rewrite_plr.bin"
        path.write_bytes(data)
        ref_fields = refgate.run_refparse(path)
        ours = refgate.flatten_contexts(
            [V3CReader().decode(g) for g in V3CReader().read(data)]
        )
        problems = refgate.compare(ref_fields, ours)
        assert not problems, "\n".join(problems[:50])
        del np
