// refparse — cross-implementation V3C syntax gate, parse side.
//
// Links against the MPEG TMC2 reference bitstream reader (compiled in-place
// from /root/reference/source/lib/PccLibBitstream{Common,Reader}; see
// build.sh) and dumps every parsed high-level-syntax field as flat
// `key=value` integer lines on stdout.  tests/test_refgate.py encodes
// streams with rabbit_transcoding_tpu at several operating points, runs
// this binary on the .bin, and asserts field-level equality with our own
// parsed structs — the fidelity gate SURVEY.md §7 milestone 1 calls for
// ("decode(reference .bin) == our structs", here exercised in the
// our-writer -> reference-reader direction; the reverse direction lives in
// refwrite.cpp).
//
// This file is original glue code; the reference implementation is only
// linked, never copied (reference entry points:
// PCCBitstreamReader.h:95-110, PccAppParser.cpp:50-77).
#include <cinttypes>
#include <cstdio>
#include <string>

#include "PCCBitstreamCommon.h"
#include "PCCHighLevelSyntax.h"
#include "PCCBitstream.h"
#include "PCCBitstreamReader.h"

using namespace pcc;

static int gofIndex = 0;

#define P( fmt, ... ) printf( "g%d." fmt "\n", gofIndex, __VA_ARGS__ )

static void dumpVps( V3CParameterSet& vps ) {
  P( "vps.id=%u", vps.getV3CParameterSetId() );
  P( "vps.atlas_count_minus1=%u", vps.getAtlasCountMinus1() );
  auto& ptl = vps.getProfileTierLevel();
  P( "vps.ptl.tier=%d", (int)ptl.getTierFlag() );
  P( "vps.ptl.codec_group_idc=%d", (int)ptl.getProfileCodecGroupIdc() );
  P( "vps.ptl.toolset_idc=%d", (int)ptl.getProfileToolsetIdc() );
  P( "vps.ptl.reconstruction_idc=%d", (int)ptl.getProfileReconstructionIdc() );
  P( "vps.ptl.level_idc=%d", (int)ptl.getLevelIdc() );
  for ( uint32_t j = 0; j <= vps.getAtlasCountMinus1(); j++ ) {
    P( "vps.atlas%u.id=%u", j, vps.getAtlasId( j ) );
    P( "vps.atlas%u.frame_width=%u", j, vps.getFrameWidth( j ) );
    P( "vps.atlas%u.frame_height=%u", j, vps.getFrameHeight( j ) );
    P( "vps.atlas%u.map_count_minus1=%u", j, vps.getMapCountMinus1( j ) );
    P( "vps.atlas%u.multiple_map_streams=%d", j,
       (int)vps.getMultipleMapStreamsPresentFlag( j ) );
    P( "vps.atlas%u.auxiliary_video=%d", j,
       (int)vps.getAuxiliaryVideoPresentFlag( j ) );
    P( "vps.atlas%u.occupancy_video=%d", j,
       (int)vps.getOccupancyVideoPresentFlag( j ) );
    P( "vps.atlas%u.geometry_video=%d", j,
       (int)vps.getGeometryVideoPresentFlag( j ) );
    P( "vps.atlas%u.attribute_video=%d", j,
       (int)vps.getAttributeVideoPresentFlag( j ) );
    for ( uint32_t m = 1; m <= vps.getMapCountMinus1( j ); m++ ) {
      P( "vps.atlas%u.map%u.absolute_coding=%d", j, m,
         (int)vps.getMapAbsoluteCodingEnableFlag( j, m ) );
    }
    auto& gi = vps.getGeometryInformation( j );
    P( "vps.atlas%u.gi.codec_id=%d", j, (int)gi.getGeometryCodecId() );
    P( "vps.atlas%u.gi.bitdepth_2d_minus1=%d", j,
       (int)gi.getGeometry2dBitdepthMinus1() );
    P( "vps.atlas%u.gi.bitdepth_3d_minus1=%d", j,
       (int)gi.getGeometry3dCoordinatesBitdepthMinus1() );
    P( "vps.atlas%u.gi.msb_align=%d", j, (int)gi.getGeometryMSBAlignFlag() );
    if ( vps.getAuxiliaryVideoPresentFlag( j ) )
      P( "vps.atlas%u.gi.aux_codec_id=%d", j,
         (int)gi.getAuxiliaryGeometryCodecId() );
    auto& oi = vps.getOccupancyInformation( j );
    P( "vps.atlas%u.oi.codec_id=%d", j, (int)oi.getOccupancyCodecId() );
    P( "vps.atlas%u.oi.bitdepth_2d_minus1=%d", j,
       (int)oi.getOccupancy2DBitdepthMinus1() );
    P( "vps.atlas%u.oi.msb_align=%d", j, (int)oi.getOccupancyMSBAlignFlag() );
    P( "vps.atlas%u.oi.lossy_threshold=%d", j,
       (int)oi.getLossyOccupancyCompressionThreshold() );
    auto& ai = vps.getAttributeInformation( j );
    P( "vps.atlas%u.ai.count=%d", j, (int)ai.getAttributeCount() );
    for ( int a = 0; a < (int)ai.getAttributeCount(); a++ ) {
      P( "vps.atlas%u.ai.attr%d.type=%d", j, a, (int)ai.getAttributeTypeId( a ) );
      P( "vps.atlas%u.ai.attr%d.codec_id=%d", j, a,
         (int)ai.getAttributeCodecId( a ) );
      P( "vps.atlas%u.ai.attr%d.dimension_minus1=%d", j, a,
         (int)ai.getAttributeDimensionMinus1( a ) );
      P( "vps.atlas%u.ai.attr%d.bitdepth_2d_minus1=%d", j, a,
         (int)ai.getAttribute2dBitdepthMinus1( a ) );
      P( "vps.atlas%u.ai.attr%d.msb_align=%d", j, a,
         (int)ai.getAttributeMSBAlignFlag( a ) );
      P( "vps.atlas%u.ai.attr%d.dimension_partitions_minus1=%d", j, a,
         (int)ai.getAttributeDimensionPartitionsMinus1( a ) );
    }
  }
}

static void dumpAsps( AtlasSequenceParameterSetRbsp& asps, size_t i ) {
  P( "asps%zu.id=%d", i, (int)asps.getAtlasSequenceParameterSetId() );
  P( "asps%zu.frame_width=%d", i, (int)asps.getFrameWidth() );
  P( "asps%zu.frame_height=%d", i, (int)asps.getFrameHeight() );
  P( "asps%zu.geometry_3d_bitdepth_minus1=%d", i,
     (int)asps.getGeometry3dBitdepthMinus1() );
  P( "asps%zu.geometry_2d_bitdepth_minus1=%d", i,
     (int)asps.getGeometry2dBitdepthMinus1() );
  P( "asps%zu.log2_max_afoc_lsb_minus4=%d", i,
     (int)asps.getLog2MaxAtlasFrameOrderCntLsbMinus4() );
  P( "asps%zu.max_dec_frame_buffering_minus1=%d", i,
     (int)asps.getMaxDecAtlasFrameBufferingMinus1() );
  P( "asps%zu.long_term_ref_flag=%d", i,
     (int)asps.getLongTermRefAtlasFramesFlag() );
  P( "asps%zu.num_ref_lists=%d", i, (int)asps.getNumRefAtlasFrameListsInAsps() );
  for ( size_t r = 0; r < asps.getNumRefAtlasFrameListsInAsps(); r++ ) {
    auto& rls = asps.getRefListStruct( r );
    P( "asps%zu.rls%zu.num_ref_entries=%d", i, r, (int)rls.getNumRefEntries() );
  }
  P( "asps%zu.use_eight_orientations=%d", i,
     (int)asps.getUseEightOrientationsFlag() );
  P( "asps%zu.extended_projection=%d", i,
     (int)asps.getExtendedProjectionEnabledFlag() );
  P( "asps%zu.max_number_projections_minus1=%d", i,
     (int)asps.getMaxNumberProjectionsMinus1() );
  P( "asps%zu.normal_axis_limits_quantization=%d", i,
     (int)asps.getNormalAxisLimitsQuantizationEnabledFlag() );
  P( "asps%zu.normal_axis_max_delta_value=%d", i,
     (int)asps.getNormalAxisMaxDeltaValueEnabledFlag() );
  P( "asps%zu.patch_precedence_order=%d", i,
     (int)asps.getPatchPrecedenceOrderFlag() );
  P( "asps%zu.log2_patch_packing_block_size=%d", i,
     (int)asps.getLog2PatchPackingBlockSize() );
  P( "asps%zu.patch_size_quantizer_present=%d", i,
     (int)asps.getPatchSizeQuantizerPresentFlag() );
  P( "asps%zu.map_count_minus1=%d", i, (int)asps.getMapCountMinus1() );
  P( "asps%zu.pixel_deinterleaving=%d", i,
     (int)asps.getPixelDeinterleavingFlag() );
  P( "asps%zu.eom_patch_enabled=%d", i, (int)asps.getEomPatchEnabledFlag() );
  if ( asps.getEomPatchEnabledFlag() && asps.getMapCountMinus1() == 0 )
    P( "asps%zu.eom_fix_bit_count_minus1=%d", i,
       (int)asps.getEomFixBitCountMinus1() );
  P( "asps%zu.raw_patch_enabled=%d", i, (int)asps.getRawPatchEnabledFlag() );
  P( "asps%zu.auxiliary_video_enabled=%d", i,
     (int)asps.getAuxiliaryVideoEnabledFlag() );
  P( "asps%zu.plr_enabled=%d", i, (int)asps.getPLREnabledFlag() );
  if ( asps.getPLREnabledFlag() ) {
    for ( size_t m = 0; m <= asps.getMapCountMinus1(); m++ ) {
      auto& plri = asps.getPLRInformation( m );
      P( "asps%zu.plri%zu.map_enabled=%d", i, m,
         (int)plri.getMapEnabledFlag() );
      if ( plri.getMapEnabledFlag() ) {
        P( "asps%zu.plri%zu.number_of_modes_minus1=%d", i, m,
           (int)plri.getNumberOfModesMinus1() );
        P( "asps%zu.plri%zu.block_threshold_per_patch_minus1=%d", i, m,
           (int)plri.getBlockThresholdPerPatchMinus1() );
        for ( size_t k = 0; k < plri.getNumberOfModesMinus1(); k++ ) {
          P( "asps%zu.plri%zu.mode%zu.interpolate=%d", i, m, k,
             (int)plri.getInterpolateFlag( k ) );
          P( "asps%zu.plri%zu.mode%zu.filling=%d", i, m, k,
             (int)plri.getFillingFlag( k ) );
          P( "asps%zu.plri%zu.mode%zu.minimum_depth=%d", i, m, k,
             (int)plri.getMinimumDepth( k ) );
          P( "asps%zu.plri%zu.mode%zu.neighbour_minus1=%d", i, m, k,
             (int)plri.getNeighbourMinus1( k ) );
        }
      }
    }
  }
  P( "asps%zu.vui_present=%d", i, (int)asps.getVuiParametersPresentFlag() );
  if ( asps.getVuiParametersPresentFlag() ) {
    auto& vp = asps.getVuiParameters();
    P( "asps%zu.vui.timing_info=%d", i, (int)vp.getTimingInfoPresentFlag() );
    if ( vp.getTimingInfoPresentFlag() ) {
      P( "asps%zu.vui.num_units_in_tick=%u", i, vp.getNumUnitsInTick() );
      P( "asps%zu.vui.time_scale=%u", i, vp.getTimeScale() );
      P( "asps%zu.vui.poc_proportional=%d", i,
         (int)vp.getPocProportionalToTimingFlag() );
      if ( vp.getPocProportionalToTimingFlag() )
        P( "asps%zu.vui.num_ticks_poc_diff_one_minus1=%u", i,
           vp.getNumTicksPocDiffOneMinus1() );
      P( "asps%zu.vui.hrd_present=%d", i,
         (int)vp.getHrdParametersPresentFlag() );
      if ( vp.getHrdParametersPresentFlag() ) {
        auto& hp = vp.getHrdParameters();
        P( "asps%zu.vui.hrd.nal_present=%d", i,
           (int)hp.getNalParametersPresentFlag() );
        P( "asps%zu.vui.hrd.acl_present=%d", i,
           (int)hp.getAclParametersPresentFlag() );
        if ( hp.getNalParametersPresentFlag() ||
             hp.getAclParametersPresentFlag() ) {
          P( "asps%zu.vui.hrd.bit_rate_scale=%d", i,
             (int)hp.getBitRateScale() );
          P( "asps%zu.vui.hrd.cab_size_scale=%d", i,
             (int)hp.getCabSizeScale() );
        }
      }
    }
    P( "asps%zu.vui.tile_restrictions=%d", i,
       (int)vp.getTileRestrictionsPresentFlag() );
    if ( vp.getTileRestrictionsPresentFlag() ) {
      P( "asps%zu.vui.fixed_atlas_tile=%d", i,
         (int)vp.getFixedAtlasTileStructureFlag() );
      P( "asps%zu.vui.fixed_video_tile=%d", i,
         (int)vp.getFixedVideoTileStructureFlag() );
      P( "asps%zu.vui.constrained_tiles_idc=%u", i,
         vp.getConstrainedTilesAcrossV3cComponentsIdc() );
      P( "asps%zu.vui.max_num_tiles_minus1=%u", i,
         vp.getMaxNumTilesPerAtlasMinus1() );
    }
    P( "asps%zu.vui.csp_present=%d", i,
       (int)vp.getCoordinateSystemParametersPresentFlag() );
    if ( vp.getCoordinateSystemParametersPresentFlag() ) {
      auto& csp = vp.getCoordinateSystemParameters();
      P( "asps%zu.vui.csp.forward_axis=%d", i, (int)csp.getForwardAxis() );
      P( "asps%zu.vui.csp.delta_left_axis=%d", i,
         (int)csp.getDeltaLeftAxis() );
      P( "asps%zu.vui.csp.forward_sign=%d", i, (int)csp.getForwardSign() );
      P( "asps%zu.vui.csp.left_sign=%d", i, (int)csp.getLeftSign() );
      P( "asps%zu.vui.csp.up_sign=%d", i, (int)csp.getUpSign() );
    }
    P( "asps%zu.vui.unit_in_metres=%d", i, (int)vp.getUnitInMetresFlag() );
    P( "asps%zu.vui.display_box_present=%d", i,
       (int)vp.getDisplayBoxInfoPresentFlag() );
    if ( vp.getDisplayBoxInfoPresentFlag() ) {
      for ( size_t d = 0; d < 3; d++ ) {
        P( "asps%zu.vui.display_box_origin%zu=%u", i, d,
           vp.getDisplayBoxOrigin( d ) );
        P( "asps%zu.vui.display_box_size%zu=%u", i, d,
           vp.getDisplayBoxSize( d ) );
      }
      P( "asps%zu.vui.anchor_present=%d", i,
         (int)vp.getAnchorPointPresentFlag() );
      if ( vp.getAnchorPointPresentFlag() )
        for ( size_t d = 0; d < 3; d++ )
          P( "asps%zu.vui.anchor_point%zu=%d", i, d,
             (int)vp.getAnchorPoint( d ) );
    }
  }
  P( "asps%zu.extension_flag=%d", i, (int)asps.getExtensionFlag() );
  if ( asps.getExtensionFlag() ) {
    P( "asps%zu.vpcc_extension_flag=%d", i, (int)asps.getVpccExtensionFlag() );
  }
}

static void dumpAfps( AtlasFrameParameterSetRbsp& afps, size_t i ) {
  P( "afps%zu.id=%d", i, (int)afps.getAtlasFrameParameterSetId() );
  P( "afps%zu.asps_id=%d", i, (int)afps.getAtlasSequenceParameterSetId() );
  P( "afps%zu.num_ref_idx_default_active_minus1=%d", i,
     (int)afps.getNumRefIdxDefaultActiveMinus1() );
  P( "afps%zu.additional_lt_afoc_lsb_len=%d", i,
     (int)afps.getAdditionalLtAfocLsbLen() );
  P( "afps%zu.lod_mode_enabled=%d", i, (int)afps.getLodModeEnableFlag() );
  P( "afps%zu.raw_3d_offset_explicit_mode=%d", i,
     (int)afps.getRaw3dOffsetBitCountExplicitModeFlag() );
  P( "afps%zu.output_flag_present=%d", i, (int)afps.getOutputFlagPresentFlag() );
  auto& afti = afps.getAtlasFrameTileInformation();
  P( "afps%zu.afti.single_tile=%d", i, (int)afti.getSingleTileInAtlasFrameFlag() );
  if ( !afti.getSingleTileInAtlasFrameFlag() ) {
    P( "afps%zu.afti.uniform_partition_spacing=%d", i,
       (int)afti.getUniformPartitionSpacingFlag() );
    P( "afps%zu.afti.num_partition_columns_minus1=%d", i,
       (int)afti.getNumPartitionColumnsMinus1() );
    P( "afps%zu.afti.num_partition_rows_minus1=%d", i,
       (int)afti.getNumPartitionRowsMinus1() );
    if ( afti.getUniformPartitionSpacingFlag() ) {
      P( "afps%zu.afti.partition_cols_width_minus1=%d", i,
         (int)afti.getPartitionColumnWidthMinus1( 0 ) );
      P( "afps%zu.afti.partition_rows_height_minus1=%d", i,
         (int)afti.getPartitionRowHeightMinus1( 0 ) );
    } else {
      for ( size_t c = 0; c < afti.getNumPartitionColumnsMinus1(); c++ )
        P( "afps%zu.afti.col%zu.width_minus1=%d", i, c,
           (int)afti.getPartitionColumnWidthMinus1( c ) );
      for ( size_t r = 0; r < afti.getNumPartitionRowsMinus1(); r++ )
        P( "afps%zu.afti.row%zu.height_minus1=%d", i, r,
           (int)afti.getPartitionRowHeightMinus1( r ) );
    }
    P( "afps%zu.afti.single_partition_per_tile=%d", i,
       (int)afti.getSinglePartitionPerTileFlag() );
    P( "afps%zu.afti.num_tiles_minus1=%d", i,
       (int)afti.getNumTilesInAtlasFrameMinus1() );
    if ( !afti.getSinglePartitionPerTileFlag() ) {
      for ( size_t t = 0; t <= afti.getNumTilesInAtlasFrameMinus1(); t++ ) {
        P( "afps%zu.afti.tile%zu.top_left_partition=%d", i, t,
           (int)afti.getTopLeftPartitionIdx( t ) );
        P( "afps%zu.afti.tile%zu.bottom_right_col_offset=%d", i, t,
           (int)afti.getBottomRightPartitionColumnOffset( t ) );
        P( "afps%zu.afti.tile%zu.bottom_right_row_offset=%d", i, t,
           (int)afti.getBottomRightPartitionRowOffset( t ) );
      }
    }
    P( "afps%zu.afti.signalled_tile_id=%d", i,
       (int)afti.getSignalledTileIdFlag() );
  }
}

static void dumpPlrd( PLRData& plrd, const std::string& k ) {
  printf( "g%d.%s.map_width=%d\n", gofIndex, k.c_str(),
          (int)plrd.getBlockToPatchMapWidth() );
  printf( "g%d.%s.map_height=%d\n", gofIndex, k.c_str(),
          (int)plrd.getBlockToPatchMapHeight() );
  printf( "g%d.%s.level=%d\n", gofIndex, k.c_str(), (int)plrd.getLevelFlag() );
  if ( plrd.getLevelFlag() ) {
    printf( "g%d.%s.present=%d\n", gofIndex, k.c_str(),
            (int)plrd.getPresentFlag() );
    if ( plrd.getPresentFlag() )
      printf( "g%d.%s.mode_minus1=%d\n", gofIndex, k.c_str(),
              (int)plrd.getModeMinus1() );
  } else {
    size_t n = (size_t)plrd.getBlockToPatchMapWidth() *
               (size_t)plrd.getBlockToPatchMapHeight();
    for ( size_t b = 0; b < n; b++ ) {
      printf( "g%d.%s.block%zu.present=%d\n", gofIndex, k.c_str(), b,
              (int)plrd.getBlockPresentFlag( b ) );
      if ( plrd.getBlockPresentFlag( b ) )
        printf( "g%d.%s.block%zu.mode_minus1=%d\n", gofIndex, k.c_str(), b,
                (int)plrd.getBlockModeMinus1( b ) );
    }
  }
}

static void dumpAtl( AtlasTileLayerRbsp& atl, size_t t, bool plrEnabled ) {
  auto& ath = atl.getHeader();
  P( "atl%zu.afps_id=%d", t, (int)ath.getAtlasFrameParameterSetId() );
  P( "atl%zu.id=%d", t, (int)ath.getId() );
  P( "atl%zu.type=%d", t, (int)ath.getType() );
  P( "atl%zu.afoc_lsb=%d", t, (int)ath.getAtlasFrmOrderCntLsb() );
  P( "atl%zu.pos_min_d_quantizer=%d", t, (int)ath.getPosMinDQuantizer() );
  P( "atl%zu.pos_delta_max_d_quantizer=%d", t,
     (int)ath.getPosDeltaMaxDQuantizer() );
  P( "atl%zu.patch_size_x_quantizer=%d", t,
     (int)ath.getPatchSizeXinfoQuantizer() );
  P( "atl%zu.patch_size_y_quantizer=%d", t,
     (int)ath.getPatchSizeYinfoQuantizer() );
  P( "atl%zu.raw_3d_offset_bit_count_minus1=%d", t,
     (int)ath.getRaw3dOffsetAxisBitCountMinus1() );
  P( "atl%zu.ref_list_sps_flag=%d", t, (int)ath.getRefAtlasFrameListSpsFlag() );
  auto& atdu = atl.getDataUnit();
  P( "atl%zu.patch_count=%d", t, (int)atdu.getPatchCount() );
  char key[96];
  for ( size_t p = 0; p < atdu.getPatchCount(); p++ ) {
    auto& pid = atdu.getPatchInformationData( p );
    uint8_t mode = pid.getPatchMode();
    P( "atl%zu.patch%zu.mode=%d", t, p, (int)mode );
    bool isP = ath.getType() == P_TILE;
    if ( ( !isP && mode == I_INTRA ) ||
         ( isP && mode == P_INTRA ) ) {
      auto& u = pid.getPatchDataUnit();
      P( "atl%zu.patch%zu.pos_x=%d", t, p, (int)u.get2dPosX() );
      P( "atl%zu.patch%zu.pos_y=%d", t, p, (int)u.get2dPosY() );
      P( "atl%zu.patch%zu.size_x_minus1=%d", t, p, (int)u.get2dSizeXMinus1() );
      P( "atl%zu.patch%zu.size_y_minus1=%d", t, p, (int)u.get2dSizeYMinus1() );
      P( "atl%zu.patch%zu.offset_u=%d", t, p, (int)u.get3dOffsetU() );
      P( "atl%zu.patch%zu.offset_v=%d", t, p, (int)u.get3dOffsetV() );
      P( "atl%zu.patch%zu.offset_d=%d", t, p, (int)u.get3dOffsetD() );
      P( "atl%zu.patch%zu.range_d=%d", t, p, (int)u.get3dRangeD() );
      P( "atl%zu.patch%zu.projection_id=%d", t, p, (int)u.getProjectionId() );
      P( "atl%zu.patch%zu.orientation=%d", t, p, (int)u.getOrientationIndex() );
      P( "atl%zu.patch%zu.lod_enable=%d", t, p, (int)u.getLodEnableFlag() );
      if ( plrEnabled ) {
        snprintf( key, sizeof key, "atl%zu.patch%zu.plrd", t, p );
        dumpPlrd( u.getPLRData(), key );
      }
    } else if ( isP && mode == P_INTER ) {
      auto& u = pid.getInterPatchDataUnit();
      P( "atl%zu.patch%zu.ref_index=%d", t, p, (int)u.getRefIndex() );
      P( "atl%zu.patch%zu.ref_patch_index=%d", t, p, (int)u.getRefPatchIndex() );
      P( "atl%zu.patch%zu.pos_x=%d", t, p, (int)u.get2dPosX() );
      P( "atl%zu.patch%zu.pos_y=%d", t, p, (int)u.get2dPosY() );
      P( "atl%zu.patch%zu.delta_size_x=%d", t, p, (int)u.get2dDeltaSizeX() );
      P( "atl%zu.patch%zu.delta_size_y=%d", t, p, (int)u.get2dDeltaSizeY() );
      P( "atl%zu.patch%zu.offset_u=%d", t, p, (int)u.get3dOffsetU() );
      P( "atl%zu.patch%zu.offset_v=%d", t, p, (int)u.get3dOffsetV() );
      P( "atl%zu.patch%zu.offset_d=%d", t, p, (int)u.get3dOffsetD() );
      P( "atl%zu.patch%zu.range_d=%d", t, p, (int)u.get3dRangeD() );
      if ( plrEnabled ) {
        snprintf( key, sizeof key, "atl%zu.patch%zu.plrd", t, p );
        dumpPlrd( u.getPLRData(), key );
      }
    } else if ( ( !isP && mode == I_RAW ) ||
                ( isP && mode == P_RAW ) ) {
      auto& u = pid.getRawPatchDataUnit();
      P( "atl%zu.patch%zu.in_aux_video=%d", t, p,
         (int)u.getPatchInAuxiliaryVideoFlag() );
      P( "atl%zu.patch%zu.pos_x=%d", t, p, (int)u.get2dPosX() );
      P( "atl%zu.patch%zu.pos_y=%d", t, p, (int)u.get2dPosY() );
      P( "atl%zu.patch%zu.size_x_minus1=%d", t, p, (int)u.get2dSizeXMinus1() );
      P( "atl%zu.patch%zu.size_y_minus1=%d", t, p, (int)u.get2dSizeYMinus1() );
      P( "atl%zu.patch%zu.offset_u=%d", t, p, (int)u.get3dOffsetU() );
      P( "atl%zu.patch%zu.offset_v=%d", t, p, (int)u.get3dOffsetV() );
      P( "atl%zu.patch%zu.offset_d=%d", t, p, (int)u.get3dOffsetD() );
      P( "atl%zu.patch%zu.points_minus1=%d", t, p, (int)u.getRawPointsMinus1() );
    } else if ( ( !isP && mode == I_EOM ) ||
                ( isP && mode == P_EOM ) ) {
      auto& u = pid.getEomPatchDataUnit();
      P( "atl%zu.patch%zu.in_aux_video=%d", t, p,
         (int)u.getPatchInAuxiliaryVideoFlag() );
      P( "atl%zu.patch%zu.pos_x=%d", t, p, (int)u.get2dPosX() );
      P( "atl%zu.patch%zu.pos_y=%d", t, p, (int)u.get2dPosY() );
      P( "atl%zu.patch%zu.size_x_minus1=%d", t, p, (int)u.get2dSizeXMinus1() );
      P( "atl%zu.patch%zu.size_y_minus1=%d", t, p, (int)u.get2dSizeYMinus1() );
      P( "atl%zu.patch%zu.patch_count_minus1=%d", t, p,
         (int)u.getPatchCountMinus1() );
      for ( size_t a = 0; a <= u.getPatchCountMinus1(); a++ ) {
        P( "atl%zu.patch%zu.assoc%zu.idx=%d", t, p, a,
           (int)u.getAssociatedPatchesIdx( a ) );
        P( "atl%zu.patch%zu.assoc%zu.points=%d", t, p, a,
           (int)u.getPoints( a ) );
      }
    } else if ( isP && mode == P_SKIP ) {
      // no payload
    } else if ( isP && mode == P_MERGE ) {
      auto& u = pid.getMergePatchDataUnit();
      P( "atl%zu.patch%zu.ref_index=%d", t, p, (int)u.getRefIndex() );
      P( "atl%zu.patch%zu.override_2d=%d", t, p,
         (int)u.getOverride2dParamsFlag() );
      P( "atl%zu.patch%zu.override_3d=%d", t, p,
         (int)u.getOverride3dParamsFlag() );
      if ( u.getOverride2dParamsFlag() ) {
        P( "atl%zu.patch%zu.pos_x=%d", t, p, (int)u.get2dPosX() );
        P( "atl%zu.patch%zu.pos_y=%d", t, p, (int)u.get2dPosY() );
        P( "atl%zu.patch%zu.delta_size_x=%d", t, p, (int)u.get2dDeltaSizeX() );
        P( "atl%zu.patch%zu.delta_size_y=%d", t, p, (int)u.get2dDeltaSizeY() );
      } else if ( u.getOverride3dParamsFlag() ) {
        P( "atl%zu.patch%zu.offset_u=%d", t, p, (int)u.get3dOffsetU() );
        P( "atl%zu.patch%zu.offset_v=%d", t, p, (int)u.get3dOffsetV() );
        P( "atl%zu.patch%zu.offset_d=%d", t, p, (int)u.get3dOffsetD() );
        P( "atl%zu.patch%zu.override_plr=%d", t, p,
           (int)u.getOverridePlrFlag() );
      }
      if ( plrEnabled && u.getPLRData().getBlockToPatchMapWidth() > 0 ) {
        snprintf( key, sizeof key, "atl%zu.patch%zu.plrd", t, p );
        dumpPlrd( u.getPLRData(), key );
      }
    }
  }
  // SEI payload types attached to this ATL (prefix + suffix)
  auto& sei = atl.getSEI();
  size_t np = 0, ns = 0;
  for ( auto& s : sei.getSeiPrefix() )
    P( "atl%zu.sei_prefix%zu.type=%d", t, np++, (int)s->getPayloadType() );
  for ( auto& s : sei.getSeiSuffix() )
    P( "atl%zu.sei_suffix%zu.type=%d", t, ns++, (int)s->getPayloadType() );
}

int main( int argc, char* argv[] ) {
  if ( argc < 2 ) {
    fprintf( stderr, "usage: refparse <stream.bin> [--trace]\n" );
    return 2;
  }
  PCCBitstream     bitstream;
  PCCBitstreamStat stat;
  PCCLogger        logger;
  bool             trace = argc > 2 && std::string( argv[2] ) == "--trace";
  if ( trace ) {
    // BITSTREAM_TRACE build: per-field trace lands in <stream>_bitstream.log
    logger.initilalize( removeFileExtension( argv[1] ), false );
#ifdef BITSTREAM_TRACE
    bitstream.setLogger( logger );
    bitstream.setTrace( true );
#endif
  }
  if ( !bitstream.initialize( std::string( argv[1] ) ) ) { return 1; }
  stat.setHeader( bitstream.size() );
  SampleStreamV3CUnit ssvu;
  PCCBitstreamReader::read( bitstream, ssvu );
  bool more = true;
  while ( more ) {
    PCCBitstreamReader reader;
    PCCHighLevelSyntax syntax;
    syntax.setBitstreamStat( stat );
#ifdef BITSTREAM_TRACE
    if ( trace ) { reader.setLogger( logger ); }
#endif
    if ( reader.decode( ssvu, syntax ) == 0 ) { break; }
    auto& vps = syntax.getVps();
    dumpVps( vps );
    for ( uint32_t j = 0; j <= vps.getAtlasCountMinus1(); j++ ) {
      syntax.setAtlasIndex( j );
      auto& hls  = syntax.getAtlasHighLevelSyntax( j );
      auto& alst = hls.getAtlasSequenceParameterSetList();
      for ( size_t i = 0; i < alst.size(); i++ ) dumpAsps( alst[i], i );
      auto& flst = hls.getAtlasFrameParameterSetList();
      for ( size_t i = 0; i < flst.size(); i++ ) dumpAfps( flst[i], i );
      auto& atls = hls.getAtlasTileLayerList();
      for ( size_t t = 0; t < atls.size(); t++ ) {
        size_t aspsId = 0;
        if ( t < atls.size() && flst.size() > 0 ) {
          auto& ath = atls[t].getHeader();
          aspsId    = flst[ath.getAtlasFrameParameterSetId()]
                       .getAtlasSequenceParameterSetId();
        }
        bool plr = alst.size() > aspsId && alst[aspsId].getPLREnabledFlag();
        dumpAtl( atls[t], t, plr );
      }
      // video sub-bitstream inventory
      for ( size_t v = 0; v < hls.getVideoBitstreamCount(); v++ ) {
        auto& vb = hls.getVideoBitstream( v );
        P( "video%zu.size=%zu", v, vb.size() );
      }
    }
    gofIndex++;
    more = ssvu.getV3CUnitCount() > 0;
  }
  printf( "gof_count=%d\n", gofIndex );
  return 0;
}
