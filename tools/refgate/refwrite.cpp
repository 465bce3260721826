// refwrite — cross-implementation V3C syntax gate, reverse direction.
//
// Populates the MPEG TMC2 reference high-level-syntax structures with a
// small but representative stream (VPS + ASPS + AFPS + an I tile with two
// intra patches + a P tile with intra/inter/skip + a geometry-smoothing
// prefix SEI + tiny video payloads) and serializes it with the REFERENCE
// writer (PCCBitstreamWriter).  tests/test_refgate_reverse.py parses the
// result with rabbit_transcoding_tpu's reader and asserts the exact field
// values set here — proving our reader consumes reference-written syntax,
// not just its own.
//
// Original glue code; reference code is linked, never copied
// (PCCBitstreamWriter.h:93-99 encode/write entry points).
#include <cstdio>
#include <string>

#include "PCCBitstreamCommon.h"
#include "PCCHighLevelSyntax.h"
#include "PCCBitstream.h"
#include "PCCBitstreamWriter.h"

using namespace pcc;

int main( int argc, char* argv[] ) {
  if ( argc < 2 ) {
    fprintf( stderr, "usage: refwrite <out.bin> [plr]\n" );
    return 2;
  }
  // "plr" mode: single-map stream with PLR enabled (intra + inter + merge
  // patches all carrying plrData) and a full ASPS VUI — the two syntax
  // families the round-4 review flagged as reader gaps.
  const bool plrMode = argc > 2 && std::string( argv[2] ) == "plr";
  PCCHighLevelSyntax syntax;
  PCCBitstreamStat   stat;
  syntax.setBitstreamStat( stat );
  syntax.allocateAtlasHLS( 1 );
  syntax.setAtlasIndex( 0 );

  // ---- VPS ---------------------------------------------------------
  auto& vps = syntax.addV3CParameterSet( 0 );
  auto& ptl = vps.getProfileTierLevel();
  ptl.setTierFlag( false );
  ptl.setProfileCodecGroupIdc( 127 );
  ptl.setProfileToolsetIdc( 0 );
  ptl.setProfileReconstructionIdc( 0 );
  ptl.setLevelIdc( 30 );
  vps.setV3CParameterSetId( 0 );
  vps.allocateAtlas();  // needs atlasCountMinus1 set first? set then alloc
  vps.setAtlasCountMinus1( 0 );
  vps.allocateAtlas();
  vps.setAtlasId( 0, 0 );
  vps.setFrameWidth( 0, 256 );
  vps.setFrameHeight( 0, 128 );
  vps.setMapCountMinus1( 0, plrMode ? 0 : 1 );
  vps.allocateMap( 0 );
  vps.setMultipleMapStreamsPresentFlag( 0, false );
  vps.setMapAbsoluteCodingEnableFlag( 0, 0, true );
  if ( !plrMode ) { vps.setMapAbsoluteCodingEnableFlag( 0, 1, true ); }
  vps.setAuxiliaryVideoPresentFlag( 0, false );
  vps.setOccupancyVideoPresentFlag( 0, true );
  vps.setGeometryVideoPresentFlag( 0, true );
  vps.setAttributeVideoPresentFlag( 0, true );
  auto& oi = vps.getOccupancyInformation( 0 );
  oi.setOccupancyCodecId( 0 );
  oi.setLossyOccupancyCompressionThreshold( 0 );
  oi.setOccupancy2DBitdepthMinus1( 7 );
  oi.setOccupancyMSBAlignFlag( false );
  auto& gi = vps.getGeometryInformation( 0 );
  gi.setGeometryCodecId( 0 );
  gi.setGeometry2dBitdepthMinus1( 9 );
  gi.setGeometryMSBAlignFlag( false );
  gi.setGeometry3dCoordinatesBitdepthMinus1( 9 );
  auto& ai = vps.getAttributeInformation( 0 );
  ai.setAttributeCount( 1 );
  ai.allocate();
  ai.setAttributeTypeId( 0, 0 );
  ai.setAttributeCodecId( 0, 0 );
  ai.setAttributeMapAbsoluteCodingPersistenceFlag( 0, true );
  ai.setAttributeDimensionMinus1( 0, 2 );
  ai.setAttributeDimensionPartitionsMinus1( 0, 0 );
  ai.setAttribute2dBitdepthMinus1( 0, 7 );
  ai.setAttributeMSBAlignFlag( 0, false );

  // ---- ASPS --------------------------------------------------------
  auto& asps = syntax.addAtlasSequenceParameterSet( 0 );
  asps.setFrameWidth( 256 );
  asps.setFrameHeight( 128 );
  asps.setGeometry3dBitdepthMinus1( 9 );
  asps.setGeometry2dBitdepthMinus1( 9 );
  asps.setLog2MaxAtlasFrameOrderCntLsbMinus4( 4 );
  asps.setMaxDecAtlasFrameBufferingMinus1( 0 );
  asps.setLongTermRefAtlasFramesFlag( false );
  asps.setNumRefAtlasFrameListsInAsps( 1 );
  asps.allocateRefListStruct();
  auto& rls = asps.getRefListStruct( 0 );
  rls.setNumRefEntries( 1 );
  rls.allocate();
  rls.setStRefAtalsFrameFlag( 0, true );
  rls.setAbsDeltaAfocSt( 0, 1 );
  rls.setStrafEntrySignFlag( 0, true );
  asps.setUseEightOrientationsFlag( true );
  asps.setExtendedProjectionEnabledFlag( false );
  asps.setMaxNumberProjectionsMinus1( 5 );
  asps.setNormalAxisLimitsQuantizationEnabledFlag( true );
  asps.setNormalAxisMaxDeltaValueEnabledFlag( false );
  asps.setPatchPrecedenceOrderFlag( false );
  asps.setLog2PatchPackingBlockSize( 4 );
  asps.setPatchSizeQuantizerPresentFlag( false );
  asps.setMapCountMinus1( plrMode ? 0 : 1 );
  asps.setPixelDeinterleavingFlag( false );
  asps.setRawPatchEnabledFlag( false );
  asps.setEomPatchEnabledFlag( false );
  asps.setAuxiliaryVideoEnabledFlag( false );
  asps.setPLREnabledFlag( plrMode );
  if ( plrMode ) {
    asps.allocatePLRInformation();
    auto& plri = asps.getPLRInformation( 0 );
    plri.setMapEnabledFlag( true );
    plri.setNumberOfModesMinus1( 2 );  // coded modes 1..2
    plri.allocate();
    plri.setInterpolateFlag( 0, true );
    plri.setFillingFlag( 0, false );
    plri.setMinimumDepth( 0, 1 );
    plri.setNeighbourMinus1( 0, 1 );
    plri.setInterpolateFlag( 1, false );
    plri.setFillingFlag( 1, true );
    plri.setMinimumDepth( 1, 2 );
    plri.setNeighbourMinus1( 1, 0 );
    plri.setBlockThresholdPerPatchMinus1( 2 );  // level flag coded when >3
  }
  // NOTE: VUI stays OFF even in plr mode.  The reference's own writer and
  // reader disagree on the VUI syntax: PCCBitstreamWriter::vuiParameters
  // emits a vui_max_coded_video_resolution present flag that
  // PCCBitstreamReader::vuiParameters never parses (dormant in TMC2 —
  // no config enables VUI), so a TMC2-written VUI cannot round-trip
  // through TMC2 itself.  We follow the READER (= final 23090-5 syntax);
  // VUI is gated in the forward direction (our writer -> reference
  // reader, tests/test_refgate.py).
  asps.setVuiParametersPresentFlag( false );
  asps.setExtensionFlag( true );
  asps.setVpccExtensionFlag( true );
  asps.setExtension7Bits( 0 );
  auto& ext = asps.getAspsVpccExtension();
  ext.setRemoveDuplicatePointEnableFlag( false );
  ext.setSurfaceThicknessMinus1( 3 );

  // ---- AFPS --------------------------------------------------------
  auto& afps = syntax.addAtlasFrameParameterSet( 0 );
  afps.setAtlasSequenceParameterSetId( 0 );
  afps.setNumRefIdxDefaultActiveMinus1( 0 );
  afps.setAdditionalLtAfocLsbLen( 0 );
  afps.setLodModeEnableFlag( false );
  afps.setRaw3dOffsetBitCountExplicitModeFlag( false );
  afps.setOutputFlagPresentFlag( false );
  auto& afti = afps.getAtlasFrameTileInformation();
  afti.setSingleTileInAtlasFrameFlag( true );

  // ---- ATL 0: I tile, two intra patches -----------------------------
  auto& atl0 = syntax.addAtlasTileLayer();
  auto& ath0 = atl0.getHeader();
  ath0.setAtlasFrameParameterSetId( 0 );
  ath0.setAtlasAdaptationParameterSetId( 0 );
  ath0.setId( 0 );
  ath0.setType( I_TILE );
  ath0.setAtlasFrmOrderCntLsb( 0 );
  ath0.setRefAtlasFrameListSpsFlag( true );
  ath0.setRefAtlasFrameListIdx( 0 );
  ath0.setPosMinDQuantizer( 2 );
  ath0.setPosDeltaMaxDQuantizer( 0 );
  ath0.setPatchSizeXinfoQuantizer( 0 );
  ath0.setPatchSizeYinfoQuantizer( 0 );
  ath0.setRaw3dOffsetAxisBitCountMinus1( 255 );  // inferred: g3d==g2d -> -1
  auto& atdu0 = atl0.getDataUnit();
  {
    auto& pid = atdu0.addPatchInformationData( uint8_t( I_INTRA ) );
    auto& pdu = pid.getPatchDataUnit();
    pdu.set2dPosX( 3 );
    pdu.set2dPosY( 1 );
    pdu.set2dSizeXMinus1( plrMode ? 2 : 15 );
    pdu.set2dSizeYMinus1( plrMode ? 1 : 7 );
    pdu.set3dOffsetU( 11 );
    pdu.set3dOffsetV( 22 );
    pdu.set3dOffsetD( 33 );
    pdu.setProjectionId( 2 );
    pdu.setOrientationIndex( 5 );
    pdu.setLodEnableFlag( false );
    if ( plrMode ) {
      // 3x2 blocks > threshold+1(3) -> block-level signalling
      auto& plrd = pdu.getPLRData();
      plrd.allocate( 3, 2 );
      plrd.setLevelFlag( false );
      const int modes[6] = { 0, 1, 0, 2, 1, 0 };  // 0 = off, m>0 -> m-1
      for ( size_t b = 0; b < 6; b++ ) {
        plrd.setBlockPresentFlag( b, modes[b] > 0 );
        if ( modes[b] > 0 ) plrd.setBlockModeMinus1( b, modes[b] - 1 );
      }
    }
  }
  {
    auto& pid = atdu0.addPatchInformationData( uint8_t( I_INTRA ) );
    auto& pdu = pid.getPatchDataUnit();
    pdu.set2dPosX( 4 );
    pdu.set2dPosY( 2 );
    pdu.set2dSizeXMinus1( plrMode ? 0 : 31 );
    pdu.set2dSizeYMinus1( plrMode ? 0 : 15 );
    pdu.set3dOffsetU( 44 );
    pdu.set3dOffsetV( 55 );
    pdu.set3dOffsetD( 66 );
    pdu.setProjectionId( 4 );
    pdu.setOrientationIndex( 1 );
    pdu.setLodEnableFlag( false );
    if ( plrMode ) {
      // 1 block <= threshold+1 -> level flag inferred patch-level
      auto& plrd = pdu.getPLRData();
      plrd.allocate( 1, 1 );
      plrd.setLevelFlag( true );
      plrd.setPresentFlag( true );
      plrd.setModeMinus1( 1 );
    }
  }
  atdu0.addPatchInformationData( uint8_t( I_END ) );
  // a prefix SEI on ATL0: grid geometry smoothing
  auto& sei = static_cast<SEIGeometrySmoothing&>(
      atl0.getSEI().addSei( NAL_PREFIX_ESEI, GEOMETRY_SMOOTHING ) );
  sei.setPersistenceFlag( true );
  sei.setResetFlag( false );
  sei.setInstancesUpdated( 1 );
  sei.allocate();
  sei.setInstanceIndex( 0, 0 );
  sei.setInstanceCancelFlag( 0, false );
  sei.setMethodType( 0, 1 );
  sei.setFilterEomPointsFlag( 0, false );
  sei.setGridSizeMinus2( 0, 6 );
  sei.setThreshold( 0, 64 );

  // ---- ATL 1: P tile with skip + inter + intra ----------------------
  auto& atl1 = syntax.addAtlasTileLayer();
  auto& ath1 = atl1.getHeader();
  ath1.setAtlasFrameParameterSetId( 0 );
  ath1.setAtlasAdaptationParameterSetId( 0 );
  ath1.setId( 0 );
  ath1.setType( P_TILE );
  ath1.setAtlasFrmOrderCntLsb( 1 );
  ath1.setRefAtlasFrameListSpsFlag( true );
  ath1.setRefAtlasFrameListIdx( 0 );
  ath1.setPosMinDQuantizer( 2 );
  ath1.setPosDeltaMaxDQuantizer( 0 );
  ath1.setRaw3dOffsetAxisBitCountMinus1( 255 );
  auto& atdu1 = atl1.getDataUnit();
  if ( plrMode ) {
    {
      // inter patch ref=ATL0 patch0 (3x2), delta (+1,0) -> 4x2 map,
      // 8 blocks > 3 -> block-level
      auto& pid  = atdu1.addPatchInformationData( uint8_t( P_INTER ) );
      auto& ipdu = pid.getInterPatchDataUnit();
      ipdu.setRefIndex( 0 );
      ipdu.setRefPatchIndex( 0 );
      ipdu.set2dPosX( 1 );
      ipdu.set2dPosY( -1 );
      ipdu.set2dDeltaSizeX( 1 );
      ipdu.set2dDeltaSizeY( 0 );
      ipdu.set3dOffsetU( 3 );
      ipdu.set3dOffsetV( -3 );
      ipdu.set3dOffsetD( 4 );
      auto& plrd = ipdu.getPLRData();
      plrd.allocate( 4, 2 );
      plrd.setLevelFlag( false );
      for ( size_t b = 0; b < 8; b++ ) {
        plrd.setBlockPresentFlag( b, ( b % 3 ) == 0 );
        if ( ( b % 3 ) == 0 ) plrd.setBlockModeMinus1( b, b % 2 );
      }
    }
    {
      // merge patch overriding 2D params: prev (4,2) + delta (-1,0)
      // -> 3x2 map, block-level
      auto& pid  = atdu1.addPatchInformationData( uint8_t( P_MERGE ) );
      auto& mpdu = pid.getMergePatchDataUnit();
      mpdu.setRefIndex( 0 );
      mpdu.setOverride2dParamsFlag( true );
      mpdu.set2dPosX( 2 );
      mpdu.set2dPosY( -2 );
      mpdu.set2dDeltaSizeX( -1 );
      mpdu.set2dDeltaSizeY( 0 );
      auto& plrd = mpdu.getPLRData();
      plrd.allocate( 3, 2 );
      plrd.setLevelFlag( false );
      for ( size_t b = 0; b < 6; b++ ) {
        plrd.setBlockPresentFlag( b, b % 2 == 1 );
        if ( b % 2 == 1 ) plrd.setBlockModeMinus1( b, 1 );
      }
    }
    {
      // merge patch overriding 3D params.  override_plr stays 0: TMC2's
      // writer has a dormant bug in this branch — it codes the
      // mpdu_override_plr_flag bit (PCCBitstreamWriter.cpp:1285-1287) but
      // its local overridePlrFlag is only set in the override-2d branch,
      // so plrData is never serialized even when the flag is 1, while
      // the reader (PCCBitstreamReader.cpp:1122-1135) DOES read plrData
      // when the flag is set -> TMC2 cannot round-trip its own stream.
      // Our writer+reader follow the reader (= final 23090-5 semantics);
      // the flag=1 read path is covered by our own round-trip tests.
      auto& pid  = atdu1.addPatchInformationData( uint8_t( P_MERGE ) );
      auto& mpdu = pid.getMergePatchDataUnit();
      mpdu.setRefIndex( 0 );
      mpdu.setOverride2dParamsFlag( false );
      mpdu.setOverride3dParamsFlag( true );
      mpdu.set3dOffsetU( 6 );
      mpdu.set3dOffsetV( -6 );
      mpdu.set3dOffsetD( 7 );
      mpdu.setOverridePlrFlag( 0 );
    }
  } else {
    atdu1.addPatchInformationData( uint8_t( P_SKIP ) );
    {
      auto& pid  = atdu1.addPatchInformationData( uint8_t( P_INTER ) );
      auto& ipdu = pid.getInterPatchDataUnit();
      ipdu.setRefIndex( 0 );
      ipdu.setRefPatchIndex( 0 );
      ipdu.set2dPosX( 1 );
      ipdu.set2dPosY( -1 );
      ipdu.set2dDeltaSizeX( 2 );
      ipdu.set2dDeltaSizeY( -2 );
      ipdu.set3dOffsetU( 3 );
      ipdu.set3dOffsetV( -3 );
      ipdu.set3dOffsetD( 4 );
    }
    {
      auto& pid = atdu1.addPatchInformationData( uint8_t( P_INTRA ) );
      auto& pdu = pid.getPatchDataUnit();
      pdu.set2dPosX( 7 );
      pdu.set2dPosY( 3 );
      pdu.set2dSizeXMinus1( 9 );
      pdu.set2dSizeYMinus1( 4 );
      pdu.set3dOffsetU( 77 );
      pdu.set3dOffsetV( 88 );
      pdu.set3dOffsetD( 99 );
      pdu.setProjectionId( 1 );
      pdu.setOrientationIndex( 3 );
      pdu.setLodEnableFlag( false );
    }
  }
  atdu1.addPatchInformationData( uint8_t( P_END ) );

  // ---- video sub-streams --------------------------------------------
  {
    // fill each stream before creating the next: createVideoBitstream
    // returns a reference into a vector that reallocates on growth
    auto& ovd = syntax.createVideoBitstream( VIDEO_OCCUPANCY );
    ovd.resize( 13 );
    memcpy( ovd.buffer(), "OCCUPANCYDATA", 13 );
  }
  {
    auto& gvd = syntax.createVideoBitstream( VIDEO_GEOMETRY );
    gvd.resize( 24 );
    memcpy( gvd.buffer(), "GEOMETRYDATAGEOMETRYDATA", 24 );
  }
  {
    auto& avd = syntax.createVideoBitstream( VIDEO_ATTRIBUTE );
    avd.resize( 13 );
    memcpy( avd.buffer(), "ATTRIBUTEDATA", 13 );
  }

  // ---- serialize with the reference writer --------------------------
  PCCBitstreamWriter  writer;
  SampleStreamV3CUnit ssvu;
  if ( writer.encode( syntax, ssvu ) != 0 ) {
    fprintf( stderr, "reference encode failed\n" );
    return 1;
  }
  PCCBitstream bitstream;
  writer.write( ssvu, bitstream );
  if ( !bitstream.write( std::string( argv[1] ) ) ) {
    fprintf( stderr, "write failed\n" );
    return 1;
  }
  printf( "wrote %zu bytes\n", bitstream.size() );
  return 0;
}
