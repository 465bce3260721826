"""Option-name parity with the reference CLI apps.

Every option the reference registers (PccAppEncoder.cpp / PccAppDecoder.cpp /
PccAppTranscoder.cpp / PccAppMetrics.cpp option tables) must be ACCEPTED by
the corresponding app here — bound to a real parameter or explicitly
registered-as-ignored — so reference cfg files and scripts drive this
framework unchanged.  The lists below were extracted from the reference
sources (option-table string literals); names, including the historical
'maxNumRefAtalsList' typo, are verbatim.
"""

from __future__ import annotations

import pytest

# ---------------------------------------------------------------------------
# PccAppEncoder.cpp option table (196 options; 'help'/'config' handled by the
# registry itself)
ENCODER_OPTIONS = """
configurationFolder uncompressedDataFolder uncompressedDataPath
compressedStreamPath reconstructedDataPath forcedSsvhUnitSizePrecisionBytes
startFrameNumber frameCount groupOfFramesSize colorTransform
colorSpaceConversionPath colorSpaceConversionConfig
inverseColorSpaceConversionConfig gridBasedSegmentation
voxelDimensionGridBasedSegmentation nnNormalEstimation normalOrientation
gridBasedRefineSegmentation maxNNCountRefineSegmentation
iterationCountRefineSegmentation voxelDimensionRefineSegmentation
searchRadiusRefineSegmentation occupancyResolution enablePatchSplitting
maxPatchSize log2QuantizerSizeX log2QuantizerSizeY
minPointCountPerCCPatchSegmentation maxNNCountPatchSegmentation
surfaceThickness depthQuantizationStep maxAllowedDist2RawPointsDetection
maxAllowedDist2RawPointsSelection lambdaRefineSegmentation minimumImageWidth
minimumImageHeight maxCandidateCount occupancyPrecision occupancyMapConfig
occupancyMapQP enhancedOccupancyMapCode EOMFixBitCount occupancyMapRefinement
decodedAtlasInformationHash attributeTransferFilterType flagGeometrySmoothing
neighborCountSmoothing radius2Smoothing radius2BoundaryDetection
thresholdSmoothing patchExpansion gridSmoothing gridSize
thresholdColorSmoothing cgridSize thresholdColorDifference
thresholdColorVariation flagColorSmoothing thresholdColorPreSmoothing
thresholdColorPreSmoothingLocalEntropy radius2ColorPreSmoothing
neighborCountColorPreSmoothing flagColorPreSmoothing bestColorSearchRange
numNeighborsColorTransferFwd numNeighborsColorTransferBwd
useDistWeightedAverageFwd useDistWeightedAverageBwd
skipAvgIfIdenticalSourcePointPresentFwd skipAvgIfIdenticalSourcePointPresentBwd
distOffsetFwd distOffsetBwd maxGeometryDist2Fwd maxGeometryDist2Bwd
maxColorDist2Fwd maxColorDist2Bwd excludeColorOutlier
thresholdColorOutlierDist videoEncoderOccupancyPath videoEncoderGeometryPath
videoEncoderAttributePath videoEncoderOccupancyCodecId
videoEncoderGeometryCodecId videoEncoderAttributeCodecId
byteStreamVideoEncoderOccupancy byteStreamVideoEncoderGeometry
byteStreamVideoEncoderAttribute geometryQP attributeQP auxGeometryQP
auxAttributeQP geometryConfig geometry0Config geometry1Config attributeConfig
attribute0Config attribute1Config rawPointsPatch noAttributes
attributeVideo444 useRawPointsSeparateVideo attributeRawSeparateVideoWidth
geometryMPConfig attributeMPConfig nbThread keepIntermediateFiles absoluteD1
absoluteT1 multipleStreams deltaQPD0 deltaQPD1 deltaQPT0 deltaQPT1
constrainedPack levelOfDetailX levelOfDetailY groupDilation offsetLossyOM
thresholdLossyOM prefilterLossyOM shvcLayerIndex shvcRateX shvcRateY
patchColorSubsampling maxNumRefAtalsList maxNumRefAtlasFrame
pointLocalReconstruction mapCountMinus1 singleMapPixelInterleaving
removeDuplicatePoints surfaceSeparation highGradientSeparation minGradient
minNumHighGradientPoints packingStrategy useEightOrientations
safeGuardDistance attributeBGFill lossyRawPointsPatch
minNormSumOfInvDist4MPSelection globalPatchAllocation
globalPackingStrategyGOF globalPackingStrategyReset
globalPackingStrategyThreshold patchPrecedenceOrder lowDelayEncoding
geometryPadding apply3dMotionCompensation usePccRDO
geometry3dCoordinatesBitdepth geometryNominal2dBitdepth nbPlrmMode patchSize
enhancedProjectionPlane minWeightEPP additionalProjectionPlaneMode
partialAdditionalProjectionPlane numMaxTilePerFrame uniformPartitionSpacing
tilePartitionWidth tilePartitionHeight tilePartitionWidthList
tilePartitionHeightList tileSegmentationType enablePointCloudPartitioning
roiBoundingBoxMinX roiBoundingBoxMaxX roiBoundingBoxMinY roiBoundingBoxMaxY
roiBoundingBoxMinZ roiBoundingBoxMaxZ numTilesHor tileHeightToWidthRatio
numCutsAlong1stLongestAxis numCutsAlong2ndLongestAxis
numCutsAlong3rdLongestAxis mortonOrderSortRawPoints pbfEnableFlag
pbfFilterSize pbfPassesCount pbfLog2Threshold computeChecksum computeMetrics
normalDataPath resolution dropdups neighborsProc tierFlag
profileCodecGroupIdc profileToolsetIdc profileReconstructionIdc levelIdc
avcCodecIdIndex hevcCodecIdIndex shvcCodecIdIndex vvcCodecIdIndex
oneV3CFrameOnlyFlag
""".split()

# PccAppDecoder.cpp
DECODER_OPTIONS = """
compressedStreamPath reconstructedDataPath startFrameNumber colorTransform
colorSpaceConversionPath inverseColorSpaceConversionConfig
videoDecoderOccupancyPath videoDecoderGeometryPath videoDecoderAttributePath
byteStreamVideoCoderOccupancy byteStreamVideoCoderGeometry
byteStreamVideoCoderAttribute nbThread attributeTransferFilterType
keepIntermediateFiles shvcLayerIndex patchColorSubsampling computeChecksum
computeMetrics uncompressedDataFolder frameCount groupOfFramesSize
uncompressedDataPath normalDataPath resolution dropdups neighborsProc
minimumImageHeight flagColorPreSmoothing surfaceSeparation checkConformance
path level fps
""".split()

# PccAppTranscoder.cpp
TRANSCODER_OPTIONS = """
compressedStreamPath outStreamPath test_name startFrameNumber nbThread
keepIntermediateFiles shvcLayerIndex preset profile tier rate_mode
qualityValAtt qualityValGeo useCuda transcodeBaseline
byteStreamVideoCoderGeometry byteStreamVideoCoderAttribute
videoDecoderGeometryPath videoDecoderAttributePath occupancyPrecision
geometryQP attributeQP configurationFolder occupancyMapConfig geometryConfig
attributeConfig constrainedPack globalPatchAllocation geometryMPConfig
pixelFormat checkConformance path level fps
""".split()

# PccAppMetrics.cpp
METRICS_OPTIONS = """
computeChecksum computeMetrics uncompressedDataFolder startFrameNumber
frameCount groupOfFramesSize uncompressedDataPath reconstructedDataPath
normalDataPath resolution dropdups neighborsProc nbThread minimumImageHeight
flagColorPreSmoothing surfaceSeparation
""".split()

# PccAppNormalGenerator.cpp (incl. the UNUSED cfg-compat registrations)
NORMALS_OPTIONS = """
configurationFolder uncompressedDataFolder uncompressedDataPath srcPlyPath
dstPlyPath startFrameNumber frameCount nbThread viewPointX viewPointY
viewPointZ radiusNormalSmoothing radiusNormalEstimation
radiusNormalOrientation weightNormalSmoothing
numberOfNearestNeighborsInNormalSmoothing
numberOfNearestNeighborsInNormalEstimation
numberOfNearestNeighborsInNormalOrientation
numberOfIterationsInNormalSmoothing orientationStrategy storeEigenvalues
storeNumberOfNearestNeighborsInNormalEstimation storeCentroids
geometry3dCoordinatesBitdepth geometryNominal2dBitdepth groupOfFramesSize
iterationCountRefineSegmentation minNormSumOfInvDist4MPSelection
partialAdditionalProjectionPlane maxPatchSize roiBoundingBoxMinX
roiBoundingBoxMaxX roiBoundingBoxMinY roiBoundingBoxMaxY roiBoundingBoxMinZ
roiBoundingBoxMaxZ numTilesHor tileHeightToWidthRatio
numCutsAlong1stLongestAxis numCutsAlong2ndLongestAxis
numCutsAlong3rdLongestAxis voxelDimensionRefineSegmentation
minimumImageHeight flagColorPreSmoothing surfaceSeparation
enhancedProjectionPlane skipAvgIfIdenticalSourcePointPresentBwd
""".split()

# PccAppColorConverter.cpp
COLORCONV_OPTIONS = """
srcVideoPath dstVideoPath configFile width height colorFormat inputNumBytes
outputNumBytes
""".split()


# Encoder options not yet bound (tracked work list; each batch that lands
# must remove its options from here — the test fails on BOTH a missing
# non-pending option and a pending option that silently became bound).
# Round 3 closed the list: every reference encoder option is bound.
PENDING_ENCODER_OPTIONS: set = set()


def _registry_for(app: str):
    from rabbit_transcoding_tpu.apps import common

    if app == "encode":
        from rabbit_transcoding_tpu.apps import encode  # noqa: F401
        from rabbit_transcoding_tpu.encoder.params import EncoderParameters

        params = EncoderParameters()
        extra = {
            "uncompressedDataFolder": ("", ""), "nbThread": (0, ""),
            "computeChecksum": (True, ""), "computeMetrics": (False, ""),
            "normalDataPath": ("", ""), "resolution": (1023, ""),
            "dropdups": (2, ""), "neighborsProc": (1, ""),
            "trace": (False, ""), "profileDir": ("", ""),
        }
    elif app == "decode":
        from rabbit_transcoding_tpu.decoder.decoder import DecoderParameters

        params = DecoderParameters()
        extra = {
            "uncompressedDataFolder": ("", ""), "resolution": (1023, ""),
            "nbThread": (0, ""), "trace": (False, ""), "profileDir": ("", ""),
            "normalDataPath": ("", ""), "frameCount": (0, ""),
            "groupOfFramesSize": (32, ""), "dropdups": (2, ""),
            "neighborsProc": (1, ""), "checkConformance": (False, ""),
            "path": ("", ""), "level": (30, ""), "fps": (30, ""),
            "minimumImageHeight": (0, ""), "flagColorPreSmoothing": (0, ""),
            "surfaceSeparation": (0, ""),
        }
    elif app == "transcode":
        from rabbit_transcoding_tpu.transcoder.params import (
            TranscoderParameters,
        )

        params = TranscoderParameters()
        extra = {
            "trace": (False, ""), "profileDir": ("", ""),
            "checkConformance": (False, ""), "path": ("", ""),
            "level": (30, ""), "fps": (30, ""),
        }
    elif app == "normals":
        from rabbit_transcoding_tpu.apps.normals import (
            _UNUSED_CFG_OPTIONS,
            NormalsParams,
        )

        params = NormalsParams()
        extra = {name: ("", "") for name in _UNUSED_CFG_OPTIONS}
    elif app == "color_convert":
        from rabbit_transcoding_tpu.apps.color_convert import (
            ColorConvertParams,
        )

        params = ColorConvertParams()
        extra = {}
    else:  # metrics
        from rabbit_transcoding_tpu.apps.metrics import MetricsAppParams

        params = MetricsAppParams()
        extra = {
            "computeChecksum": (True, ""), "computeMetrics": (True, ""),
            "uncompressedDataFolder": ("", ""), "groupOfFramesSize": (32, ""),
            "dropdups": (-1, ""), "nbThread": (0, ""),
            "minimumImageHeight": (0, ""), "flagColorPreSmoothing": (0, ""),
            "surfaceSeparation": (0, ""),
        }
    return common.build_registry(params, extra=extra)


@pytest.mark.parametrize(
    "app,options",
    [
        ("encode", ENCODER_OPTIONS),
        ("decode", DECODER_OPTIONS),
        ("transcode", TRANSCODER_OPTIONS),
        ("metrics", METRICS_OPTIONS),
        ("normals", NORMALS_OPTIONS),
        ("color_convert", COLORCONV_OPTIONS),
    ],
)
def test_every_reference_option_is_accepted(app, options):
    reg = _registry_for(app)
    pending = PENDING_ENCODER_OPTIONS if app == "encode" else set()
    missing = [o for o in options if o not in reg and o not in pending]
    assert not missing, (
        f"{app}: reference options not accepted: {missing}"
    )
    # options still in the pending work list must not be silently bound —
    # implementing one requires removing it from PENDING_ENCODER_OPTIONS
    stale = [o for o in pending if o in reg]
    assert not stale, (
        f"{app}: pending options now bound, remove from "
        f"PENDING_ENCODER_OPTIONS: {stale}"
    )


def test_app_extras_match_app_source():
    """The extras mirrored in _registry_for must stay in sync with the apps'
    actual build_registry(extra=...) dicts — parse each app's source for the
    extra keys and require a superset of what this test assumes."""
    import pathlib
    import re

    import rabbit_transcoding_tpu.apps as apps_pkg

    apps_dir = pathlib.Path(apps_pkg.__file__).parent
    for app, options in [
        ("encode", ENCODER_OPTIONS),
        ("decode", DECODER_OPTIONS),
        ("transcode", TRANSCODER_OPTIONS),
        ("metrics", METRICS_OPTIONS),
    ]:
        src = (apps_dir / f"{app}.py").read_text()
        keys = set(re.findall(r'"([A-Za-z0-9_]+)":\s*\(', src))
        reg = _registry_for(app)
        pending = PENDING_ENCODER_OPTIONS if app == "encode" else set()
        for opt in options:
            if opt in keys or opt in pending:
                continue  # registered as an app extra / tracked as pending
            assert opt in reg, f"{app}: option {opt} lost"
