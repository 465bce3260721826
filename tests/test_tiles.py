"""Multi-tile atlas: per-tile ATLs, AFTI origins, reconstruction equality."""

import numpy as np
import pytest

from rabbit_transcoding_tpu.bitstream import V3CReader, V3CWriter
from rabbit_transcoding_tpu.codec.patch_frame import decode_patch_frames
from rabbit_transcoding_tpu.core.gof import GroupOfFrames
from rabbit_transcoding_tpu.decoder.decoder import Decoder
from rabbit_transcoding_tpu.encoder.encoder import Encoder
from rabbit_transcoding_tpu.encoder.params import EncoderParameters
from rabbit_transcoding_tpu.metrics.metrics import MetricsParams, compute_metrics

from test_e2e_codec import make_sphere_cloud


def encode_roundtrip(tile_count):
    src = make_sphere_cloud(seed=0)
    enc = Encoder(EncoderParameters(
        minimumImageWidth=256, minimumImageHeight=64,
        geometryQP=8, attributeQP=16, occupancyPrecision=2,
        tileCount=tile_count, flagGeometrySmoothing=False,
    ))
    ctx, recon = enc.encode(GroupOfFrames([src, src]))
    w = V3CWriter()
    data = w.write(w.encode(ctx))
    ctx2 = V3CReader().decode(V3CReader().read(data)[0])
    return src, ctx2, Decoder().decode(ctx2), recon


class TestTiles:
    def test_tile_structure(self):
        src, ctx, clouds, recon = encode_roundtrip(tile_count=2)
        atlas = ctx.atlas(0)
        # 2 frames x 2 tiles = 4 ATLs
        assert len(atlas.atlas_tile_layers) == 4
        ids = {atl.header.ath_id for atl in atlas.atlas_tile_layers}
        assert ids == {0, 1}
        afti = atlas.afps(0).atlas_frame_tile_information
        assert not afti.afti_single_tile_in_atlas_frame_flag
        assert afti.afti_uniform_partition_spacing_flag
        # patch frames group tiles back into 2 frames
        frames = decode_patch_frames(atlas)
        assert len(frames) == 2
        # patches from tile 1 sit in the second band
        band_px = (afti.afti_partition_rows_height_minus1 + 1) * 64
        in_band1 = [
            p for p in frames[0] if p.v0 * p.occupancy_resolution >= band_px
        ]
        assert in_band1, "no patches placed in the second tile band"

    def test_tiled_quality_matches_untiled(self):
        src, _, clouds1, _ = encode_roundtrip(tile_count=1)
        _, _, clouds2, _ = encode_roundtrip(tile_count=2)
        m1 = compute_metrics(src, clouds1[0], MetricsParams(resolution=255))
        m2 = compute_metrics(src, clouds2[0], MetricsParams(resolution=255))
        assert abs(m1.d1_psnr - m2.d1_psnr) < 1.5, (m1.d1_psnr, m2.d1_psnr)
        assert m2.d1_psnr > 35

    def test_tiled_closed_loop(self):
        src, ctx, clouds, recon = encode_roundtrip(tile_count=3)
        for dec, rec in zip(clouds, recon):
            assert dec.compute_checksum() == rec.compute_checksum()


class TestRoiTiles:
    """ROI-driven tiling (roiBoundingBox* + generateTilesFromSegments,
    PCCEncoder.cpp:5108): patches tile by the ROI containing their 3D
    centroid instead of area round-robin."""

    def _two_blob_cloud(self):
        from rabbit_transcoding_tpu.core.pointset import PointSet

        a = make_sphere_cloud(radius=25, center=32, seed=1)
        b = make_sphere_cloud(radius=25, center=96, seed=2)
        return PointSet(
            positions=np.concatenate([a.positions, b.positions]),
            colors=np.concatenate([a.colors, b.colors]),
        ).remove_duplicates()

    def test_roi_assignment_and_roundtrip(self):
        src = self._two_blob_cloud()
        params = EncoderParameters(
            minimumImageWidth=256, minimumImageHeight=64,
            geometryQP=8, attributeQP=16, occupancyPrecision=2,
            flagGeometrySmoothing=False,
            roiBoundingBoxMinX="0,64", roiBoundingBoxMaxX="63,127",
            roiBoundingBoxMinY="0,64", roiBoundingBoxMaxY="63,127",
            roiBoundingBoxMinZ="0,64", roiBoundingBoxMaxZ="63,127",
        )
        assert len(params.roi_boxes()) == 2
        enc = Encoder(params)
        ctx, recon = enc.encode(GroupOfFrames([src]))
        assert enc.params.tileCount == 2
        w = V3CWriter()
        data = w.write(w.encode(ctx))
        ctx2 = V3CReader().decode(V3CReader().read(data)[0])
        clouds = Decoder().decode(ctx2)
        assert clouds[0].compute_checksum() == recon[0].compute_checksum()
        # tile membership follows the ROIs: decode each tile's patches and
        # check their reconstructed points stay in the owning ROI's half
        atlas = ctx2.atlas(0)
        afti = atlas.afps(0).atlas_frame_tile_information
        band_px = (afti.afti_partition_rows_height_minus1 + 1) * 64
        frames = decode_patch_frames(atlas)
        for p in frames[0]:
            tile = 1 if p.v0 * p.occupancy_resolution >= band_px else 0
            # u1/v1/d1 are the patch's 3D min corner: blob A lives < 64,
            # blob B >= 64 on every axis (with a small quantization margin)
            lo = min(p.u1, p.v1, p.d1)
            if tile == 0:
                assert lo < 64
            else:
                assert max(p.u1, p.v1, p.d1) >= 48


class TestTileOptionFamily:
    """tileSegmentationType / numMaxTilePerFrame / partition grid options /
    enablePointCloudPartitioning chunk cuts."""

    def test_fixed_grid_type2(self):
        src = make_sphere_cloud(seed=0)
        enc = Encoder(EncoderParameters(
            minimumImageWidth=256, minimumImageHeight=64,
            geometryQP=8, attributeQP=16, occupancyPrecision=2,
            tileSegmentationType=2, numMaxTilePerFrame=3,
            flagGeometrySmoothing=False,
        ))
        ctx, recon = enc.encode(GroupOfFrames([src]))
        assert enc.params.tileCount == 3
        clouds = Decoder().decode(ctx)
        assert clouds[0].compute_checksum() == recon[0].compute_checksum()

    def test_explicit_partition_lists(self):
        src = make_sphere_cloud(seed=0)
        enc = Encoder(EncoderParameters(
            minimumImageWidth=256, minimumImageHeight=64,
            geometryQP=8, attributeQP=16, occupancyPrecision=2,
            tileCount=2, uniformPartitionSpacing=False,
            flagGeometrySmoothing=False,
        ))
        ctx, recon = enc.encode(GroupOfFrames([src]))
        # fill the lists from the atlas the encoder actually built
        afti = ctx.atlas(0).afps(0).atlas_frame_tile_information
        h64 = afti.afti_partition_rows_height_minus1 + 1
        enc2 = Encoder(EncoderParameters(
            minimumImageWidth=256, minimumImageHeight=64,
            geometryQP=8, attributeQP=16, occupancyPrecision=2,
            tileCount=2, uniformPartitionSpacing=False,
            tilePartitionWidthList=[4], tilePartitionHeightList=[h64, h64],
            flagGeometrySmoothing=False,
        ))
        ctx2, recon2 = enc2.encode(GroupOfFrames([src]))
        afti2 = ctx2.atlas(0).afps(0).atlas_frame_tile_information
        assert not afti2.afti_uniform_partition_spacing_flag
        # only num_minus1 sizes are coded (the last is the frame remainder)
        assert afti2.afti_partition_row_heights_minus1[:1] == [h64 - 1]
        w = V3CWriter()
        data = w.write(w.encode(ctx2))
        ctx3 = V3CReader().decode(V3CReader().read(data)[0])
        clouds = Decoder().decode(ctx3)
        assert clouds[0].compute_checksum() == recon2[0].compute_checksum()

    def test_chunk_cuts_split_components(self):
        from rabbit_transcoding_tpu.encoder.segment import (
            SegmenterParams,
            segment_frame,
        )

        # one long wall: without cuts it is one component; with 3 cuts
        # along the longest axis it must split into >= 4 patches
        g = np.mgrid[0:200, 0:24].reshape(2, -1).T
        pts = np.column_stack(
            [g[:, 0], g[:, 1], np.full(len(g), 6)]
        ).astype(np.int32)
        base = SegmenterParams()
        segs0, _ = segment_frame(pts, base)
        segs3, _ = segment_frame(pts, SegmenterParams(
            partition_rois=((0, 255, 0, 255, 0, 255),),
            partition_cuts=(3, 0, 0),
        ))
        assert len(segs3) >= len(segs0) + 3
        covered = sum(len(s.point_indices) for s in segs3)
        assert covered >= 0.98 * len(pts)

    def test_point_cloud_partitioning_e2e(self):
        src = make_sphere_cloud(seed=0)
        enc = Encoder(EncoderParameters(
            minimumImageWidth=256, minimumImageHeight=64,
            geometryQP=8, attributeQP=16, occupancyPrecision=2,
            flagGeometrySmoothing=False,
            enablePointCloudPartitioning=True,
            numCutsAlong1stLongestAxis=1,
            roiBoundingBoxMinX="0", roiBoundingBoxMaxX="127",
            roiBoundingBoxMinY="0", roiBoundingBoxMaxY="127",
            roiBoundingBoxMinZ="0", roiBoundingBoxMaxZ="127",
        ))
        ctx, recon = enc.encode(GroupOfFrames([src]))
        clouds = Decoder().decode(ctx)
        assert clouds[0].compute_checksum() == recon[0].compute_checksum()
