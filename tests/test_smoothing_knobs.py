"""Batch-B smoothing-family option parity.

Covers the reference's full-KNN geometry smoothing (gridSmoothing=0 path:
neighborCountSmoothing / radius2Smoothing / radius2BoundaryDetection,
PCCCodec::smoothPointCloud, PCCCodec.cpp:1106), the fully gated grid color
smoothing (cgridSize / thresholdColorDifference / thresholdColorVariation,
PCCCodec.cpp:149-290), encoder color pre-smoothing knobs
(thresholdColorPreSmoothingLocalEntropy / radius2ColorPreSmoothing /
neighborCountColorPreSmoothing, PCCEncoder.cpp:6578), and the
attributeTransferFilterType selector (explicit + PTL-derived,
PCCDecoderParameters.cpp:115-145).
"""

from __future__ import annotations

import sys

import numpy as np

sys.path.insert(0, "tests")


def _two_patch_slab(n=2000, seed=0):
    """Two flat z-slabs meeting at a seam in x, different patch indices;
    seam points of patch 1 are displaced so a centroid snap would move them."""
    rng = np.random.default_rng(seed)
    a = np.stack([
        rng.integers(0, 32, n), rng.integers(0, 64, n), np.full(n, 20),
    ], 1).astype(np.int32)
    b = np.stack([
        rng.integers(32, 64, n), rng.integers(0, 64, n), np.full(n, 20),
    ], 1).astype(np.int32)
    pos = np.concatenate([a, b])
    part = np.concatenate([
        np.zeros(n, np.int32), np.ones(n, np.int32),
    ])
    return pos, part


class TestKnnSmooth:
    def test_moves_only_cross_patch_outliers(self):
        from rabbit_transcoding_tpu.ops.smoothing import knn_smooth

        pos, part = _two_patch_slab()
        # displace some patch-1 points near the seam upward: they have
        # patch-0 neighbors within the boundary radius and a far centroid
        seam = (pos[:, 0] >= 32) & (pos[:, 0] <= 34)
        idx = np.nonzero(seam)[0][:60]
        pos2 = pos.copy()
        pos2[idx, 2] += 4
        # far-from-seam displaced points: no cross-patch neighbor -> stay
        far = np.nonzero(pos[:, 0] > 48)[0][:60]
        pos2[far, 2] += 4

        out, moved = knn_smooth(
            pos2, part, neighbor_count=64, radius2=36.0,
            radius2_boundary=36.0, threshold=16.0,
        )
        assert moved > 0
        # seam outliers pulled back toward the slab
        assert out[idx, 2].mean() < pos2[idx, 2].mean() - 1.5
        # interior outliers untouched (no cross-patch neighbor in radius)
        assert np.array_equal(out[far], pos2[far])

    def test_threshold_and_radius_gates(self):
        from rabbit_transcoding_tpu.ops.smoothing import knn_smooth

        pos, part = _two_patch_slab()
        seam = np.nonzero((pos[:, 0] >= 32) & (pos[:, 0] <= 33))[0][:40]
        pos2 = pos.copy()
        pos2[seam, 2] += 10
        # huge threshold: nothing reaches it
        _, m_thr = knn_smooth(pos2, part, radius2=36.0,
                              radius2_boundary=36.0, threshold=1e9)
        assert m_thr == 0
        # tiny boundary-detection radius: no cross-patch neighbor found
        _, m_rad = knn_smooth(pos2, part, radius2=36.0,
                              radius2_boundary=0.25, threshold=16.0)
        assert m_rad == 0

    def test_eligible_mask_respected(self):
        from rabbit_transcoding_tpu.ops.smoothing import knn_smooth

        pos, part = _two_patch_slab()
        seam = np.nonzero((pos[:, 0] >= 32) & (pos[:, 0] <= 33))[0][:40]
        pos2 = pos.copy()
        pos2[seam, 2] += 10
        elig = np.zeros(len(pos2), bool)  # nobody may move
        out, moved = knn_smooth(pos2, part, radius2=36.0,
                                radius2_boundary=36.0, threshold=16.0,
                                eligible=elig)
        assert moved == 0 and np.array_equal(out, pos2)


class TestGatedColorSmoothing:
    def _cloud(self, seed=0):
        """Dense flat sheet, uniform color, one deviant point at the
        patch seam and one deviant point deep inside a single patch."""
        rng = np.random.default_rng(seed)
        g = np.stack(np.meshgrid(
            np.arange(0, 32), np.arange(0, 32), indexing="ij"
        ), -1).reshape(-1, 2)
        pos = np.concatenate(
            [g, np.full((len(g), 1), 8)], 1
        ).astype(np.int32)
        # split INSIDE a grid cell (cells are 4 wide) so seam cells hold
        # points of both patches — the partition-mix gate's trigger
        part = (pos[:, 0] >= 18).astype(np.int32)
        cols = np.full((len(pos), 3), 120, np.uint8)
        seam = np.nonzero(pos[:, 0] == 18)[0][3]
        interior = np.nonzero(pos[:, 0] == 28)[0][3]
        cols[seam] = (250, 250, 250)
        cols[interior] = (250, 250, 250)
        return pos, cols, part, seam, interior

    def test_partition_mix_gate(self):
        from rabbit_transcoding_tpu.ops.smoothing import smooth_colors

        pos, cols, part, seam, interior = self._cloud()
        out, moved = smooth_colors(
            pos, cols, threshold=10.0, grid_size=4, coord_bits=6,
            partition=part, threshold_variation=40.0,
            threshold_difference=40.0,
        )
        assert moved >= 1
        # the seam deviant (mixed-partition cell) is smoothed toward 120
        assert abs(int(out[seam, 0]) - 120) < 40
        # the interior deviant's cell holds one partition only -> untouched
        assert tuple(out[interior]) == (250, 250, 250)

    def test_variation_gate_blocks_noisy_cells(self):
        from rabbit_transcoding_tpu.ops.smoothing import smooth_colors

        pos, cols, part, seam, _ = self._cloud()
        rng = np.random.default_rng(1)
        # make the whole sheet luma-noisy: own-cell variation gate trips
        cols = rng.integers(0, 255, cols.shape).astype(np.uint8)
        out, moved = smooth_colors(
            pos, cols, threshold=10.0, grid_size=4, coord_bits=6,
            partition=part, threshold_variation=2.0,
            threshold_difference=255.0,
        )
        assert moved == 0 and np.array_equal(out, cols)

    def test_eligible_restricts_to_boundary(self):
        from rabbit_transcoding_tpu.ops.smoothing import smooth_colors

        pos, cols, part, seam, _ = self._cloud()
        elig = np.zeros(len(pos), bool)
        out, moved = smooth_colors(
            pos, cols, threshold=10.0, grid_size=4, coord_bits=6,
            partition=part, eligible=elig, threshold_variation=40.0,
            threshold_difference=40.0,
        )
        assert moved == 0


class TestPresmoothColors:
    def test_flat_region_outlier_snaps_textured_survives(self):
        from rabbit_transcoding_tpu.ops.smoothing import presmooth_colors

        rng = np.random.default_rng(0)
        g = np.stack(np.meshgrid(
            np.arange(0, 24), np.arange(0, 24), indexing="ij"
        ), -1).reshape(-1, 2)
        pos = np.concatenate([g, np.zeros((len(g), 1))], 1).astype(np.int32)
        flat = np.full((len(pos), 3), 100, np.uint8)
        out_i = np.nonzero((pos[:, 0] == 5) & (pos[:, 1] == 5))[0][0]
        flat[out_i] = (240, 240, 240)
        out, moved = presmooth_colors(
            pos, flat, radius2=9.0, max_neighbors=32,
            threshold=20.0, entropy_threshold=4.5,
        )
        assert moved >= 1 and abs(int(out[out_i, 0]) - 100) < 40

        # high-entropy texture: the entropy gate protects every point
        noisy = rng.integers(0, 255, flat.shape).astype(np.uint8)
        out2, moved2 = presmooth_colors(
            pos, noisy, radius2=9.0, max_neighbors=32,
            threshold=20.0, entropy_threshold=1.0,
        )
        assert moved2 == 0 and np.array_equal(out2, noisy)


class TestSmoothingE2E:
    def _roundtrip(self, params, n_frames=1):
        from test_e2e_codec import make_sphere_cloud

        from rabbit_transcoding_tpu.bitstream import V3CReader, V3CWriter
        from rabbit_transcoding_tpu.core.gof import GroupOfFrames
        from rabbit_transcoding_tpu.decoder.decoder import Decoder
        from rabbit_transcoding_tpu.encoder.encoder import Encoder

        src = GroupOfFrames(
            [make_sphere_cloud(seed=i) for i in range(n_frames)]
        )
        context, recon = Encoder(params).encode(src)
        data = V3CWriter().write(V3CWriter().encode(context))
        context2 = V3CReader().decode(V3CReader().read(data)[0])
        clouds = Decoder().decode(context2)
        return src, recon, clouds, data

    def test_knn_closed_loop_no_sei(self):
        """gridSmoothing=0: encoder KNN-smooths its closed loop and writes
        NO geometry-smoothing SEI (only the grid method is signalled,
        PCCEncoder.cpp:8456) — the decoder therefore does not smooth."""
        from rabbit_transcoding_tpu.bitstream.sei import SeiGeometrySmoothing
        from rabbit_transcoding_tpu.encoder.params import EncoderParameters

        params = EncoderParameters(
            minimumImageWidth=256, minimumImageHeight=64,
            geometryQP=4, attributeQP=8,
            flagGeometrySmoothing=True, gridSmoothing=False,
            neighborCountSmoothing=48, radius2Smoothing=36.0,
            radius2BoundaryDetection=36.0, thresholdSmoothing=16.0,
            frameCount=1, groupOfFramesSize=1,
        )
        src, recon, clouds, data = self._roundtrip(params)
        from rabbit_transcoding_tpu.bitstream import V3CReader

        ctx = V3CReader().decode(V3CReader().read(data)[0])
        seis = ctx.atlas(0).seis_prefix + ctx.atlas(0).seis_suffix
        assert not any(isinstance(s, SeiGeometrySmoothing) for s in seis)
        # both sides still produce clouds; quality unbroken
        assert clouds[0].point_count > 0.7 * src[0].point_count

    def test_gated_color_smoothing_closed_loop(self):
        """flagColorSmoothing carries the full gate set in the SEI; encoder
        closed loop and decoder run the identical gated algorithm."""
        from rabbit_transcoding_tpu.bitstream.sei import SeiAttributeSmoothing
        from rabbit_transcoding_tpu.encoder.params import EncoderParameters

        params = EncoderParameters(
            minimumImageWidth=256, minimumImageHeight=64,
            geometryQP=4, attributeQP=8,
            flagColorSmoothing=True, cgridSize=4,
            thresholdColorSmoothing=6.0,
            thresholdColorVariation=20.0, thresholdColorDifference=20.0,
            frameCount=1, groupOfFramesSize=1,
        )
        src, recon, clouds, data = self._roundtrip(params)
        from rabbit_transcoding_tpu.bitstream import V3CReader

        ctx = V3CReader().decode(V3CReader().read(data)[0])
        seis = ctx.atlas(0).seis_prefix + ctx.atlas(0).seis_suffix
        sei = next(
            s for s in seis if isinstance(s, SeiAttributeSmoothing)
        )
        assert sei.as_smoothing_grid_size_minus2 == 2
        assert sei.as_smoothing_threshold_variation == 20
        assert sei.as_smoothing_threshold_difference == 20
        for dec, rec in zip(clouds, recon):
            assert dec.compute_checksum() == rec.compute_checksum()

    def test_attr_transfer_filter_follows_reconstruction_idc(self):
        """attributeTransferFilterType derives from the PTL reconstruction
        idc on the decoder side (PCCDecoderParameters.cpp:115-145): under
        Rec1 both sides re-transfer colors to smoothing-moved points and
        the closed loop still checksums."""
        from rabbit_transcoding_tpu.encoder.params import EncoderParameters

        params = EncoderParameters(
            minimumImageWidth=256, minimumImageHeight=64,
            geometryQP=4, attributeQP=8,
            flagGeometrySmoothing=True, gridSmoothing=True,
            thresholdSmoothing=16.0, profileReconstructionIdc=1,
            attributeTransferFilterType=1,
            frameCount=1, groupOfFramesSize=1,
        )
        src, recon, clouds, _ = self._roundtrip(params)
        for dec, rec in zip(clouds, recon):
            assert dec.compute_checksum() == rec.compute_checksum()

    def test_decoder_clouds_carry_partition(self):
        from rabbit_transcoding_tpu.encoder.params import EncoderParameters

        params = EncoderParameters(
            minimumImageWidth=256, minimumImageHeight=64,
            geometryQP=4, attributeQP=8, flagGeometrySmoothing=False,
            frameCount=1, groupOfFramesSize=1,
        )
        src, recon, clouds, _ = self._roundtrip(params)
        ps = clouds[0]
        assert ps.partition is not None
        assert len(ps.partition) == ps.point_count
        # several distinct patches contribute points
        assert len(np.unique(ps.partition[ps.partition >= 0])) >= 2
