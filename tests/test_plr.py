"""PLR (point local reconstruction): single-map second-layer synthesis."""

import numpy as np
from scipy.spatial import cKDTree

from rabbit_transcoding_tpu.bitstream import V3CReader, V3CWriter
from rabbit_transcoding_tpu.codec.patch_frame import decode_patch_frames
from rabbit_transcoding_tpu.core.gof import GroupOfFrames
from rabbit_transcoding_tpu.decoder.decoder import Decoder
from rabbit_transcoding_tpu.encoder.encoder import Encoder
from rabbit_transcoding_tpu.encoder.params import EncoderParameters

from test_dualmap import thin_slab_cloud


def roundtrip(src, **kw):
    base = dict(
        minimumImageWidth=128, minimumImageHeight=64,
        geometryQP=4, attributeQP=8, occupancyPrecision=2,
        surfaceThickness=4, flagGeometrySmoothing=False,
        mapCountMinus1=0, constrainedPack=False,
        # exact missed-point accounting: these tests reason about which
        # layer points PLR synthesizes, so keep the CTC proximity
        # thresholds out of the patch structure
        maxAllowedDist2RawPointsSelection=0.0,
        maxAllowedDist2RawPointsDetection=0.0,
        maxNNCountPatchSegmentation=0,
    )
    base.update(kw)
    enc = Encoder(EncoderParameters(**base))
    ctx, recon = enc.encode(GroupOfFrames([src]))
    w = V3CWriter()
    data = w.write(w.encode(ctx))
    ctx2 = V3CReader().decode(V3CReader().read(data)[0])
    return ctx2, Decoder().decode(ctx2)[0], recon[0]


class TestPlr:
    def test_plr_mode_survives_syntax(self):
        src = thin_slab_cloud(thickness=2)
        ctx, dec, recon = roundtrip(src, pointLocalReconstruction=True)
        asps = ctx.atlas(0).asps_list[0]
        assert asps.asps_plr_enabled_flag
        patches = decode_patch_frames(ctx.atlas(0))[0]
        assert any(p.plr_mode > 0 for p in patches)

    def test_plr_improves_single_map_quality(self):
        src = thin_slab_cloud(thickness=1)
        _, dec_plr, _ = roundtrip(src, pointLocalReconstruction=True)
        _, dec_off, _ = roundtrip(src, pointLocalReconstruction=False)
        d_plr = cKDTree(dec_plr.positions).query(src.positions, k=1)[0]
        d_off = cKDTree(dec_off.positions).query(src.positions, k=1)[0]
        assert np.mean(d_plr ** 2) < np.mean(d_off ** 2)
        assert dec_plr.point_count > dec_off.point_count

    def test_plr_closed_loop(self):
        src = thin_slab_cloud(thickness=2)
        ctx, dec, recon = roundtrip(src, pointLocalReconstruction=True)
        assert dec.compute_checksum() == recon.compute_checksum()

    def test_plr_ignored_with_dual_maps(self):
        src = thin_slab_cloud(thickness=2)
        ctx, dec, recon = roundtrip(
            src, pointLocalReconstruction=True, mapCountMinus1=1
        )
        assert not ctx.atlas(0).asps_list[0].asps_plr_enabled_flag
        assert dec.compute_checksum() == recon.compute_checksum()


class TestBlockLevelPlr:
    """plrd_level_flag=0: per-packing-block PLR modes (23090-5 8.3.7.9)."""

    def test_block_modes_survive_syntax(self):
        src = thin_slab_cloud(thickness=2)
        ctx, dec, recon = roundtrip(
            src, pointLocalReconstruction=True, plrLevel=0, patchSize=4,
        )
        patches = decode_patch_frames(ctx.atlas(0))[0]
        with_blocks = [p for p in patches if p.plr_block_modes is not None]
        assert with_blocks, "no block-level PLR patches decoded"
        for p in with_blocks:
            assert p.plr_block_modes.shape == (p.size_v0, p.size_u0)
            assert p.plr_mode == int(p.plr_block_modes.any())

    def test_block_level_closed_loop(self):
        src = thin_slab_cloud(thickness=2)
        ctx, dec, recon = roundtrip(
            src, pointLocalReconstruction=True, plrLevel=0, patchSize=4,
        )
        assert dec.compute_checksum() == recon.compute_checksum()

    def test_block_level_selective(self):
        """A half-thick half-flat slab: block-level modes adapt per block
        while one patch-level mode must compromise across both halves, so
        the source->recon distance strictly improves off -> patch -> block."""
        src = thin_slab_cloud(thickness=1)
        # flatten one half: remove second-layer points on x < median
        half = src.positions[:, 0] < np.median(src.positions[:, 0])
        zmin = src.positions[:, 2].min()
        keep = ~(half & (src.positions[:, 2] > zmin))
        from rabbit_transcoding_tpu.core.pointset import PointSet
        src2 = PointSet(
            positions=src.positions[keep], colors=src.colors[keep]
        ).remove_duplicates()
        _, dec_blk, _ = roundtrip(
            src2, pointLocalReconstruction=True, plrLevel=0, patchSize=4,
        )
        _, dec_patch, _ = roundtrip(
            src2, pointLocalReconstruction=True, plrLevel=1,
        )
        _, dec_off, _ = roundtrip(src2, pointLocalReconstruction=False)

        def fwd_err(dec):
            d = cKDTree(dec.positions).query(src2.positions, k=1)[0]
            return float(np.mean(d ** 2))

        assert fwd_err(dec_blk) <= fwd_err(dec_patch) <= fwd_err(dec_off)
        assert dec_blk.point_count >= dec_off.point_count


class TestPlrModeTable:
    """Parameterized PLR modes (plri descriptors, g_pointLocalReconstruction
    Mode table): interpolation follows neighborhood depth steps and filling
    adds the intermediate depths."""

    def test_plri_descriptors_survive_syntax(self):
        src = thin_slab_cloud(thickness=2)
        ctx, dec, recon = roundtrip(
            src, pointLocalReconstruction=True, nbPlrmMode=6,
        )
        asps = ctx.atlas(0).asps_list[0]
        assert asps.asps_plr_number_of_modes_minus1 == 5
        assert len(asps.plri_interpolate_flag) == 5
        # descriptor 4 is canonical entry 5 = (False, False, minD1=1, n=1)
        assert asps.plri_minimum_depth[4] == 1
        assert asps.plri_block_threshold_per_patch_minus1 == 8

    def test_interpolate_mode_tracks_staircase(self):
        """A sloped (staircase) surface: interpolate modes synthesize the
        depth steps between neighboring columns, recovering a denser
        surface than minD1-only synthesis."""
        import numpy as np
        from rabbit_transcoding_tpu.codec.reconstruct import (
            plr_delta_neighbors,
        )

        # depth plane stepping by 2 per column: delta = step - 1 = 1
        g = np.tile(np.arange(0, 16, 2, np.int32), (8, 1))[None]
        d = plr_delta_neighbors(g, 1)
        assert (d[0][:, 1:-1] == 1).all()
        # steps larger than the g_neighborThreshold are ignored
        g2 = np.tile(np.arange(0, 64, 8, np.int32), (8, 1))[None]
        assert (plr_delta_neighbors(g2, 1) == 0).all()

    def test_closed_loop_all_mode_counts(self):
        src = thin_slab_cloud(thickness=2)
        for nb in (2, 6, 10):
            ctx, dec, recon = roundtrip(
                src, pointLocalReconstruction=True, nbPlrmMode=nb,
                plrLevel=0, patchSize=4,
            )
            assert dec.compute_checksum() == recon.compute_checksum(), nb
