"""Unit tests: occupancy ops, color ops, patch-frame decode, device reprojection."""

import numpy as np
import pytest

import jax.numpy as jnp

from rabbit_transcoding_tpu.core.image import Video
from rabbit_transcoding_tpu.core.patch import Patch
from rabbit_transcoding_tpu.codec.patch_frame import (
    _axes_of,
    decode_patch_frames,
    projection_id_of,
)
from rabbit_transcoding_tpu.codec.reconstruct import (
    GeneratePointCloudParameters,
    ReconstructionEngine,
)
from rabbit_transcoding_tpu.ops import color as color_ops
from rabbit_transcoding_tpu.ops import occupancy as occ_ops
from rabbit_transcoding_tpu.utils.enums import ColorFormat, PatchOrientation


class TestOccupancyOps:
    def test_maxpool_downscale(self):
        occ = np.zeros((1, 8, 8), np.uint8)
        occ[0, 3, 5] = 1
        small = np.asarray(occ_ops.downscale_maxpool(jnp.asarray(occ), 4))
        assert small.shape == (1, 2, 2)
        assert small[0, 0, 1] == 1 and small.sum() == 1

    def test_upsample_roundtrip(self):
        rng = np.random.default_rng(0)
        occ = rng.integers(0, 2, (2, 16, 16)).astype(np.uint8)
        up = np.asarray(occ_ops.upsample_nearest(jnp.asarray(occ), 4))
        assert up.shape == (2, 64, 64)
        down = np.asarray(occ_ops.downscale_maxpool(jnp.asarray(up), 4))
        np.testing.assert_array_equal(down, occ)


class TestColorOps:
    def test_float_matrix_identity(self):
        rng = np.random.default_rng(0)
        r, g, b = [jnp.asarray(rng.uniform(0, 1, (4, 8, 8)).astype(np.float32))
                   for _ in range(3)]
        y, u, v = color_ops.rgb_to_yuv709(r, g, b)
        r2, g2, b2 = color_ops.yuv709_to_rgb(y, u, v)
        np.testing.assert_allclose(np.asarray(r2), np.asarray(r), atol=1e-5)
        np.testing.assert_allclose(np.asarray(g2), np.asarray(g), atol=1e-5)
        np.testing.assert_allclose(np.asarray(b2), np.asarray(b), atol=1e-5)

    def test_rgb_yuv420_roundtrip_smooth(self):
        # chroma-smooth content survives 4:2:0 subsampling closely
        yy, xx = np.mgrid[0:32, 0:32]
        rgb = np.stack(
            [128 + 60 * np.sin(xx / 9.0), 128 + 60 * np.cos(yy / 9.0),
             128 + 30 * np.sin((xx + yy) / 13.0)], axis=-1,
        )[None].astype(np.uint8)
        y, u, v = color_ops.rgb8_to_yuv420(jnp.asarray(rgb))
        back = np.asarray(color_ops.yuv420_to_rgb8(y, u, v))
        err = np.abs(back.astype(int) - rgb.astype(int))
        assert np.median(err) <= 3 and err.max() <= 24

    def test_gray_is_invariant(self):
        gray = np.full((1, 16, 16, 3), 128, np.uint8)
        y, u, v = color_ops.rgb8_to_yuv420(jnp.asarray(gray))
        assert abs(int(np.asarray(y)[0, 0, 0]) - 128) <= 1
        assert abs(int(np.asarray(u)[0, 0, 0]) - 128) <= 1
        back = np.asarray(color_ops.yuv420_to_rgb8(y, u, v))
        assert np.abs(back.astype(int) - 128).max() <= 2


class TestAxes:
    def test_axes_projection_roundtrip(self):
        for pid in range(6):
            n, t, b, mode, rot = _axes_of(pid)
            assert {n, t, b} == {0, 1, 2}
            assert rot == 0
            assert projection_id_of(n, mode) == pid

    def test_extended_axes_roundtrip(self):
        for pid in range(6, 18):
            n, t, b, mode, rot = _axes_of(pid)
            expected_rot = 1 + (pid - 6) // 4
            assert rot == expected_rot and {n, t, b} == {0, 1, 2}
            assert projection_id_of(n, mode, rot) == pid


def synthesize_atlas(patches, width=256, height=256, seed=0):
    """Rasterize ground-truth patches into geo/occ planes + true 3D points."""
    rng = np.random.default_rng(seed)
    geo = np.zeros((height, width), np.uint16)
    occ = np.zeros((height, width), np.uint8)
    all_pts = []
    for p in patches:
        u, v = np.meshgrid(np.arange(p.size_u_pix), np.arange(p.size_v_pix),
                           indexing="ij")
        depth = (20 + 10 * np.sin(u / 7.0) + 5 * np.cos(v / 5.0)).astype(np.int32)
        x, y = p.patch_to_canvas(u, v)
        geo[y, x] = depth
        occ[y, x] = 1
        all_pts.append(p.generate_point(u, v, depth).reshape(-1, 3))
    return geo, occ, np.concatenate(all_pts, axis=0)


def as_set(pts):
    return set(map(tuple, pts.tolist()))


class TestReprojection:
    @pytest.mark.parametrize("orientation", list(PatchOrientation))
    def test_single_patch_exact(self, orientation):
        p = Patch(
            index=0, u0=2, v0=2, size_u0=3, size_v0=4, size_u=48, size_v=64,
            u1=100, v1=50, d1=200, normal_axis=2, tangent_axis=0,
            bitangent_axis=1, projection_mode=0, orientation=orientation,
        )
        geo, occ, truth = synthesize_atlas([p])
        engine = ReconstructionEngine(
            GeneratePointCloudParameters(remove_duplicate_points=False)
        )
        geo_v = Video(256, 256, 10, ColorFormat.YUV400, [geo[None]])
        clouds = engine.generate_point_clouds(
            [[p]], occ[None], geo_v, None
        )
        assert as_set(clouds[0].positions) == as_set(truth)

    def test_multi_patch_multi_axis(self):
        patches = [
            Patch(index=0, u0=0, v0=0, size_u0=2, size_v0=2, size_u=32,
                  size_v=32, u1=0, v1=0, d1=10, normal_axis=0, tangent_axis=2,
                  bitangent_axis=1, projection_mode=0),
            Patch(index=1, u0=4, v0=0, size_u0=2, size_v0=2, size_u=32,
                  size_v=32, u1=64, v1=0, d1=300, normal_axis=1,
                  tangent_axis=2, bitangent_axis=0, projection_mode=1,
                  orientation=PatchOrientation.ROT90),
            Patch(index=2, u0=0, v0=4, size_u0=3, size_v0=2, size_u=48,
                  size_v=32, u1=10, v1=20, d1=30, normal_axis=2,
                  tangent_axis=0, bitangent_axis=1, projection_mode=0,
                  orientation=PatchOrientation.SWAP),
        ]
        geo, occ, truth = synthesize_atlas(patches)
        engine = ReconstructionEngine(
            GeneratePointCloudParameters(remove_duplicate_points=False)
        )
        geo_v = Video(256, 256, 10, ColorFormat.YUV400, [geo[None]])
        clouds = engine.generate_point_clouds([patches], occ[None], geo_v, None)
        assert as_set(clouds[0].positions) == as_set(truth)

    def test_block_to_patch_first_wins(self):
        p0 = Patch(index=0, u0=0, v0=0, size_u0=2, size_v0=2, size_u=32, size_v=32)
        p1 = Patch(index=1, u0=1, v0=0, size_u0=2, size_v0=2, size_u=32, size_v=32)
        occ = np.zeros((1, 64, 64), np.uint8)
        occ[0, :32, :48] = 1
        engine = ReconstructionEngine()
        b2p = engine.block_to_patch_maps([[p0, p1]], occ, block_size=16)
        assert b2p[0, 0, 0] == 1  # patch 0 owns
        assert b2p[0, 0, 1] == 1  # contested: first decode-order patch wins
        assert b2p[0, 0, 2] == 2  # patch 1 only
        assert b2p[0, 2, 0] == 0  # unoccupied

    def test_colors_gathered(self):
        p = Patch(index=0, u0=0, v0=0, size_u0=2, size_v0=2, size_u=32,
                  size_v=32, d1=5)
        geo, occ, _ = synthesize_atlas([p], width=64, height=64)
        geo_v = Video(64, 64, 10, ColorFormat.YUV400, [geo[None]])
        # constant mid-gray attribute -> every point mid-gray
        attr = Video.zeros(1, 64, 64, 8, ColorFormat.YUV420)
        attr.planes[0][...] = 120
        attr.planes[1][...] = 128
        attr.planes[2][...] = 128
        engine = ReconstructionEngine()
        clouds = engine.generate_point_clouds([[p]], occ[None], geo_v, attr)
        assert clouds[0].has_colors
        assert np.abs(clouds[0].colors.astype(int) - 120).max() <= 2


class TestPatchFrameDecode:
    def test_intra_inter_chain(self):
        from rabbit_transcoding_tpu.bitstream.hls import AtlasHLS
        from rabbit_transcoding_tpu.bitstream.syntax import (
            AtlasFrameParameterSetRbsp,
            AtlasSequenceParameterSetRbsp,
            AtlasTileDataUnit,
            AtlasTileHeader,
            AtlasTileLayerRbsp,
            InterPatchDataUnit,
            PatchDataUnit,
            PatchInformationData,
        )
        from rabbit_transcoding_tpu.utils.enums import (
            AtlasTileType,
            PatchModeITile,
            PatchModePTile,
        )

        atlas = AtlasHLS()
        atlas.asps_list.append(AtlasSequenceParameterSetRbsp())
        atlas.afps_list.append(AtlasFrameParameterSetRbsp())

        # frame 0: two intra patches
        du0 = AtlasTileDataUnit()
        for i in range(2):
            du0.patches.append(PatchInformationData(
                patch_mode=int(PatchModeITile.I_INTRA),
                data=PatchDataUnit(
                    pdu_2d_pos_x=i * 4, pdu_2d_size_x_minus1=3,
                    pdu_2d_size_y_minus1=3, pdu_3d_offset_u=i * 100,
                    pdu_3d_offset_d=10, pdu_projection_id=4,
                    pdu_orientation_index=2,
                ),
            ))
        atl0 = AtlasTileLayerRbsp(
            header=AtlasTileHeader(ath_type=AtlasTileType.I_TILE,
                                   ath_atlas_frm_order_cnt_lsb=0),
            data_unit=du0,
        )

        # frame 1: inter patches referencing both
        du1 = AtlasTileDataUnit()
        du1.patches.append(PatchInformationData(
            patch_mode=int(PatchModePTile.P_INTER),
            data=InterPatchDataUnit(ipdu_patch_index=0, ipdu_2d_pos_x=1,
                                    ipdu_3d_offset_u=5),
        ))
        du1.patches.append(PatchInformationData(
            patch_mode=int(PatchModePTile.P_INTER),
            data=InterPatchDataUnit(ipdu_patch_index=0, ipdu_2d_delta_size_x=1),
        ))
        atl1 = AtlasTileLayerRbsp(
            header=AtlasTileHeader(ath_type=AtlasTileType.P_TILE,
                                   ath_atlas_frm_order_cnt_lsb=1),
            data_unit=du1,
        )
        atlas.atlas_tile_layers = [atl0, atl1]

        frames = decode_patch_frames(atlas)
        assert len(frames) == 2
        f0, f1 = frames
        assert len(f0) == 2 and len(f1) == 2
        assert f0[0].projection_mode == 1 and f0[0].normal_axis == 1
        assert f0[0].orientation == PatchOrientation.ROT90
        assert f0[1].u1 == 100
        # inter: first refs patch 0 (+deltas), predictor advances -> second refs patch 1
        assert f1[0].u0 == f0[0].u0 + 1 and f1[0].u1 == f0[0].u1 + 5
        assert f1[1].best_match_idx == 1
        assert f1[1].size_u0 == f0[1].size_u0 + 1


class TestBoundarySmoothing:
    """Geometry smoothing moves only patch-boundary points
    (identifyBoundaryPoints analog, PCCCodec.cpp:266)."""

    def test_ineligible_points_never_move(self):
        import numpy as np

        from rabbit_transcoding_tpu.ops.smoothing import smooth_cloud

        rng = np.random.default_rng(0)
        # a plane plus strong outliers that the centroid snap WOULD move
        base = np.stack([
            rng.integers(0, 64, 4000), rng.integers(0, 64, 4000),
            np.full(4000, 32),
        ], 1).astype(np.int32)
        outliers = base.copy()[:50]
        outliers[:, 2] += 14
        pts = np.concatenate([base, outliers])
        elig = np.zeros(len(pts), bool)
        elig[len(base):] = True

        out_all, keep_a, moved_all = smooth_cloud(
            pts, threshold=64.0, min_neighbors=0, coord_bits=7,
        )
        out_b, keep_b, moved_b = smooth_cloud(
            pts, threshold=64.0, min_neighbors=0, coord_bits=7,
            eligible=elig,
        )
        assert moved_all > moved_b > 0
        # non-eligible points are bit-identical to their inputs
        assert np.array_equal(out_b[: len(base)], pts[: len(base)])

    def test_decoder_clouds_carry_boundary_types(self):
        import sys

        sys.path.insert(0, "tests")
        import numpy as np
        from test_e2e_codec import make_sphere_cloud

        from rabbit_transcoding_tpu.bitstream import V3CReader, V3CWriter
        from rabbit_transcoding_tpu.core.gof import GroupOfFrames
        from rabbit_transcoding_tpu.decoder.decoder import Decoder
        from rabbit_transcoding_tpu.encoder.encoder import Encoder
        from rabbit_transcoding_tpu.encoder.params import EncoderParameters

        src = make_sphere_cloud(seed=0)
        params = EncoderParameters(
            minimumImageWidth=256, minimumImageHeight=64,
            geometryQP=4, attributeQP=8, occupancyPrecision=2,
            flagGeometrySmoothing=False,  # keep types observable (smoothing
        )                                 # output is deduped anyway)
        ctx, recon = Encoder(params).encode(GroupOfFrames([src]))
        w = V3CWriter()
        ctx2 = V3CReader().decode(V3CReader().read(w.write(w.encode(ctx)))[0])
        dec = Decoder().decode(ctx2)[0]
        assert dec.types is not None
        n_boundary = int((dec.types == 1).sum())
        # a sphere atlas has real patch borders, but most points are interior
        assert 0 < n_boundary < 0.9 * dec.point_count
        assert dec.compute_checksum() == recon[0].compute_checksum()


class TestPbfRefine:
    """Occupancy synthesis / patch-border filtering (SeiOccupancySynthesis)."""

    def test_off_surface_rim_eroded(self):
        import jax.numpy as jnp
        import numpy as np

        from rabbit_transcoding_tpu.ops.occupancy import pbf_refine

        occ = np.zeros((1, 32, 32), np.uint8)
        occ[0, 4:28, 4:28] = 1                      # 24x24 patch
        geo = np.full((1, 32, 32), 100, np.int32)
        # the outer ring of the patch carries off-surface fill (+40)
        geo[0, 4:28, 4] = 140
        geo[0, 4:28, 27] = 140
        geo[0, 4, 4:28] = 140
        geo[0, 27, 4:28] = 140
        owner = occ.astype(np.int32)                # single patch id 1
        out = np.asarray(pbf_refine(
            jnp.asarray(occ), jnp.asarray(geo), jnp.asarray(owner),
            jnp.float32(4.0), passes=2, radius=1,
        ))
        # rim dropped, interior intact
        assert not out[0, 4, 10] and not out[0, 10, 4]
        assert out[0, 6:26, 6:26].all()

    def test_on_surface_rim_kept(self):
        import jax.numpy as jnp
        import numpy as np

        from rabbit_transcoding_tpu.ops.occupancy import pbf_refine

        occ = np.zeros((1, 32, 32), np.uint8)
        occ[0, 4:28, 4:28] = 1
        geo = np.full((1, 32, 32), 100, np.int32)   # smooth everywhere
        owner = occ.astype(np.int32)
        out = np.asarray(pbf_refine(
            jnp.asarray(occ), jnp.asarray(geo), jnp.asarray(owner),
            jnp.float32(4.0), passes=2, radius=1,
        ))
        assert (out.astype(bool) == occ.astype(bool)).all()

    def test_e2e_pbf_sei_closed_loop(self):
        import sys

        sys.path.insert(0, "tests")
        from test_e2e_codec import make_sphere_cloud

        from rabbit_transcoding_tpu.bitstream import V3CReader, V3CWriter
        from rabbit_transcoding_tpu.bitstream.sei import SeiOccupancySynthesis
        from rabbit_transcoding_tpu.core.gof import GroupOfFrames
        from rabbit_transcoding_tpu.decoder.decoder import Decoder
        from rabbit_transcoding_tpu.encoder.encoder import Encoder
        from rabbit_transcoding_tpu.encoder.params import EncoderParameters

        src = make_sphere_cloud(seed=0)
        params = EncoderParameters(
            minimumImageWidth=256, minimumImageHeight=64,
            geometryQP=4, attributeQP=8, occupancyPrecision=4,
            pbfEnableFlag=True,
        )
        ctx, recon = Encoder(params).encode(GroupOfFrames([src]))
        w = V3CWriter()
        ctx2 = V3CReader().decode(V3CReader().read(w.write(w.encode(ctx)))[0])
        assert any(isinstance(s, SeiOccupancySynthesis)
                   for s in ctx2.atlas(0).seis_prefix)
        dec = Decoder().decode(ctx2)[0]
        assert dec.compute_checksum() == recon[0].compute_checksum()
