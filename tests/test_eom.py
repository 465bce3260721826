"""EOM patches: between-layer points ride the occupancy bit planes."""

import numpy as np

from rabbit_transcoding_tpu.bitstream import V3CReader, V3CWriter
from rabbit_transcoding_tpu.core.gof import GroupOfFrames
from rabbit_transcoding_tpu.core.pointset import PointSet
from rabbit_transcoding_tpu.decoder.decoder import Decoder
from rabbit_transcoding_tpu.encoder.encoder import Encoder
from rabbit_transcoding_tpu.encoder.params import EncoderParameters


def filled_slab_cloud(thickness=4):
    """A fully solid slab: every voxel layer between top and bottom occupied —
    interior layers are representable ONLY via EOM."""
    g = np.mgrid[8:56, 8:56].reshape(2, -1).T
    layers = [
        np.column_stack([g[:, 0], g[:, 1], np.full(len(g), 30 + dz)])
        for dz in range(thickness + 1)
    ]
    pos = np.concatenate(layers).astype(np.int32)
    colors = np.clip(
        np.stack([pos[:, 2] * 37 % 255, pos[:, 0] * 3, pos[:, 1] * 3], 1),
        0, 255,
    ).astype(np.uint8)
    return PointSet(positions=pos, colors=colors).remove_duplicates()


def roundtrip(src, **kw):
    base = dict(
        minimumImageWidth=128, minimumImageHeight=64,
        geometryQP=4, attributeQP=8, occupancyPrecision=1,
        surfaceThickness=6, flagGeometrySmoothing=False,
        constrainedPack=False,
        # these tests count exact interior-layer recovery: keep the CTC
        # proximity tolerances (maxAllowedDist2RawPoints*) out of the
        # missed-points accounting
        maxAllowedDist2RawPointsSelection=0.0,
        maxAllowedDist2RawPointsDetection=0.0,
    )
    base.update(kw)
    enc = Encoder(EncoderParameters(**base))
    ctx, recon = enc.encode(GroupOfFrames([src]))
    w = V3CWriter()
    data = w.write(w.encode(ctx))
    ctx2 = V3CReader().decode(V3CReader().read(data)[0])
    return ctx2, Decoder().decode(ctx2)[0], recon[0]


class TestEom:
    def test_interior_layers_recovered(self):
        src = filled_slab_cloud(thickness=4)
        _, dec_eom, _ = roundtrip(src, enhancedOccupancyMapCode=True)
        _, dec_off, _ = roundtrip(src, enhancedOccupancyMapCode=False)
        src_set = set(map(tuple, src.positions.tolist()))
        hit_eom = len(src_set & set(map(tuple, dec_eom.positions.tolist())))
        hit_off = len(src_set & set(map(tuple, dec_off.positions.tolist())))
        # interior layers (3 of 5) only recoverable with EOM
        assert hit_eom > hit_off
        assert hit_eom >= 0.93 * len(src_set), (hit_eom, len(src_set))

    def test_eom_closed_loop(self):
        src = filled_slab_cloud(thickness=3)
        ctx, dec, recon = roundtrip(src, enhancedOccupancyMapCode=True)
        assert dec.compute_checksum() == recon.compute_checksum()

    def test_eom_colors_lossless_aux(self):
        """The aux-video color stream must align positionally with the
        decoder's EOM enumeration: every enumerated EOM point's aux color is
        the exact source color.  (In the merged cloud some EOM positions
        collide with lossy far-layer points that legitimately win the
        decode-order dedupe, so the check runs at the enumeration level.)"""
        import numpy as np

        from rabbit_transcoding_tpu.codec.eom import enumerate_frame_eom_points
        from rabbit_transcoding_tpu.codec.patch_frame import decode_patch_frames
        from rabbit_transcoding_tpu.codec.raw_points import (
            collect_raw_patch_units,
        )
        from rabbit_transcoding_tpu.codec.reconstruct import (
            GeneratePointCloudParameters,
            ReconstructionEngine,
        )
        from rabbit_transcoding_tpu.utils.enums import VideoType
        from rabbit_transcoding_tpu.video import rbv

        src = filled_slab_cloud(thickness=3)
        ctx, dec, _ = roundtrip(src, enhancedOccupancyMapCode=True)
        atlas = ctx.atlas(0)
        pf = decode_patch_frames(atlas)
        occ_v = rbv.decode(atlas.get_video_bitstream(VideoType.OCCUPANCY).data)
        geo_v = rbv.decode(atlas.get_video_bitstream(VideoType.GEOMETRY).data)
        engine = ReconstructionEngine(GeneratePointCloudParameters())
        w = ctx.vps.atlas(0).vps_frame_width
        h = ctx.vps.atlas(0).vps_frame_height
        occ_maps = engine.occupancy_maps(occ_v, w, h)
        b2p = engine.block_to_patch_maps(pf, occ_maps, block_size=16)
        eom_plane = (np.asarray(occ_v.planes[0])[0][:h, :w] >> 1).astype(
            np.uint8
        )
        owner = np.repeat(np.repeat(b2p[0], 16, 0), 16, 1)[:h, :w]
        map_count = atlas.asps_list[0].asps_map_count_minus1 + 1
        geo_d0 = np.asarray(geo_v.planes[0])[::map_count][0][:h, :w].astype(
            np.int32
        )
        pts = enumerate_frame_eom_points(pf[0], eom_plane, geo_d0, owner)
        assert len(pts) > 500

        attr_raw = rbv.decode(
            atlas.get_video_bitstream(VideoType.ATTRIBUTE_RAW).data
        )
        attr_flat = np.stack(
            [pl[0] for pl in attr_raw.planes], -1
        ).reshape(-1, 3)
        rus = collect_raw_patch_units(atlas)
        rc = sum(u.rpdu_points_minus1 + 1 for u in rus[0]) if rus[0] else 0
        cols = attr_flat[rc : rc + len(pts)]
        src_map = {tuple(p): c for p, c in zip(src.positions.tolist(),
                                               src.colors)}
        exact = sum(
            tuple(p) in src_map and (c == src_map[tuple(p)]).all()
            for p, c in zip(pts.tolist(), cols)
        )
        assert exact == len(pts), (exact, len(pts))


class TestEomFixBitCount:
    """asps_eom_fix_bit_count (EOMFixBitCount): interior points beyond the
    per-cell bit budget leave EOM and recover through the raw patch."""

    def test_lossless_survives_small_bit_budget(self):
        src = filled_slab_cloud(thickness=4)
        # single map: asps_eom_fix_bit_count is only coded when
        # asps_map_count_minus1 == 0 (23090-5 ASPS syntax)
        kw = dict(enhancedOccupancyMapCode=True, losslessGeo=True,
                  rawPointsPatch=True, attributeVideo444=True,
                  losslessAttribute=True, mapCountMinus1=0)
        ctx1, dec1, _ = roundtrip(src, EOMFixBitCount=1, **kw)
        ctx7, dec7, _ = roundtrip(src, EOMFixBitCount=7, **kw)
        src_set = set(map(tuple, src.positions.tolist()))
        for dec in (dec1, dec7):
            assert src_set <= set(map(tuple, dec.positions.tolist()))
        assert ctx1.atlas(0).asps_list[0].asps_eom_fix_bit_count_minus1 == 0
        assert ctx7.atlas(0).asps_list[0].asps_eom_fix_bit_count_minus1 == 6
        # the tight budget pushes the deep interior layers into the raw
        # patch: the raw aux geometry stream must be larger
        from rabbit_transcoding_tpu.utils.enums import VideoType

        raw1 = len(ctx1.atlas(0).video_bitstreams[VideoType.GEOMETRY_RAW])
        raw7 = len(
            ctx7.atlas(0).video_bitstreams.get(
                VideoType.GEOMETRY_RAW,
                type("E", (), {"data": b""})(),
            ).data
            if VideoType.GEOMETRY_RAW in ctx7.atlas(0).video_bitstreams
            else b""
        )
        assert raw1 > raw7


class TestPatchExpansion:
    def test_expansion_closed_loop_and_fewer_missed(self):
        src = filled_slab_cloud(thickness=2)
        ctx, dec, recon = roundtrip(src, patchExpansion=True)
        assert dec.compute_checksum() == recon.compute_checksum()
