"""Raw (missed-points) patches: uncovered points must survive losslessly."""

import numpy as np
from scipy.spatial import cKDTree

from rabbit_transcoding_tpu.bitstream import V3CReader, V3CWriter
from rabbit_transcoding_tpu.core.gof import GroupOfFrames
from rabbit_transcoding_tpu.core.pointset import PointSet
from rabbit_transcoding_tpu.decoder.decoder import Decoder
from rabbit_transcoding_tpu.encoder.encoder import Encoder
from rabbit_transcoding_tpu.encoder.params import EncoderParameters
from rabbit_transcoding_tpu.utils.enums import VideoType


def plate_with_outliers(n_outliers=40, seed=0):
    """A projectable plate + isolated scattered points no patch can cover."""
    g = np.mgrid[8:72, 8:72].reshape(2, -1).T
    plate = np.column_stack([g[:, 0], g[:, 1], np.full(len(g), 30)])
    rng = np.random.default_rng(seed)
    outliers = rng.integers(100, 250, size=(n_outliers, 3))
    pos = np.concatenate([plate, outliers]).astype(np.int32)
    colors = np.clip(np.stack(
        [pos[:, 0] * 2, pos[:, 1] * 2, pos[:, 2] % 255], 1), 0, 255
    ).astype(np.uint8)
    return (
        PointSet(positions=pos, colors=colors).remove_duplicates(),
        np.unique(outliers.astype(np.int32), axis=0),
    )


def make_params(**kw):
    base = dict(
        minimumImageWidth=128, minimumImageHeight=64,
        geometryQP=8, attributeQP=12, occupancyPrecision=2,
        flagGeometrySmoothing=False,
    )
    base.update(kw)
    return EncoderParameters(**base)


def roundtrip(src, params):
    enc = Encoder(params)
    ctx, recon = enc.encode(GroupOfFrames([src]))
    w = V3CWriter()
    data = w.write(w.encode(ctx))
    ctx2 = V3CReader().decode(V3CReader().read(data)[0])
    return ctx2, Decoder().decode(ctx2)[0], recon[0]


class TestRawPoints:
    def test_outliers_survive_exactly(self):
        src, outliers = plate_with_outliers()
        ctx, dec, recon = roundtrip(src, make_params(rawPointsPatch=True))
        assert VideoType.GEOMETRY_RAW in ctx.atlas(0).video_bitstreams
        dec_set = set(map(tuple, dec.positions.tolist()))
        for o in outliers:
            assert tuple(o) in dec_set, f"outlier {o} lost"
        # colors of outliers are lossless
        idx = {tuple(p): i for i, p in enumerate(dec.positions.tolist())}
        src_idx = {tuple(p): i for i, p in enumerate(src.positions.tolist())}
        for o in outliers:
            t = tuple(o)
            np.testing.assert_array_equal(
                dec.colors[idx[t]], src.colors[src_idx[t]]
            )

    def test_outliers_dropped_without_raw_patch(self):
        src, outliers = plate_with_outliers()
        ctx, dec, _ = roundtrip(src, make_params(rawPointsPatch=False))
        assert VideoType.GEOMETRY_RAW not in ctx.atlas(0).video_bitstreams
        dec_set = set(map(tuple, dec.positions.tolist()))
        missing = sum(tuple(o) not in dec_set for o in outliers)
        assert missing > len(outliers) * 0.8

    def test_closed_loop_with_raw_points(self):
        src, _ = plate_with_outliers()
        ctx, dec, recon = roundtrip(src, make_params(rawPointsPatch=True))
        assert dec.compute_checksum() == recon.compute_checksum()

    def test_d1_improves_with_raw_points(self):
        src, _ = plate_with_outliers()
        _, dec_raw, _ = roundtrip(src, make_params(rawPointsPatch=True))
        _, dec_noraw, _ = roundtrip(src, make_params(rawPointsPatch=False))
        d_raw = cKDTree(dec_raw.positions).query(src.positions, k=1)[0]
        d_noraw = cKDTree(dec_noraw.positions).query(src.positions, k=1)[0]
        assert np.mean(d_raw ** 2) < np.mean(d_noraw ** 2)


class TestMortonSort:
    """mortonOrderSortRawPoints: Z-order sorting shrinks the aux geometry
    video and the roundtrip stays exact."""

    def test_smaller_aux_and_exact(self):
        import numpy as np

        from rabbit_transcoding_tpu.codec.raw_points import morton_order
        from rabbit_transcoding_tpu.core.gof import GroupOfFrames
        from rabbit_transcoding_tpu.core.pointset import PointSet
        from rabbit_transcoding_tpu.bitstream import V3CReader, V3CWriter
        from rabbit_transcoding_tpu.decoder.decoder import Decoder
        from rabbit_transcoding_tpu.encoder.encoder import Encoder
        from rabbit_transcoding_tpu.encoder.params import EncoderParameters
        from rabbit_transcoding_tpu.utils.enums import VideoType

        # sparse scatter: everything lands in the raw patch
        rng = np.random.default_rng(0)
        pos = np.unique(
            rng.integers(0, 512, (6000, 3)).astype(np.int32), axis=0
        )
        rng.shuffle(pos)
        src = PointSet(
            positions=pos,
            colors=np.clip(pos // 2, 0, 255).astype(np.uint8),
        )
        sizes = {}
        decs = {}
        for morton in (False, True):
            p = EncoderParameters(
                minimumImageWidth=256, minimumImageHeight=64,
                mortonOrderSortRawPoints=morton,
                frameCount=1, groupOfFramesSize=1,
            )
            ctx, _ = Encoder(p).encode(GroupOfFrames([src]))
            sizes[morton] = len(
                ctx.atlas(0).get_video_bitstream(VideoType.GEOMETRY_RAW).data
            )
            data = V3CWriter().write(V3CWriter().encode(ctx))
            decs[morton] = Decoder().decode(
                V3CReader().decode(V3CReader().read(data)[0])
            )[0]
        assert sizes[True] < sizes[False]
        s = set(map(tuple, src.positions.astype(np.int64)))
        assert set(map(tuple, decs[True].positions.astype(np.int64))) == s

    def test_morton_order_locality(self):
        import numpy as np

        from rabbit_transcoding_tpu.codec.raw_points import morton_order

        rng = np.random.default_rng(1)
        pts = rng.integers(0, 1024, (2000, 3)).astype(np.int32)
        order = morton_order(pts)
        sorted_pts = pts[order].astype(np.int64)
        shuffled = pts.astype(np.int64)
        d_sorted = np.abs(np.diff(sorted_pts, axis=0)).sum()
        d_shuffled = np.abs(np.diff(shuffled, axis=0)).sum()
        assert d_sorted < 0.5 * d_shuffled


class TestLossyRawPoints:
    """lossyRawPointsPatch + auxGeometryQP/auxAttributeQP: aux raw videos
    coded lossy; the closed loop consumes the DECODED coords so encoder
    recon stays checksum-identical to the decode."""

    def _scatter(self):
        import numpy as np

        from rabbit_transcoding_tpu.core.pointset import PointSet

        rng = np.random.default_rng(2)
        pos = np.unique(
            rng.integers(0, 256, (4000, 3)).astype(np.int32), axis=0
        )
        return PointSet(
            positions=pos,
            colors=np.clip(pos, 0, 255).astype(np.uint8),
        )

    def test_lossy_raw_closed_loop(self):
        import numpy as np
        from scipy.spatial import cKDTree

        from rabbit_transcoding_tpu.bitstream import V3CReader, V3CWriter
        from rabbit_transcoding_tpu.core.gof import GroupOfFrames
        from rabbit_transcoding_tpu.decoder.decoder import Decoder
        from rabbit_transcoding_tpu.encoder.encoder import Encoder
        from rabbit_transcoding_tpu.encoder.params import EncoderParameters
        from rabbit_transcoding_tpu.utils.enums import VideoType

        src = self._scatter()
        sizes = {}
        for lossy in (False, True):
            p = EncoderParameters(
                minimumImageWidth=256, minimumImageHeight=64,
                mortonOrderSortRawPoints=True,
                lossyRawPointsPatch=lossy,
                auxGeometryQP=12, auxAttributeQP=12,
                frameCount=1, groupOfFramesSize=1,
                # this scatter is pure isolated noise — the reference-
                # faithful density pruning would (correctly) drop ALL of
                # it; pin pruning off to exercise the lossy aux coding
                minNormSumOfInvDist4MPSelection=0.0,
            )
            ctx, recon = Encoder(p).encode(GroupOfFrames([src]))
            sizes[lossy] = len(
                ctx.atlas(0).get_video_bitstream(VideoType.GEOMETRY_RAW).data
            )
            data = V3CWriter().write(V3CWriter().encode(ctx))
            dec = Decoder().decode(
                V3CReader().decode(V3CReader().read(data)[0])
            )
            assert dec[0].compute_checksum() == recon[0].compute_checksum()
            if lossy:
                d = cKDTree(dec[0].positions.astype(np.float32)).query(
                    src.positions.astype(np.float32), k=1
                )[0]
                assert float(np.mean(d**2)) < 50.0  # lossy but bounded
        assert sizes[True] < sizes[False]


class TestAuxVideoWidth:
    """attributeRawSeparateVideoWidth: the aux raw videos honor the
    configured width, and lossless recovery is width-independent."""

    def test_width_is_configurable_and_lossless(self):
        import numpy as np

        from rabbit_transcoding_tpu.codec.raw_points import (
            build_raw_videos,
            make_raw_patch_unit,
            recover_raw_points,
        )

        rng = np.random.default_rng(5)
        pts = rng.integers(0, 255, size=(333, 3)).astype(np.int32)
        cols = rng.integers(0, 255, size=(333, 3)).astype(np.uint8)
        for width in (64, 128, 256):
            geo_v, attr_v = build_raw_videos([pts], [cols], 8, width=width)
            assert geo_v.width == width and attr_v.width == width
            unit = make_raw_patch_unit(len(pts), width=width)
            assert unit.rpdu_2d_size_x_minus1 == width - 1
            rec, rcol = recover_raw_points(
                [unit], np.asarray(geo_v.planes[0][0]),
                np.stack([np.asarray(p[0]) for p in attr_v.planes], -1),
            )
            assert np.array_equal(rec, pts)
            assert np.array_equal(rcol, cols)
