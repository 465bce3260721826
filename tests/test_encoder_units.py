"""Unit tests: segmentation, packing, padding fill, recolor."""

import numpy as np
import jax.numpy as jnp

from rabbit_transcoding_tpu.encoder.packing import pack_patches
from rabbit_transcoding_tpu.encoder.segment import (
    SegmenterParams,
    initial_segmentation,
    segment_frame,
)
from rabbit_transcoding_tpu.ops.dilate import dilate, pad_pow2, push_pull_fill
from rabbit_transcoding_tpu.ops.recolor import transfer_colors


class TestSegmentation:
    def test_initial_segmentation_axis_aligned(self):
        normals = np.array(
            [[1, 0, 0], [0, 1, 0], [0, 0, 1], [-1, 0, 0], [0, -1, 0], [0, 0, -1]],
            np.float32,
        )
        ppi = initial_segmentation(normals)
        assert ppi.tolist() == [0, 1, 2, 3, 4, 5]

    def test_cube_face_segmentation(self):
        # two opposing flat plates -> normals ±Z -> ppi 2 and 5 -> >=2 patches
        g = np.mgrid[0:24, 0:24].reshape(2, -1).T
        top = np.column_stack([g[:, 0], g[:, 1], np.full(len(g), 40)])
        bottom = np.column_stack([g[:, 0], g[:, 1], np.zeros(len(g))])
        pts = np.concatenate([top, bottom]).astype(np.int32)
        patches, missed = segment_frame(pts, SegmenterParams())
        assert len(patches) >= 2
        assert len(missed) < 0.1 * len(pts)
        covered = sum(len(s.point_indices) for s in patches)
        assert covered >= 0.9 * len(pts)
        # plates project along Z
        axes = {s.patch.normal_axis for s in patches}
        assert 2 in axes

    def test_depth_maps_reconstruct_points(self):
        g = np.mgrid[0:16, 0:16].reshape(2, -1).T
        z = 10 + (g[:, 0] // 4)
        pts = np.column_stack([g[:, 0], g[:, 1], z]).astype(np.int32)
        patches, _ = segment_frame(pts, SegmenterParams(
            min_point_count_per_cc_patch_segmentation=8))
        assert patches
        seg = patches[0]
        u, v = np.nonzero(seg.occupancy)
        rec = seg.patch.generate_point(u, v, seg.depth0[u, v])
        assert set(map(tuple, rec.tolist())) <= set(map(tuple, pts.tolist()))


class TestPacking:
    def _mk(self, w, h):
        from rabbit_transcoding_tpu.core.patch import Patch
        from rabbit_transcoding_tpu.encoder.segment import SegmentedPatch

        return SegmentedPatch(
            patch=Patch(size_u=w, size_v=h, size_u0=(w + 15) // 16,
                        size_v0=(h + 15) // 16),
            depth0=np.zeros((w, h), np.int32),
            depth1=np.zeros((w, h), np.int32),
            occupancy=np.ones((w, h), bool),
            point_indices=np.arange(w * h),
        )

    def test_no_overlap(self):
        segs = [self._mk(48, 32), self._mk(32, 32), self._mk(64, 16),
                self._mk(16, 48), self._mk(16, 16)]
        h = pack_patches(segs, width=128, height=64, block=16)
        used = np.zeros((h // 16, 128 // 16), int)
        for s in segs:
            x0, y0, w, h2 = s.patch.canvas_bounds()
            used[y0 // 16 : (y0 + h2) // 16, x0 // 16 : (x0 + w) // 16] += 1
        assert used.max() == 1  # no block claimed twice

    def test_atlas_grows_when_full(self):
        segs = [self._mk(64, 64) for _ in range(5)]
        h = pack_patches(segs, width=64, height=64, block=16)
        assert h >= 5 * 64


class TestFill:
    def test_push_pull_keeps_occupied_exact(self):
        rng = np.random.default_rng(0)
        img = rng.uniform(0, 255, (2, 64, 64)).astype(np.float32)
        occ = (rng.uniform(size=(2, 64, 64)) < 0.3).astype(np.uint8)
        out = np.asarray(push_pull_fill(jnp.asarray(img), jnp.asarray(occ)))
        np.testing.assert_allclose(out[occ > 0], img[occ > 0], rtol=1e-6)

    def test_push_pull_fills_holes_smoothly(self):
        img = np.zeros((1, 64, 64), np.float32)
        occ = np.zeros((1, 64, 64), np.uint8)
        img[0, :, :8] = 100.0
        occ[0, :, :8] = 1
        img[0, :, 56:] = 200.0
        occ[0, :, 56:] = 1
        out = np.asarray(push_pull_fill(jnp.asarray(img), jnp.asarray(occ)))
        mid = out[0, :, 8:56]
        assert mid.min() >= 99.0 and mid.max() <= 201.0

    def test_dilate_fills_adjacent(self):
        img = np.zeros((1, 8, 8), np.float32)
        occ = np.zeros((1, 8, 8), np.uint8)
        img[0, 4, 4] = 50.0
        occ[0, 4, 4] = 1
        out = np.asarray(dilate(jnp.asarray(img), jnp.asarray(occ), iterations=1))
        assert out[0, 4, 5] == 50.0 and out[0, 3, 4] == 50.0
        assert out[0, 0, 0] == 0.0

    def test_pad_pow2(self):
        x = np.ones((1, 50, 70), np.float32)
        o = np.ones((1, 50, 70), np.uint8)
        xp, op, (h, w) = pad_pow2(x, o)
        assert xp.shape == (1, 64, 128) and (h, w) == (50, 70)


class TestRecolor:
    def test_nn_transfer(self):
        src = np.array([[0, 0, 0], [10, 0, 0]], np.float32)
        col = np.array([[255, 0, 0], [0, 255, 0]], np.uint8)
        dst = np.array([[1, 0, 0], [9, 1, 0]], np.float32)
        out = transfer_colors(src, col, dst, k=1)
        assert out[0].tolist() == [255, 0, 0]
        assert out[1].tolist() == [0, 255, 0]

    def test_idw_blend(self):
        src = np.array([[0, 0, 0], [2, 0, 0]], np.float32)
        col = np.array([[0, 0, 0], [200, 200, 200]], np.uint8)
        dst = np.array([[1, 0, 0]], np.float32)
        out = transfer_colors(src, col, dst, k=2)
        assert 90 <= out[0, 0] <= 110  # midpoint blends to ~100


class TestHighGradientSeparation:
    """separateHighGradientPoints analog: edge-on cells are evicted and
    repartitioned to a non-parallel axis (PCCPatchSegmenter.cpp:1520)."""

    def _cliff_cloud(self):
        import numpy as np

        xs, ys = np.mgrid[0:32, 0:64]
        floor = np.stack(
            [xs.ravel(), ys.ravel(), np.full(xs.size, 32)], 1
        )
        # steep ramp: depth jumps 6 per x step (edge-on for a z projection)
        rx, ry = np.mgrid[32:40, 0:64]
        ramp = np.stack(
            [rx.ravel(), ry.ravel(), 32 + (rx.ravel() - 31) * 6], 1
        )
        return np.concatenate([floor, ramp]).astype(np.int32)

    def test_evicted_points_get_new_axis(self):
        import numpy as np

        from rabbit_transcoding_tpu.encoder.segment import (
            SegmenterParams,
            segment_frame,
        )

        pts = self._cliff_cloud()
        # heavy PPI smoothing drags the (minority) ramp onto the floor's
        # z axis — exactly the misassignment high-gradient separation fixes
        base = dict(
            min_point_count_per_cc_patch_segmentation=16,
            max_cc_edge_distance=8.0,
            surface_thickness=2,
            lambda_refine_segmentation=40.0,
            iteration_count_refine_segmentation=20,
            # exact membership accounting (this test counts patch members;
            # the CTC selection/detection thresholds would proximity-cover
            # some evicted points instead of re-patching them)
            max_allowed_dist2_raw_points_selection=0.0,
            max_allowed_dist2_raw_points_detection=0.0,
        )
        p_off = SegmenterParams(**base)
        p_on = SegmenterParams(
            high_gradient_separation=True, min_gradient=4.0,
            min_num_high_gradient_points=32, **base,
        )
        segs_off, missed_off = segment_frame(pts, p_off)
        segs_on, missed_on = segment_frame(pts, p_on)

        axes_off = {s.patch.normal_axis for s in segs_off}
        axes_on = {s.patch.normal_axis for s in segs_on}
        # with separation, the ramp is re-projected along a non-z axis
        assert 0 in axes_on or 1 in axes_on, axes_on
        # coverage must not get worse
        cov_off = sum(len(s.point_indices) for s in segs_off)
        cov_on = sum(len(s.point_indices) for s in segs_on)
        assert cov_on >= cov_off, (cov_on, cov_off)
        # and the evicted edge-on points LEFT the z patches for a
        # re-projected non-z patch of their own
        zpts_off = sum(
            len(s.point_indices) for s in segs_off
            if s.patch.normal_axis == 2
        )
        zpts_on = sum(
            len(s.point_indices) for s in segs_on
            if s.patch.normal_axis == 2
        )
        assert zpts_on < zpts_off, (zpts_on, zpts_off)
        assert len(segs_on) > len(segs_off), (len(segs_on), len(segs_off))


class TestAdaptiveGPA:
    """pack_gof_adaptive (performDataAdaptiveGPAMethod parity): union
    packing with iterative re-allocation and subcontext splitting."""

    def _mk(self, w, h, match=-1):
        from rabbit_transcoding_tpu.core.patch import Patch
        from rabbit_transcoding_tpu.encoder.segment import SegmentedPatch

        return SegmentedPatch(
            patch=Patch(size_u=w, size_v=h, size_u0=(w + 15) // 16,
                        size_v0=(h + 15) // 16, best_match_idx=match),
            depth0=np.zeros((w, h), np.int32),
            depth1=np.zeros((w, h), np.int32),
            occupancy=np.ones((w, h), bool),
            point_indices=np.arange(w * h),
        )

    def test_iterative_beats_greedy_on_transients(self):
        """A big patch alive only in frames 0-1 and another only in frames
        2-3: the GOF-exclusive greedy grid pays for both areas; the
        adaptive packer's per-frame fill reuses the space."""
        from rabbit_transcoding_tpu.encoder.packing import (
            pack_gof_adaptive,
            pack_gof_global,
        )

        def make_gof():
            # one small patch spans all 4 frames (keeps the union ratio ok)
            f0 = [self._mk(32, 32), self._mk(96, 96)]
            f1 = [self._mk(32, 32, match=0), self._mk(96, 96, match=1)]
            f2 = [self._mk(32, 32, match=0), self._mk(96, 96)]  # B is new
            f3 = [self._mk(32, 32, match=0), self._mk(96, 96, match=1)]
            return [f0, f1, f2, f3]

        h_greedy = pack_gof_global(make_gof(), width=128, height=64)
        h_adapt = pack_gof_adaptive(make_gof(), width=128, height=64)
        assert h_adapt < h_greedy  # 96+96 stacked vs shared

    def test_union_positions_stable_across_subcontext(self):
        from rabbit_transcoding_tpu.encoder.packing import pack_gof_adaptive

        gof = [
            [self._mk(48, 32), self._mk(32, 48)],
            [self._mk(48, 32, match=0), self._mk(32, 48, match=1)],
            [self._mk(48, 32, match=0), self._mk(32, 48, match=1)],
        ]
        pack_gof_adaptive(gof, width=128, height=64)
        for chain in range(2):
            pos = {
                (f[chain].patch.u0, f[chain].patch.v0,
                 f[chain].patch.orientation)
                for f in gof
            }
            assert len(pos) == 1  # stable the whole GOF

    def test_no_overlap_within_each_frame(self):
        from rabbit_transcoding_tpu.encoder.packing import pack_gof_adaptive

        rng = np.random.default_rng(3)
        gof = []
        prev_count = 0
        for fi in range(4):
            segs = []
            for i in range(5):
                w, h = rng.integers(16, 64, 2)
                m = i if (fi > 0 and i < prev_count and i < 3) else -1
                segs.append(self._mk(int(w), int(h), match=m))
            prev_count = len(segs)
            gof.append(segs)
        h = pack_gof_adaptive(gof, width=128, height=64)
        for segs in gof:
            used = np.zeros((h // 16 + 8, 128 // 16), int)
            for s in segs:
                x0, y0, w, h2 = s.patch.canvas_bounds()
                used[y0 // 16:(y0 + h2) // 16, x0 // 16:(x0 + w) // 16] += 1
            assert used.max() <= 1

    def test_union_grows_with_member_sizes(self):
        """Chain members of different sizes: every member must fit at the
        union position (the union footprint is the OR)."""
        from rabbit_transcoding_tpu.encoder.packing import pack_gof_adaptive

        gof = [
            [self._mk(32, 32)],
            [self._mk(64, 48, match=0)],   # grows
            [self._mk(48, 64, match=0)],   # different aspect
        ]
        h = pack_gof_adaptive(gof, width=128, height=64)
        pos = {(f[0].patch.u0, f[0].patch.v0) for f in gof}
        assert len(pos) == 1
        assert h >= 64


class TestMaxPatchSize:
    """maxPatchSize splitting (reference enablePatchSplitting): oversized
    components split at the longer tangent axis median until they fit."""

    def test_wide_wall_splits(self):
        import numpy as np

        from rabbit_transcoding_tpu.encoder.segment import (
            SegmenterParams,
            segment_frame,
        )

        # 600px-wide flat wall, maxPatchSize 128 -> >= 5 patches, all <= 128
        g = np.mgrid[0:600, 0:40].reshape(2, -1).T
        pts = np.column_stack(
            [g[:, 0], g[:, 1], np.full(len(g), 7)]
        ).astype(np.int32)
        segs, missed = segment_frame(
            pts, SegmenterParams(max_patch_size=128)
        )
        assert len(segs) >= 5
        for seg in segs:
            assert max(seg.patch.size_u, seg.patch.size_v) <= 128
        covered = sum(len(s.point_indices) for s in segs)
        assert covered + len(missed) == len(pts)
        assert len(missed) == 0

    def test_no_split_when_disabled(self):
        import numpy as np

        from rabbit_transcoding_tpu.encoder.segment import (
            SegmenterParams,
            segment_frame,
        )

        g = np.mgrid[0:600, 0:40].reshape(2, -1).T
        pts = np.column_stack(
            [g[:, 0], g[:, 1], np.full(len(g), 7)]
        ).astype(np.int32)
        segs, _ = segment_frame(pts, SegmenterParams(max_patch_size=0))
        assert any(max(s.patch.size_u, s.patch.size_v) > 128 for s in segs)


class TestColorPreSmoothing:
    """flagColorPreSmoothing (presmoothPointCloudColor analog): encoder-side
    damping of transferred-color outliers before the attribute video."""

    def test_presmoothing_runs_and_reduces_attr_bits(self):
        import numpy as np
        import sys
        sys.path.insert(0, __file__.rsplit("/", 1)[0])
        from test_e2e_codec import make_sphere_cloud

        from rabbit_transcoding_tpu.core.gof import GroupOfFrames
        from rabbit_transcoding_tpu.encoder.encoder import Encoder
        from rabbit_transcoding_tpu.encoder.params import EncoderParameters
        from rabbit_transcoding_tpu.utils.enums import VideoType

        src = make_sphere_cloud(seed=5)
        # salt the colors with outliers pre-smoothing should damp
        rng = np.random.default_rng(1)
        noisy = src.colors.copy()
        idx = rng.choice(len(noisy), len(noisy) // 20, replace=False)
        noisy[idx] = rng.integers(0, 256, (len(idx), 3))
        src.colors = noisy
        sizes = {}
        for pre in (False, True):
            p = EncoderParameters(
                minimumImageWidth=256, minimumImageHeight=64,
                geometryQP=8, attributeQP=20, occupancyPrecision=2,
                flagColorPreSmoothing=pre, frameCount=1,
                groupOfFramesSize=1,
            )
            ctx, _ = Encoder(p).encode(GroupOfFrames([src]))
            sizes[pre] = len(
                ctx.atlas(0).get_video_bitstream(VideoType.ATTRIBUTE).data
            )
        assert sizes[True] < sizes[False]

    def test_recolor_neighbor_option(self):
        from rabbit_transcoding_tpu.encoder.params import EncoderParameters

        p = EncoderParameters(numNeighborsColorTransferFwd=8)
        assert (p.numNeighborsColorTransferFwd or p.recolorNeighborCount) == 8
        p2 = EncoderParameters()
        assert (p2.numNeighborsColorTransferFwd or p2.recolorNeighborCount) == 1


class TestOccupancyMapRefinement:
    """refineOccupancyMap (PCCEncoder.cpp:3818): one-point precision tiles
    and <4-point packing blocks evict to the raw patch instead of becoming
    full junk blocks after occupancy downscale."""

    def test_sparse_blocks_evicted_and_recovered(self):
        import numpy as np
        from scipy.spatial import cKDTree

        from rabbit_transcoding_tpu.bitstream import V3CReader, V3CWriter
        from rabbit_transcoding_tpu.core.gof import GroupOfFrames
        from rabbit_transcoding_tpu.core.pointset import PointSet
        from rabbit_transcoding_tpu.decoder.decoder import Decoder
        from rabbit_transcoding_tpu.encoder.encoder import Encoder
        from rabbit_transcoding_tpu.encoder.params import EncoderParameters
        from rabbit_transcoding_tpu.utils.enums import VideoType

        # a dense wall plus isolated satellites that land in own blocks
        g = np.mgrid[16:80, 16:80].reshape(2, -1).T
        wall = np.column_stack([g[:, 0], g[:, 1], np.full(len(g), 30)])
        rng = np.random.default_rng(0)
        sat = np.column_stack([
            rng.integers(100, 160, 12), rng.integers(16, 80, 12),
            np.full(12, 30),
        ])
        pos = np.unique(np.concatenate([wall, sat]).astype(np.int32), axis=0)
        src = PointSet(
            positions=pos, colors=np.clip(pos, 0, 255).astype(np.uint8)
        )
        counts = {}
        decs = {}
        for refine in (False, True):
            p = EncoderParameters(
                minimumImageWidth=256, minimumImageHeight=64,
                geometryQP=8, attributeQP=16, occupancyPrecision=4,
                occupancyMapRefinement=refine, flagGeometrySmoothing=False,
                maxCCEdgeDistance=64.0,   # satellites join the wall's CC
                frameCount=1, groupOfFramesSize=1,
            )
            ctx, _ = Encoder(p).encode(GroupOfFrames([src]))
            data = V3CWriter().write(V3CWriter().encode(ctx))
            dec = Decoder().decode(
                V3CReader().decode(V3CReader().read(data)[0])
            )[0]
            decs[refine] = dec
            counts[refine] = len(dec.positions)
        # refinement drops the junk points the precision-4 block fill adds
        # around isolated samples, without losing source coverage
        assert counts[True] < counts[False]
        for refine in (False, True):
            d = cKDTree(decs[refine].positions.astype(np.float32)).query(
                src.positions.astype(np.float32), k=1
            )[0]
            assert float(np.mean(d**2)) < 2.0


class TestSurfaceSeparation:
    """surfaceSeparation: color-dissimilar back-surface points stay out of
    the front patch's D0..D1 column and re-patch separately."""

    def test_two_tone_slab(self):
        import numpy as np

        from rabbit_transcoding_tpu.encoder.segment import (
            SegmenterParams,
            segment_frame,
        )

        # a 2-deep slab: front layer white, back layer black — projected
        # along Z the back layer sits inside the front's thickness window
        g = np.mgrid[10:60, 10:60].reshape(2, -1).T
        front = np.column_stack([g[:, 0], g[:, 1], np.full(len(g), 30)])
        back = np.column_stack([g[:, 0], g[:, 1], np.full(len(g), 32)])
        pts = np.concatenate([front, back]).astype(np.int32)
        colors = np.concatenate([
            np.full((len(front), 3), 240, np.uint8),
            np.full((len(back), 3), 10, np.uint8),
        ])
        # exact accounting (patch member or missed) needs the lossless-style
        # selection threshold; CTC defaults proximity-cover near-surface
        # points without membership
        exact = dict(max_allowed_dist2_raw_points_selection=0.0,
                     max_allowed_dist2_raw_points_detection=0.0)
        params = SegmenterParams(**exact)
        segs_off, missed_off = segment_frame(pts, params, colors=None)
        params_on = SegmenterParams(surface_separation=True, **exact)
        segs_on, missed_on = segment_frame(pts, params_on, colors=colors)

        n_front = len(front)

        def mixed_columns(segs) -> int:
            # a column (same x,y under Z projection) holding BOTH a white
            # front point and a black back point violates surfaceSeparation
            count = 0
            for s in segs:
                if s.patch.normal_axis != 2:
                    continue
                c = s.point_indices
                keys = pts[c, 0].astype(np.int64) * 4096 + pts[c, 1]
                is_front = c < n_front
                kf = set(keys[is_front].tolist())
                kb = set(keys[~is_front].tolist())
                count += len(kf & kb)
            return count

        assert mixed_columns(segs_off) > 50     # off: some columns mix layers
        assert mixed_columns(segs_on) == 0      # on: columns are color-pure
        # and every point is still accounted for (patch or missed->raw)
        covered_on = set(missed_on.tolist()).union(
            *[set(s.point_indices.tolist()) for s in segs_on]
        )
        assert covered_on == set(range(len(pts)))
