"""Raw-points selection/detection thresholds + CC graph width
(maxAllowedDist2RawPoints{Selection,Detection}, maxNNCountPatchSegmentation
— PCCPatchSegmenter.cpp:521-527,778,1261 semantics).

Drives segment_patches directly with a uniform PPI so the two-layer slab
stays one connected component: the front plane is patched in round one and
the occluded back layer's fate is decided purely by the thresholds."""

from __future__ import annotations

import numpy as np

from rabbit_transcoding_tpu.encoder.normals import knn_indices
from rabbit_transcoding_tpu.encoder.segment import (
    SegmenterParams,
    segment_frame,
    segment_patches,
)


def _slab_case(gap: int, **knobs):
    xs, ys = np.meshgrid(np.arange(8, 40), np.arange(8, 40), indexing="ij")
    front = np.stack([xs.ravel(), ys.ravel(),
                      np.full(xs.size, 8)], axis=1)
    back = front.copy()
    back[:, 2] += gap
    pts = np.concatenate([front, back]).astype(np.int32)
    ppi = np.full(len(pts), 2, np.int32)       # all +z: one component
    nbr = knn_indices(pts.astype(np.float32), k=16)
    params = SegmenterParams(surface_thickness=0, **knobs)
    segs, missed = segment_patches(pts, ppi, nbr, params)
    members = (set(np.concatenate([s.point_indices for s in segs]).tolist())
               if segs else set())
    return segs, set(missed.tolist()), members, set(range(len(front),
                                                          len(pts)))


class TestSelectionThreshold:
    def test_within_selection_is_proximity_covered(self):
        # gap 1: the back layer sits at dist^2 == 1 from the front samples
        # -> under the CTC selection threshold (1) it is neither missed nor
        # a member: proximity-covered, like the reference
        segs, missed, members, back = _slab_case(gap=1)
        assert not (back & members)
        assert not (back & missed)

    def test_selection_zero_keeps_them_missed(self):
        segs, missed, members, back = _slab_case(
            gap=1,
            max_allowed_dist2_raw_points_selection=0.0,
            max_allowed_dist2_raw_points_detection=0.0,
        )
        assert back <= missed | members

        assert back & missed or back & members


class TestDetectionThreshold:
    def test_mildly_missed_component_not_repatched(self):
        # gap 2: back at dist^2 == 4 -> missed (4 > selection 1) but below
        # detection (9): the component must NOT become a second patch
        segs, missed, members, back = _slab_case(gap=2)
        assert len(segs) == 1
        assert not (back & members)
        assert back <= missed

    def test_badly_missed_component_is_repatched(self):
        segs, missed, members, back = _slab_case(
            gap=2, max_allowed_dist2_raw_points_detection=0.0)
        assert len(segs) >= 2
        assert back & members

    def test_beyond_detection_is_repatched_by_default(self):
        # gap 4 -> dist^2 == 16 > detection 9: re-patched with CTC defaults
        segs, missed, members, back = _slab_case(gap=4)
        assert len(segs) >= 2
        assert back & members


class TestPatchSegmentationGraphWidth:
    def test_narrow_cc_graph_still_covers(self):
        rng = np.random.default_rng(5)
        pts = np.unique(
            rng.integers(8, 56, (4000, 3)).astype(np.int32), axis=0)
        pts[:, 2] = 8  # a plane
        segs_wide, _ = segment_frame(
            pts, SegmenterParams(max_nn_count_patch_segmentation=0))
        segs_narrow, _ = segment_frame(
            pts, SegmenterParams(max_nn_count_patch_segmentation=4))
        cov_w = sum(len(s.point_indices) for s in segs_wide)
        cov_n = sum(len(s.point_indices) for s in segs_narrow)
        assert cov_n >= int(0.9 * cov_w)


def _two_plane_cloud(n=24):
    """Two orthogonal planes: +z facing and +x facing."""
    a, b = np.meshgrid(np.arange(n), np.arange(n), indexing="ij")
    z_plane = np.stack([a.ravel(), b.ravel(), np.full(a.size, 4)], axis=1)
    x_plane = np.stack([np.full(a.size, 4), a.ravel(), b.ravel() + n], axis=1)
    return np.concatenate([z_plane, x_plane]).astype(np.int32)


class TestGridBasedRefineSegmentation:
    def test_matches_point_refine_on_clean_planes(self):
        from rabbit_transcoding_tpu.encoder.normals import compute_normals
        from rabbit_transcoding_tpu.encoder.segment import (
            initial_segmentation,
            refine_segmentation,
            refine_segmentation_grid_based,
        )

        pts = _two_plane_cloud()
        nbr = knn_indices(pts.astype(np.float32), k=48)
        normals, _ = compute_normals(pts.astype(np.float32), k=16,
                                     nbr_idx=nbr[:, :16])
        ppi0 = initial_segmentation(normals)
        params = SegmenterParams()
        plain = refine_segmentation(normals, ppi0, nbr, params)
        grid = refine_segmentation_grid_based(pts, normals, ppi0, params)
        # both refinements agree on the clean interiors (boundary rows may
        # differ); require >90% identical labels
        assert np.mean(plain == grid) > 0.9
        assert set(np.unique(grid)) <= set(range(6))

    def test_grid_refine_smooths_label_noise(self):
        from rabbit_transcoding_tpu.encoder.normals import compute_normals
        from rabbit_transcoding_tpu.encoder.segment import (
            initial_segmentation,
            refine_segmentation_grid_based,
        )

        pts = _two_plane_cloud()
        nbr = knn_indices(pts.astype(np.float32), k=16)
        normals, _ = compute_normals(pts.astype(np.float32), k=16,
                                     nbr_idx=nbr)
        ppi = initial_segmentation(normals)
        rng = np.random.default_rng(0)
        noisy = ppi.copy()
        flip = rng.random(len(ppi)) < 0.15
        noisy[flip] = rng.integers(0, 6, flip.sum())
        refined = refine_segmentation_grid_based(
            pts, normals, noisy, SegmenterParams()
        )
        assert np.mean(refined == ppi) > np.mean(noisy == ppi)

    def test_e2e_segment_frame_with_grid_refine(self):
        pts = _two_plane_cloud()
        segs, missed = segment_frame(
            pts, SegmenterParams(grid_based_refine_segmentation=True)
        )
        covered = sum(len(s.point_indices) for s in segs) + len(missed)
        assert covered >= len(pts) * 0.95


class TestNormalOrientationKnob:
    def test_strategies_run_end_to_end(self):
        pts = _two_plane_cloud()
        for strategy in (0, 2, 3):
            segs, missed = segment_frame(
                pts, SegmenterParams(normal_orientation=strategy)
            )
            assert len(segs) >= 1


class TestLossyRawPruning:
    def test_isolated_points_pruned_clustered_kept(self):
        from rabbit_transcoding_tpu.codec.raw_points import (
            prune_isolated_raw_points,
        )

        rng = np.random.default_rng(1)
        cluster = rng.integers(0, 3, size=(64, 3)).astype(np.float32)
        isolated = np.array([[200.0, 200, 200], [400, 10, 40]], np.float32)
        pts = np.concatenate([cluster, isolated])
        keep = prune_isolated_raw_points(pts)
        assert keep[:64].all()
        assert not keep[64:].any()
