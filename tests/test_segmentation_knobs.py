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
