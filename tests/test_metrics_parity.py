"""Metrics parity with PCCMetrics.cpp semantics: equidistant-NN D2
averaging, neighborsProc color modes, dropDuplicates modes, color
Hausdorff.  Expected values are hand-computed or produced by an
independent scalar reimplementation of the reference loops."""

import numpy as np
import pytest

from rabbit_transcoding_tpu.core.pointset import PointSet
from rabbit_transcoding_tpu.metrics.metrics import (
    MetricsParams,
    _rgb_to_yuv709,
    compute_metrics,
)


def _ps(pos, colors=None):
    return PointSet(
        positions=np.asarray(pos, np.float64),
        colors=None if colors is None else np.asarray(colors, np.uint8),
    )


class TestD2Equidistant:
    def test_hand_computed_average(self):
        """src (0,0,0) n=(1,0,0); rec has two NNs both at distance 1: one
        along the normal (proj^2=1), one across it (proj^2=0) -> D2 is the
        MEAN over the equidistant set = 0.5 (PCCMetrics.cpp:112-125), where
        single-NN would give 0 or 1 depending on tie order."""
        src = _ps([[0, 0, 0]])
        rec = _ps([[1, 0, 0], [0, 1, 0]])
        normals = np.array([[1.0, 0.0, 0.0]])
        m = compute_metrics(
            src, rec, MetricsParams(drop_duplicates=0), source_normals=normals
        )
        # src->rec: (1+0)/2 = 0.5; rec->src: per-point 1 and 0, mean 0.5
        assert m.d2_mse == pytest.approx(0.5)
        assert m.d1_mse == pytest.approx(1.0)

    def test_single_nn_knob(self):
        """neighbors_d2=1 reproduces single-NN D2 (no averaging)."""
        src = _ps([[0, 0, 0]])
        rec = _ps([[2, 0, 0], [0, 3, 0]])  # unique distances: NN is (2,0,0)
        normals = np.array([[1.0, 0.0, 0.0]])
        m = compute_metrics(
            src, rec,
            MetricsParams(drop_duplicates=0, neighbors_d2=1),
            source_normals=normals,
        )
        # src->rec: err (2,0,0) proj^2 = 4
        # rec->src: (2,0,0)->4 along normal; (0,3,0)->0 across; mean 2
        assert m.d2_mse == pytest.approx(4.0)

    def test_extension_beyond_first_batch(self):
        """>5 equidistant neighbours: the adaptive query must extend past
        the first batch of 5 (num_results_incr, PCCMetrics.cpp:87-99)."""
        # 6 rec points all at distance 1, 5 across the normal, 1 along it
        rec_pts = [[0, 1, 0], [0, -1, 0], [0, 0, 1], [0, 0, -1],
                   [0, np.sqrt(0.5), np.sqrt(0.5)], [1, 0, 0]]
        src = _ps([[0, 0, 0]])
        rec = _ps(rec_pts)
        normals = np.array([[1.0, 0.0, 0.0]])
        m = compute_metrics(
            src, rec, MetricsParams(drop_duplicates=0), source_normals=normals
        )
        # src->rec: mean over all 6 = 1/6; rec->src: mean = 1/6 as well
        assert m.d2_mse == pytest.approx(1.0 / 6.0)


class TestNeighborsProc:
    def test_average_mode_hand_value(self):
        """proc=1: RGB of the equidistant set is averaged (rounded) BEFORE
        YUV conversion (PCCMetrics.cpp:141-156)."""
        src = _ps([[0, 0, 0]], colors=[[100, 100, 100]])
        rec = _ps(
            [[1, 0, 0], [0, 1, 0]], colors=[[90, 90, 90], [110, 112, 110]]
        )
        normals = np.array([[1.0, 0.0, 0.0]])
        m = compute_metrics(
            src, rec,
            MetricsParams(drop_duplicates=0, neighbors_proc=1),
            source_normals=normals,
        )
        yuv_a = _rgb_to_yuv709(np.array([100, 100, 100]))
        yuv_avg = _rgb_to_yuv709(np.round(
            np.array([(90 + 110) / 2, (90 + 112) / 2, (90 + 110) / 2])
        ))
        sq_ab = (yuv_a - yuv_avg) ** 2
        # rec->src direction: each rec point vs src color
        sq_ba = np.stack([
            (_rgb_to_yuv709(np.array([90, 90, 90])) - yuv_a) ** 2,
            (_rgb_to_yuv709(np.array([110, 112, 110])) - yuv_a) ** 2,
        ]).mean(axis=0)
        expect = np.maximum(sq_ab, sq_ba)
        got = 10 ** (-np.asarray(m.color_psnr) / 10.0)
        np.testing.assert_allclose(got, expect, rtol=1e-9)

    @pytest.mark.parametrize("proc", [3, 4])
    def test_min_max_modes(self, proc):
        """proc=3/4 pick the equidistant neighbour with min/max YUV
        distance (PCCMetrics.cpp:157-176)."""
        src = _ps([[0, 0, 0]], colors=[[100, 100, 100]])
        rec = _ps(
            [[1, 0, 0], [0, 1, 0]], colors=[[98, 98, 98], [180, 180, 180]]
        )
        normals = np.array([[1.0, 0.0, 0.0]])
        m = compute_metrics(
            src, rec,
            MetricsParams(drop_duplicates=0, neighbors_proc=proc),
            source_normals=normals,
        )
        yuv_a = _rgb_to_yuv709(np.array([100, 100, 100]))
        pick = [98, 98, 98] if proc == 3 else [180, 180, 180]
        sq_ab = (yuv_a - _rgb_to_yuv709(np.array(pick))) ** 2
        sq_ba = np.stack([
            (_rgb_to_yuv709(np.array([98, 98, 98])) - yuv_a) ** 2,
            (_rgb_to_yuv709(np.array([180, 180, 180])) - yuv_a) ** 2,
        ]).mean(axis=0)
        expect = np.maximum(sq_ab, sq_ba)
        got = 10 ** (-np.asarray(m.color_psnr) / 10.0)
        np.testing.assert_allclose(got, expect, rtol=1e-9)

    def test_differential_vs_scalar_reference(self):
        """Random clouds: the vectorised path must match a direct scalar
        transcription of the reference loop (average mode + D2)."""
        rng = np.random.default_rng(7)
        a_pos = rng.integers(0, 6, size=(40, 3)).astype(np.float64)
        b_pos = rng.integers(0, 6, size=(50, 3)).astype(np.float64)
        a_col = rng.integers(0, 256, size=(40, 3)).astype(np.uint8)
        b_col = rng.integers(0, 256, size=(50, 3)).astype(np.uint8)
        normals = rng.normal(size=(40, 3))
        normals /= np.linalg.norm(normals, axis=1, keepdims=True)

        def scalar_direction(pa, pb, ca, cb, n_a, normals_on_b):
            d2s, csqs = [], []
            for i in range(len(pa)):
                d = ((pb - pa[i]) ** 2).sum(axis=1)
                dmin = d.min()
                ties = np.where(np.abs(d - dmin) < 1e-8)[0]
                # D2: mean proj^2 over ties
                projs = []
                for j in ties:
                    err = pb[j] - pa[i]
                    nrm = n_a[j] if normals_on_b else n_a[i]
                    projs.append(float(err @ nrm) ** 2)
                d2s.append(np.mean(projs))
                # color avg mode
                rgb = np.round(cb[ties].astype(np.float64).mean(axis=0))
                csqs.append(
                    (_rgb_to_yuv709(ca[i]) - _rgb_to_yuv709(rgb)) ** 2
                )
            return np.mean(d2s), np.mean(csqs, axis=0)

        d2_ab, c_ab = scalar_direction(
            a_pos, b_pos, a_col, b_col, normals, normals_on_b=False
        )
        d2_ba, c_ba = scalar_direction(
            b_pos, a_pos, b_col, a_col, normals, normals_on_b=True
        )
        src = _ps(a_pos, a_col)
        rec = _ps(b_pos, b_col)
        m = compute_metrics(
            src, rec,
            MetricsParams(drop_duplicates=0, neighbors_proc=1),
            source_normals=normals,
        )
        assert m.d2_mse == pytest.approx(max(d2_ab, d2_ba), rel=1e-9)
        got = 10 ** (-np.asarray(m.color_psnr) / 10.0)
        np.testing.assert_allclose(got, np.maximum(c_ab, c_ba), rtol=1e-9)


class TestDropDuplicates:
    def test_average_colors_floor_division(self):
        """mode 2: colors of co-located points floor-average (the C++
        size_t division, PCCPointSet.cpp:190-200)."""
        ps = _ps(
            [[1, 1, 1], [1, 1, 1], [2, 2, 2]],
            colors=[[10, 11, 10], [13, 12, 13], [50, 50, 50]],
        )
        out = ps.remove_duplicates(2)
        assert out.point_count == 2
        # (10+13)//2 = 11 (floor), (11+12)//2 = 11, (10+13)//2 = 11
        i = int(np.where((out.positions == 1).all(axis=1))[0][0])
        np.testing.assert_array_equal(out.colors[i], [11, 11, 11])

    def test_drop_keeps_first(self):
        ps = _ps(
            [[1, 1, 1], [1, 1, 1]], colors=[[10, 10, 10], [200, 200, 200]]
        )
        out = ps.remove_duplicates(1)
        assert out.point_count == 1
        np.testing.assert_array_equal(out.colors[0], [10, 10, 10])

    def test_mode_zero_keeps_all(self):
        src = _ps([[0, 0, 0], [0, 0, 0]], colors=[[1, 1, 1], [3, 3, 3]])
        m = compute_metrics(
            src, src, MetricsParams(drop_duplicates=0),
            source_normals=np.array([[1.0, 0, 0], [1.0, 0, 0]]),
        )
        assert m.point_count_source == 2

    def test_metrics_use_mode(self):
        """Duplicate with wildly different colors: mode 2 averages them on
        BOTH clouds, so identical clouds stay infinite-PSNR."""
        pos = [[0, 0, 0], [0, 0, 0], [4, 4, 4]]
        col = [[0, 0, 0], [255, 255, 255], [9, 9, 9]]
        m = compute_metrics(
            _ps(pos, col), _ps(pos, col),
            MetricsParams(drop_duplicates=2),
        )
        assert all(np.isinf(p) for p in m.color_psnr)


class TestColorHausdorff:
    def test_present_and_correct(self):
        src = _ps([[0, 0, 0], [5, 0, 0]],
                  colors=[[100, 100, 100], [100, 100, 100]])
        rec = _ps([[0, 0, 0], [5, 0, 0]],
                  colors=[[100, 100, 100], [110, 100, 100]])
        m = compute_metrics(
            src, rec, MetricsParams(drop_duplicates=0),
            source_normals=np.array([[1.0, 0, 0], [1.0, 0, 0]]),
        )
        sq = (_rgb_to_yuv709(np.array([100, 100, 100]))
              - _rgb_to_yuv709(np.array([110, 100, 100]))) ** 2
        got = 10 ** (-np.asarray(m.color_hausdorff_psnr) / 10.0)
        np.testing.assert_allclose(got, sq, rtol=1e-9)
