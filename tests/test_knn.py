"""Grid-hash KNN vs the exact KD-tree."""

import numpy as np
import pytest
from scipy.spatial import cKDTree

from rabbit_transcoding_tpu.ops.knn import knn

from test_e2e_codec import make_sphere_cloud


class TestGridKnn:
    def test_nn_matches_kdtree_on_surface(self):
        ps = make_sphere_cloud(n_theta=120)
        pts = ps.positions
        queries = pts[::7] + np.array([1, 0, 0], np.int32)
        d2, idx = knn(queries, pts, k=1)
        d_ref, i_ref = cKDTree(pts).query(queries, k=1)
        found = idx[:, 0] >= 0
        assert found.mean() > 0.999
        np.testing.assert_allclose(
            np.sqrt(d2[found, 0]), d_ref[found], atol=1e-4
        )

    def test_k4_distances_match(self):
        ps = make_sphere_cloud(n_theta=100)
        pts = ps.positions
        d2, idx = knn(pts, pts, k=4)
        d_ref, _ = cKDTree(pts).query(pts, k=4)
        found = (idx >= 0).all(axis=1)
        assert found.mean() > 0.99
        # sorted distances agree where all 4 were found within the radius
        got = np.sort(np.sqrt(d2[found]), axis=1)
        ref = np.sort(d_ref[found], axis=1)
        close = np.isclose(got, ref, atol=1e-3).all(axis=1)
        assert close.mean() > 0.98

    def test_self_query_returns_self_first(self):
        ps = make_sphere_cloud(n_theta=60)
        pts = ps.positions
        d2, idx = knn(pts, pts, k=1)
        assert (d2[:, 0] == 0).mean() > 0.999

    def test_far_outlier_unfound(self):
        refs = np.zeros((10, 3), np.int32)
        queries = np.array([[900, 900, 900]], np.int32)
        d2, idx = knn(queries, refs, k=1)
        assert np.isinf(d2[0, 0]) and idx[0, 0] == -1


class TestDeviceRecolor:
    def test_matches_host_nn(self):
        from rabbit_transcoding_tpu.ops.recolor import (
            transfer_colors,
            transfer_colors_device,
        )

        ps = make_sphere_cloud(n_theta=80)
        dst = ps.positions[::3] + np.array([0, 1, 0], np.int32)
        host = transfer_colors(
            ps.positions.astype(np.float32), ps.colors, dst.astype(np.float32),
            k=1,
        )
        dev = transfer_colors_device(ps.positions, ps.colors, dst, k=1)
        # disagreements must only be exact distance ties (equally valid NN)
        agree = (host == dev).all(axis=1)
        if not agree.all():
            from rabbit_transcoding_tpu.ops.knn import knn as gknn

            d_ref, _ = cKDTree(ps.positions).query(dst[~agree], k=1)
            d_dev, _ = gknn(dst[~agree], ps.positions, k=1)
            ties = np.isclose(np.sqrt(d_dev[:, 0]), d_ref, atol=1e-5)
            assert ties.all(), "device picked a farther neighbor"
        assert agree.mean() > 0.8

    def test_outlier_fallback(self):
        from rabbit_transcoding_tpu.ops.recolor import transfer_colors_device

        src = np.array([[10, 10, 10]], np.int32)
        col = np.array([[9, 8, 7]], np.uint8)
        dst = np.array([[900, 900, 900]], np.int32)
        out = transfer_colors_device(src, col, dst, k=1)
        assert out[0].tolist() == [9, 8, 7]
