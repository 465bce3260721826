"""transfer_colors_fwd_bwd vs a scalar oracle of PCCPointSet3::transferColors.

The oracle below is a direct transliteration of the reference control flow
(/root/reference/source/lib/PccLibCommon/source/PCCPointSet.cpp:807-1110)
used only as a test fixture; the shipping implementation is the vectorised
ops/recolor.py path.
"""

from __future__ import annotations

import numpy as np
import pytest
from scipy.spatial import cKDTree

from rabbit_transcoding_tpu.ops.recolor import (
    RecolorParams,
    transfer_colors_fwd_bwd,
)


def oracle(src_pts, src_col, dst_pts, p: RecolorParams):
    src_pts = np.asarray(src_pts, float)
    dst_pts = np.asarray(dst_pts, float)
    src_col = np.asarray(src_col, float)
    nS, nT = len(src_pts), len(dst_pts)
    geo2f = p.maxGeometryDist2Fwd if p.maxGeometryDist2Fwd < 512 else np.inf
    geo2b = p.maxGeometryDist2Bwd if p.maxGeometryDist2Bwd < 512 else np.inf
    col2f = p.maxColorDist2Fwd if p.maxColorDist2Fwd < 512 else np.inf
    col2b = p.maxColorDist2Bwd if p.maxColorDist2Bwd < 512 else np.inf
    ts = cKDTree(src_pts)
    tt = cKDTree(dst_pts)

    def spread(cols):
        m = 0.0
        for i in range(len(cols)):
            for j in range(i + 1, len(cols)):
                m = max(m, ((cols[i] - cols[j]) ** 2).sum())
        return m

    def wavg(cols, ws):
        avg = (cols * ws[:, None]).sum(0) / ws.sum()
        if p.excludeColorOutlier:
            far = ((cols - avg) ** 2).sum(1) > p.thresholdColorOutlierDist ** 2
            if 0 < far.sum() < len(cols):
                keep = ~far
                avg = (cols[keep] * ws[keep][:, None]).sum(0) / ws[keep].sum()
        return avg

    refined1 = np.zeros((nT, 3))
    for t in range(nT):
        k = min(p.numNeighborsFwd, nS)
        d, idx = ts.query(dst_pts[t], k=k)
        d, idx = np.atleast_1d(d), np.atleast_1d(idx)
        d2 = d * d
        while len(idx) > 1 and d2[-1] > geo2f:
            d2, idx = d2[:-1], idx[:-1]
        if p.skipAvgIfIdenticalSourcePointPresentFwd and d2[0] < 1e-4:
            refined1[t] = src_col[idx[0]]
            continue
        n = len(idx)
        while n > 1 and spread(src_col[idx[:n]]) > col2f:
            n -= 1
        if n == 1:
            refined1[t] = src_col[idx[0]]
            continue
        ws = (1.0 / (d2[:n] + p.distOffsetFwd)
              if p.useDistWeightedAverageFwd else np.ones(n))
        refined1[t] = np.clip(np.round(wavg(src_col[idx[:n]], ws)), 0, 255)

    cands = [[] for _ in range(nT)]
    for s in range(nS):
        k = min(p.numNeighborsBwd, nT)
        d, idx = tt.query(src_pts[s], k=k)
        d, idx = np.atleast_1d(d), np.atleast_1d(idx)
        for dd, ii in zip(d * d, idx):
            if dd <= geo2b:
                cands[int(ii)].append((dd, src_col[s]))
    out = np.zeros((nT, 3))
    for t in range(nT):
        cl = sorted(cands[t], key=lambda x: x[0])
        if not cl or p.losslessAttribute:
            out[t] = refined1[t]
            continue
        if p.skipAvgIfIdenticalSourcePointPresentBwd and cl[0][0] < 1e-4:
            cl = cl[:1]
            centroid2 = cl[0][1].astype(float)
        else:
            n = len(cl)
            while n > 1 and spread(np.array([c for _, c in cl[:n]])) > col2b:
                n -= 1
            cl = cl[:n]
            if n == 1:
                centroid2 = cl[0][1].astype(float)
            else:
                ws = np.array(
                    [1.0 / (np.sqrt(dd) + p.distOffsetBwd) for dd, _ in cl]
                ) if p.useDistWeightedAverageBwd else np.ones(n)
                centroid2 = wavg(np.array([c for _, c in cl]), ws)
        color0 = np.clip(np.round(centroid2), 0, 255)
        if p.searchRange > 0:
            best, best_err = color0, np.inf
            rng = range(-p.searchRange, p.searchRange + 1)
            for s1 in rng:
                for s2 in rng:
                    for s3 in rng:
                        c = np.clip(color0 + [s1, s2, s3], 0, 255)
                        e1 = ((c - refined1[t]) ** 2).sum() / nT
                        e2 = sum(((c - cc) ** 2).sum() for _, cc in cl) / nS
                        if max(e1, e2) < best_err:
                            best_err, best = max(e1, e2), c
            color0 = best
        out[t] = color0
    return np.clip(np.round(out), 0, 255).astype(np.uint8)


def _random_cloud(rng, n, spread=30.0):
    pts = rng.uniform(0, spread, (n, 3)).round(1)
    col = rng.integers(0, 256, (n, 3)).astype(np.uint8)
    return pts, col


CASES = [
    RecolorParams(),
    RecolorParams(numNeighborsFwd=8, numNeighborsBwd=2),
    RecolorParams(useDistWeightedAverageFwd=False,
                  useDistWeightedAverageBwd=False),
    RecolorParams(maxGeometryDist2Fwd=9.0, maxGeometryDist2Bwd=9.0),
    RecolorParams(maxColorDist2Fwd=400.0, maxColorDist2Bwd=400.0,
                  numNeighborsFwd=6),
    RecolorParams(excludeColorOutlier=True, thresholdColorOutlierDist=40.0,
                  numNeighborsFwd=6),
    RecolorParams(skipAvgIfIdenticalSourcePointPresentFwd=False,
                  skipAvgIfIdenticalSourcePointPresentBwd=False),
    RecolorParams(searchRange=1),
    RecolorParams(losslessAttribute=True),
]


class TestAgainstOracle:
    @pytest.mark.parametrize("case", range(len(CASES)))
    def test_matches_reference_control_flow(self, case):
        rng = np.random.default_rng(7 + case)
        src_pts, src_col = _random_cloud(rng, 120)
        # target = jittered subset + a few exact copies (identical-point path)
        dst = np.concatenate([
            src_pts[:40] + rng.normal(0, 0.8, (40, 3)).round(1),
            src_pts[40:55],
        ])
        got = transfer_colors_fwd_bwd(src_pts, src_col, dst, CASES[case])
        want = oracle(src_pts, src_col, dst, CASES[case])
        # ties in KNN ordering / float assoc can flip a rounding unit
        assert np.abs(got.astype(int) - want.astype(int)).max() <= 1
        assert (got != want).mean() < 0.06

    def test_identical_cloud_is_exact(self):
        rng = np.random.default_rng(3)
        pts, col = _random_cloud(rng, 200)
        got = transfer_colors_fwd_bwd(pts, col, pts, RecolorParams())
        assert np.array_equal(got, col)

    def test_empty_inputs(self):
        p, c = _random_cloud(np.random.default_rng(0), 5)
        assert transfer_colors_fwd_bwd(p, c, np.zeros((0, 3))).shape == (0, 3)
        out = transfer_colors_fwd_bwd(np.zeros((0, 3)), np.zeros((0, 3)),
                                      p)
        assert out.shape == (5, 3)

    def test_backward_centroid_wins_over_forward(self):
        # one target point between two source clusters: fwd avg mixes both,
        # bwd candidates (their nearest target is this one) pick the true
        # owners -> reference semantics keep the bwd centroid
        src = np.array([[0, 0, 0], [10, 0, 0]], float)
        col = np.array([[0, 0, 0], [200, 200, 200]], np.uint8)
        dst = np.array([[1.0, 0, 0]])
        got = transfer_colors_fwd_bwd(
            src, col, dst,
            RecolorParams(numNeighborsFwd=2, numNeighborsBwd=1,
                          maxGeometryDist2Bwd=1000.0))
        # both sources' nearest target is dst[0]; weighted toward the near one
        w0 = 1 / (1.0 + 4.0)
        w1 = 1 / (9.0 + 4.0)
        want = np.round(200 * w1 / (w0 + w1))
        assert abs(int(got[0][0]) - want) <= 1
