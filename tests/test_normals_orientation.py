"""Normal-orientation strategies on hostile topology (round-3 verdict
task 7).

The reference orients normal signs by growing a maximum spanning tree over
the KNN graph (orientNormals, PCCNormalsGenerator.cpp:178-234); earlier
rounds substituted global viewpoint seeding + consistency sweeps.  On
convex single bodies the two agree, but on MULTI-BODY scenes the global
centroid seeds the hemisphere of an off-center body inconsistently and
the sweeps settle mixed (measured ~55% sign consistency on the small
body below) — which splits its PPI partition and fragments patches.  The
true tree (native/normals_tree.cpp, now the default in compute_normals)
orients every component consistently.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from rabbit_transcoding_tpu import native
from rabbit_transcoding_tpu.encoder import normals as nm
from rabbit_transcoding_tpu.encoder.segment import (
    SegmenterParams,
    initial_segmentation,
    refine_segmentation,
)

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native library unavailable (no g++?)"
)


def sphere(center, r, n, seed):
    rng = np.random.default_rng(seed)
    th = np.arccos(1 - 2 * rng.uniform(0, 1, n))
    ph = rng.uniform(0, 2 * np.pi, n)
    return np.round(center + r * np.stack([
        np.sin(th) * np.cos(ph), np.sin(th) * np.sin(ph), np.cos(th),
    ], 1)).astype(np.float32)


def consistency(normals, pos, center):
    """Per-body sign consistency: the fraction of the dominant sign of
    dot(normal, outward).  1.0 = every normal on the same side."""
    out = np.einsum("nc,nc->n", normals, pos - center) > 0
    return max(out.mean(), 1.0 - out.mean())


@pytest.fixture(scope="module")
def multibody():
    """A large sphere + a small FAR OFF-CENTER body: the global centroid
    sits inside the big sphere, so centroid-outward seeding is wrong for
    half the small body."""
    a = sphere(np.array([100.0, 100.0, 100.0]), 60, 12000, 0)
    b = sphere(np.array([350.0, 120.0, 100.0]), 25, 3000, 1)
    pts = np.concatenate([a, b])
    idx = nm.knn_indices(pts, 16)
    pca = np.asarray(nm._pca_normals(jnp.asarray(pts), jnp.asarray(idx)))
    return pts, idx, pca, len(a)


class TestMultiBody:
    def test_tree_orients_every_body(self, multibody):
        pts, idx, pca, na = multibody
        tree = nm.orient_spanning_tree(pca, pts, idx)
        assert consistency(tree[:na], pts[:na],
                           np.array([100.0, 100.0, 100.0])) > 0.99
        assert consistency(tree[na:], pts[na:],
                           np.array([350.0, 120.0, 100.0])) > 0.99

    def test_sweeps_misorient_small_body(self, multibody):
        """The documented failure the tree fixes: keep this as the canary —
        if the sweep path ever starts passing, the A/B claim in the
        module docstring needs re-measuring."""
        pts, idx, pca, na = multibody
        sweep = np.asarray(nm._orient_all(
            jnp.asarray(pca), jnp.asarray(pts), jnp.asarray(idx), 2,
        ))
        assert consistency(sweep[na:], pts[na:],
                           np.array([350.0, 120.0, 100.0])) < 0.9

    def test_ppi_partition_quality(self, multibody):
        """Segmentation-quality comparison: consistent signs give the small
        body a clean <=6-direction PPI split; mixed signs send nearly
        antipodal PPIs to neighbouring points, which refinement cannot
        fully undo.  Measure PPI smoothness = fraction of KNN edges whose
        endpoints share a PPI, on the small body."""
        pts, idx, pca, na = multibody
        params = SegmenterParams()

        def smoothness(normals):
            ppi = initial_segmentation(normals)
            ppi = refine_segmentation(normals, ppi, idx, params)
            p = ppi[na:]
            nbr = ppi[idx[na:, 1:]]
            return float((nbr == p[:, None]).mean())

        tree = nm.orient_spanning_tree(pca, pts, idx)
        sweep = np.asarray(nm._orient_all(
            jnp.asarray(pca), jnp.asarray(pts), jnp.asarray(idx), 2,
        ))
        s_tree, s_sweep = smoothness(tree), smoothness(sweep)
        assert s_tree >= s_sweep - 1e-9, (s_tree, s_sweep)
        assert s_tree > 0.9, s_tree

    def test_component_count(self, multibody):
        pts, idx, pca, _ = multibody
        n = np.ascontiguousarray(pca, np.float32).copy()
        comps = native.orient_normals_tree(
            n, pts, idx, np.ones(idx.shape, np.uint8),
            np.zeros(3, np.float32),
        )
        # KNN on two far-apart bodies has cross-body edges only via the
        # nearest-neighbor padding; each body seeds at least once
        assert comps >= 2


class TestConvexEquivalence:
    def test_sphere_tree_matches_sweeps(self):
        """On the convex content every earlier round measured with, the
        tree and the sweeps agree UP TO A GLOBAL SIGN (the tree's
        origin-viewpoint seed can pick the inward convention; PPI
        classification and projection are invariant to a global flip) —
        the regression guard for the default switch."""
        pts = sphere(np.array([128.0, 128.0, 128.0]), 80, 15000, 3)
        idx = nm.knn_indices(pts, 16)
        pca = np.asarray(nm._pca_normals(jnp.asarray(pts), jnp.asarray(idx)))
        tree = nm.orient_spanning_tree(pca, pts, idx)
        sweep = np.asarray(nm._orient_all(
            jnp.asarray(pca), jnp.asarray(pts), jnp.asarray(idx), 2,
        ))
        agree = (np.einsum("nc,nc->n", tree, sweep) > 0).mean()
        assert max(agree, 1.0 - agree) > 0.999, agree

    def test_compute_normals_uses_tree(self):
        """compute_normals (the encoder's segmentation path) now returns
        tree-oriented normals: outward on a sphere, unit length."""
        center = np.array([128.0, 128.0, 128.0])
        pts = sphere(center, 60, 8000, 4)
        n, _ = nm.compute_normals(pts.astype(np.int32))
        assert consistency(n, pts, center) > 0.999
        assert np.allclose(np.linalg.norm(n, axis=1), 1.0, atol=1e-5)


class TestThinSheet:
    def test_two_layer_sheet_consistent(self):
        """A 2-voxel-thick sheet (the V-PCC near/far-layer shape): the
        KNN graph spans both faces, so the |dot|-weighted tree keeps ONE
        consistent sign across the sheet (the reference's behavior — the
        projection split into D0/D1 handles two-sidedness, not the
        normals)."""
        rng = np.random.default_rng(5)
        m = 8000
        xy = rng.uniform(0, 200, (m, 2))
        z = np.where(rng.random(m) < 0.5, 100.0, 101.0)
        pts = np.round(np.column_stack([xy, z])).astype(np.float32)
        idx = nm.knn_indices(pts, 16)
        pca = np.asarray(nm._pca_normals(jnp.asarray(pts), jnp.asarray(idx)))
        tree = nm.orient_spanning_tree(pca, pts, idx)
        sign = np.einsum("nc,c->n", tree, np.array([0.0, 0.0, 1.0]))
        frac = (sign > 0).mean()
        assert frac > 0.99 or frac < 0.01, frac
