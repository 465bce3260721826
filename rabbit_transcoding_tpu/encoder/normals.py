"""Normal estimation: PCA over KNN neighborhoods.

Capability parity with PCCNormalsGenerator3 (/root/reference/source/lib/
PccLibEncoder/source/PCCNormalsGenerator.cpp:61-533): per-point normals from
the eigen-decomposition of the local covariance, then sign orientation.

TPU-first split: the KNN graph is built once on host (scipy cKDTree — the
nanoflann analog); the per-point covariance + eigh and every later
consumer of the graph (segmentation refinement) run batched on device.
Orientation uses viewpoint disambiguation (flip toward the outward ray from
the cloud centroid) followed by KNN sign-consistency voting sweeps — a
parallel-friendly substitute for the reference's sequential spanning-tree
propagation (orientNormals :178)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from scipy.spatial import cKDTree


def knn_indices(points: np.ndarray, k: int) -> np.ndarray:
    """(N, 3) -> (N, k) neighbor indices (self included as first column)."""
    tree = cKDTree(points)
    _, idx = tree.query(points, k=min(k, len(points)), workers=-1)
    if idx.ndim == 1:
        idx = idx[:, None]
    if idx.shape[1] < k:  # tiny clouds: pad with self
        pad = np.repeat(idx[:, :1], k - idx.shape[1], axis=1)
        idx = np.concatenate([idx, pad], axis=1)
    return idx.astype(np.int32)


@jax.jit
def _pca_normals(points: jax.Array, nbr_idx: jax.Array) -> jax.Array:
    """Smallest-eigenvector normals of local covariance, batched per point."""
    nbrs = points[nbr_idx]                      # (N, k, 3)
    mean = nbrs.mean(axis=1, keepdims=True)
    centered = nbrs - mean
    cov = jnp.einsum("nki,nkj->nij", centered, centered,
                     precision=jax.lax.Precision.HIGHEST)
    # eigh returns ascending eigenvalues; the smallest's vector is the normal
    _, vecs = jnp.linalg.eigh(cov)
    return vecs[:, :, 0]


@jax.jit
def _orient_sweep(normals: jax.Array, nbr_idx: jax.Array) -> jax.Array:
    """One sign-consistency sweep: flip each normal if the majority of its
    neighbors' normals disagree in sign."""
    nbr_n = normals[nbr_idx]                    # (N, k, 3)
    agree = jnp.einsum("nkc,nc->nk", nbr_n, normals)
    vote = agree.sum(axis=1)
    return jnp.where(vote[:, None] < 0, -normals, normals)


from functools import partial  # noqa: E402


@partial(jax.jit, static_argnames=("sweeps",))
def _orient_all(
    normals: jax.Array, points: jax.Array, nbr_idx: jax.Array, sweeps: int
) -> jax.Array:
    """Viewpoint disambiguation + all consistency sweeps + normalisation in
    ONE device program (one host round trip on high-latency links)."""
    centroid = points.mean(axis=0, keepdims=True)
    outward = points - centroid
    flip = jnp.einsum("nc,nc->n", normals, outward) < 0
    n = jnp.where(flip[:, None], -normals, normals)
    n = jax.lax.fori_loop(
        0, sweeps, lambda _, x: _orient_sweep(x, nbr_idx), n
    )
    return n / jnp.maximum(jnp.linalg.norm(n, axis=1, keepdims=True), 1e-12)


def compute_normals(
    points: np.ndarray,
    k: int = 16,
    orient_sweeps: int = 2,
    nbr_idx: np.ndarray | None = None,
) -> tuple[np.ndarray, np.ndarray]:
    """-> (normals (N,3) float32 unit, knn indices (N,k)).  The KNN graph is
    returned for reuse by segmentation refinement."""
    if nbr_idx is None:
        nbr_idx = knn_indices(points, k)
    pts = jnp.asarray(points.astype(np.float32))
    idx = jnp.asarray(nbr_idx)
    n = _pca_normals(pts, idx)
    # viewpoint disambiguation + consistency sweeps, fused into one program
    n = _orient_all(n, pts, idx, orient_sweeps)
    return np.asarray(n), np.asarray(nbr_idx)
