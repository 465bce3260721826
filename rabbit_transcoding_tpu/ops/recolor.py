"""Attribute transfer (recoloring): source cloud -> reconstructed cloud.

Capability parity with the PCCPointSet3::transferColors* family
(/root/reference/source/lib/PccLibCommon/source/PCCPointSet.cpp:807-2097):
colors are transferred from the source cloud to the (geometry-compressed)
reconstructed cloud by nearest/KNN lookup with inverse-distance weighting.

Host KNN (scipy cKDTree, the nanoflann analog) builds the neighbor lists;
the weighted blend itself is a trivial vectorised op.  A device grid-hash
KNN (ops/knn.py) replaces the host tree for the batched multi-stream path.
"""

from __future__ import annotations

import numpy as np
from scipy.spatial import cKDTree


def transfer_colors(
    src_points: np.ndarray,
    src_colors: np.ndarray,
    dst_points: np.ndarray,
    k: int = 1,
) -> np.ndarray:
    """-> (M, 3) uint8 colors for dst_points.

    k=1 nearest-neighbour transfer (the reference's base mode); k>1 applies
    inverse-distance weighting over the k nearest source points."""
    if len(dst_points) == 0:
        return np.zeros((0, 3), np.uint8)
    tree = cKDTree(src_points)
    if k == 1:
        _, idx = tree.query(dst_points, k=1)
        return src_colors[idx]
    dist, idx = tree.query(dst_points, k=min(k, len(src_points)))
    if idx.ndim == 1:
        return src_colors[idx]
    w = 1.0 / np.maximum(dist, 1e-9)
    w /= w.sum(axis=1, keepdims=True)
    blended = (src_colors[idx].astype(np.float64) * w[..., None]).sum(axis=1)
    return np.clip(np.round(blended), 0, 255).astype(np.uint8)
