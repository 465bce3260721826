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
        _, idx = tree.query(dst_points, k=1, workers=-1)
        return src_colors[idx]
    dist, idx = tree.query(dst_points, k=min(k, len(src_points)), workers=-1)
    if idx.ndim == 1:
        return src_colors[idx]
    w = 1.0 / np.maximum(dist, 1e-9)
    w /= w.sum(axis=1, keepdims=True)
    blended = (src_colors[idx].astype(np.float64) * w[..., None]).sum(axis=1)
    return np.clip(np.round(blended), 0, 255).astype(np.uint8)


def transfer_colors_device(
    src_points: np.ndarray,
    src_colors: np.ndarray,
    dst_points: np.ndarray,
    k: int = 1,
    coord_bits: int = 10,
) -> np.ndarray:
    """Device grid-hash variant (ops/knn.py) of transfer_colors: the TPU path
    for batched multi-stream recoloring.  Falls back to the nearest found
    candidate; points with no in-radius neighbour take the globally nearest
    via a host fixup (rare: isolated outliers)."""
    from .knn import knn

    if len(dst_points) == 0:
        return np.zeros((0, 3), np.uint8)
    d2, idx = knn(
        dst_points.astype(np.int32), src_points.astype(np.int32), k=k,
        coord_bits=coord_bits,
    )
    unfound = idx[:, 0] < 0
    idx0 = np.where(unfound[:, None], 0, np.maximum(idx, 0))
    if k == 1:
        out = src_colors[idx0[:, 0]].copy()
    else:
        w = 1.0 / np.sqrt(np.maximum(d2, 1e-9))
        w = np.where(idx >= 0, w, 0.0)
        wsum = np.maximum(w.sum(axis=1, keepdims=True), 1e-12)
        blended = (
            src_colors[idx0].astype(np.float64) * (w / wsum)[..., None]
        ).sum(axis=1)
        out = np.clip(np.round(blended), 0, 255).astype(np.uint8)
    if unfound.any():
        tree = cKDTree(src_points)
        _, far_idx = tree.query(dst_points[unfound], k=1)
        out[unfound] = src_colors[far_idx]
    return out
