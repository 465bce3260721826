"""Geometry + color smoothing / outlier filtering (decoder post-processing).

Capability parity with PCCCodec::smoothPointCloudPostprocess /
smoothPointCloudGrid / gridFiltering (PCCCodec.cpp:52, :1065, :1000):
reconstruction artifacts near patch seams are pulled toward the local
neighborhood centroid, and isolated occupancy-fill outliers (the artifact
class the reference suppresses with occupancy refinement / PBF) are dropped
by a density test.  Driven by the geometry-smoothing SEI parameters.

TPU-first: one scatter-add builds a (cells, 4) accumulation grid for the
whole cloud; each point gathers its 27-cell neighborhood stats — a handful
of fused device passes, no per-point loops.  Static shapes via pow2 padding.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

_OFFSETS = np.array(
    [(dx, dy, dz) for dx in (-1, 0, 1) for dy in (-1, 0, 1) for dz in (-1, 0, 1)],
    np.int32,
)


@partial(jax.jit, static_argnames=("grid_size", "grid_dim"))
def grid_smooth(
    points: jax.Array,        # (N, 3) int32 (padded)
    valid: jax.Array,         # (N,) bool
    threshold: jax.Array,     # scalar: sq distance triggering the centroid snap
    min_neighbors: jax.Array, # scalar: below this 27-cell count -> drop point
    eligible: jax.Array,      # (N,) bool: only these may MOVE (boundary
                              # points, identifyBoundaryPoints analog)
    grid_size: int = 8,
    grid_dim: int = 128,
):
    """-> (points (N,3) int32, keep (N,) bool, moved (N,) bool)."""
    cell = jnp.clip(points // grid_size, 0, grid_dim - 1)
    w = valid.astype(jnp.float32)
    acc = jnp.zeros((grid_dim, grid_dim, grid_dim, 4), jnp.float32)
    acc = acc.at[cell[:, 0], cell[:, 1], cell[:, 2]].add(
        jnp.concatenate(
            [points.astype(jnp.float32) * w[:, None], w[:, None]], axis=1
        ),
        mode="drop",
    )

    stats = jnp.zeros((points.shape[0], 4), jnp.float32)
    for off in _OFFSETS:
        nb = jnp.clip(cell + jnp.asarray(off), 0, grid_dim - 1)
        stats = stats + acc[nb[:, 0], nb[:, 1], nb[:, 2]]

    count = stats[:, 3]
    centroid = stats[:, :3] / jnp.maximum(count, 1.0)[:, None]
    d2 = jnp.sum((points.astype(jnp.float32) - centroid) ** 2, axis=1)
    # density test: the point itself contributes 1
    keep = valid & (count > min_neighbors)
    move = keep & eligible & (d2 > threshold) & (count > 4.0)
    out = jnp.where(
        move[:, None], jnp.round(centroid).astype(jnp.int32), points
    )
    return out, keep, move


@partial(jax.jit, static_argnames=("grid_size", "grid_dim"))
def color_grid_smooth(
    points: jax.Array,       # (N, 3) int32 (padded)
    colors: jax.Array,       # (N, 3) uint8
    valid: jax.Array,        # (N,) bool
    threshold: jax.Array,    # luma-distance beyond which a point is smoothed
    grid_size: int = 8,
    grid_dim: int = 128,
):
    """Color smoothing (PCCCodec::colorSmoothing / smoothPointCloudColorLC
    analog, PCCCodec.cpp:149, :1268): points whose color deviates from their
    neighborhood mean by more than `threshold` (YUV-luma distance) are pulled
    to the mean.  Same two-pass scatter/gather grid as geometry smoothing."""
    cell = jnp.clip(points // grid_size, 0, grid_dim - 1)
    w = valid.astype(jnp.float32)
    c = colors.astype(jnp.float32)
    acc = jnp.zeros((grid_dim, grid_dim, grid_dim, 4), jnp.float32)
    acc = acc.at[cell[:, 0], cell[:, 1], cell[:, 2]].add(
        jnp.concatenate([c * w[:, None], w[:, None]], axis=1), mode="drop"
    )
    stats = jnp.zeros((points.shape[0], 4), jnp.float32)
    for off in _OFFSETS:
        nb = jnp.clip(cell + jnp.asarray(off), 0, grid_dim - 1)
        stats = stats + acc[nb[:, 0], nb[:, 1], nb[:, 2]]
    count = jnp.maximum(stats[:, 3], 1.0)
    mean = stats[:, :3] / count[:, None]
    # luma-weighted deviation (BT.709 luma)
    lw = jnp.asarray([0.2126, 0.7152, 0.0722], jnp.float32)
    dev = jnp.abs((c - mean) @ lw)
    move = valid & (dev > threshold) & (stats[:, 3] > 4.0)
    out = jnp.where(
        move[:, None],
        jnp.clip(jnp.round(mean), 0, 255).astype(jnp.uint8),
        colors,
    )
    return out, move


def smooth_colors(
    positions: np.ndarray,
    colors: np.ndarray,
    threshold: float = 10.0,
    grid_size: int = 8,
    coord_bits: int = 10,
) -> tuple[np.ndarray, int]:
    """Host wrapper for color_grid_smooth."""
    n = len(positions)
    if n == 0:
        return colors, 0
    cap = 1 << max(10, (n - 1).bit_length())
    pts = np.zeros((cap, 3), np.int32)
    pts[:n] = positions
    cols = np.zeros((cap, 3), np.uint8)
    cols[:n] = colors
    valid = np.zeros((cap,), bool)
    valid[:n] = True
    grid_dim = max(2, (1 << coord_bits) // grid_size)
    out, moved = color_grid_smooth(
        jnp.asarray(pts), jnp.asarray(cols), jnp.asarray(valid),
        jnp.float32(threshold), grid_size, grid_dim,
    )
    return np.asarray(out)[:n], int(np.asarray(moved).sum())


def smooth_cloud(
    positions: np.ndarray,
    threshold: float = 64.0,
    min_neighbors: int = 4,
    grid_size: int = 8,
    coord_bits: int = 10,
    eligible: np.ndarray | None = None,
) -> tuple[np.ndarray, np.ndarray, int]:
    """Host wrapper: pad to a static-shape bucket, run, trim.
    eligible: optional (N,) bool — only these points may move (the
    reference smooths patch-BOUNDARY points only, identifyBoundaryPoints,
    PCCCodec.cpp:266); None = all movable.
    Returns (positions, keep mask over input order, moved count)."""
    n = len(positions)
    if n == 0:
        return positions, np.zeros(0, bool), 0
    cap = 1 << max(10, (n - 1).bit_length())
    pts = np.zeros((cap, 3), np.int32)
    pts[:n] = positions
    valid = np.zeros((cap,), bool)
    valid[:n] = True
    elig = np.zeros((cap,), bool)
    elig[:n] = True if eligible is None else eligible
    grid_dim = max(2, (1 << coord_bits) // grid_size)
    out, keep, moved = grid_smooth(
        jnp.asarray(pts), jnp.asarray(valid), jnp.float32(threshold),
        jnp.float32(min_neighbors), jnp.asarray(elig), grid_size, grid_dim,
    )
    keep = np.asarray(keep)[:n]
    return np.asarray(out)[:n], keep, int(np.asarray(moved).sum())
