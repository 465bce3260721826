"""Patch packing into the atlas.

Capability parity with PCCEncoder::packFlexible (/root/reference/source/lib/
PccLibEncoder/source/PCCEncoder.cpp:2390): patches sorted by size, greedy
raster-scan first-fit over the block grid, trying all 8 orientations,
growing atlas height when full.  Packing is inherently sequential and tiny
(hundreds of patches) — it stays host-side by design (SURVEY.md §7.6).
"""

from __future__ import annotations

import numpy as np

from ..utils.enums import PatchOrientation
from .segment import SegmentedPatch

# orientation preference order: identity first, then swaps/rotations
_ORIENTATIONS = [
    PatchOrientation.DEFAULT,
    PatchOrientation.SWAP,
    PatchOrientation.ROT90,
    PatchOrientation.ROT180,
    PatchOrientation.ROT270,
    PatchOrientation.MIRROR,
    PatchOrientation.MROT90,
    PatchOrientation.MROT180,
]


def _block_footprint(seg: SegmentedPatch, block: int) -> np.ndarray:
    """Patch-space occupied block grid (size_u0, size_v0) bool."""
    su, sv = seg.occupancy.shape
    nbu = (su + block - 1) // block
    nbv = (sv + block - 1) // block
    fp = np.zeros((nbu, nbv), bool)
    occ = seg.occupancy
    pad = np.zeros((nbu * block, nbv * block), bool)
    pad[:su, :sv] = occ
    fp = pad.reshape(nbu, block, nbv, block).any(axis=(1, 3))
    return fp


def _oriented_footprint(fp: np.ndarray, o: PatchOrientation) -> np.ndarray:
    """Map a patch-space (u, v) block footprint into canvas-space (x, y) —
    returns array indexed [bx, by]."""
    if o == PatchOrientation.DEFAULT:
        return fp
    if o == PatchOrientation.SWAP:
        return fp.T
    if o == PatchOrientation.ROT90:
        return fp.T[::-1, :]          # x = h-1-v, y = u
    if o == PatchOrientation.ROT180:
        return fp[::-1, ::-1]
    if o == PatchOrientation.ROT270:
        return fp.T[:, ::-1]
    if o == PatchOrientation.MIRROR:
        return fp[::-1, :]
    if o == PatchOrientation.MROT90:
        return fp.T[::-1, ::-1]
    if o == PatchOrientation.MROT180:
        return fp[:, ::-1]
    raise ValueError(o)


def pack_patches(
    segs: list[SegmentedPatch],
    width: int,
    height: int,
    block: int = 16,
    try_orientations: bool = True,
    max_height: int = 4096,
) -> int:
    """Assign (u0, v0, orientation) to every patch in place; returns the used
    atlas height (multiple of `block`, may exceed `height` up to max_height)."""
    nbx = width // block
    nby = height // block
    used = np.zeros((nby, nbx), bool)  # [by, bx]
    order = sorted(
        range(len(segs)),
        key=lambda i: segs[i].occupancy.sum(),
        reverse=True,
    )
    orientations = _ORIENTATIONS if try_orientations else [PatchOrientation.DEFAULT]
    used_height = 0

    for i in order:
        seg = segs[i]
        fp = _block_footprint(seg, block)
        placed = False
        while not placed:
            for o in orientations:
                cfp = _oriented_footprint(fp, o)  # [bx, by]
                w_b, h_b = cfp.shape
                if w_b > nbx or h_b > used.shape[0]:
                    continue
                pos = _first_fit(used, cfp)
                if pos is not None:
                    by, bx = pos
                    used[by : by + h_b, bx : bx + w_b] |= cfp.T
                    seg.patch.u0 = bx
                    seg.patch.v0 = by
                    seg.patch.orientation = o
                    used_height = max(used_height, (by + h_b) * block)
                    placed = True
                    break
            if not placed:
                # grow the atlas (packFlexible grows height on overflow)
                if (used.shape[0] + nby) * block > max_height:
                    raise RuntimeError(
                        f"atlas overflow: cannot pack patch of {seg.occupancy.sum()}"
                        f" blocks into width {width} below max height {max_height}"
                    )
                used = np.concatenate(
                    [used, np.zeros((nby, nbx), bool)], axis=0
                )
    return max(used_height, block)


def _first_fit(used: np.ndarray, cfp: np.ndarray):
    """First raster-scan position where footprint `cfp` ([bx, by]) fits."""
    h_grid, w_grid = used.shape
    w_b, h_b = cfp.shape
    fpT = cfp.T  # [by, bx]
    # vectorised sliding-window test via summed-area of conflicts
    for by in range(h_grid - h_b + 1):
        window = used[by : by + h_b]
        # quick row skip: if window fully free, place at bx=0
        if not window.any():
            return by, 0
        for bx in range(w_grid - w_b + 1):
            if not (window[:, bx : bx + w_b] & fpT).any():
                return by, bx
    return None
