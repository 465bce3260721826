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


class Packer:
    """Block-grid packer with first-fit placement, orientation search, atlas
    growth, pinned placement (spatially consistent packing), and chain
    ownership (global patch allocation: a temporally matched patch chain may
    re-claim its own blocks across the GOF)."""

    def __init__(self, width: int, height: int, block: int = 16,
                 try_orientations: bool = True, max_height: int = 4096):
        self.width = width
        self.block = block
        self.nbx = width // block
        self.grow_rows = max(4, height // block)
        # owner grid: -1 free, otherwise owning chain id
        self.owner = np.full((max(4, height // block), self.nbx), -1,
                             np.int32)
        self.orientations = (
            _ORIENTATIONS if try_orientations else [PatchOrientation.DEFAULT]
        )
        self.max_height = max_height
        self.used_height = 0

    @property
    def used(self) -> np.ndarray:
        return self.owner >= 0

    def _mark(self, seg: SegmentedPatch, cfp: np.ndarray, bx: int, by: int,
              o: PatchOrientation, chain: int) -> None:
        w_b, h_b = cfp.shape
        region = self.owner[by : by + h_b, bx : bx + w_b]
        region[cfp.T] = chain
        seg.patch.u0 = bx
        seg.patch.v0 = by
        seg.patch.orientation = o
        self.used_height = max(self.used_height, (by + h_b) * self.block)

    def _conflicts(self, cfp: np.ndarray, bx: int, by: int, chain: int) -> bool:
        w_b, h_b = cfp.shape
        region = self.owner[by : by + h_b, bx : bx + w_b]
        return bool(((region >= 0) & (region != chain) & cfp.T).any())

    def try_place_at(self, seg: SegmentedPatch, bx: int, by: int,
                     o: PatchOrientation, chain: int = 0) -> bool:
        """Pin a patch to an exact position/orientation if the blocks are
        free or already owned by the same chain."""
        fp = _block_footprint(seg, self.block)
        cfp = _oriented_footprint(fp, o)
        w_b, h_b = cfp.shape
        while (by + h_b) > self.owner.shape[0]:
            if not self._grow():
                return False
        if bx < 0 or by < 0 or bx + w_b > self.nbx:
            return False
        if self._conflicts(cfp, bx, by, chain):
            return False
        self._mark(seg, cfp, bx, by, o, chain)
        return True

    def place(self, seg: SegmentedPatch, chain: int = 0,
              tetris: bool = False) -> None:
        fp = _block_footprint(seg, self.block)
        while True:
            best = None  # (skyline_top, by, bx, o, cfp)
            for o in self.orientations:
                cfp = _oriented_footprint(fp, o)
                w_b, h_b = cfp.shape
                if w_b > self.nbx or h_b > self.owner.shape[0]:
                    continue
                pos = _first_fit(self.used, cfp)
                if pos is None:
                    continue
                by, bx = pos
                if not tetris:
                    self._mark(seg, cfp, bx, by, o, chain)
                    return
                top = by + h_b
                if best is None or top < best[0]:
                    best = (top, by, bx, o, cfp)
            if best is not None:
                _, by, bx, o, cfp = best
                self._mark(seg, cfp, bx, by, o, chain)
                return
            if not self._grow():
                raise RuntimeError(
                    f"atlas overflow: cannot pack patch of "
                    f"{seg.occupancy.sum()} blocks into width {self.width} "
                    f"below max height {self.max_height}"
                )

    def _grow(self) -> bool:
        if (self.owner.shape[0] + self.grow_rows) * self.block > self.max_height:
            return False
        self.owner = np.concatenate(
            [self.owner, np.full((self.grow_rows, self.nbx), -1, np.int32)],
            axis=0,
        )
        return True


def pack_patches(
    segs: list[SegmentedPatch],
    width: int,
    height: int,
    block: int = 16,
    try_orientations: bool = True,
    max_height: int = 4096,
    tetris: bool = False,
) -> int:
    """Assign (u0, v0, orientation) to every patch in place; returns the used
    atlas height (multiple of `block`, may exceed `height` up to max_height).
    tetris=True uses the lowest-skyline orientation choice (packTetris
    analog) instead of plain first-fit."""
    packer = Packer(width, height, block, try_orientations, max_height)
    order = sorted(
        range(len(segs)),
        key=lambda i: segs[i].occupancy.sum(),
        reverse=True,
    )
    for chain, i in enumerate(order):
        packer.place(segs[i], chain=chain, tetris=tetris)
    return max(packer.used_height, block)


def pack_patches_consistent(
    segs: list[SegmentedPatch],
    prev_segs: list[SegmentedPatch],
    width: int,
    height: int,
    block: int = 16,
    try_orientations: bool = True,
    max_height: int = 4096,
) -> int:
    """Spatially consistent packing (spatialConsistencyPackFlexible analog):
    patches matched to the previous frame (patch.best_match_idx set by
    encoder.matching) keep the reference's position/orientation when those
    blocks are free; everything else first-fits into the gaps."""
    packer = Packer(width, height, block, try_orientations, max_height)
    deferred = []
    order = sorted(
        range(len(segs)),
        key=lambda i: segs[i].occupancy.sum(),
        reverse=True,
    )
    for chain, i in enumerate(order):
        seg = segs[i]
        ref_idx = seg.patch.best_match_idx
        if 0 <= ref_idx < len(prev_segs):
            ref = prev_segs[ref_idx].patch
            if packer.try_place_at(seg, ref.u0, ref.v0, ref.orientation,
                                   chain=chain):
                continue
            # position lost: still usable as inter (deltas), just repacked
        deferred.append((chain, i))
    for chain, i in deferred:
        packer.place(segs[i], chain=chain)
    return max(packer.used_height, block)


def pack_gof_global(
    frame_segs: list[list[SegmentedPatch]],
    width: int,
    height: int,
    block: int = 16,
    try_orientations: bool = True,
    max_height: int = 4096,
) -> int:
    """Global patch allocation (performDataAdaptiveGPAMethod analog,
    PCCEncoder.cpp:6792): ONE packing grid for the whole GOF.  Temporally
    matched patch chains own their blocks for the GOF's duration (a chain
    may re-claim and grow its own region; nothing else may), so every
    matched patch keeps its position across ALL frames.  Requires
    patch.best_match_idx set frame-to-frame (encoder.matching)."""
    packer = Packer(width, height, block, try_orientations, max_height)
    next_chain = 0
    chains_prev: list[int] = []
    for fi, segs in enumerate(frame_segs):
        chains: list[int] = [0] * len(segs)
        order = sorted(
            range(len(segs)),
            key=lambda i: segs[i].occupancy.sum(),
            reverse=True,
        )
        for i in order:
            seg = segs[i]
            ref_idx = seg.patch.best_match_idx
            if fi > 0 and 0 <= ref_idx < len(chains_prev):
                chain = chains_prev[ref_idx]
                ref = frame_segs[fi - 1][ref_idx].patch
                if packer.try_place_at(
                    seg, ref.u0, ref.v0, ref.orientation, chain=chain
                ):
                    chains[i] = chain
                    continue
                seg.patch.best_match_idx = -1  # chain broken: code as intra
            chain = next_chain = next_chain + 1
            chains[i] = chain
            packer.place(seg, chain=chain)
        chains_prev = chains
    return max(packer.used_height, block)


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
