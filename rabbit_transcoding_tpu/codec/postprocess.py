"""SEI-driven decoder post-processing, shared by encoder (closed loop) and
decoder so both reconstruct identical clouds.

Parity with PCCCodec::smoothPointCloudPostprocess / colorSmoothing dispatch
(PCCCodec.cpp:52,149): parameters come from the geometry-smoothing SEI.
"""

from __future__ import annotations

from ..bitstream.sei import Sei, SeiAttributeSmoothing, SeiGeometrySmoothing
from ..core.pointset import PointSet
from ..ops.smoothing import smooth_cloud, smooth_colors

# fixed density-filter strength (both sides must agree; not SEI-coded)
MIN_NEIGHBORS = 4


def find_attribute_smoothing_sei(seis: list[Sei]) -> SeiAttributeSmoothing | None:
    for sei in seis:
        if isinstance(sei, SeiAttributeSmoothing):
            return sei
    return None


def apply_color_smoothing(
    clouds: list[PointSet],
    sei: SeiAttributeSmoothing | None,
    coord_bits: int = 10,
) -> list[PointSet]:
    if sei is None:
        return clouds
    grid_size = sei.as_smoothing_grid_size_minus2 + 2
    threshold = float(sei.as_smoothing_threshold)
    for ps in clouds:
        if ps.colors is None or ps.point_count == 0:
            continue
        ps.colors, _ = smooth_colors(
            ps.positions, ps.colors, threshold=threshold,
            grid_size=grid_size, coord_bits=coord_bits,
        )
    return clouds


def find_geometry_smoothing_sei(seis: list[Sei]) -> SeiGeometrySmoothing | None:
    for sei in seis:
        if isinstance(sei, SeiGeometrySmoothing):
            if sei.gs_smoothing_instance_cancel_flag:
                return None
            return sei
    return None


def apply_geometry_smoothing(
    clouds: list[PointSet],
    sei: SeiGeometrySmoothing | None,
    coord_bits: int = 10,
) -> list[PointSet]:
    if sei is None or sei.gs_smoothing_method_type != 1:
        return clouds
    grid_size = sei.gs_smoothing_grid_size_minus2 + 2
    threshold = float(sei.gs_smoothing_threshold)
    out = []
    for ps in clouds:
        pos, keep, _moved = smooth_cloud(
            ps.positions,
            threshold=threshold,
            min_neighbors=MIN_NEIGHBORS,
            grid_size=grid_size,
            coord_bits=coord_bits,
            # only patch-boundary points may move (identifyBoundaryPoints);
            # clouds without type tags keep the move-anything behavior
            eligible=None if ps.types is None else ps.types == 1,
        )
        if ps.types is not None:
            # the density filter also only applies to boundary points:
            # raw/EOM/interior points (types 0) are exact by construction
            # and must survive smoothing untouched
            keep = keep | (ps.types != 1)
        ps2 = PointSet(
            positions=pos[keep],
            colors=None if ps.colors is None else ps.colors[keep],
            reflectances=(
                None if ps.reflectances is None else ps.reflectances[keep]
            ),
            types=None if ps.types is None else ps.types[keep],
        )
        out.append(ps2.remove_duplicates())
    return out
