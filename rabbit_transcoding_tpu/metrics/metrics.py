"""Quality metrics: D1/D2 PSNR, color PSNR, Hausdorff.

Capability parity with PCCMetrics (/root/reference/source/lib/PccLibMetrics/
source/PCCMetrics.cpp:44-292): symmetric A<->B nearest-neighbour error,
point-to-point (D1) and point-to-plane (D2, error projected on the reference
cloud's normals), BT.709 color PSNR over NN pairs, Hausdorff variants, PSNR
peak = 3 * resolution^2 for geometry (:44-47).
"""

from __future__ import annotations

import dataclasses

import numpy as np
from scipy.spatial import cKDTree

from ..core.pointset import PointSet
from ..ops.color import rgb_to_yuv709


@dataclasses.dataclass
class MetricsParams:
    resolution: int = 1023         # peak geometry value (vox10 -> 1023)
    drop_duplicates: bool = True
    neighbors_d2: int = 1


@dataclasses.dataclass
class QualityMetrics:
    d1_mse: float = 0.0
    d1_psnr: float = 0.0
    d2_mse: float = 0.0
    d2_psnr: float = 0.0
    d1_hausdorff: float = 0.0
    d1_hausdorff_psnr: float = 0.0
    color_psnr: tuple[float, float, float] = (0.0, 0.0, 0.0)
    reflectance_psnr: float = 0.0
    point_count_source: int = 0
    point_count_reconstructed: int = 0

    def print(self) -> str:
        y, u, v = self.color_psnr
        return (
            f"D1 (p2point) mse, PSNR : {self.d1_mse:.6f}, {self.d1_psnr:.4f} dB\n"
            f"D2 (p2plane) mse, PSNR : {self.d2_mse:.6f}, {self.d2_psnr:.4f} dB\n"
            f"D1 Hausdorff, PSNR     : {self.d1_hausdorff:.6f}, "
            f"{self.d1_hausdorff_psnr:.4f} dB\n"
            f"Color Y/U/V PSNR       : {y:.4f}, {u:.4f}, {v:.4f} dB"
            + (
                f"\nReflectance PSNR       : {self.reflectance_psnr:.4f} dB"
                if self.reflectance_psnr
                else ""
            )
        )

    def csv_line(self) -> str:
        y, u, v = self.color_psnr
        return (
            f"{self.d1_psnr:.4f};{self.d2_psnr:.4f};"
            f"{self.d1_hausdorff_psnr:.4f};{y:.4f};{u:.4f};{v:.4f}"
        )


def _geom_psnr(mse: float, resolution: int) -> float:
    if mse <= 0:
        return float("inf")
    peak = 3.0 * resolution * resolution
    return 10.0 * np.log10(peak / mse)


def _one_direction(a: PointSet, b: PointSet, b_normals: np.ndarray | None):
    """A->B errors: (d1 sq dists, d2 sq plane dists, nn indices in B)."""
    tree = cKDTree(b.positions)
    dist, idx = tree.query(a.positions, k=1, workers=-1)
    d1 = dist ** 2
    if b_normals is not None:
        err = a.positions.astype(np.float64) - b.positions[idx].astype(np.float64)
        proj = np.einsum("nc,nc->n", err, b_normals[idx])
        d2 = proj ** 2
    else:
        d2 = d1
    return d1, d2, idx


def _color_mse(a: PointSet, b: PointSet, idx_ab: np.ndarray):
    """Per-channel YUV (BT.709) MSE between A colors and NN B colors."""
    ca = a.colors.astype(np.float64) / 255.0
    cb = b.colors[idx_ab].astype(np.float64) / 255.0
    import numpy as _np

    ya, ua, va = rgb_to_yuv709(ca[:, 0], ca[:, 1], ca[:, 2])
    yb, ub, vb = rgb_to_yuv709(cb[:, 0], cb[:, 1], cb[:, 2])
    mse = [
        float(_np.mean((_np.asarray(ya) - _np.asarray(yb)) ** 2)),
        float(_np.mean((_np.asarray(ua) - _np.asarray(ub)) ** 2)),
        float(_np.mean((_np.asarray(va) - _np.asarray(vb)) ** 2)),
    ]
    return mse


def compute_metrics(
    source: PointSet,
    reconstructed: PointSet,
    params: MetricsParams | None = None,
    source_normals: np.ndarray | None = None,
) -> QualityMetrics:
    """Symmetric quality metrics between source and reconstruction."""
    params = params or MetricsParams()
    src = source.remove_duplicates() if params.drop_duplicates else source
    rec = reconstructed

    if source_normals is None and src.has_normals:
        source_normals = src.normals
    if source_normals is None:
        from ..encoder.normals import compute_normals

        source_normals, _ = compute_normals(src.positions.astype(np.float32))

    # A->B (source -> rec): plane normals at source side unavailable for rec;
    # the reference projects on the *source* normals in both directions when
    # only source normals exist (PCCMetrics.cpp:112-123 concept)
    d1_ab, _, idx_ab = _one_direction(src, rec, None)
    err_ab = rec.positions[idx_ab].astype(np.float64) - src.positions.astype(
        np.float64
    )
    # for the source->rec direction, project onto the source point's own normal
    d2_ab = np.einsum("nc,nc->n", err_ab, source_normals) ** 2

    d1_ba, _, idx_ba = _one_direction(rec, src, None)
    err_ba = src.positions[idx_ba].astype(np.float64) - rec.positions.astype(
        np.float64
    )
    d2_ba = np.einsum("nc,nc->n", err_ba, source_normals[idx_ba]) ** 2

    d1_mse = max(float(np.mean(d1_ab)), float(np.mean(d1_ba)))
    d2_mse = max(float(np.mean(d2_ab)), float(np.mean(d2_ba)))
    haus = max(float(np.max(d1_ab)), float(np.max(d1_ba)))

    m = QualityMetrics(
        d1_mse=d1_mse,
        d1_psnr=_geom_psnr(d1_mse, params.resolution),
        d2_mse=d2_mse,
        d2_psnr=_geom_psnr(d2_mse, params.resolution),
        d1_hausdorff=haus,
        d1_hausdorff_psnr=_geom_psnr(haus, params.resolution),
        point_count_source=src.point_count,
        point_count_reconstructed=rec.point_count,
    )

    if src.has_reflectances and rec.has_reflectances:
        ra = src.reflectances.astype(np.float64)
        rb = rec.reflectances[idx_ab].astype(np.float64)
        rc = src.reflectances[idx_ba].astype(np.float64)
        rd = rec.reflectances.astype(np.float64)
        mse_r = max(float(np.mean((ra - rb) ** 2)),
                    float(np.mean((rd - rc) ** 2)))
        m.reflectance_psnr = (
            float("inf") if mse_r <= 0
            else 10.0 * np.log10(65535.0 ** 2 / mse_r)
        )

    if src.has_colors and rec.has_colors:
        mse_ab = _color_mse(src, rec, idx_ab)
        mse_ba = _color_mse(rec, src, idx_ba)
        psnrs = []
        for c in range(3):
            mse = max(mse_ab[c], mse_ba[c])
            psnrs.append(float("inf") if mse <= 0 else 10.0 * np.log10(1.0 / mse))
        m.color_psnr = tuple(psnrs)
    return m


def compute_sequence_metrics(
    sources: list[PointSet],
    reconstructions: list[PointSet],
    params: MetricsParams | None = None,
) -> tuple[list[QualityMetrics], QualityMetrics]:
    """Per-frame metrics + sequence averages (PccAppMetrics behaviour)."""
    per_frame = [
        compute_metrics(s, r, params) for s, r in zip(sources, reconstructions)
    ]
    n = max(1, len(per_frame))

    def avg(vals):
        finite = [v for v in vals if np.isfinite(v)]
        return float(np.mean(finite)) if finite else float("inf")

    summary = QualityMetrics(
        d1_mse=avg([m.d1_mse for m in per_frame]),
        d1_psnr=avg([m.d1_psnr for m in per_frame]),
        d2_mse=avg([m.d2_mse for m in per_frame]),
        d2_psnr=avg([m.d2_psnr for m in per_frame]),
        d1_hausdorff=avg([m.d1_hausdorff for m in per_frame]),
        d1_hausdorff_psnr=avg([m.d1_hausdorff_psnr for m in per_frame]),
        color_psnr=(
            avg([m.color_psnr[0] for m in per_frame]),
            avg([m.color_psnr[1] for m in per_frame]),
            avg([m.color_psnr[2] for m in per_frame]),
        ),
        reflectance_psnr=avg(
            [m.reflectance_psnr for m in per_frame if m.reflectance_psnr]
        )
        if any(m.reflectance_psnr for m in per_frame)
        else 0.0,
        point_count_source=sum(m.point_count_source for m in per_frame) // n,
        point_count_reconstructed=(
            sum(m.point_count_reconstructed for m in per_frame) // n
        ),
    )
    return per_frame, summary
