"""Synthetic test-data generator.

The reference's smoke loops require the 8i VFB v2 dataset on disk; this
module generates a stand-in dynamic point-cloud sequence (a deforming
voxelized sphere with smooth colors) so every pipeline can run end-to-end in
any environment:

    python -m rabbit_transcoding_tpu.testdata --frames 4 --out cloud_%04d.ply
"""

from __future__ import annotations

import argparse

import numpy as np

from .core.pointset import PointSet


def make_frame(
    frame: int = 0,
    n: int = 40000,
    radius: float = 100.0,
    center: float = 128.0,
    seed: int = 7,
    vox_bits: int = 10,
) -> PointSet:
    rng = np.random.default_rng(seed)  # same base sphere; deforms over time
    theta = np.arccos(1 - 2 * rng.uniform(0, 1, n))
    phi = rng.uniform(0, 2 * np.pi, n)
    # time-varying radial deformation = moving surface detail
    r = radius * (
        1.0
        + 0.08 * np.sin(4 * theta + 0.3 * frame)
        + 0.05 * np.cos(5 * phi - 0.2 * frame)
    )
    x = center + r * np.sin(theta) * np.cos(phi)
    y = center + r * np.sin(theta) * np.sin(phi)
    z = center + r * np.cos(theta)
    maxv = (1 << vox_bits) - 1
    pos = np.clip(np.round(np.stack([x, y, z], 1)), 0, maxv).astype(np.int32)
    colors = np.clip(
        np.stack(
            [
                128 + 90 * np.sin(pos[:, 0] / 12.0 + 0.1 * frame),
                128 + 90 * np.cos(pos[:, 1] / 12.0),
                128 + 60 * np.sin(pos[:, 2] / 8.0),
            ],
            1,
        ),
        0,
        255,
    ).astype(np.uint8)
    return PointSet(positions=pos, colors=colors).remove_duplicates()


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--frames", type=int, default=4)
    ap.add_argument("--points", type=int, default=40000)
    ap.add_argument("--start", type=int, default=0)
    ap.add_argument("--out", default="cloud_%04d.ply")
    args = ap.parse_args(argv)
    for f in range(args.frames):
        ps = make_frame(f, n=args.points)
        path = args.out % (args.start + f)
        ps.write_ply(path)
        print(f"{path}: {ps.point_count} points")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
