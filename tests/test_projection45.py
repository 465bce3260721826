"""45-degree extended projection planes (additionalProjectionPlaneMode 1-4:
about Y / X / Z / all three — reference orientations10_{Y,X,Z}Axis +
orientations18, PCCPatchSegmenter.h:323-383, viewIds 6..17
PCCPatch.cpp:111-138)."""

import numpy as np
import pytest
from scipy.spatial import cKDTree

from rabbit_transcoding_tpu.bitstream import V3CReader, V3CWriter
from rabbit_transcoding_tpu.codec.patch_frame import decode_patch_frames
from rabbit_transcoding_tpu.core.gof import GroupOfFrames
from rabbit_transcoding_tpu.core.patch import Patch
from rabbit_transcoding_tpu.core.pointset import PointSet
from rabbit_transcoding_tpu.decoder.decoder import Decoder
from rabbit_transcoding_tpu.encoder.encoder import Encoder
from rabbit_transcoding_tpu.encoder.params import EncoderParameters
from rabbit_transcoding_tpu.encoder.segment import rotate45


def diagonal_wall_cloud(plane_axis: int = 1):
    """A wall at 45 degrees to two coordinate axes — the case the diagonal
    projection planes fix.  plane_axis picks the rotation axis the wall is
    parallel to: 1 = wall along x=z (about Y), 2 = along y=z (about X),
    3 = along x=y (about Z)."""
    g = np.mgrid[10:80, 10:80].reshape(2, -1).T  # (s, free)
    s, free = g[:, 0], g[:, 1]
    pts = []
    for dz in range(2):
        if plane_axis == 1:     # diagonal in the x-z plane, y free
            pts.append(np.column_stack([s, free, s + dz]))
        elif plane_axis == 2:   # diagonal in the y-z plane, x free
            pts.append(np.column_stack([free, s, s + dz]))
        else:                   # diagonal in the x-y plane, z free
            pts.append(np.column_stack([s, s + dz, free]))
    pos = np.concatenate(pts).astype(np.int32)
    colors = np.clip(
        np.stack([pos[:, 0] * 3, pos[:, 1] * 3, 128 + pos[:, 2]], 1), 0, 255
    ).astype(np.uint8)
    return PointSet(positions=pos, colors=colors).remove_duplicates()


class TestRotation:
    @pytest.mark.parametrize("axis", [1, 2, 3])
    def test_rotation_exact_inverse(self, axis):
        rng = np.random.default_rng(0)
        pts = rng.integers(0, 1024, (1000, 3)).astype(np.int32)
        rot = rotate45(pts, axis, 1024)
        # invert via Patch.generate_point's formulas: feed rotated coords
        # through a patch whose axes are identity in rotated space
        p = Patch(
            rotation_axis=axis, rot_offset=1024,
            normal_axis=0, tangent_axis=1, bitangent_axis=2,
            u1=0, v1=0, d1=0,
        )
        inv = p.generate_point(rot[:, 1], rot[:, 2], rot[:, 0])
        np.testing.assert_array_equal(inv, pts)


class TestProjection45:
    def _roundtrip(self, mode, plane_axis=1):
        src = diagonal_wall_cloud(plane_axis)
        enc = Encoder(EncoderParameters(
            minimumImageWidth=256, minimumImageHeight=64,
            geometryQP=4, attributeQP=8, occupancyPrecision=2,
            flagGeometrySmoothing=False, constrainedPack=False,
            additionalProjectionPlaneMode=mode, rawPointsPatch=False,
        ))
        ctx, recon = enc.encode(GroupOfFrames([src]))
        w = V3CWriter()
        data = w.write(w.encode(ctx))
        ctx2 = V3CReader().decode(V3CReader().read(data)[0])
        return src, ctx2, Decoder().decode(ctx2)[0], recon[0]

    @pytest.mark.parametrize("mode,plane_axis", [(1, 1), (2, 2), (3, 3)])
    def test_diagonal_patches_used_and_quality(self, mode, plane_axis):
        src, ctx, dec, recon = self._roundtrip(mode, plane_axis)
        asps = ctx.atlas(0).asps_list[0]
        assert asps.asps_extended_projection_enabled_flag
        patches = decode_patch_frames(ctx.atlas(0))[0]
        assert any(p.rotation_axis == mode for p in patches), (
            f"no 45-degree patches on a mode-{mode} diagonal wall"
        )
        d = cKDTree(dec.positions).query(src.positions, k=1)[0]
        assert np.mean(d ** 2) < 1.0, np.mean(d ** 2)

    @pytest.mark.parametrize("plane_axis", [1, 2, 3])
    def test_mode4_covers_all_axes(self, plane_axis):
        """mode 4 (all 18 orientations) picks the right diagonal plane for a
        wall about ANY axis."""
        src, ctx, dec, _ = self._roundtrip(4, plane_axis)
        patches = decode_patch_frames(ctx.atlas(0))[0]
        assert any(p.rotation_axis == plane_axis for p in patches)
        d = cKDTree(dec.positions).query(src.positions, k=1)[0]
        assert np.mean(d ** 2) < 1.0, np.mean(d ** 2)

    @pytest.mark.parametrize("mode,plane_axis", [(1, 1), (2, 2), (3, 3)])
    def test_45_beats_canonical_on_diagonal_wall(self, mode, plane_axis):
        src, _, dec_45, _ = self._roundtrip(mode, plane_axis)
        _, _, dec_06, _ = self._roundtrip(0, plane_axis)
        d45 = cKDTree(dec_45.positions).query(src.positions, k=1)[0]
        d06 = cKDTree(dec_06.positions).query(src.positions, k=1)[0]
        assert np.mean(d45 ** 2) <= np.mean(d06 ** 2) + 1e-9

    @pytest.mark.parametrize("mode", [1, 2, 3, 4])
    def test_closed_loop_with_45(self, mode):
        src, ctx, dec, recon = self._roundtrip(mode, min(mode, 3))
        assert dec.compute_checksum() == recon.compute_checksum()


class TestPartialAndWeighted:
    def test_weight_normal_favors_covered_axes(self):
        """calculateWeightNormal: a flat XY wall projects all its points
        onto the Z faces -> Z weight 1, X/Y floored at minWeightEPP."""
        from rabbit_transcoding_tpu.encoder.segment import (
            calculate_weight_normal,
        )

        g = np.mgrid[0:64, 0:64].reshape(2, -1).T
        pts = np.column_stack(
            [g[:, 0], g[:, 1], np.full(len(g), 32)]
        ).astype(np.int32)
        w = calculate_weight_normal(pts, 10, min_weight=0.6)
        assert w[2] == 1.0          # Z projection sees every point
        assert w[0] == pytest.approx(0.6)  # X sees a 1px-thin line
        assert w[0] <= w[1] <= w[2]

    def test_enhanced_projection_plane_e2e(self):
        src = diagonal_wall_cloud(1)
        enc = Encoder(EncoderParameters(
            minimumImageWidth=256, minimumImageHeight=64,
            geometryQP=4, attributeQP=8, occupancyPrecision=2,
            flagGeometrySmoothing=False, constrainedPack=False,
            enhancedProjectionPlane=True, rawPointsPatch=True,
        ))
        ctx, recon = enc.encode(GroupOfFrames([src]))
        data = V3CWriter().write(V3CWriter().encode(ctx))
        dec = Decoder().decode(V3CReader().decode(V3CReader().read(data)[0]))
        assert dec[0].compute_checksum() == recon[0].compute_checksum()

    def test_partial_additional_projection_mode5(self):
        """Mode 5: only the top slice of the longest axis gets diagonal
        patches; the rest stays canonical."""
        from rabbit_transcoding_tpu.encoder.segment import (
            SegmenterParams,
            segment_frame_partial,
        )

        # tall content: bottom = flat XY walls, top = x=z diagonal wall
        g = np.mgrid[10:70, 10:70].reshape(2, -1).T
        s, t = g[:, 0], g[:, 1]
        bottom = np.column_stack([s, t, np.full(len(g), 20)])
        y_top = 200 + (s - 10)  # top slice of the Y span
        diag = np.column_stack([t, y_top, t + 1])
        pts = np.concatenate([bottom, diag]).astype(np.int32)
        params = SegmenterParams(rot_offset=1024)
        segs, missed = segment_frame_partial(pts, params, ratio=0.4)
        rots = {seg.patch.rotation_axis for seg in segs}
        assert 0 in rots, "canonical patches must remain"
        assert any(r > 0 for r in rots), "no diagonal patches from the slice"
        # diagonal patches only come from the slice (their points' y > cut)
        span = pts[:, 1].max() - pts[:, 1].min()
        cut = pts[:, 1].min() + span * 0.6
        for seg in segs:
            if seg.patch.rotation_axis:
                assert (pts[seg.point_indices][:, 1] > cut).all()

    def test_mode5_e2e_roundtrip(self):
        g = np.mgrid[10:70, 10:70].reshape(2, -1).T
        s, t = g[:, 0], g[:, 1]
        bottom = np.column_stack([s, t, np.full(len(g), 20)])
        y_top = 200 + (s - 10)
        diag = np.column_stack([t, y_top, t + 1])
        pos = np.concatenate([bottom, diag]).astype(np.int32)
        colors = np.clip(np.stack(
            [pos[:, 0] * 3, pos[:, 1], 128 + pos[:, 2]], 1
        ), 0, 255).astype(np.uint8)
        from rabbit_transcoding_tpu.core.pointset import PointSet

        src = PointSet(positions=pos, colors=colors).remove_duplicates()
        enc = Encoder(EncoderParameters(
            minimumImageWidth=256, minimumImageHeight=64,
            geometryQP=4, attributeQP=8, occupancyPrecision=2,
            flagGeometrySmoothing=False, constrainedPack=False,
            additionalProjectionPlaneMode=5,
            partialAdditionalProjectionPlane=0.4,
        ))
        ctx, recon = enc.encode(GroupOfFrames([src]))
        data = V3CWriter().write(V3CWriter().encode(ctx))
        dec = Decoder().decode(V3CReader().decode(V3CReader().read(data)[0]))
        assert dec[0].compute_checksum() == recon[0].compute_checksum()
        d = cKDTree(dec[0].positions).query(src.positions, k=1)[0]
        assert np.mean(d ** 2) < 1.0
