"""PccAppNormalGenerator / PccAppColorConverter analog apps: full normal
generation parameter surface + cfg-driven color conversion."""

from __future__ import annotations

import numpy as np
import pytest

from rabbit_transcoding_tpu.core.image import Video
from rabbit_transcoding_tpu.core.pointset import PointSet
from rabbit_transcoding_tpu.encoder.normals import (
    NormalsGenParams,
    generate_normals,
)
from rabbit_transcoding_tpu.utils.enums import ColorFormat


def _sphere(n=500, radius=40.0, center=(64.0, 64.0, 64.0), seed=3):
    rng = np.random.default_rng(seed)
    v = rng.normal(size=(n, 3))
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    return (np.asarray(center) + radius * v).astype(np.float32)


class TestGenerateNormals:
    def test_unit_length_and_surface_alignment(self):
        pts = _sphere()
        out = generate_normals(pts, NormalsGenParams())
        n = out["normals"]
        assert np.allclose(np.linalg.norm(n, axis=1), 1.0, atol=1e-4)
        radial = pts - pts.mean(axis=0)
        radial /= np.linalg.norm(radial, axis=1, keepdims=True)
        # PCA normals on a sphere align with the radial direction (any sign)
        assert np.mean(np.abs(np.einsum("nc,nc->n", n, radial)) > 0.9) > 0.95

    def test_viewpoint_orientation(self):
        pts = _sphere()
        vp = (300.0, 64.0, 64.0)
        out = generate_normals(
            pts, NormalsGenParams(view_point=vp, orientation_strategy=2)
        )
        toward = np.asarray(vp)[None] - pts
        dots = np.einsum("nc,nc->n", out["normals"], toward)
        assert (dots >= -1e-5).all()

    def test_spanning_tree_analog_is_consistent(self):
        pts = _sphere()
        out = generate_normals(pts, NormalsGenParams(orientation_strategy=1))
        radial = pts - pts.mean(axis=0)
        dots = np.einsum("nc,nc->n", out["normals"], radial)
        # consistent orientation: (nearly) all outward or all inward
        frac_out = np.mean(dots > 0)
        assert frac_out > 0.95 or frac_out < 0.05

    def test_cubemap_orientation_points_outward(self):
        pts = _sphere(n=800)
        out = generate_normals(pts, NormalsGenParams(orientation_strategy=3))
        radial = pts - pts.mean(axis=0)
        dots = np.einsum("nc,nc->n", out["normals"], radial)
        # cubemap visibility seeds fix the sign outward on a convex shape
        assert np.mean(dots > 0) > 0.9

    def test_smoothing_reduces_noise(self):
        pts = _sphere(n=800)
        rough = generate_normals(
            pts, NormalsGenParams(knn_normal_estimation=4,
                                  orientation_strategy=2,
                                  view_point=(300.0, 64.0, 64.0))
        )["normals"]
        smooth = generate_normals(
            pts, NormalsGenParams(knn_normal_estimation=4,
                                  orientation_strategy=2,
                                  view_point=(300.0, 64.0, 64.0),
                                  smoothing_iterations=4,
                                  weight_normal_smoothing=0.8)
        )["normals"]
        radial = pts - pts.mean(axis=0)
        radial /= np.linalg.norm(radial, axis=1, keepdims=True)
        err = lambda n: np.mean(1.0 - np.abs(np.einsum("nc,nc->n", n, radial)))
        assert err(smooth) <= err(rough) + 1e-6

    def test_store_flags(self):
        pts = _sphere(n=200)
        out = generate_normals(
            pts,
            NormalsGenParams(store_eigenvalues=True, store_centroids=True,
                             store_number_of_nearest_neighbors=True),
        )
        assert out["eigenvalues"].shape == (200, 3)
        # ascending eigenvalues: surface patches have small first eigenvalue
        assert (out["eigenvalues"][:, 0] <= out["eigenvalues"][:, 2] + 1e-6).all()
        assert out["centroids"].shape == (200, 3)
        assert (out["nn_counts"] == 16).all()

    def test_radius_cap_limits_neighbors(self):
        pts = _sphere(n=200)
        out = generate_normals(
            pts,
            NormalsGenParams(radius_normal_estimation=1e-6,
                             store_number_of_nearest_neighbors=True),
        )
        assert (out["nn_counts"] == 1).all()  # only self survives the cap


class TestNormalsApp:
    def test_cli_end_to_end(self, tmp_path):
        from rabbit_transcoding_tpu.apps.normals import main

        pts = _sphere(n=300)
        src = tmp_path / "frame_%04d.ply"
        PointSet(pts).write_ply(str(src) % 0)
        rc = main([
            f"--srcPlyPath={src}", "--startFrameNumber=0", "--frameCount=1",
            "--orientationStrategy=2", "--viewPointX=300",
            "--storeEigenvalues=1",
            f"--dstPlyPath={tmp_path / 'out_%04d.ply'}",
        ])
        assert rc == 0
        out = PointSet.read_ply(str(tmp_path / "out_0000.ply"))
        assert out.has_normals and len(out.normals) == 300
        assert (tmp_path / "out_0000_eigenvalues.npy").exists()

    def test_unused_cfg_options_accepted(self, tmp_path):
        from rabbit_transcoding_tpu.apps.normals import main

        pts = _sphere(n=100)
        src = tmp_path / "f_%04d.ply"
        PointSet(pts).write_ply(str(src) % 0)
        cfg = tmp_path / "enc.cfg"
        cfg.write_text(
            "maxPatchSize: 1024\nminNormSumOfInvDist4MPSelection: 0.35\n"
            "surfaceSeparation: 0\n"
        )
        rc = main(["-c", str(cfg), f"--srcPlyPath={src}", "--frameCount=1"])
        assert rc == 0


class TestColorConvertApp:
    def _write_rgb(self, path, f=1, h=16, w=16, seed=0, smooth=False):
        if smooth:
            yy, xx = np.mgrid[0:h, 0:w]
            r = (255 * xx / max(w - 1, 1)).astype(np.uint8)
            g = (255 * yy / max(h - 1, 1)).astype(np.uint8)
            b = ((r.astype(int) + g.astype(int)) // 2).astype(np.uint8)
            rgb = np.broadcast_to(
                np.stack([r, g, b], axis=-1)[None], (f, h, w, 3)
            ).copy()
        else:
            rng = np.random.default_rng(seed)
            rgb = rng.integers(0, 256, size=(f, h, w, 3), dtype=np.uint8)
        v = Video(w, h, 8, ColorFormat.RGB444,
                  [rgb[..., 0], rgb[..., 1], rgb[..., 2]])
        v.write(str(path))
        return rgb

    def test_cfg_driven_rgb_to_yuv420(self, tmp_path):
        from rabbit_transcoding_tpu.apps.color_convert import main

        src = tmp_path / "in.rgb"
        self._write_rgb(src)
        cfg = tmp_path / "conv.cfg"
        cfg.write_text(
            "SourceColorSpace: 1\nSourceChromaFormat: 3\n"
            "SourceBitDepthCmp0: 8\nOutputColorSpace: 0\n"
            "OutputChromaFormat: 1\nOutputBitDepthCmp0: 8\n"
        )
        dst = tmp_path / "out.yuv"
        rc = main([
            f"--srcVideoPath={src}", f"--dstVideoPath={dst}",
            f"--configFile={cfg}", "--width=16", "--height=16",
            "--colorFormat=RGB444", "--inputNumBytes=1",
            "--outputNumBytes=1",
        ])
        assert rc == 0
        # YUV420 8-bit: w*h*1.5 bytes per frame
        assert dst.stat().st_size == 16 * 16 * 3 // 2

    def test_cfg_roundtrip_preserves_color(self, tmp_path):
        from rabbit_transcoding_tpu.apps.color_convert import main

        src = tmp_path / "in.rgb"
        rgb = self._write_rgb(src, h=32, w=32, smooth=True)
        fwd = tmp_path / "fwd.cfg"
        fwd.write_text("SourceColorSpace: 1\nSourceChromaFormat: 3\n"
                       "OutputColorSpace: 0\nOutputChromaFormat: 1\n")
        bwd = tmp_path / "bwd.cfg"
        bwd.write_text("SourceColorSpace: 0\nSourceChromaFormat: 1\n"
                       "OutputColorSpace: 1\nOutputChromaFormat: 3\n")
        mid = tmp_path / "mid.yuv"
        out = tmp_path / "out.rgb"
        assert main([f"--srcVideoPath={src}", f"--dstVideoPath={mid}",
                     f"--configFile={fwd}", "--width=32", "--height=32"]) == 0
        assert main([f"--srcVideoPath={mid}", f"--dstVideoPath={out}",
                     f"--configFile={bwd}", "--width=32", "--height=32"]) == 0
        back = np.fromfile(out, np.uint8).reshape(1, 3, 32, 32)
        back = np.moveaxis(back, 1, -1)
        # chroma subsample round trip: luma-dominated content within ~12 codes
        assert np.mean(np.abs(back.astype(int) - rgb.astype(int))) < 12

    def test_ten_bit_output(self, tmp_path):
        from rabbit_transcoding_tpu.apps.color_convert import main

        src = tmp_path / "in.rgb"
        self._write_rgb(src)
        cfg = tmp_path / "conv.cfg"
        cfg.write_text("SourceColorSpace: 1\nSourceChromaFormat: 3\n"
                       "OutputColorSpace: 0\nOutputChromaFormat: 1\n"
                       "OutputBitDepthCmp0: 10\n")
        dst = tmp_path / "out.yuv"
        rc = main([f"--srcVideoPath={src}", f"--dstVideoPath={dst}",
                   f"--configFile={cfg}", "--width=16", "--height=16",
                   "--outputNumBytes=2"])
        assert rc == 0
        data = np.fromfile(dst, np.uint16)
        assert data.size == 16 * 16 * 3 // 2
        assert data.max() > 255  # genuinely 10-bit codes

    def test_legacy_conversion_mode(self, tmp_path):
        from rabbit_transcoding_tpu.apps.color_convert import main

        src = tmp_path / "in.rgb"
        self._write_rgb(src)
        dst = tmp_path / "out.yuv"
        rc = main([f"--inPath={src}", f"--outPath={dst}",
                   "--conversion=rgb444toyuv420", "--width=16",
                   "--height=16", "--frameCount=1"])
        assert rc == 0
        assert dst.stat().st_size == 16 * 16 * 3 // 2
