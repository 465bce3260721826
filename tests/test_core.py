"""Unit tests: core containers, config cascade, patch math."""

import numpy as np
import pytest

from rabbit_transcoding_tpu.core import GroupOfFrames, Image, Patch, PointSet, Video
from rabbit_transcoding_tpu.utils.config import OptionRegistry
from rabbit_transcoding_tpu.utils.enums import ColorFormat, PatchOrientation


def make_cloud(n=500, seed=0, with_colors=True, with_normals=False):
    rng = np.random.default_rng(seed)
    pos = rng.integers(0, 1024, size=(n, 3)).astype(np.int32)
    colors = rng.integers(0, 256, size=(n, 3)).astype(np.uint8) if with_colors else None
    normals = None
    if with_normals:
        v = rng.normal(size=(n, 3))
        normals = v / np.linalg.norm(v, axis=1, keepdims=True)
    return PointSet(positions=pos, colors=colors, normals=normals)


# --------------------------------------------------------------------------
class TestPointSet:
    def test_ply_roundtrip_binary(self, tmp_path):
        ps = make_cloud(with_normals=True)
        p = tmp_path / "c.ply"
        ps.write_ply(str(p), binary=True)
        ps2 = PointSet.read_ply(str(p))
        np.testing.assert_array_equal(ps.positions, ps2.positions)
        np.testing.assert_array_equal(ps.colors, ps2.colors)
        np.testing.assert_allclose(ps.normals, ps2.normals, atol=1e-6)

    def test_ply_roundtrip_ascii(self, tmp_path):
        ps = make_cloud(n=50)
        p = tmp_path / "c.ply"
        ps.write_ply(str(p), binary=False)
        ps2 = PointSet.read_ply(str(p))
        np.testing.assert_array_equal(ps.positions, ps2.positions)
        np.testing.assert_array_equal(ps.colors, ps2.colors)

    def test_remove_duplicates(self):
        pos = np.array([[0, 0, 0], [1, 1, 1], [0, 0, 0], [2, 2, 2]], np.int32)
        col = np.array([[1, 0, 0], [0, 1, 0], [9, 9, 9], [0, 0, 1]], np.uint8)
        ps = PointSet(positions=pos, colors=col).remove_duplicates()
        assert ps.point_count == 3
        # first occurrence kept
        assert ps.colors[0].tolist() == [1, 0, 0]

    def test_checksum_order_invariant(self):
        ps = make_cloud(n=100)
        perm = np.random.default_rng(1).permutation(100)
        ps2 = ps.select(perm)
        assert ps.compute_checksum() == ps2.compute_checksum()

    def test_gof_io(self, tmp_path):
        gof = GroupOfFrames([make_cloud(seed=i) for i in range(4)])
        tpl = str(tmp_path / "f_%04d.ply")
        gof.write(tpl, start=0)
        gof2 = GroupOfFrames.load(tpl, start=0, count=4)
        for a, b in zip(gof, gof2):
            np.testing.assert_array_equal(a.positions, b.positions)


# --------------------------------------------------------------------------
class TestVideo:
    def test_yuv420_roundtrip(self, tmp_path):
        rng = np.random.default_rng(0)
        v = Video.zeros(3, 64, 32, 8, ColorFormat.YUV420)
        for p in v.planes:
            p[...] = rng.integers(0, 255, p.shape)
        path = str(tmp_path / "v.yuv")
        v.write(path)
        v2 = Video().read(path, 64, 32, 3, 8, ColorFormat.YUV420)
        for a, b in zip(v.planes, v2.planes):
            np.testing.assert_array_equal(a, b)

    def test_bitdepth_conversion(self):
        v = Video.zeros(1, 16, 16, 8, ColorFormat.YUV400)
        v.planes[0][...] = 200
        v10 = v.convert_bitdepth(10)
        assert v10.planes[0][0, 0, 0] == 800
        v8 = v10.convert_bitdepth(8)
        assert v8.planes[0][0, 0, 0] == 200

    def test_chroma_conversion_shapes(self):
        v = Video.zeros(2, 32, 16, 8, ColorFormat.YUV420)
        v444 = v.yuv420_to_yuv444()
        assert v444.planes[1].shape == (2, 16, 32)
        v420 = v444.yuv444_to_yuv420()
        assert v420.planes[1].shape == (2, 8, 16)

    def test_image_copy_block(self):
        src = Image(32, 32, 8, ColorFormat.YUV420)
        src.planes[0][...] = 7
        dst = Image(64, 64, 8, ColorFormat.YUV420)
        dst.copy_block(src, 0, 0, 16, 16, 32, 32)
        assert dst.planes[0][32:48, 32:48].min() == 7
        assert dst.planes[0][:32, :32].max() == 0


# --------------------------------------------------------------------------
class TestPatch:
    @pytest.mark.parametrize("orientation", list(PatchOrientation))
    def test_canvas_roundtrip(self, orientation):
        patch = Patch(
            u0=2, v0=3, size_u0=2, size_v0=3, size_u=25, size_v=41,
            orientation=orientation, occupancy_resolution=16,
        )
        u, v = np.meshgrid(np.arange(25), np.arange(41), indexing="ij")
        x, y = patch.patch_to_canvas(u, v)
        u2, v2 = patch.canvas_to_patch(x, y)
        np.testing.assert_array_equal(u, u2)
        np.testing.assert_array_equal(v, v2)
        # all mapped pixels fall in the canvas bounding box
        x0, y0, w, h = patch.canvas_bounds()
        assert x.min() >= x0 and x.max() < x0 + w
        assert y.min() >= y0 and y.max() < y0 + h

    def test_generate_point_modes(self):
        p = Patch(u1=10, v1=20, d1=100, normal_axis=2, tangent_axis=0,
                  bitangent_axis=1, projection_mode=0)
        pt = p.generate_point(3, 4, 5)
        assert pt.tolist() == [13, 24, 105]
        p.projection_mode = 1
        pt = p.generate_point(3, 4, 5)
        assert pt.tolist() == [13, 24, 95]


# --------------------------------------------------------------------------
class TestConfig:
    def test_cli_and_cascade(self, tmp_path):
        cfg1 = tmp_path / "common.cfg"
        cfg1.write_text("geometryQP: 30 # comment\nuncompressedDataPath: a.ply\n")
        cfg2 = tmp_path / "rate.cfg"
        cfg2.write_text("geometryQP = 24\n")
        reg = OptionRegistry()
        reg.add("geometryQP", 32, "geometry QP")
        reg.add("attributeQP", 42, "attribute QP")
        reg.add("uncompressedDataPath", "", "input")
        reg.add("useCuda", False, "hw codec")
        reg.parse_args(
            ["-c", str(cfg1), "--config", str(cfg2), "--attributeQP=37", "--useCuda"]
        )
        assert reg["geometryQP"] == 24  # last wins: rate.cfg overrides common.cfg
        assert reg["attributeQP"] == 37
        assert reg["uncompressedDataPath"] == "a.ply"
        assert reg["useCuda"] is True

    def test_unknown_keys_warn_not_fail(self, tmp_path):
        cfg = tmp_path / "x.cfg"
        cfg.write_text("notAnOption: 1\n")
        reg = OptionRegistry()
        reg.add("a", 1)
        reg.parse_config_file(str(cfg))
        assert reg.warnings
