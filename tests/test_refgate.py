"""Cross-implementation V3C syntax fidelity gate (SURVEY §7 milestone 1).

Encodes streams with this framework at several operating points, parses
each .bin with the MPEG TMC2 reference bitstream reader (compiled in-env
by tools/refgate/build.sh — linked, never copied), and asserts field-level
equality between the reference's parsed high-level syntax and our own
reader's structs.  This is the our-writer -> reference-reader direction;
test_refgate_reverse.py covers reference-writer -> our-reader.

Skipped when /root/reference or a C++ toolchain is unavailable.
"""

import shutil

import numpy as np
import pytest

from rabbit_transcoding_tpu.bitstream import V3CReader, V3CWriter
from rabbit_transcoding_tpu.conformance import refgate
from rabbit_transcoding_tpu.core.gof import GroupOfFrames
from rabbit_transcoding_tpu.core.pointset import PointSet
from rabbit_transcoding_tpu.encoder.encoder import Encoder
from rabbit_transcoding_tpu.encoder.params import EncoderParameters

pytestmark = pytest.mark.skipif(
    not refgate.reference_available() or shutil.which("g++") is None,
    reason="reference sources or g++ not available",
)


def slab_cloud(thickness=2, extent=48):
    g = np.mgrid[8:8 + extent, 8:8 + extent].reshape(2, -1).T
    layers = [
        np.column_stack([g[:, 0], g[:, 1], np.full(len(g), 30 + dz)])
        for dz in range(thickness + 1)
    ]
    pos = np.concatenate(layers).astype(np.int32)
    colors = np.clip(
        np.stack([pos[:, 2] * 40 % 255, pos[:, 0] * 3, pos[:, 1] * 3], 1),
        0, 255,
    ).astype(np.uint8)
    return PointSet(positions=pos, colors=colors).remove_duplicates()


BASE = dict(
    minimumImageWidth=128, minimumImageHeight=64,
    geometryQP=8, attributeQP=12, occupancyPrecision=2,
    surfaceThickness=4, flagGeometrySmoothing=False,
)


def gate(tmp_path, n_frames=1, cloud=None, **kw):
    """Encode -> .bin -> reference parse vs our parse -> compare."""
    params = dict(BASE)
    params.update(kw)
    src = cloud if cloud is not None else slab_cloud()
    enc = Encoder(EncoderParameters(**params))
    ctx, _ = enc.encode(GroupOfFrames([src] * n_frames))
    w = V3CWriter()
    data = w.write(w.encode(ctx))
    path = tmp_path / "gate.bin"
    path.write_bytes(data)
    ref = refgate.run_refparse(path)
    ours = refgate.flatten_contexts(
        [V3CReader().decode(g) for g in V3CReader().read(data)]
    )
    problems = refgate.compare(ref, ours)
    assert not problems, "\n".join(problems[:50])


class TestRefGate:
    def test_default_dual_map(self, tmp_path):
        gate(tmp_path, n_frames=2)

    @pytest.mark.slow
    def test_single_map_plr_block_level(self, tmp_path):
        gate(
            tmp_path, mapCountMinus1=0, pointLocalReconstruction=True,
            plrLevel=0, patchSize=4, nbPlrmMode=4,
            maxAllowedDist2RawPointsSelection=0.0,
            maxAllowedDist2RawPointsDetection=0.0,
        )

    @pytest.mark.slow
    def test_lossless_eom_raw(self, tmp_path):
        gate(
            tmp_path, cloud=slab_cloud(thickness=1),
            losslessGeo=True, enhancedOccupancyMapCode=True,
            geometryQP=0, attributeQP=0, occupancyPrecision=1,
        )

    @pytest.mark.slow
    def test_tiles(self, tmp_path):
        gate(
            tmp_path, cloud=slab_cloud(extent=56),
            numMaxTilePerFrame=2, minimumImageHeight=128,
        )

    @pytest.mark.slow
    def test_patch_size_quantizers(self, tmp_path):
        gate(tmp_path, log2QuantizerSizeX=2, log2QuantizerSizeY=3)

    @pytest.mark.slow
    def test_multiple_streams_absolute_d1(self, tmp_path):
        gate(tmp_path, multipleStreams=True, absoluteD1=True, n_frames=2)

    @pytest.mark.slow
    def test_plr_inter_patches(self, tmp_path):
        """PLR carried on inter patches (P-tiles): our writer's plrData on
        InterPatchDataUnit must parse field-identical through the TMC2
        reader (PCCBitstreamReader.cpp:1182-1218)."""
        rng = np.random.default_rng(3)
        g = np.mgrid[8:40, 8:40].reshape(2, -1).T

        def cloud(seed, stair):
            r2 = np.random.default_rng(seed)
            z = 30 + ((g[:, 0] // (2 * stair)) % 3) + (
                r2.random(len(g)) * 2
            ).astype(np.int32)
            layers = [
                np.column_stack([g[:, 0], g[:, 1], z + dz]) for dz in range(3)
            ]
            pos = np.concatenate(layers).astype(np.int32)
            colors = np.clip(
                np.stack([pos[:, 2] * 40 % 255, pos[:, 0] * 3, pos[:, 1] * 3], 1),
                0, 255,
            ).astype(np.uint8)
            return PointSet(positions=pos, colors=colors).remove_duplicates()

        params = dict(BASE)
        params.update(
            mapCountMinus1=0, pointLocalReconstruction=True,
            plrLevel=0, patchSize=4, nbPlrmMode=4,
            maxAllowedDist2RawPointsSelection=0.0,
            maxAllowedDist2RawPointsDetection=0.0,
            maxNNCountPatchSegmentation=0,
        )
        enc = Encoder(EncoderParameters(**params))
        ctx, _ = enc.encode(GroupOfFrames([cloud(1, 1), cloud(7, 4)]))
        from rabbit_transcoding_tpu.bitstream.syntax import InterPatchDataUnit
        from rabbit_transcoding_tpu.utils.enums import AtlasTileType
        atl1 = ctx.atlases[0].atlas_tile_layers[1]
        assert atl1.header.ath_type == AtlasTileType.P_TILE
        assert any(
            isinstance(p.data, InterPatchDataUnit)
            for p in atl1.data_unit.patches
        ), "operating point must exercise inter patches with PLR"
        w = V3CWriter()
        data = w.write(w.encode(ctx))
        path = tmp_path / "gate.bin"
        path.write_bytes(data)
        ref = refgate.run_refparse(path)
        ours = refgate.flatten_contexts(
            [V3CReader().decode(g2) for g2 in V3CReader().read(data)]
        )
        problems = refgate.compare(ref, ours)
        assert not problems, "\n".join(problems[:50])
        del rng

    def test_asps_vui(self, tmp_path):
        """ASPS VUI parameters: our writer emits a fully-featured VUI and
        the TMC2 reader (PCCBitstreamReader.cpp:2262 vuiParameters) parses
        it field-identical.  Forward-only: TMC2's own writer emits a
        vui_max_coded_video_resolution flag its reader never parses, so
        the reverse direction cannot carry VUI (see refwrite.cpp).  HRD
        stays OFF through this gate: TMC2's HrdParameters allocates its
        per-sublayer vectors to maxNumSubLayersMinus1_=0 elements and then
        indexes [0] (PCCVUIParameters.h:80-86) — undefined behaviour /
        segfault on any HRD-carrying stream; the HRD syntax is covered by
        our own round-trip tests (test_bitstream.py)."""
        from rabbit_transcoding_tpu.bitstream.syntax import (
            CoordinateSystemParameters,
            VUIParameters,
        )

        params = dict(BASE)
        enc = Encoder(EncoderParameters(**params))
        ctx, _ = enc.encode(GroupOfFrames([slab_cloud()]))
        asps = ctx.atlases[0].asps_list[0]
        asps.asps_vui_parameters_present_flag = True
        asps.vui_parameters = VUIParameters(
            vui_timing_info_present_flag=True,
            vui_num_units_in_tick=1001,
            vui_time_scale=60000,
            vui_poc_proportional_to_timing_flag=True,
            vui_num_ticks_poc_diff_one_minus1=3,
            vui_tile_restrictions_present_flag=True,
            vui_fixed_atlas_tile_structure_flag=True,
            vui_max_num_tiles_per_atlas_minus1=3,
            vui_coordinate_system_parameters_present_flag=True,
            coordinate_system_parameters=CoordinateSystemParameters(
                csp_forward_axis=2, csp_delta_left_axis=1,
                csp_forward_sign=1, csp_up_sign=1,
            ),
            vui_unit_in_metres_flag=True,
            vui_display_box_info_present_flag=True,
            vui_display_box_origin=[1, 2, 3],
            vui_display_box_size=[512, 512, 256],
            vui_anchor_point_present_flag=True,
            vui_anchor_point=[7, 8, 9],
        )
        w = V3CWriter()
        data = w.write(w.encode(ctx))
        path = tmp_path / "gate.bin"
        path.write_bytes(data)
        ref = refgate.run_refparse(path)
        ours = refgate.flatten_contexts(
            [V3CReader().decode(g) for g in V3CReader().read(data)]
        )
        problems = refgate.compare(ref, ours)
        assert not problems, "\n".join(problems[:50])
