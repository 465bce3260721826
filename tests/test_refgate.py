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
