"""Dual-map (D0+D1) geometry: the far layer of thin structures must survive."""

import numpy as np
from scipy.spatial import cKDTree

from rabbit_transcoding_tpu.core.gof import GroupOfFrames
from rabbit_transcoding_tpu.core.pointset import PointSet
from rabbit_transcoding_tpu.decoder.decoder import Decoder
from rabbit_transcoding_tpu.encoder.encoder import Encoder
from rabbit_transcoding_tpu.encoder.params import EncoderParameters
from rabbit_transcoding_tpu.bitstream import V3CReader, V3CWriter


def thin_slab_cloud(thickness=2):
    """A 48x48 double-sided slab: two surfaces `thickness` apart in Z."""
    g = np.mgrid[8:56, 8:56].reshape(2, -1).T
    layers = [np.column_stack([g[:, 0], g[:, 1], np.full(len(g), 30 + dz)])
              for dz in range(thickness + 1)]
    pos = np.concatenate(layers).astype(np.int32)
    colors = np.clip(
        np.stack([pos[:, 2] * 40 % 255, pos[:, 0] * 3, pos[:, 1] * 3], 1),
        0, 255,
    ).astype(np.uint8)
    return PointSet(positions=pos, colors=colors).remove_duplicates()


def _roundtrip(params):
    src = thin_slab_cloud()
    enc = Encoder(params)
    ctx, recon = enc.encode(GroupOfFrames([src, src]))
    w = V3CWriter()
    data = w.write(w.encode(ctx))
    ctx2 = V3CReader().decode(V3CReader().read(data)[0])
    clouds = Decoder().decode(ctx2)
    return src, clouds[0], recon[0]


class TestDualMap:
    def test_both_layers_recovered(self):
        params = EncoderParameters(
            minimumImageWidth=128, minimumImageHeight=64,
            geometryQP=4, attributeQP=8, occupancyPrecision=2,
            mapCountMinus1=1, surfaceThickness=4,
            flagGeometrySmoothing=False,
        )
        src, dec, recon = _roundtrip(params)
        # every source point (near AND far surface) has an exact/near match
        d, _ = cKDTree(dec.positions).query(src.positions, k=1)
        assert np.mean(d ** 2) < 0.6, f"dual-map D1 mse {np.mean(d**2)}"
        assert (d == 0).mean() > 0.6  # majority reconstructed exactly

    def test_dual_beats_single_on_thin_structures(self):
        base = dict(
            minimumImageWidth=128, minimumImageHeight=64,
            geometryQP=4, attributeQP=8, occupancyPrecision=2,
            surfaceThickness=4, flagGeometrySmoothing=False,
        )
        src1, dec1, _ = _roundtrip(EncoderParameters(**base, mapCountMinus1=0))
        src2, dec2, _ = _roundtrip(EncoderParameters(**base, mapCountMinus1=1))
        d1 = cKDTree(dec1.positions).query(src1.positions, k=1)[0]
        d2 = cKDTree(dec2.positions).query(src2.positions, k=1)[0]
        # the far surface is missing from the single-map decode
        assert np.mean(d2 ** 2) < np.mean(d1 ** 2)
        assert dec2.point_count > dec1.point_count

    def test_decoder_matches_encoder_closed_loop(self):
        params = EncoderParameters(
            minimumImageWidth=128, minimumImageHeight=64,
            geometryQP=12, attributeQP=20, occupancyPrecision=2,
            mapCountMinus1=1,
        )
        src, dec, recon = _roundtrip(params)
        assert dec.compute_checksum() == recon.compute_checksum()
