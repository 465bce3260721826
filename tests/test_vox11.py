"""vox11 content (11-bit coordinates, 8-bit nominal depth) — the Owlii
basketball_player/dancer operating point (reference
cfg/sequence/basketball_player_vox11.cfg: geometry3dCoordinatesBitdepth 11,
geometryNominal2dBitdepth 8)."""

import numpy as np
from scipy.spatial import cKDTree

from rabbit_transcoding_tpu.bitstream import V3CReader, V3CWriter
from rabbit_transcoding_tpu.core.gof import GroupOfFrames
from rabbit_transcoding_tpu.decoder.decoder import Decoder
from rabbit_transcoding_tpu.encoder.encoder import Encoder
from rabbit_transcoding_tpu.encoder.params import EncoderParameters
from rabbit_transcoding_tpu.testdata import make_frame


def vox11_params(**over):
    base = dict(
        geometry3dCoordinatesBitdepth=11,
        geometryNominal2dBitdepth=8,
        minimumImageWidth=1024,
        minimumImageHeight=64,
        geometryQP=12,
        attributeQP=20,
        frameCount=1,
        groupOfFramesSize=1,
    )
    base.update(over)
    return EncoderParameters(**base)


def roundtrip(gof, params):
    ctx, recon = Encoder(params).encode(gof)
    data = V3CWriter().write(V3CWriter().encode(ctx))
    dec = Decoder().decode(V3CReader().decode(V3CReader().read(data)[0]))
    return data, dec, recon


class TestVox11:
    def test_dense_vox11_roundtrip(self):
        """Dense 11-bit cloud: patches form, depths fit the 8-bit nominal
        range (range_d coded with min(geom2d, geom3d) bits), quality sane."""
        gof = GroupOfFrames(
            [make_frame(0, n=120000, radius=600.0, center=1024.0,
                        vox_bits=11)]
        )
        _, dec, recon = roundtrip(gof, vox11_params())
        assert dec[0].positions.max() > 1023  # genuinely 11-bit content
        d = cKDTree(dec[0].positions.astype(np.float32)).query(
            gof[0].positions.astype(np.float32), k=1
        )[0]
        assert float(np.mean(d**2)) < 20.0
        assert dec[0].compute_checksum() == recon[0].compute_checksum()

    def test_sparse_vox11_exact_raw_recovery(self):
        """A cloud too sparse to segment goes entirely to the raw patch and
        must survive bit-exact — the aux geometry video carries 11-bit
        ABSOLUTE coords (not the 8-bit nominal depth), and the smoothing
        density filter never drops exact (non-boundary) points."""
        gof = GroupOfFrames(
            [make_frame(0, n=15000, radius=600.0, center=1024.0,
                        vox_bits=11)]
        )
        _, dec, _ = roundtrip(gof, vox11_params())
        s = set(map(tuple, gof[0].positions.astype(np.int64)))
        d = set(map(tuple, dec[0].positions.astype(np.int64)))
        assert s == d

    def test_vox11_sequence_cfgs_parse(self):
        import os

        from rabbit_transcoding_tpu.apps.common import build_registry

        cfg = os.path.join(
            os.path.dirname(__file__), "..", "cfg", "sequence",
            "basketball_player_vox11.cfg",
        )
        params = EncoderParameters()
        reg = build_registry(params)
        reg.parse_config_file(cfg)
        reg.apply_to_dataclass(params)
        assert params.geometry3dCoordinatesBitdepth == 11
        assert params.geometryNominal2dBitdepth == 8
        assert params.minimumImageWidth == 2560
