"""PLR (point local reconstruction): single-map second-layer synthesis."""

import numpy as np
from scipy.spatial import cKDTree

from rabbit_transcoding_tpu.bitstream import V3CReader, V3CWriter
from rabbit_transcoding_tpu.codec.patch_frame import decode_patch_frames
from rabbit_transcoding_tpu.core.gof import GroupOfFrames
from rabbit_transcoding_tpu.decoder.decoder import Decoder
from rabbit_transcoding_tpu.encoder.encoder import Encoder
from rabbit_transcoding_tpu.encoder.params import EncoderParameters

from test_dualmap import thin_slab_cloud


def roundtrip(src, **kw):
    base = dict(
        minimumImageWidth=128, minimumImageHeight=64,
        geometryQP=4, attributeQP=8, occupancyPrecision=2,
        surfaceThickness=4, flagGeometrySmoothing=False,
        mapCountMinus1=0, constrainedPack=False,
    )
    base.update(kw)
    enc = Encoder(EncoderParameters(**base))
    ctx, recon = enc.encode(GroupOfFrames([src]))
    w = V3CWriter()
    data = w.write(w.encode(ctx))
    ctx2 = V3CReader().decode(V3CReader().read(data)[0])
    return ctx2, Decoder().decode(ctx2)[0], recon[0]


class TestPlr:
    def test_plr_mode_survives_syntax(self):
        src = thin_slab_cloud(thickness=2)
        ctx, dec, recon = roundtrip(src, pointLocalReconstruction=True)
        asps = ctx.atlas(0).asps_list[0]
        assert asps.asps_plr_enabled_flag
        patches = decode_patch_frames(ctx.atlas(0))[0]
        assert any(p.plr_mode == 1 for p in patches)

    def test_plr_improves_single_map_quality(self):
        src = thin_slab_cloud(thickness=1)
        _, dec_plr, _ = roundtrip(src, pointLocalReconstruction=True)
        _, dec_off, _ = roundtrip(src, pointLocalReconstruction=False)
        d_plr = cKDTree(dec_plr.positions).query(src.positions, k=1)[0]
        d_off = cKDTree(dec_off.positions).query(src.positions, k=1)[0]
        assert np.mean(d_plr ** 2) < np.mean(d_off ** 2)
        assert dec_plr.point_count > dec_off.point_count

    def test_plr_closed_loop(self):
        src = thin_slab_cloud(thickness=2)
        ctx, dec, recon = roundtrip(src, pointLocalReconstruction=True)
        assert dec.compute_checksum() == recon.compute_checksum()

    def test_plr_ignored_with_dual_maps(self):
        src = thin_slab_cloud(thickness=2)
        ctx, dec, recon = roundtrip(
            src, pointLocalReconstruction=True, mapCountMinus1=1
        )
        assert not ctx.atlas(0).asps_list[0].asps_plr_enabled_flag
        assert dec.compute_checksum() == recon.compute_checksum()
