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


class TestPixelInterleaving:
    """Single-map pixel interleaving (asps_pixel_deinterleaving_flag,
    singleMapPixelInterleaving): both maps checkerboard into ONE video."""

    def test_pixel_interleave_roundtrip(self):
        import sys

        sys.path.insert(0, "tests")
        import numpy as np
        from test_e2e_codec import make_sphere_cloud, nn_dist

        from rabbit_transcoding_tpu.bitstream import V3CReader, V3CWriter
        from rabbit_transcoding_tpu.core.gof import GroupOfFrames
        from rabbit_transcoding_tpu.decoder.decoder import Decoder
        from rabbit_transcoding_tpu.encoder.encoder import Encoder
        from rabbit_transcoding_tpu.encoder.params import EncoderParameters
        from rabbit_transcoding_tpu.utils.enums import VideoType

        src = make_sphere_cloud(seed=0)

        def run(**kw):
            params = EncoderParameters(
                minimumImageWidth=256, minimumImageHeight=64,
                geometryQP=4, attributeQP=8, occupancyPrecision=2, **kw,
            )
            ctx, recon = Encoder(params).encode(GroupOfFrames([src]))
            w = V3CWriter()
            data = w.write(w.encode(ctx))
            ctx2 = V3CReader().decode(V3CReader().read(data)[0])
            return data, ctx2, Decoder().decode(ctx2)[0], recon[0]

        data_pi, ctx_pi, dec_pi, recon_pi = run(
            singleMapPixelInterleaving=True,
        )
        data_dual, _, dec_dual, _ = run()

        asps = ctx_pi.atlas(0).asps_list[0]
        assert asps.asps_pixel_deinterleaving_flag
        assert asps.asps_map_count_minus1 == 1
        # ONE geometry video of F frames (not 2F)
        from rabbit_transcoding_tpu.video import rbv

        geo_vb = ctx_pi.atlas(0).get_video_bitstream(VideoType.GEOMETRY)
        assert rbv.probe(geo_vb.data)["frame_count"] == 1

        # closed loop exact; materially smaller; quality still reasonable
        assert dec_pi.compute_checksum() == recon_pi.compute_checksum()
        assert len(data_pi) < 0.85 * len(data_dual)
        d = nn_dist(src.positions, dec_pi.positions)
        assert np.mean(d ** 2) < 2.0, np.mean(d ** 2)

    def test_deinterleave_inverts_interleave_on_own_samples(self):
        import jax.numpy as jnp
        import numpy as np

        from rabbit_transcoding_tpu.ops.interleave import (
            deinterleave_maps,
            interleave_maps,
        )

        rng = np.random.default_rng(0)
        m0 = rng.integers(0, 1000, (2, 16, 16)).astype(np.uint16)
        m1 = rng.integers(0, 1000, (2, 16, 16)).astype(np.uint16)
        plane = np.asarray(interleave_maps(jnp.asarray(m0), jnp.asarray(m1)))
        r0, r1 = map(np.asarray, deinterleave_maps(jnp.asarray(plane)))
        yy, xx = np.mgrid[0:16, 0:16]
        par0 = ((yy + xx) % 2) == 0
        # coded samples are exact; the opposite-parity ones are interpolated
        assert (r0[:, par0] == m0[:, par0]).all()
        assert (r1[:, ~par0] == m1[:, ~par0]).all()
