"""Multi-chip sharding tests on the 8-device virtual CPU mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from rabbit_transcoding_tpu.parallel.mesh import (
    make_mesh,
    make_sharded_transcode_step,
    stream_batch_sharding,
    transcode_compute_step,
)
from rabbit_transcoding_tpu.video.rbv import qstep_of


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) == 8, "conftest should provide 8 virtual devices"
    return make_mesh()


class TestMesh:
    def test_mesh_factorization(self, mesh):
        assert mesh.devices.size == 8
        assert mesh.axis_names == ("stream", "space")
        # balanced: 4x2 or 2x4
        assert sorted(mesh.devices.shape) == [2, 4]

    def test_prime_count_mesh(self):
        m = make_mesh(jax.devices()[:7])
        assert m.devices.shape == (7, 1)

    def test_sharded_step_matches_single_device(self, mesh):
        s_stream, s_space = mesh.devices.shape
        rng = np.random.default_rng(0)
        shape = (s_stream * 2, 4, s_space * 2, 2, 16, 16)
        coeffs = rng.integers(-40, 40, size=shape).astype(np.int32)
        qi, qo, mx = (jnp.float32(qstep_of(16)), jnp.float32(qstep_of(32)),
                      jnp.float32(1023.0))

        step = make_sharded_transcode_step(mesh)
        q2_sh, recon_sh, mse_sh = step(jnp.asarray(coeffs), qi, qo, mx)

        q2_ref, recon_ref, mse_ref = transcode_compute_step(
            jnp.asarray(coeffs), qi, qo, mx
        )
        np.testing.assert_array_equal(np.asarray(q2_sh), np.asarray(q2_ref))
        np.testing.assert_allclose(
            np.asarray(recon_sh), np.asarray(recon_ref), atol=1e-3
        )
        assert abs(float(mse_sh) - float(mse_ref)) < 1e-3

    def test_output_shardings_applied(self, mesh):
        s_stream, s_space = mesh.devices.shape
        rng = np.random.default_rng(1)
        shape = (s_stream, 2, s_space, 1, 16, 16)
        coeffs = jnp.asarray(rng.integers(-10, 10, size=shape).astype(np.int32))
        step = make_sharded_transcode_step(mesh)
        q2, recon, mse = step(
            coeffs, jnp.float32(qstep_of(20)), jnp.float32(qstep_of(30)),
            jnp.float32(255.0),
        )
        # coefficients stay sharded over (stream, space)
        assert len(q2.sharding.device_set) == 8
        # the global mse is fully replicated (the ICI collective happened)
        assert len(mse.sharding.device_set) == 8
        assert mse.sharding.is_fully_replicated

    def test_stream_batch_sharding_spec(self, mesh):
        sh = stream_batch_sharding(mesh)
        arr = jax.device_put(np.zeros((4, 2, 4, 8), np.float32), sh)
        assert len(arr.sharding.device_set) == 8


# ===========================================================================
# The PRODUCT multi-stream path: N payloads through one sharded device
# program, byte-identical to the sequential per-stream transcode.
# ===========================================================================
from rabbit_transcoding_tpu.core.image import Video
from rabbit_transcoding_tpu.parallel.multistream import transcode_payloads
from rabbit_transcoding_tpu.utils.enums import ColorFormat
from rabbit_transcoding_tpu.video import rbv
from rabbit_transcoding_tpu.video.rbv import RbvParams


def _payload(qp, f=4, h=64, w=96, mc=False, gop=2):
    planes = [
        (300 + 200 * np.sin(
            np.linalg.norm(np.mgrid[0:h, 0:w], axis=0) / 9 + i
        )).astype(np.uint16)
        for i in range(f)
    ]
    v = Video(w, h, 10, ColorFormat.YUV400, [np.stack(planes)])
    p, _ = rbv.encode(v, RbvParams(qp=qp, gop_size=gop, motion=mc))
    return p


class TestMultiStreamPayloads:
    def test_mixed_qps_bit_identical(self, mesh):
        # 3 streams does NOT divide the 4-wide stream axis: exercises padding
        pays = [_payload(16), _payload(20), _payload(24)]
        seq = [rbv.transcode_payload(p, 32) for p in pays]
        bat = transcode_payloads(pays, 32, mesh=mesh)
        assert all(a == b for a, b in zip(seq, bat))

    def test_motion_compensated_bit_identical(self, mesh):
        pays = [_payload(16, mc=True), _payload(22, mc=True)]
        seq = [rbv.transcode_payload(p, 34) for p in pays]
        bat = transcode_payloads(pays, 34, mesh=mesh)
        assert all(a == b for a, b in zip(seq, bat))

    def test_requant_mode_bit_identical(self, mesh):
        pays = [_payload(16), _payload(20)]
        seq = [rbv.requantize(p, 30) for p in pays]
        bat = transcode_payloads(pays, 30, mesh=mesh, mode="requant")
        assert all(a == b for a, b in zip(seq, bat))

    def test_rows_not_divisible_by_space_axis(self, mesh):
        # 48px -> 3 block rows: not divisible by the space axis (2 or 4)
        pays = [_payload(18, h=48, w=48), _payload(26, h=48, w=48)]
        seq = [rbv.transcode_payload(p, 36) for p in pays]
        bat = transcode_payloads(pays, 36, mesh=mesh)
        assert all(a == b for a, b in zip(seq, bat))

    def test_gop_restructure_bit_identical(self, mesh):
        pays = [_payload(16), _payload(20)]
        seq = [rbv.transcode_payload(p, 32, new_gop=1) for p in pays]
        bat = transcode_payloads(pays, 32, mesh=mesh, new_gop=1)
        assert all(a == b for a, b in zip(seq, bat))

    def test_per_stream_qps(self, mesh):
        pays = [_payload(16), _payload(16)]
        seq = [rbv.transcode_payload(pays[0], 28),
               rbv.transcode_payload(pays[1], 40)]
        bat = transcode_payloads(pays, [28, 40], mesh=mesh)
        assert all(a == b for a, b in zip(seq, bat))

    def test_lossless_matches_sequential(self, mesh):
        # lossless inputs re-encode to the target QP exactly like the
        # sequential rbv.transcode_payload (no silent passthrough)
        occ = (np.arange(4 * 32 * 32).reshape(4, 32, 32) % 7 == 0).astype(
            np.uint8
        )
        v = Video(32, 32, 8, ColorFormat.YUV400, [occ])
        p, _ = rbv.encode(v, RbvParams(lossless=True))
        seq = rbv.transcode_payload(p, 32)
        assert transcode_payloads([p, p], 32, mesh=mesh) == [seq, seq]

    def test_mixed_shapes_grouped(self, mesh):
        # incompatible shapes form separate groups, all still correct
        pays = [_payload(16), _payload(20, h=32, w=32), _payload(24)]
        seq = [rbv.transcode_payload(p, 30) for p in pays]
        bat = transcode_payloads(pays, 30, mesh=mesh)
        assert all(a == b for a, b in zip(seq, bat))


class TestMultiStreamEdgeCases:
    """MultiStreamTranscoder must stay byte-identical to the sequential
    Transcoder for map-stream and lossless inputs too."""

    def _stream(self, **enc_kw):
        import numpy as np
        import sys, os
        sys.path.insert(0, os.path.dirname(__file__))
        from test_e2e_codec import make_sphere_cloud

        from rabbit_transcoding_tpu.bitstream import V3CWriter
        from rabbit_transcoding_tpu.core.gof import GroupOfFrames
        from rabbit_transcoding_tpu.encoder.encoder import Encoder
        from rabbit_transcoding_tpu.encoder.params import EncoderParameters

        base = dict(
            minimumImageWidth=256, minimumImageHeight=64,
            geometryQP=12, attributeQP=20, occupancyPrecision=2,
            flagGeometrySmoothing=False, frameCount=1, groupOfFramesSize=1,
        )
        base.update(enc_kw)
        src = make_sphere_cloud(seed=7)
        ctx, _ = Encoder(EncoderParameters(**base)).encode(
            GroupOfFrames([src])
        )
        return V3CWriter().write(V3CWriter().encode(ctx))

    def _compare(self, data):
        from rabbit_transcoding_tpu.bitstream import V3CReader, V3CWriter
        from rabbit_transcoding_tpu.transcoder.multistream import (
            MultiStreamTranscoder,
        )
        from rabbit_transcoding_tpu.transcoder.params import (
            TranscoderParameters,
        )
        from rabbit_transcoding_tpu.transcoder.transcoder import Transcoder

        params = TranscoderParameters(geometryQP=28, attributeQP=36)
        seq = []
        for _ in range(2):
            ctx = V3CReader().decode(V3CReader().read(data)[0])
            Transcoder(params).transcode(ctx)
            seq.append(V3CWriter().write(V3CWriter().encode(ctx)))
        ctxs = [
            V3CReader().decode(V3CReader().read(data)[0]) for _ in range(2)
        ]
        MultiStreamTranscoder(params).transcode_many(ctxs)
        batched = [
            V3CWriter().write(V3CWriter().encode(c)) for c in ctxs
        ]
        assert batched == seq

    def test_map_stream_inputs(self):
        self._compare(self._stream(
            multipleStreams=True, absoluteD1=False, absoluteT1=False,
        ))

    def test_lossless_inputs(self):
        self._compare(self._stream(
            losslessGeo=True, losslessAttribute=True, attributeVideo444=True,
            enhancedOccupancyMapCode=True,
        ))
