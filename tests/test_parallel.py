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


def _payload(qp, f=4, h=64, w=96, mc=False, gop=2, intra=False):
    planes = [
        (300 + 200 * np.sin(
            np.linalg.norm(np.mgrid[0:h, 0:w], axis=0) / 9 + i
        )).astype(np.uint16)
        for i in range(f)
    ]
    v = Video(w, h, 10, ColorFormat.YUV400, [np.stack(planes)])
    p, _ = rbv.encode(v, RbvParams(qp=qp, gop_size=gop, motion=mc,
                                   intra=intra))
    return p


class TestMultiStreamPayloads:
    def test_mixed_qps_bit_identical(self, mesh):
        # 3 streams does NOT divide the 4-wide stream axis: exercises padding
        pays = [_payload(16), _payload(20), _payload(24)]
        seq = [rbv.transcode_payload(p, 32) for p in pays]
        bat = transcode_payloads(pays, 32, mesh=mesh)
        assert all(a == b for a, b in zip(seq, bat))

    def test_intra_bit_identical(self, mesh):
        pays = [_payload(16, intra=True), _payload(22, intra=True),
                _payload(20, intra=True, gop=1)]
        seq = [rbv.transcode_payload(p, 32) for p in pays]
        bat = transcode_payloads(pays, 32, mesh=mesh)
        assert all(a == b for a, b in zip(seq, bat))

    def test_intra_mc_bit_identical(self, mesh):
        pays = [_payload(16, mc=True, intra=True),
                _payload(22, mc=True, intra=True)]
        seq = [rbv.transcode_payload(p, 34) for p in pays]
        bat = transcode_payloads(pays, 34, mesh=mesh)
        assert all(a == b for a, b in zip(seq, bat))

    def test_intra_requant_bit_identical(self, mesh):
        pays = [_payload(18, intra=True), _payload(24, intra=True)]
        seq = [rbv.requantize(p, 30) for p in pays]
        bat = transcode_payloads(pays, 30, mesh=mesh, mode="requant")
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


# ===========================================================================
# Decoder reconstruction + metrics KNN sharded over the mesh
# (round-3 verdict task 5: multi-chip beyond the transcoder)
# ===========================================================================
from rabbit_transcoding_tpu.core.gof import GroupOfFrames
from rabbit_transcoding_tpu.core.pointset import PointSet
from rabbit_transcoding_tpu.decoder.decoder import Decoder, DecoderParameters
from rabbit_transcoding_tpu.encoder.encoder import Encoder
from rabbit_transcoding_tpu.encoder.params import EncoderParameters
from rabbit_transcoding_tpu.metrics.metrics import (
    MetricsParams,
    compute_metrics,
    d1_psnr_sharded,
)
from rabbit_transcoding_tpu.parallel.pipeline import (
    make_sharded_nn_mse,
    sharded_reproject,
)


def _cloud(seed=0, n=12000, radius=40, center=64):
    rng = np.random.default_rng(seed)
    theta = np.arccos(1 - 2 * rng.uniform(0, 1, n))
    phi = rng.uniform(0, 2 * np.pi, n)
    pos = np.round(np.stack([
        center + radius * np.sin(theta) * np.cos(phi),
        center + radius * np.sin(theta) * np.sin(phi),
        center + radius * np.cos(theta),
    ], 1)).astype(np.int32)
    colors = np.clip(np.stack([
        128 + 100 * np.sin(pos[:, 0] / 10.0),
        128 + 100 * np.cos(pos[:, 1] / 10.0),
        128 + 60 * np.sin(pos[:, 2] / 7.0),
    ], 1), 0, 255).astype(np.uint8)
    return PointSet(positions=pos, colors=colors).remove_duplicates()


@pytest.fixture(scope="module")
def encoded_ctx():
    sources = GroupOfFrames([_cloud(seed=i) for i in range(2)])
    context, _ = Encoder(EncoderParameters(
        minimumImageWidth=256, minimumImageHeight=64,
        geometryQP=12, attributeQP=24, frameCount=2, groupOfFramesSize=2,
    )).encode(sources)
    return sources, context


class TestShardedDecode:
    def test_decoder_checksum_identity(self, mesh, encoded_ctx):
        """The SAME decode with reconstruction sharded over 8 devices
        (DecoderParameters.shardingMesh) produces checksum-identical
        clouds — frame-local math, only device placement changes."""
        _, context = encoded_ctx
        single = Decoder().decode(context)
        sharded = Decoder(DecoderParameters(shardingMesh=mesh)).decode(
            context
        )
        assert len(single) == len(sharded)
        for a, b in zip(single, sharded):
            assert a.compute_checksum() == b.compute_checksum()

    def test_sharded_reproject_frames_not_divisible(self, mesh):
        """Frame counts that don't divide the device count pad internally
        and still match the single-device result bitwise."""
        from rabbit_transcoding_tpu.core.patch import Patch
        from rabbit_transcoding_tpu.ops import reproject as repro_ops

        rng = np.random.default_rng(1)
        f, h, w = 5, 64, 64  # 5 frames on 8 devices
        patches = []
        for _ in range(f):
            p = Patch()
            p.u0, p.v0 = 0, 0
            p.size_u0, p.size_v0 = 4, 4
            p.u1, p.v1, p.d1 = 10, 20, 30
            p.normal_axis, p.tangent_axis, p.bitangent_axis = 0, 1, 2
            p.patch_orientation = 0
            p.projection_mode = 0
            p.occupancy_resolution = 16
            patches.append([p])
        table, counts = repro_ops.build_patch_table(patches, 4)
        occ = (rng.random((f, h, w)) < 0.5).astype(np.uint8)
        geo = rng.integers(0, 200, (f, h, w)).astype(np.int32)
        pts_s, val_s, b2p_s = sharded_reproject(
            mesh, geo, occ, table, counts, 16
        )
        pts_1, val_1, b2p_1 = repro_ops.reproject(
            jnp.asarray(geo), jnp.asarray(occ), jnp.asarray(table),
            jnp.asarray(counts), 16,
        )
        assert np.array_equal(np.asarray(pts_s), np.asarray(pts_1))
        assert np.array_equal(np.asarray(val_s), np.asarray(val_1))
        assert np.array_equal(np.asarray(b2p_s), np.asarray(b2p_1))


class TestShardedMetrics:
    def test_nn_mse_matches_kdtree(self, mesh):
        """The sharded grid-KNN reduction reproduces the exact NN MSE the
        host cKDTree computes (same distances, order-tolerant sum)."""
        from scipy.spatial import cKDTree

        rng = np.random.default_rng(2)
        refs = rng.integers(200, 800, (40000, 3)).astype(np.int32)
        queries = np.clip(
            refs[rng.choice(len(refs), 25000)]
            + rng.integers(-3, 4, (25000, 3)), 0, 1023,
        ).astype(np.int32)
        nn_mse = make_sharded_nn_mse(mesh, k_cell_bits=3, grid_dim=128,
                                     cap=64)
        sharded = nn_mse(queries, refs)
        d, _ = cKDTree(refs).query(queries, k=1)
        exact = float(np.mean(d ** 2))
        assert abs(sharded - exact) < 1e-4 * max(1.0, exact)

    def test_d1_psnr_sharded_matches_plain_d1(self, mesh, encoded_ctx):
        """d1_psnr_sharded on the decoded clouds lands within 0.2 dB of
        compute_metrics' D1 (same NN core; the gap is the equidistant-tie
        refinement documented in the docstring)."""
        sources, context = encoded_ctx
        clouds = Decoder().decode(context)
        psnr_sharded = d1_psnr_sharded(
            sources[0], clouds[0], mesh,
            MetricsParams(resolution=1023),
        )
        m = compute_metrics(sources[0], clouds[0],
                            MetricsParams(resolution=1023))
        assert abs(psnr_sharded - m.d1_psnr) < 0.2, (
            psnr_sharded, m.d1_psnr,
        )

    def test_unfound_raises(self, mesh):
        """Two far-apart clusters beyond the grid search radius: the
        reduction refuses to silently zero the misses."""
        a = np.zeros((512, 3), np.int32)
        b = np.full((512, 3), 900, np.int32)
        nn_mse = make_sharded_nn_mse(mesh, k_cell_bits=2, grid_dim=256)
        with pytest.raises(ValueError):
            nn_mse(a, b)
