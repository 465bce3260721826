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
