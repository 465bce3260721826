"""Test environment: force JAX onto 8 virtual CPU devices so multi-chip
sharding paths compile and run without TPU hardware (the driver separately
dry-runs the multi-chip path; benches run on the real chip).

Must run before any jax import: the host may have JAX_PLATFORMS pre-set to a
real accelerator (e.g. 'axon'); tests always run on the virtual CPU mesh.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# The env var alone is not enough on hosts where an accelerator plugin (axon)
# pre-registers itself; the config update below reliably pins the backend.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
