"""Test configuration: run the whole suite on a virtual 8-device CPU mesh.

Must set env vars *before* jax initializes so sharding tests can build an
8-device ``jax.sharding.Mesh`` without TPU hardware.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

# The environment ships an 'axon' TPU-tunnel platform plugin that re-inserts
# itself into JAX_PLATFORMS; forcing the config after import keeps the test
# suite on the virtual 8-device CPU mesh (eager ops over the tunnel are
# ~1000x slower and tests must not depend on TPU availability).
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")
assert len(jax.devices()) == 8, jax.devices()
