"""Test configuration: run the suite on CPU with 8 virtual devices.

The multi-device tests exercise the same ``shard_map`` programs that run on a
real TPU slice ("multi-node testing without a cluster" — the TPU analog of the
reference's MPI oversubscription, see SURVEY.md §4).  float64 is enabled so
operator/solver kernels can be validated at full precision.
"""

import os

# The harness environment pins JAX_PLATFORMS=axon (remote TPU tunnel) and a
# sitecustomize imports jax before this file runs, so the env var alone is
# ignored — jax.config.update is required to retarget the backend.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
