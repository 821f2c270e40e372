"""Test harness: run everything on an 8-device virtual CPU mesh.

Multi-chip TPU hardware is not available in CI; sharding correctness is
validated on XLA's host platform with 8 virtual devices (SURVEY.md §4).

Environment subtlety: the container's `sitecustomize.py` (on PYTHONPATH at
/root/.axon_site) imports jax at interpreter startup — before pytest loads
this conftest — so setting XLA_FLAGS/JAX_PLATFORMS in os.environ here is
too late.  But the backends themselves are created lazily, so flipping the
jax *config* still works, and `jax_num_cpu_devices` replaces the
`--xla_force_host_platform_device_count` flag.
"""

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_default_matmul_precision", "highest")

assert len(jax.devices()) == 8, (
    f"expected 8 virtual CPU devices, got {jax.devices()}")
