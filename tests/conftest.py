"""Test environment: force CPU with 8 virtual devices (multi-chip sharding
tests run on a host-platform mesh, per SURVEY.md §4) and enable float64 so
the FEM oracle comparisons are exact-precision.

NOTE: this container's sitecustomize imports jax at interpreter startup
(with JAX_PLATFORMS=axon pointing at a remote TPU), so env vars are too
late here — the platform must be forced through jax.config, and XLA_FLAGS
(read at backend init, which hasn't happened yet) through os.environ."""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import pytest  # noqa: E402

REFERENCE_MESH = "/root/reference/Mesh_info/beam_coarse.vtk"


@pytest.fixture(scope="session")
def reference_mesh_path():
    if not os.path.exists(REFERENCE_MESH):
        pytest.skip("reference mesh not available")
    return REFERENCE_MESH
