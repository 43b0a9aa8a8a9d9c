"""Test configuration.

Tests run on CPU with 8 virtual devices so multi-chip sharding paths
(tensorfft_tpu.parallel) execute real collectives without TPU hardware —
the TPU-era equivalent of the reference's (nonexistent) multi-GPU testing.
Environment must be set before jax imports.
"""
import os

# Force-set: the axon sitecustomize injects JAX_PLATFORMS=axon (real TPU via
# tunnel); tests must run on the host CPU with a virtual 8-device mesh.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import pytest  # noqa: E402


def pytest_addoption(parser):
    parser.addoption(
        "--full-conformance",
        action="store_true",
        default=False,
        help="run the full reference conformance sweep (N=256..2^20, 10 seeds)",
    )


@pytest.fixture
def full_conformance(request):
    return request.config.getoption("--full-conformance")
