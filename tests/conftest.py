"""Test harness config: run JAX on CPU with 8 virtual devices.

This is the standard JAX way to exercise multi-chip sharding logic without
real hardware (the driver separately dry-runs the multi-chip path).

Note: this environment's sitecustomize registers a TPU ('axon') backend at
interpreter start and latches JAX_PLATFORMS before conftest runs, so the
env var alone is NOT enough — jax.config must be updated explicitly.
XLA_FLAGS is still read lazily when the CPU client is first created.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

assert jax.devices()[0].platform == "cpu", "tests must run on the CPU backend"
assert len(jax.devices()) == 8, "tests expect 8 virtual CPU devices"

import gc  # noqa: E402

import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Drop compiled executables between test modules.

    A single-process run of the full suite accumulates hundreds of live
    XLA:CPU executables; on this jaxlib that intermittently crashes the
    process (SIGSEGV/SIGABRT inside backend compile or executable
    serialization) somewhere in the compile-heaviest stretch, while the
    same tests pass when the module runs alone. Bounding accumulation at
    the module boundary keeps the suite at the solo-run profile; the
    recompile cost is small because cross-module executable reuse is
    rare (fixtures and render configs are module-local)."""
    yield
    jax.clear_caches()
    gc.collect()
