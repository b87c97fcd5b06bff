"""Test harness configuration.

Tests run on CPU with 8 virtual devices so multi-chip sharding logic is
exercised without TPU hardware (the driver separately dry-runs the multi-chip
path; see __graft_entry__.py). Must set XLA flags before jax initializes.
"""

import os

# The environment pre-sets JAX_PLATFORMS=axon (the TPU tunnel); tests must
# override it unconditionally, not setdefault, or the whole suite runs
# single-filed against one remote TPU chip.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# Belt and braces: the axon sitecustomize registers the TPU plugin before
# conftest runs, so the env var alone may be read too early to stick.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
# Persistent compile cache: CPU test-compile here is slow (multi-second per
# jit); cache across runs keeps the suite fast.
jax.config.update("jax_compilation_cache_dir", "/tmp/gsrast_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return jax.random.PRNGKey(0)
