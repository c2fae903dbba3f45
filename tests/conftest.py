"""Test configuration: force an 8-device virtual CPU mesh.

Multi-chip logic is tested without a pod via JAX's standard fake-multi-device
mechanism (SURVEY.md section 4): 8 virtual CPU devices stand in for 8 TPU chips.

Note: this environment's sitecustomize registers the axon TPU plugin and pins
``JAX_PLATFORMS=axon``, so the env var alone is not enough -- we also override
the config flag after import (which wins over the env var at backend init).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Bound accumulated XLA-CPU compiler state across the suite.

    A rare LLVM-side segfault has been observed (twice) deep into full-suite
    runs, always during a pjit compile and never reproducible in isolation
    or in module subsets; dropping live compiled programs between modules
    keeps the CPU backend's state small at a modest recompile cost (each
    module overwhelmingly compiles its own shapes anyway).
    """
    yield
    jax.clear_caches()
