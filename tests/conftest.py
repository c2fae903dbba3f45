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
