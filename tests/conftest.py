"""Test configuration: force CPU with 8 virtual devices so sharding tests run
anywhere (the idiomatic TPU analog of a fake backend — see SURVEY.md §4).

Note: this environment pins JAX_PLATFORMS=axon via sitecustomize, so the env-var
route is not enough — we override through jax.config after import.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
