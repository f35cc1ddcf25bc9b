"""Test harness: force an 8-device virtual CPU mesh (SURVEY.md §4 distributed
test strategy) so sharding tests run without TPU hardware.

Note: this environment's sitecustomize registers a TPU backend and calls
``jax.config.update("jax_platforms", "axon,cpu")`` at interpreter start, which
overrides JAX_PLATFORMS from the environment — so we must override the config
(not just the env var) back to CPU and clear any initialized backends.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
try:
    from jax._src import xla_bridge as _xb

    if _xb.backends_are_initialized():
        from jax.extend.backend import clear_backends

        clear_backends()
except Exception:
    pass

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(1234)
