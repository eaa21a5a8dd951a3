"""Test configuration: run everything on a virtual 8-device CPU mesh.

Must set the env vars before jax initializes (SURVEY.md §4e: multi-device
tests on CPU via --xla_force_host_platform_device_count, a capability the
CUDA reference never had).
"""

import os

# Force CPU: the environment pins JAX_PLATFORMS=axon (TPU tunnel), which is
# slow and single-device; tests want the virtual 8-device CPU mesh.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The sandbox's sitecustomize registers an 'axon' PJRT plugin (TPU tunnel)
# in every interpreter. Even unused, its presence slows each XLA compile by
# ~20x (remote compile hooks). Drop the factory before first backend use.
try:
    from jax._src import xla_bridge as _xb

    _xb._backend_factories.pop("axon", None)
except Exception:
    pass

# jax was already imported by sitecustomize, so the env var alone is not
# enough — update the live config too.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)  # f64 available for golden tests

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
