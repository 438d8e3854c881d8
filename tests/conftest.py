"""Test harness: run everything on a virtual 8-device CPU mesh.

Per SURVEY.md §4 — multi-host/tile-sharding behavior is tested with
``xla_force_host_platform_device_count`` so no pod is needed. Must set env
vars before jax initializes a backend.
"""

import os

# Force CPU: the session env may export JAX_PLATFORMS=axon (single real TPU
# behind a tunnel), and the axon sitecustomize force-sets
# jax_platforms="axon,cpu" in every interpreter — so the env var alone is
# not enough; we must update the jax config after import.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture()
def rng():
    # function-scoped: every test draws from a fresh deterministic stream,
    # so results don't depend on test execution order
    return np.random.default_rng(42)
