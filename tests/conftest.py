"""Test configuration: force an 8-device virtual CPU mesh before JAX initializes.

Multi-device sharding tests run on fake CPU devices
(XLA_FLAGS=--xla_force_host_platform_device_count=8), per the SURVEY.md test plan;
real-TPU execution is exercised by bench.py / the driver instead.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"  # the session env pins JAX_PLATFORMS=axon (TPU)
os.environ["DSS_TPU_NO_COMPILE_CACHE"] = "1"  # don't cache CPU AOT compiles
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

# The axon TPU sitecustomize calls jax.config.update("jax_platforms", "axon,cpu")
# at interpreter boot, which overrides the env var — force CPU back for tests.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
