"""Test configuration: force an 8-device virtual CPU backend.

Must run before jax initializes any backend.  This is the standard JAX
fake-backend pattern for testing multi-chip sharding without TPU hardware
(SURVEY.md section 4).
"""

import os

# force, don't setdefault: the environment's sitecustomize registers the
# tunneled-TPU ("axon") PJRT plugin for every interpreter and selects it via
# jax config, so the env var alone is NOT enough — override the config too.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

assert jax.devices()[0].platform == "cpu", jax.devices()
assert len(jax.devices()) == 8, jax.devices()

# Persistent compile cache (repo-local .jax_cache/cpu_<fingerprint>): the
# fast lane is compile-bound on this one-core box (~70% of its wall clock is
# XLA:CPU compiles of the same programs every run), so repeat runs drop from
# ~4-5 min to well under the 2-minute lane budget once the cache is warm.
from sept_tpu.cli.common import enable_compile_cache  # noqa: E402

enable_compile_cache()


@pytest.fixture
def rng():
    return np.random.default_rng(8)
