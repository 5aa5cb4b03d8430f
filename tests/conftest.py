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

# NOTE on the persistent compile cache: wiring enable_compile_cache() here
# cuts a warm fast-lane run 4:14 -> 2:19, but XLA:CPU AOT reload on this box
# logs machine-feature mismatches (+prefer-no-scatter/+prefer-no-gather) and
# was observed to perturb test_dp_scanned_epoch_matches_single_device by
# 4.4e-6 (atol 3e-6) — cache-loaded code is not bit-identical to fresh-JIT
# code.  Numerical-equivalence tests must run against fresh compiles, so the
# test lane deliberately does NOT enable the cache.


@pytest.fixture
def rng():
    return np.random.default_rng(8)
