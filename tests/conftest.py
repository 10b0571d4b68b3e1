"""Test harness setup.

Tests run on CPU with 8 virtual devices so that multi-chip sharding paths
compile and execute without TPU hardware (the driver separately dry-runs the
multi-chip path). Must run before the first `import jax` anywhere.
"""

import os

# Force CPU: the session environment exports JAX_PLATFORMS=axon (remote TPU
# tunnel), which would turn every test op into a network round trip.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
# NOTE: the persistent compilation cache is intentionally NOT enabled:
# cache-loaded executables run pathologically slowly on the axon TPU
# platform and XLA:CPU AOT reloads warn about machine-feature mismatches.

# The axon TPU plugin force-registers itself regardless of JAX_PLATFORMS;
# only the config knob reliably pins tests to local CPU.
import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(233)
