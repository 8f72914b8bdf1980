"""Test configuration.

All tests run on CPU with an 8-device virtual topology so that multi-chip
sharding (DP/TP mesh axes) is exercised without TPU hardware — the idiomatic
JAX answer to "test multi-node without a cluster" (SURVEY.md §4).

Note: the host environment pre-imports jax with a TPU platform plugin via
PYTHONPATH sitecustomize, so env vars are too late; jax.config.update is the
reliable override (it works any time before backend initialization).
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
try:
    jax.config.update("jax_num_cpu_devices", 8)
except Exception:
    pass  # XLA_FLAGS fallback above covers older jax

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def pytest_report_header(config):
    return f"jax devices: {jax.devices()}"
