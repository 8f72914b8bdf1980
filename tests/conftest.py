"""Test configuration.

All tests run on CPU with an 8-device virtual topology so that multi-chip
sharding (DP/TP mesh axes) is exercised without TPU hardware — the idiomatic
JAX answer to "test multi-node without a cluster" (SURVEY.md §4).

Env vars MUST be set before jax is imported anywhere.
"""

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
