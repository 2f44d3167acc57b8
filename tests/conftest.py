"""Test configuration: run all tests on a virtual 8-device CPU mesh.

Multi-chip sharding is validated without TPU hardware via
``xla_force_host_platform_device_count`` (the TPU answer to "multi-node
without a real cluster" — see SURVEY.md §4).
"""

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
