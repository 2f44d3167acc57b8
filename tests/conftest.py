"""Test configuration: run all tests on a virtual 8-device CPU mesh.

Multi-chip sharding is validated without TPU hardware via
``xla_force_host_platform_device_count`` (the TPU answer to "multi-node
without a real cluster" — see SURVEY.md §4).
"""

import os
import sys

# The harness environment presets JAX_PLATFORMS=axon (the TPU tunnel) AND
# pre-imports jax via an interpreter startup hook, so setting env vars here
# is too late for the env-var path. jax.config.update still works as long as
# no backend has been initialized — force CPU through it, and set the fake
# device count before first backend init.
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["JAX_PLATFORM_NAME"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    flags += " --xla_force_host_platform_device_count=8"
if "collective_call_terminate" not in flags:
    # 8 virtual devices timeslice one core: the CPU backend's rendezvous
    # deadlock heuristic (warn 20 s / kill 40 s) fires spuriously when a
    # shard's pre-collective work straggles. Raise the detection
    # thresholds — they are not correctness knobs. Round 5: 600 s was
    # STILL hit on a slower host (the golden-convergence train loop
    # enqueues a 50-step async window; with ~8 s/step and a multi-minute
    # straggle the terminate fired -> the suite died with a bare
    # 'Fatal Python error: Aborted' whose reason pytest capture
    # swallowed). A genuine deadlock is caught by the suite timeout
    # instead; keep the kill threshold far above any legal straggle.
    flags += (" --xla_cpu_collective_call_warn_stuck_timeout_seconds=600"
              " --xla_cpu_collective_call_terminate_timeout_seconds=7200")
os.environ["XLA_FLAGS"] = flags.strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from open_world_semantic_segmentation_tpu.core.cache import enable  # noqa: E402

enable()
