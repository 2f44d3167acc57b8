"""True multi-process (DCN-tier) correctness: 2 real OS processes.

The single-process 8-device dryrun proves the ICI-tier SPMD program; this
test proves the DCN tier the reference's dormant DistributedSampler
(anomaly/lib/utils/data/distributed.py:7) was meant for: two processes
federated via ``jax.distributed.initialize`` (CPU backend, 4 virtual
devices each, gloo collectives) run the sharded anomaly train step over
per-host ``TrainPipeline`` input shards and an 8-device global mesh, then
orbax-save/restore the state across the process boundary.

Asserts: both processes see 8 global devices, their per-step losses and
final parameter digests are IDENTICAL (the SPMD program is replicated-
consistent), and the orbax multi-host roundtrip is exact.
"""

import json
import os
import socket
import subprocess
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
from make_synthetic_data import make_streethazards  # noqa: E402

pytestmark = pytest.mark.e2e

WORKER = os.path.join(os.path.dirname(__file__), "_mp_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _run_workers(root, outdir, port, timeout=1500):
    """Spawn both workers; returns per-worker (returncode, log_tail)."""
    env = dict(os.environ)
    # the worker overrides platform/devices via jax.config itself; drop any
    # conflicting XLA_FLAGS the parent test session may have set
    env.pop("XLA_FLAGS", None)

    # log to FILES, not pipes: with PIPE, a worker that fills its ~64KB
    # stdout buffer blocks in write() while its peer waits on a gloo
    # collective with it — a cross-process stall that burns the timeout
    logs = [open(os.path.join(outdir, f"worker_{pid}.log"), "wb")
            for pid in range(2)]
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, str(pid), "2", str(port),
             root, outdir],
            env=env, cwd=os.path.dirname(os.path.dirname(WORKER)),
            stdout=logs[pid], stderr=subprocess.STDOUT)
        for pid in range(2)
    ]
    try:
        for p in procs:
            p.wait(timeout=timeout)
    except subprocess.TimeoutExpired:
        for q in procs:
            q.kill()
        raise
    finally:
        for f in logs:
            f.close()
    out = []
    for pid, p in enumerate(procs):
        with open(os.path.join(outdir, f"worker_{pid}.log"),
                  errors="replace") as f:
            out.append((p.returncode, f.read()[-3000:]))
    return out


def test_two_process_train_step_and_orbax(tmp_path):
    root = make_streethazards(str(tmp_path / "sh"), n_train=8, n_val=2,
                              h=48, w=64)
    outdir = str(tmp_path / "out")
    os.makedirs(outdir)

    # one retry with a fresh port: the coordinator bind / gloo connect can
    # race with other machine activity (a real-network test, not numerics)
    for attempt in range(2):
        results_rc = _run_workers(root, outdir, _free_port())
        if all(rc == 0 for rc, _ in results_rc):
            break
        if attempt == 1:
            raise AssertionError(
                "workers failed twice:\n" +
                "\n".join(tail for _, tail in results_rc))

    results = []
    for pid in range(2):
        with open(os.path.join(outdir, f"result_{pid}.json")) as f:
            results.append(json.load(f))

    assert results[0]["n_global_devices"] == 8
    assert results[1]["n_global_devices"] == 8
    # identical training trajectory on both processes (replicated SPMD)
    assert results[0]["losses"] == results[1]["losses"]
    assert results[0]["digest"] == results[1]["digest"]
    # the loss moved (training actually happened)
    assert results[0]["losses"][0] != results[0]["losses"][-1]
    # orbax multi-host save/restore roundtripped exactly on both hosts
    assert results[0]["orbax_ok"] and results[1]["orbax_ok"]
