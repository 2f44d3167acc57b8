"""The driver contract: bench.py prints ONE JSON line with the agreed keys."""

import json
import sys
import os
import pytest

pytestmark = pytest.mark.e2e

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def test_bench_json_contract(capsys, monkeypatch):
    import bench

    # bench.main setdefaults OWSS_RESIZE_IMPL=mxu process-wide; pre-set it
    # through monkeypatch so the leak is undone at teardown (later tests
    # must not inherit a different resize formulation)
    monkeypatch.setenv("OWSS_RESIZE_IMPL", "mxu")
    line = bench.main(arch_encoder="resnet18dilated", fc_dim=512,
                      pyramid=[(24, 32), (32, 40)], full_size=(48, 64),
                      n_imgs=2, n_iters=1)
    rec = json.loads(line)
    assert rec["metric"] == "streethazards_ood_eval"
    assert rec["unit"] == "imgs/sec/chip"
    assert rec["value"] > 0
    assert rec["vs_baseline"] > 0
    out_lines = [ln for ln in capsys.readouterr().out.strip().splitlines()
                 if ln.strip()]
    assert len(out_lines) == 1
    json.loads(out_lines[0])


def test_observability_trace_smoke(tmp_path):
    from open_world_semantic_segmentation_tpu.utils import (
        profile_trace, annotate)
    import jax.numpy as jnp

    out = str(tmp_path / "trace")
    with profile_trace(out):
        with annotate("work"):
            float(jnp.sum(jnp.ones((8, 8))))
    found = []
    for root, _, files in os.walk(out):
        found += files
    assert found  # profiler wrote trace artifacts
