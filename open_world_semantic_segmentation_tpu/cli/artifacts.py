"""Artifact zoo tooling: list/validate directories of ``.owss`` exports.

Deployment-side companion to ``cli/export_model.py`` (no reference
equivalent — the torch reference ships raw ``.pth`` files and a README
table). Two subcommands:

- ``list DIR``: header-only scan (``core.export.read_meta``) — prints one
  JSON line per artifact (path, size, and the stamped metadata:
  format/owss_version/jax_version/model/input/quant/...). Cheap: never
  deserializes the StableHLO payload.
- ``check PATH [PATH...]``: full deserialization — verifies the payload
  parses, validates the metadata schema for the artifact's kind
  (plain / pyramid / NPM, the three shapes ``cli/export_model.py``
  emits), prints the artifact's actual calling convention (input avals)
  and lowering platforms, and flags artifacts whose platforms don't
  include the current backend. With ``--run`` it also EXECUTES the
  artifact on zeros at its declared input spec and checks the outputs
  are finite — the strongest offline validation a zoo can get.

Usage:
    python -m open_world_semantic_segmentation_tpu.cli.artifacts list zoo/
    python -m open_world_semantic_segmentation_tpu.cli.artifacts check zoo/m.owss --run
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys


def list_artifacts(root: str) -> list:
    """Header-scan ``root`` (a directory or a single file) -> list of
    manifest rows. Non-artifact files are skipped; unreadable artifacts
    become rows with an ``error`` field (loud, not silent)."""
    from ..core.export import read_meta

    if os.path.isdir(root):
        paths = sorted(glob.glob(os.path.join(root, "**", "*.owss"),
                                 recursive=True))
    else:
        paths = [root]
    rows = []
    for p in paths:
        row = {"path": p, "bytes": os.path.getsize(p)}
        try:
            row.update(read_meta(p))
        except (ValueError, json.JSONDecodeError) as e:
            row["error"] = str(e)
        rows.append(row)
    return rows


def _kind(meta: dict) -> str:
    if meta.get("npm"):
        return "npm"
    if meta.get("pyramid"):
        return "pyramid"
    return "plain"


def validate_meta(meta: dict) -> list:
    """Schema problems for the three artifact kinds export_model emits."""
    problems = []
    if meta.get("format") != 1:
        problems.append(f"unknown format {meta.get('format')!r}")
    for key in ("owss_version", "jax_version", "model", "input"):
        if key not in meta:
            problems.append(f"missing meta key {key!r}")
    kind = _kind(meta)
    if kind == "npm":
        for key in ("prototype_dim", "novel_id", "dis_threshold"):
            if key not in meta:
                problems.append(f"npm artifact missing {key!r}")
    elif "method" not in meta:
        problems.append("missing meta key 'method'")
    if kind == "pyramid" and not (
            isinstance(meta.get("input"), list) and meta["input"]
            and isinstance(meta["input"][0], list)):
        problems.append("pyramid 'input' must be a list of shapes")
    return problems


def _run_on_zeros(exported, meta: dict) -> list:
    """Execute on zeros at the declared input spec; non-finite or raising
    outputs are problems."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    spec, kind = meta.get("input"), _kind(meta)
    if kind == "pyramid":
        args = [jnp.zeros(s, jnp.float32) for s in spec]
    elif kind == "npm":
        args = [jnp.zeros(spec, jnp.float32),
                jnp.zeros((meta["prototype_dim"],), jnp.float32)]
    else:
        args = [jnp.zeros(spec, jnp.float32)]
    try:
        out = jax.jit(exported.call)(*args)
    except Exception as e:
        return [f"execution failed: {type(e).__name__}: {e}"]
    for leaf in jax.tree_util.tree_leaves(out):
        if not bool(np.all(np.isfinite(np.asarray(leaf, np.float32)))):
            return ["non-finite output on zero input"]
    return []


def check_artifact(path: str, run: bool = False) -> dict:
    """Deserialize ``path``, validate its metadata schema, report its true
    calling convention; ``run=True`` also executes it on zero inputs."""
    import jax
    from jax import export as jex

    from ..core.export import MAGIC, read_meta

    meta = read_meta(path)
    with open(path, "rb") as f:
        f.read(len(MAGIC))
        f.readline()
        exported = jex.deserialize(f.read())
    backend = jax.default_backend()
    problems = validate_meta(meta)
    report = {
        "path": path,
        "meta": meta,
        "in_avals": [str(a) for a in exported.in_avals],
        "out_avals": [str(a) for a in exported.out_avals],
        "platforms": list(exported.platforms),
        "current_backend": backend,
        "runs_here": backend in exported.platforms,
    }
    if run and not problems and report["runs_here"]:
        problems += _run_on_zeros(exported, meta)
        report["ran_on_zeros"] = not problems
    report["problems"] = problems
    report["valid"] = not problems
    return report


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(
        prog="owss-artifacts", description=__doc__,
        formatter_class=argparse.RawDescriptionHelpFormatter)
    sub = parser.add_subparsers(dest="cmd", required=True)
    p_list = sub.add_parser("list", help="header-only manifest scan")
    p_list.add_argument("root", help=".owss file or directory (recursive)")
    p_check = sub.add_parser("check", help="deserialize + verify")
    p_check.add_argument("paths", nargs="+",
                         help=".owss files and/or directories (recursive)")
    p_check.add_argument("--run", action="store_true",
                         help="also execute each artifact on zero inputs "
                              "and verify finite outputs")
    args = parser.parse_args(argv)

    rc = 0
    if args.cmd == "list":
        for row in list_artifacts(args.root):
            print(json.dumps(row))
            if "error" in row:
                rc = 1
    else:
        paths = []
        for p in args.paths:
            paths += [r["path"] for r in list_artifacts(p)] \
                if os.path.isdir(p) else [p]
        for p in paths:
            try:
                report = check_artifact(p, run=args.run)
            except Exception as e:  # loud per-file failure, keep going
                print(json.dumps({"path": p, "error": str(e)}))
                rc = 1
                continue
            print(json.dumps(report))
            if not report["runs_here"] or not report["valid"]:
                rc = 1
    return rc


if __name__ == "__main__":
    sys.exit(main())
