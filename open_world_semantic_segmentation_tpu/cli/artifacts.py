"""Artifact zoo tooling: list/validate directories of ``.owss`` exports.

Deployment-side companion to ``cli/export_model.py`` (no reference
equivalent — the torch reference ships raw ``.pth`` files and a README
table). Two subcommands:

- ``list DIR``: header-only scan (``core.export.read_meta``) — prints one
  JSON line per artifact (path, size, and the stamped metadata:
  format/owss_version/jax_version/model/input/quant/...). Cheap: never
  deserializes the StableHLO payload.
- ``check PATH [PATH...]``: full deserialization — verifies the payload
  parses, prints the artifact's actual calling convention (input avals)
  and lowering platforms, and flags artifacts whose platforms don't
  include the current backend.

Usage:
    python -m open_world_semantic_segmentation_tpu.cli.artifacts list zoo/
    python -m open_world_semantic_segmentation_tpu.cli.artifacts check zoo/m.owss
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


def check_artifact(path: str) -> dict:
    """Deserialize ``path`` and report its true calling convention."""
    import jax
    from jax import export as jex

    from ..core.export import MAGIC, read_meta

    meta = read_meta(path)
    with open(path, "rb") as f:
        f.read(len(MAGIC))
        f.readline()
        exported = jex.deserialize(f.read())
    backend = jax.default_backend()
    report = {
        "path": path,
        "meta": meta,
        "in_avals": [str(a) for a in exported.in_avals],
        "out_avals": [str(a) for a in exported.out_avals],
        "platforms": list(exported.platforms),
        "current_backend": backend,
        "runs_here": backend in exported.platforms,
    }
    return report


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(
        prog="owss-artifacts", description=__doc__,
        formatter_class=argparse.RawDescriptionHelpFormatter)
    sub = parser.add_subparsers(dest="cmd", required=True)
    p_list = sub.add_parser("list", help="header-only manifest scan")
    p_list.add_argument("root", help=".owss file or directory (recursive)")
    p_check = sub.add_parser("check", help="deserialize + verify")
    p_check.add_argument("paths", nargs="+")
    args = parser.parse_args(argv)

    rc = 0
    if args.cmd == "list":
        for row in list_artifacts(args.root):
            print(json.dumps(row))
            if "error" in row:
                rc = 1
    else:
        for p in args.paths:
            try:
                report = check_artifact(p)
            except Exception as e:  # loud per-file failure, keep going
                print(json.dumps({"path": p, "error": str(e)}))
                rc = 1
                continue
            print(json.dumps(report))
            if not report["runs_here"]:
                rc = 1
    return rc


if __name__ == "__main__":
    sys.exit(main())
