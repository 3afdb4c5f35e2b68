#!/usr/bin/env python
"""Round-start fixture probe: print each fixture table's physical parquet
column types + row counts, so schema/flavor drift between driver rounds is
caught before it breaks anything (the events `ts` column has shipped as
physical INT96, INT64 TIMESTAMP(NANOS), and timestamp[us] in different
rounds — see streaming/ingest.py::_events_ts_flavor).

Usage: python tools/probe_fixtures.py [sf_dir ...]
Defaults to /root/testdata/sf0.001 sf0.01 sf0.1.
No Spark needed — reads parquet footers with pyarrow only.
"""

from __future__ import annotations

import glob
import os
import sys

import pyarrow.parquet as pq

DEFAULT_DIRS = [f"/root/testdata/sf{s}" for s in ("0.001", "0.01", "0.1")]


def probe_file(path: str) -> tuple[int, dict[str, str]]:
    """(num_rows, {column: 'logical_type / physical_type'}) for one file."""
    md = pq.ParquetFile(path).metadata
    schema = md.schema
    cols = {}
    for i in range(len(schema)):
        col = schema.column(i)
        cols[col.name] = f"{col.logical_type} / {col.physical_type}"
    return md.num_rows, cols


def probe_table(path: str) -> None:
    """Print rows + per-column physical types for a file or directory."""
    files = (
        sorted(glob.glob(os.path.join(path, "*.parquet")))
        if os.path.isdir(path)
        else [path]
    )
    if not files:
        print(f"  (no parquet files under {path})")
        return
    total_rows = 0
    type_variants: dict[str, set[str]] = {}
    for f in files:
        rows, cols = probe_file(f)
        total_rows += rows
        for name, typ in cols.items():
            type_variants.setdefault(name, set()).add(typ)
    name = os.path.basename(path)
    print(f"  {name}: {total_rows} rows, {len(files)} file(s)")
    for col, typs in type_variants.items():
        marker = "  !! MIXED: " if len(typs) > 1 else ""
        print(f"    {col}: {marker}{' | '.join(sorted(typs))}")


def main(argv: list[str]) -> int:
    dirs = argv or [d for d in DEFAULT_DIRS if os.path.isdir(d)]
    for sf_dir in dirs:
        print(f"{sf_dir}:")
        entries = sorted(glob.glob(os.path.join(sf_dir, "*.parquet")))
        if not entries:
            print("  (empty)")
            continue
        for entry in entries:
            probe_table(entry)
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
