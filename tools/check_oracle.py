"""Local replica of the driver's DuckDB-oracle comparison.

Runs each __spark_entry__.queries() entry on Spark and its oracle_sql() on
DuckDB at sf0.01, compares row count, column names, and order-insensitive
values (rows sorted by their string form, columns sorted by name).

Usage: python tools/check_oracle.py [query_name ...]
"""

from __future__ import annotations

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

import __spark_entry__ as entrymod
from vector_search_test_spark.io import TABLES
from vector_search_test_spark.session import get_session

SF_DIR = os.environ.get("ORACLE_SF_DIR", "/root/testdata/sf0.01")


def _norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return f"{v:.9g}"
    if isinstance(v, list):
        return "[" + ",".join(_norm(x) for x in v) + "]"
    return str(v)


def _canon(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = sorted(tuple(_norm(r[i]) for i in order) for r in rows)
    return [cols[i] for i in order], out


def main(names=None):
    # one reviewable line per entry (VERDICT r7 next-#5): silence the
    # benign WindowExec/streaming WARN wall and the stage progress bar
    # that otherwise bury the per-query OK lines
    spark = get_session(
        "oracle-check",
        shuffle_partitions=8,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    def _connect():
        c = duckdb.connect()
        # cap DuckDB's allocator: its default memory_limit (80% of RAM)
        # assumes it owns the box, but this process also carries the
        # Spark driver JVM and its Python workers — a full walk under
        # the default died at ~entry 138 with a system-level "bad
        # allocation" (r17). The cap must still clear the hungriest
        # single twin: pagerank_similarity's iterative CTE peaks past
        # 16 GB even at sf0.01 (measured — a 16 GB cap fails exactly
        # there), so 48 GB bounds DuckDB well under the box while
        # leaving it room; the spill dir catches what can spill.
        c.execute("SET memory_limit='48GB'")
        c.execute("PRAGMA temp_directory='/tmp/duckdb_oracle_spill'")
        for t in TABLES:
            c.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
            )
        return c

    con = _connect()
    qs = entrymod.queries()
    if names:
        unknown = set(names) - set(qs)
        if unknown:
            print(f"unknown query name(s): {sorted(unknown)}; known: {sorted(qs)}")
            sys.exit(2)
    oracles = entrymod.oracle_sql()
    failures = []
    ran = 0
    for name, fn in qs.items():
        if names and name not in names:
            continue
        # one long-lived DuckDB process walking the whole suite OOMs its
        # allocator somewhere past ~130 entries (r14 finding — the
        # strict_compare twin hit the same wall at ~100 in r13); a
        # fresh connection every 25 entries releases whatever the old
        # one retains
        ran += 1
        if ran % 25 == 0:
            con.close()
            con = _connect()
        sdf = fn(spark, SF_DIR)
        srows = sdf.collect()
        scols = sdf.columns
        if name not in oracles:
            print(f"  {name}: NO ORACLE (rows-only) -> {len(srows)} rows")
            continue
        dres = con.execute(oracles[name])
        dcols = [d[0] for d in dres.description]
        drows = dres.fetchall()
        sc, sv = _canon(scols, [tuple(r) for r in srows])
        dc, dv = _canon(dcols, drows)
        ok = True
        if sc != dc:
            print(f"  {name}: SCHEMA MISMATCH spark={sc} duck={dc}")
            ok = False
        elif len(sv) != len(dv):
            print(f"  {name}: ROWCOUNT MISMATCH spark={len(sv)} duck={len(dv)}")
            ok = False
        elif sv != dv:
            diffs = [(a, b) for a, b in zip(sv, dv) if a != b][:3]
            print(f"  {name}: VALUE MISMATCH ({sum(1 for a,b in zip(sv,dv) if a!=b)} rows) e.g. {diffs}")
            ok = False
        if ok:
            print(f"  {name}: OK ({len(sv)} rows)")
        else:
            failures.append(name)
    if failures:
        print(f"\nFAILED: {failures}")
        sys.exit(1)
    print("\nall queries match the oracle")


if __name__ == "__main__":
    main(set(sys.argv[1:]) or None)
