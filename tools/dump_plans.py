"""Dump ``.explain("formatted")`` output for declared entries.

Round-16 deliverable support: writes ``plans/r16/<entry>_<tag>.txt`` for
each named entry (default tag ``before``), so optimization claims
("2 Exchange -> 1", "SortMergeJoin -> BroadcastHashJoin") are checkable
against committed artifacts without running Spark.

Usage:
    python tools/dump_plans.py --tag before entry1 entry2 ...
    python tools/dump_plans.py --tag after --round r16 entry1 ...

Entries whose result is built eagerly (multi-stage probes) still produce
the plan of the FINAL returned DataFrame — the part the noop sink times.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> int:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("entries", nargs="+", metavar="ENTRY")
    parser.add_argument("--tag", default="before")
    parser.add_argument("--round", dest="round_", default="r16")
    args = parser.parse_args()

    import __spark_entry__ as entrymod
    from vector_search_test_spark.session import get_session

    spark = get_session(app_name="dump-plans")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()
    unknown = [e for e in args.entries if e not in qs]
    if unknown:
        print(f"unknown entries: {unknown}", file=sys.stderr)
        return 1

    outdir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        args.round_,
    )
    os.makedirs(outdir, exist_ok=True)
    import contextlib
    import io

    for name in args.entries:
        df = qs[name](spark, SF_DIR)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        plan = buf.getvalue()
        path = os.path.join(outdir, f"{name}_{args.tag}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({len(plan)} bytes)")
        entrymod.reset_memos()
        spark.catalog.clearCache()
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
