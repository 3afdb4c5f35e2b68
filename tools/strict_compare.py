"""Bit-exact Spark-vs-DuckDB comparison — a STRICTER gate than the
driver's value hash.

tools/check_oracle.py normalizes floats to 9 significant digits before
comparing; this tool compares float columns by their raw IEEE-754 bit
patterns instead. Entries engineered for hash stability (exact decimal
sums cast back to double, integer-domain percentiles) must produce the
IDENTICAL double on both engines — if they do, no downstream hasher can
ever disagree, whatever its rounding.

Usage: python tools/strict_compare.py [query ...]   # default: all
       ORACLE_SF_DIR=/root/testdata/sf0.01 (default)
"""

from __future__ import annotations

import os
import sys

import duckdb
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def main() -> int:
    import __spark_entry__ as entry
    from vector_search_test_spark.session import get_session

    sf_dir = os.environ.get("ORACLE_SF_DIR", "/root/testdata/sf0.01")
    names = sys.argv[1:] or list(entry.oracle_sql())
    spark = get_session("strict-compare", shuffle_partitions=16)

    def _connect():
        c = duckdb.connect()
        # same allocator cap as check_oracle.py (r17): DuckDB's default
        # memory_limit assumes it owns the box; alongside the Spark
        # driver JVM a heavy twin can malloc-fail late in a full walk
        # instead of spilling
        c.execute("SET memory_limit='48GB'")
        c.execute("PRAGMA temp_directory='/tmp/duckdb_oracle_spill'")
        for t in TABLES:
            c.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
        return c

    con = _connect()
    oracles = entry.oracle_sql()
    queries = entry.queries()
    failed = []
    for qi, name in enumerate(names):
        # one long-lived DuckDB process walking the whole suite OOMs
        # its allocator around ~100 entries (r13 finding); a fresh
        # connection every 25 releases whatever the old one retains
        if qi and qi % 25 == 0:
            con.close()
            con = _connect()
        if name not in oracles:
            print(f"  {name}: skipped (no oracle)")
            continue
        sdf = queries[name](spark, sf_dir).toPandas()
        odf = con.sql(oracles[name]).df()
        cols = sorted(sdf.columns)
        if cols != sorted(odf.columns):
            print(f"  {name}: COLUMN MISMATCH {cols} vs {sorted(odf.columns)}")
            failed.append(name)
            continue
        # DATE columns arrive asymmetrically: Spark's toPandas yields
        # datetime.date objects, duckdb's .df() a midnight
        # datetime64[us] — equal values, unequal types. Canonicalize
        # the datetime64 side to dates when the other side holds dates
        # (true TIMESTAMP columns are datetime64 on BOTH sides and are
        # untouched).
        import datetime as _dt

        def _is_date_obj(s):
            # probe the first NON-NULL value (r13 ADVICE): a date column
            # whose row 0 is NULL/NaT would otherwise skip conversion
            # and report a spurious dtype mismatch
            if s.dtype != object:
                return False
            nn = s.dropna()
            return (
                len(nn) > 0
                and isinstance(nn.iloc[0], _dt.date)
                and not isinstance(nn.iloc[0], _dt.datetime)
            )

        for c in cols:
            if _is_date_obj(sdf[c]) and str(odf[c].dtype).startswith(
                "datetime64"
            ):
                odf[c] = odf[c].dt.date
            elif _is_date_obj(odf[c]) and str(sdf[c].dtype).startswith(
                "datetime64"
            ):
                sdf[c] = sdf[c].dt.date
        sdf = sdf[cols].sort_values(by=cols, ignore_index=True)
        odf = odf[cols].sort_values(by=cols, ignore_index=True)
        if len(sdf) != len(odf):
            print(f"  {name}: ROWCOUNT {len(sdf)} vs {len(odf)}")
            failed.append(name)
            continue
        bad = []
        for c in cols:
            a, b = sdf[c].values, odf[c].values
            if a.dtype.kind == "f" or b.dtype.kind == "f":
                av = np.asarray(a, dtype="float64")
                bv = np.asarray(b, dtype="float64")
                # NaN-safe bit comparison; NULLs arrive as NaN on both sides
                same = np.array_equal(av.view("int64"), bv.view("int64"))
            else:
                same = list(a) == list(b)
            if not same:
                bad.append(c)
        if bad:
            print(f"  {name}: BIT-MISMATCH in {bad}")
            failed.append(name)
        else:
            print(f"  {name}: BITEXACT ({len(sdf)} rows)")
    if failed:
        print(f"FAILED: {failed}")
        return 1
    print("all compared queries are bit-exact")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
