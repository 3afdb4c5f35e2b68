"""Declarative expectations (operators/expect.py): cross-engine value
equality, per-kind violation semantics, the one-aggregate-per-table
plan shape, and spec validation."""

import duckdb
import pytest

from vector_search_test_spark.io import load_table
from vector_search_test_spark.operators.expect import (
    expectations_report,
    expectations_report_sql,
)


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


CHECKS = [
    {"name": "u", "table": "t", "kind": "unique", "col": "k"},
    {"name": "nn", "table": "t", "kind": "not_null", "col": "v"},
    {"name": "rg", "table": "t", "kind": "range", "col": "v",
     "lo": 0, "hi": 10},
    {"name": "acc", "table": "t", "kind": "accepted", "col": "s",
     "values": ["a", "b"]},
    {"name": "fk", "table": "t", "kind": "fk", "col": "p",
     "ref_table": "ref", "ref_col": "rk"},
]


def _toy(spark):
    t = spark.createDataFrame(
        [
            (1, 5, "a", 10),
            (1, None, "b", 20),     # dup key, null v
            (2, 99, "zzz", None),   # v out of range, s not accepted,
                                    # NULL fk child (passes fk)
            (3, -1, "a", 77),       # v out of range, orphan fk
        ],
        "k long, v long, s string, p long",
    )
    ref = spark.createDataFrame([(10,), (20,)], "rk long")
    return {"t": t, "ref": ref}


def test_expect_semantics_per_kind(spark):
    rep = {
        r["check_name"]: (r["n_rows"], r["n_violations"], r["passed"])
        for r in expectations_report(_toy(spark), CHECKS).collect()
    }
    assert rep["u"] == (4, 1, False)    # one surplus duplicate of k=1
    assert rep["nn"] == (4, 1, False)   # one NULL v
    assert rep["rg"] == (4, 3, False)   # 99, -1, and the NULL
    assert rep["acc"] == (4, 1, False)  # "zzz"
    assert rep["fk"] == (4, 1, False)   # 77 orphan; NULL child passes


def test_expect_matches_duckdb_fixtures(spark, sf_dir):
    checks = [
        {"name": "ok_unique", "table": "orders", "kind": "unique",
         "col": "o_orderkey"},
        {"name": "st_acc", "table": "orders", "kind": "accepted",
         "col": "o_orderstatus", "values": ["O", "F"]},
        {"name": "price_rg", "table": "orders", "kind": "range",
         "col": "o_totalprice", "lo": 0.0, "hi": 250000.0},
        {"name": "fk_cust", "table": "orders", "kind": "fk",
         "col": "o_custkey", "ref_table": "customer",
         "ref_col": "c_custkey"},
    ]
    tables = {
        t: load_table(spark, sf_dir, t) for t in ("orders", "customer")
    }
    got = sorted(
        tuple(str(x) for x in r)
        for r in expectations_report(tables, checks).collect()
    )
    con = duckdb.connect()
    for t in tables:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')"
        )
    want = sorted(
        tuple(str(x) for x in r)
        for r in con.execute(expectations_report_sql(checks)).fetchall()
    )
    assert got == want and len(got) == 4
    # the battery must carry real violations, not a trivially-green run
    assert any(r[5] == "False" for r in got)
    assert any(r[5] == "True" for r in got)


def test_expect_scalar_checks_share_one_scan(spark, sf_dir):
    """The scale claim: all scalar checks against one table compile to
    ONE aggregate over ONE scan — the plan holds exactly one parquet
    scan of orders no matter how many scalar checks pile on."""
    checks = [
        {"name": f"c{i}", "table": "orders", "kind": "range",
         "col": "o_totalprice", "lo": 0.0, "hi": float(10 ** i)}
        for i in range(6)
    ] + [
        {"name": "nn", "table": "orders", "kind": "not_null",
         "col": "o_custkey"},
        {"name": "uq", "table": "orders", "kind": "unique",
         "col": "o_orderkey"},
    ]
    tables = {"orders": load_table(spark, sf_dir, "orders")}
    plan = _plan(expectations_report(tables, checks))
    assert plan.count("FileScan parquet") == 1


def test_expect_rejects_bad_specs(spark):
    tables = _toy(spark)
    with pytest.raises(ValueError):
        expectations_report(tables, [])
    with pytest.raises(ValueError):
        expectations_report(
            tables,
            [{"name": "x", "table": "nope", "kind": "not_null", "col": "v"}],
        )
    with pytest.raises(ValueError):
        expectations_report(
            tables,
            [{"name": "x", "table": "t", "kind": "wat", "col": "v"}],
        )
    with pytest.raises(ValueError):
        expectations_report(
            tables,
            [
                {"name": "x", "table": "t", "kind": "not_null", "col": "v"},
                {"name": "x", "table": "t", "kind": "unique", "col": "k"},
            ],
        )
