"""Declarative data-quality expectations — the validation gate a
pipeline runs BEFORE training on (or publishing) a table (extension —
the reference has no validation surface; its only input check is the
'sentences' column contract, app.py:207-208).

The operator compiles a declarative check list (not-null, value range,
accepted values, key uniqueness, referential integrity) into the
MINIMUM number of passes: every scalar check against a table folds into
ONE conditional aggregate over ONE scan of that table — N checks never
cost N scans, the mistake naive validation scripts make at 100 TB — and
each referential check is one left join + the same single-pass
aggregate (the parent side reduced to its distinct keys first, which
the planner broadcasts when small). Output is one row per check:
(check_name, table_name, kind, n_rows, n_violations, passed) — a
dashboardable contract table the DuckDB oracle replays exactly.

Check semantics (each pinned in tests):
- not_null: a NULL in `col` is a violation.
- range: value outside [lo, hi] (inclusive) OR NULL is a violation
  (a range assertion on a nullable column that should admit NULLs
  belongs behind a separate not_null check — explicit beats implied).
- accepted: value outside `values` OR NULL is a violation.
- unique: violations = count(col) - count(DISTINCT col) over non-NULL
  values (the number of surplus duplicate rows).
- fk: a NON-NULL child value with no matching parent key is a
  violation; NULL children pass (SQL FK semantics — assert
  non-nullability separately).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SCALAR_KINDS = ("not_null", "range", "accepted", "unique")


def _scalar_violations(check: dict):
    kind = check["kind"]
    col = F.col(check["col"])
    if kind == "not_null":
        return F.sum(col.isNull().cast("long"))
    if kind == "range":
        lo, hi = check["lo"], check["hi"]
        bad = col.isNull() | (col < F.lit(lo)) | (col > F.lit(hi))
        return F.sum(bad.cast("long"))
    if kind == "accepted":
        bad = col.isNull() | ~col.isin(list(check["values"]))
        return F.sum(bad.cast("long"))
    if kind == "unique":
        return F.count(col) - F.count_distinct(col)
    raise ValueError(f"unknown scalar check kind {kind!r}")


def expectations_report(
    tables: dict[str, DataFrame], checks: list[dict]
) -> DataFrame:
    """Run every check and return one row per check. `tables` maps the
    names `checks` reference to DataFrames; each check dict carries
    (name, table, kind, col) plus kind-specific fields (lo/hi, values,
    ref_table/ref_col).

    Plan: scalar checks grouped by table — one conditional aggregate
    per table (single scan, map-side combined; `unique` rides the same
    aggregate via count_distinct), melted to long rows by an explode
    over literal structs. Each fk check is one left join of the child
    against the parent's distinct keys (broadcast when small) feeding
    one count/count aggregate. All branches union to the contract
    table; nothing is collected."""
    if not checks:
        raise ValueError("checks must be a non-empty list")
    names = [c["name"] for c in checks]
    if len(set(names)) != len(names):
        raise ValueError("check names must be unique")
    parts = []
    by_table: dict[str, list[dict]] = {}
    for c in checks:
        if c["table"] not in tables:
            raise ValueError(f"check {c['name']!r}: unknown table {c['table']!r}")
        if c["kind"] in _SCALAR_KINDS:
            by_table.setdefault(c["table"], []).append(c)
        elif c["kind"] != "fk":
            raise ValueError(f"unknown check kind {c['kind']!r}")
    for tname, tchecks in by_table.items():
        agg = tables[tname].agg(
            F.count(F.lit(1)).alias("__n"),
            *[
                _scalar_violations(c).cast("long").alias(f"__v{i}")
                for i, c in enumerate(tchecks)
            ],
        )
        rows = F.array(
            *[
                F.struct(
                    F.lit(c["name"]).alias("check_name"),
                    F.lit(c["kind"]).alias("kind"),
                    F.coalesce(F.col(f"__v{i}"), F.lit(0)).alias(
                        "n_violations"
                    ),
                )
                for i, c in enumerate(tchecks)
            ]
        )
        parts.append(
            agg.select(
                F.explode(rows).alias("c"), F.col("__n").alias("n_rows")
            ).select(
                F.col("c.check_name").alias("check_name"),
                F.lit(tname).alias("table_name"),
                F.col("c.kind").alias("kind"),
                F.col("n_rows").cast("long").alias("n_rows"),
                F.col("c.n_violations").alias("n_violations"),
            )
        )
    for c in checks:
        if c["kind"] != "fk":
            continue
        if c["ref_table"] not in tables:
            raise ValueError(
                f"check {c['name']!r}: unknown ref_table {c['ref_table']!r}"
            )
        child = tables[c["table"]].select(F.col(c["col"]).alias("__k"))
        parent = (
            tables[c["ref_table"]]
            .select(F.col(c["ref_col"]).alias("__k"))
            .distinct()
            .withColumn("__hit", F.lit(1))
        )
        agg = child.join(parent, "__k", "left").agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(
                (F.col("__k").isNotNull() & F.col("__hit").isNull()).cast(
                    "long"
                )
            ).alias("n_violations"),
        )
        parts.append(
            agg.select(
                F.lit(c["name"]).alias("check_name"),
                F.lit(c["table"]).alias("table_name"),
                F.lit("fk").alias("kind"),
                F.col("n_rows").cast("long").alias("n_rows"),
                F.coalesce(F.col("n_violations"), F.lit(0))
                .cast("long")
                .alias("n_violations"),
            )
        )
    out = reduce(DataFrame.unionByName, parts)
    return out.withColumn("passed", F.col("n_violations") == 0)


def _sql_literal(v) -> str:
    if isinstance(v, str):
        return "'" + v.replace("'", "''") + "'"
    return repr(v) if isinstance(v, float) else str(int(v))


def expectations_report_sql(checks: list[dict]) -> str:
    """DuckDB twin of `expectations_report`: one aggregate per check
    (the oracle optimizes for clarity, not scan count), identical
    violation semantics, UNION ALL'd."""
    parts = []
    for c in checks:
        name, table, kind = c["name"], c["table"], c["kind"]
        head = (
            f"SELECT '{name}' AS check_name, '{table}' AS table_name, "
            f"'{kind}' AS kind, count(*)::BIGINT AS n_rows"
        )
        if kind == "not_null":
            v = f"sum(CASE WHEN {c['col']} IS NULL THEN 1 ELSE 0 END)"
            parts.append(
                f"{head}, COALESCE({v}, 0)::BIGINT AS n_violations FROM {table}"
            )
        elif kind == "range":
            lo, hi = _sql_literal(c["lo"]), _sql_literal(c["hi"])
            v = (
                f"sum(CASE WHEN {c['col']} IS NULL OR {c['col']} < {lo} "
                f"OR {c['col']} > {hi} THEN 1 ELSE 0 END)"
            )
            parts.append(
                f"{head}, COALESCE({v}, 0)::BIGINT AS n_violations FROM {table}"
            )
        elif kind == "accepted":
            vals = ", ".join(_sql_literal(x) for x in c["values"])
            v = (
                f"sum(CASE WHEN {c['col']} IS NULL "
                f"OR {c['col']} NOT IN ({vals}) THEN 1 ELSE 0 END)"
            )
            parts.append(
                f"{head}, COALESCE({v}, 0)::BIGINT AS n_violations FROM {table}"
            )
        elif kind == "unique":
            v = f"(count({c['col']}) - count(DISTINCT {c['col']}))"
            parts.append(f"{head}, {v}::BIGINT AS n_violations FROM {table}")
        elif kind == "fk":
            v = (
                f"sum(CASE WHEN t.{c['col']} IS NOT NULL AND r.__k IS NULL "
                f"THEN 1 ELSE 0 END)"
            )
            parts.append(
                f"{head}, COALESCE({v}, 0)::BIGINT AS n_violations "
                f"FROM {table} t LEFT JOIN (SELECT DISTINCT {c['ref_col']} "
                f"AS __k FROM {c['ref_table']}) r ON t.{c['col']} = r.__k"
            )
        else:
            raise ValueError(f"unknown check kind {kind!r}")
    body = "\nUNION ALL\n".join(parts)
    return (
        f"SELECT check_name, table_name, kind, n_rows, n_violations, "
        f"n_violations = 0 AS passed FROM (\n{body}\n)"
    )
