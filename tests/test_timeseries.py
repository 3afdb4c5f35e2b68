"""As-of join, interval join + sessionization tests (naive twins as the
oracle)."""

from datetime import datetime, timedelta

from pyspark.sql import functions as F

from vector_search_test_spark.operators.timeseries import (
    asof_join,
    interval_join,
    sessionize,
)

T0 = datetime(2025, 1, 1, 12, 0, 0)


def _ts(minutes):
    return T0 + timedelta(minutes=minutes)


def test_asof_join_backward_semantics(spark):
    left = spark.createDataFrame(
        [(1, 10, _ts(5)), (2, 10, _ts(20)), (3, 20, _ts(1)), (4, 30, _ts(9))],
        "event_id long, user_id long, ts timestamp",
    )
    right = spark.createDataFrame(
        [(100, 10, _ts(5)), (101, 10, _ts(19)), (102, 20, _ts(2))],
        "click_id long, user_id long, ts timestamp",
    )
    out = {
        r.event_id: r.r_click_id
        for r in asof_join(
            left, right, key="user_id", right_payload=["click_id"]
        ).collect()
    }
    # event 1: click at the SAME ts matches (>= semantics)
    # event 2: latest prior click is 101
    # event 3: user 20's only click is LATER -> no match
    # event 4: user 30 has no clicks -> no match
    assert out == {1: 100, 2: 101, 3: None, 4: None}


def test_asof_join_preserves_all_left_rows(spark, sf_dir):
    from vector_search_test_spark.io import load_table

    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("click_id"))
    )
    out = asof_join(purchases, clicks, key="user_id", right_payload=["click_id"])
    assert out.count() == purchases.count()


def test_interval_join_matches_naive(spark, sf_dir):
    """Bucketed interval join == naive cross-join + BETWEEN filter, at
    several bucket sizes (completeness and no-duplicates are bucket-size
    invariant)."""
    from vector_search_test_spark.io import load_table

    ev = load_table(spark, sf_dir, "events").select("event_id", "ts")
    iv = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("user_id") < 10)
        .groupBy(F.col("user_id").alias("w_user"))
        .agg(F.min("ts").alias("start"))
        .withColumn("end", F.col("start") + F.expr("INTERVAL 2 DAYS"))
    )
    naive = sorted(
        (r.w_user, r.event_id)
        for r in ev.crossJoin(iv)
        .filter((F.col("ts") >= F.col("start")) & (F.col("ts") <= F.col("end")))
        .select("w_user", "event_id")
        .collect()
    )
    assert len(naive) > 0
    for bucket in (3600, 86400, 7 * 86400):
        got = sorted(
            (r.w_user, r.event_id)
            for r in interval_join(ev, iv, bucket_seconds=bucket)
            .select("w_user", "event_id")
            .collect()
        )
        assert got == naive


def test_sessionize_gap_splits(spark):
    rows = [
        (1, 10, _ts(0)),
        (2, 10, _ts(10)),   # 10 min gap -> same session
        (3, 10, _ts(50)),   # 40 min gap -> new session
        (4, 10, _ts(55)),
        (5, 20, _ts(0)),    # other user -> own session numbering
    ]
    ev = spark.createDataFrame(rows, "event_id long, user_id long, ts timestamp")
    out = {
        r.event_id: r.session_id
        for r in sessionize(ev, gap_seconds=1800).collect()
    }
    assert out == {1: 0, 2: 0, 3: 1, 4: 1, 5: 0}


def test_sessionize_boundary_exact_gap(spark):
    # a gap of exactly gap_seconds does NOT start a new session (strict >)
    ev = spark.createDataFrame(
        [(1, 1, _ts(0)), (2, 1, _ts(30)), (3, 1, T0 + timedelta(minutes=60, seconds=1))],
        "event_id long, user_id long, ts timestamp",
    )
    out = {
        r.event_id: r.session_id
        for r in sessionize(ev, gap_seconds=1800).collect()
    }
    assert out == {1: 0, 2: 0, 3: 1}


def test_next_event_examples_session_boundaries(spark):
    """Labels stop at session gaps and at each user's final event."""
    from datetime import datetime

    from vector_search_test_spark.operators.timeseries import (
        next_event_examples,
    )

    t = lambda m: datetime(2026, 1, 1, 10, m)
    rows = [
        (1, 1, t(0), "view"),
        (2, 1, t(5), "click"),     # within gap -> view->click
        (3, 1, t(50), "purchase"), # 45-min gap -> click has NO label
        (4, 1, t(52), "view"),     # purchase->view; view is final (none)
        (5, 2, t(0), "signup"),    # single event -> none
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, event_type string"
    )
    got = {
        r.event_id: (r.next_type, r.gap_sec)
        for r in next_event_examples(df).collect()
    }
    assert got == {1: ("click", 300), 3: ("view", 120)}


def test_asof_forward_semantics(spark):
    """Forward as-of matches the EARLIEST at-or-after right row; ties at
    equal ts match; rows after the last right row get NULL; backward on
    the same data gives the mirrored answer."""
    from datetime import datetime

    from vector_search_test_spark.operators.timeseries import asof_join

    t = lambda m: datetime(2026, 1, 1, 10, m)
    left = spark.createDataFrame(
        [(1, 1, t(0)), (2, 1, t(10)), (3, 1, t(31)), (4, 2, t(0))],
        "lid long, k long, ts timestamp",
    )
    right = spark.createDataFrame(
        [(100, 1, t(10)), (101, 1, t(30))],
        "rid long, k long, ts timestamp",
    )
    fwd = {
        r.lid: r.r_rid
        for r in asof_join(
            left, right, key="k", right_payload=["rid"], direction="forward"
        ).collect()
    }
    assert fwd == {1: 100, 2: 100, 3: None, 4: None}  # tie at t10 matches
    bwd = {
        r.lid: r.r_rid
        for r in asof_join(
            left, right, key="k", right_payload=["rid"]
        ).collect()
    }
    assert bwd == {1: None, 2: 100, 3: 101, 4: None}
    import pytest

    with pytest.raises(ValueError):
        asof_join(left, right, key="k", direction="sideways")


def test_funnel_ordering_matters(spark, monkeypatch, tmp_path):
    """The funnel requires the ORDER view <= click <= purchase: a user
    who purchases before ever viewing does not convert."""
    import sys
    from datetime import datetime

    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as entrymod

    t = lambda m: datetime(2026, 1, 1, 10, m)
    rows = [
        # user 1: full ordered funnel
        (1, 1, t(0), "view"), (2, 1, t(5), "click"), (3, 1, t(9), "purchase"),
        # user 2: purchase BEFORE view -> views, clicks, but no funnel
        (4, 2, t(0), "purchase"), (5, 2, t(1), "view"), (6, 2, t(2), "click"),
        # user 3: view only
        (7, 3, t(0), "view"),
        # user 4: click equal-ts view -> ties count (>=)
        (8, 4, t(0), "view"), (9, 4, t(0), "click"), (10, 4, t(0), "purchase"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, event_type string"
    )
    pq = tmp_path / "events.parquet"
    df.coalesce(1).write.mode("overwrite").parquet(str(pq))
    r = entrymod._q_funnel_counts(spark, str(tmp_path)).first()
    assert (r.n_view, r.n_view_click, r.n_full_funnel) == (4, 3, 2)


# ---------------------------------------------------------------------------
# retention cohorts (timeseries.py::retention_cohorts)
# ---------------------------------------------------------------------------


def test_retention_cohorts_hand_computed(spark):
    """Two weekly cohorts with a known matrix. 2025-01-01 is a
    Wednesday; its ISO week starts Monday 2024-12-30."""
    from vector_search_test_spark.operators.timeseries import (
        retention_cohorts,
    )

    rows = [
        # cohort A (week of 2024-12-30): users 1, 2
        (1, _ts(0)),                 # u1 week 0
        (1, _ts(60 * 24 * 7)),       # u1 week 1
        (1, _ts(60 * 24 * 21)),      # u1 week 3
        (2, _ts(30)),                # u2 week 0 only
        # cohort B (week of 2025-01-06): user 3
        (3, _ts(60 * 24 * 6)),       # 2025-01-07 -> week of 01-06
        (3, _ts(60 * 24 * 13)),      # one week later
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    got = {
        (str(r.cohort_week), r.week_offset): r.n_users
        for r in retention_cohorts(df).collect()
    }
    assert got == {
        ("2024-12-30", 0): 2,
        ("2024-12-30", 1): 1,
        ("2024-12-30", 3): 1,
        ("2025-01-06", 0): 1,
        ("2025-01-06", 1): 1,
    }


def test_retention_cohorts_matches_duckdb(spark, sf_dir):
    import duckdb

    from vector_search_test_spark.io import load_table
    from vector_search_test_spark.operators.timeseries import (
        retention_cohorts,
    )

    ev = load_table(spark, sf_dir, "events")
    got = sorted(
        (str(r.cohort_week), int(r.week_offset), int(r.n_users))
        for r in retention_cohorts(ev).collect()
    )
    from vector_search_test_spark.operators.timeseries import (
        retention_cohorts_oracle_sql,
    )

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{sf_dir}/events.parquet')"
    )
    want = sorted(
        (str(c), int(o), int(n))
        for c, o, n in con.execute(retention_cohorts_oracle_sql()).fetchall()
    )
    assert got == want
    # offset 0 row exists for every cohort (the cohort size itself)
    cohorts = {c for c, _, _ in got}
    assert {(c) for c, o, _ in got if o == 0} == cohorts


def test_retention_cohorts_no_window_no_cartesian(spark, sf_dir):
    """Plan shape: per-user aggregates + equi-joins only — no window
    over raw events, no cartesian product."""
    from vector_search_test_spark.io import load_table
    from vector_search_test_spark.operators.timeseries import (
        retention_cohorts,
    )

    plan = (
        retention_cohorts(load_table(spark, sf_dir, "events"))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Window" not in plan
    assert "Cartesian" not in plan
    assert "BatchEvalPython" not in plan


# ---------------------------------------------------------------------------
# robust value anomalies (timeseries.py::value_anomalies)
# ---------------------------------------------------------------------------


def test_value_anomalies_hand_computed(spark):
    """[1,2,3,4,100]: median 3, MAD 1, Hampel threshold 3*1.4826 ->
    exactly the 100 is anomalous."""
    from vector_search_test_spark.operators.timeseries import value_anomalies

    df = spark.createDataFrame(
        [("a", float(v)) for v in (1, 2, 3, 4, 100)]
        + [("b", float(v)) for v in (10, 10, 10)],
        "event_type string, value double",
    )
    got = {r.event_type: r for r in value_anomalies(df).collect()}
    a = got["a"]
    assert (a.n, a.med, a.mad, a.n_anomalies, a.anomaly_frac) == (
        5, 3.0, 1.0, 1, 0.2,
    )
    b = got["b"]  # zero MAD: nothing exceeds a zero threshold band
    assert (b.n, b.med, b.mad, b.n_anomalies) == (3, 10.0, 0.0, 0)


def test_value_anomalies_matches_duckdb(spark, sf_dir):
    import duckdb

    from vector_search_test_spark.io import load_table
    from vector_search_test_spark.operators.timeseries import (
        value_anomalies,
        value_anomalies_oracle_sql,
    )

    ev = load_table(spark, sf_dir, "events")
    got = sorted(
        (r.event_type, r.n, r.med, r.mad, r.n_anomalies, r.anomaly_frac)
        for r in value_anomalies(ev).collect()
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{sf_dir}/events.parquet')"
    )
    want = sorted(
        (k, int(n), float(m), float(d), int(na), float(fr))
        for k, n, m, d, na, fr in con.execute(
            value_anomalies_oracle_sql()
        ).fetchall()
    )
    assert got == want and len(got) > 0
