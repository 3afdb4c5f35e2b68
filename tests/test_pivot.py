"""Pivot / unpivot (melt): wide-format event counts round-trip back to
long form, explicit pivot values avoid the discovery job, and totals
are conserved."""

from pyspark.sql import functions as F

from vector_search_test_spark.io import load_table

TYPES = ["click", "error", "purchase", "signup", "view"]


def test_pivot_unpivot_roundtrip(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    wide = (
        ev.groupBy("user_id")
        .pivot("event_type", TYPES)
        .count()
        .na.fill(0, TYPES)
    )
    # totals conserved: sum of all pivot cells == total events
    total = wide.select(
        sum([F.col(t) for t in TYPES], F.lit(0)).alias("s")
    ).agg(F.sum("s")).first()[0]
    assert total == ev.count()

    # unpivot (melt) back to long form == the plain groupBy counts
    long = (
        wide.unpivot("user_id", TYPES, "event_type", "n")
        .filter(F.col("n") > 0)
    )
    got = sorted(
        (r.user_id, r.event_type, r.n) for r in long.collect()
    )
    want = sorted(
        (r.user_id, r.event_type, r.n)
        for r in ev.groupBy("user_id", "event_type")
        .agg(F.count("*").alias("n"))
        .collect()
    )
    assert got == want


def test_pivot_explicit_values_skip_discovery_job(spark, sf_dir):
    """With explicit values the plan is a single aggregation — no extra
    distinct-collect over the input to discover columns (the at-scale
    footgun of pivot(col) without values)."""
    ev = load_table(spark, sf_dir, "events")
    tracker = spark.sparkContext.statusTracker()
    before = len(tracker.getJobIdsForGroup() or [])
    wide = ev.groupBy("user_id").pivot("event_type", TYPES).count()
    # building the plan with explicit values runs NO job at all
    after = len(tracker.getJobIdsForGroup() or [])
    assert after == before
    assert set(TYPES) <= set(wide.columns)
