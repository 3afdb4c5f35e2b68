"""Approximate-aggregation (sketch) coverage: HLL count-distinct and
quantile sketches vs their exact twins, with pinned error bounds.

These are the cardinality/quantile primitives a 100 TB pipeline uses when
exact distinct/percentile shuffles are too expensive; values are
approximate by design, so correctness is an error-bound contract against
the exact aggregate, not a hash match (the exact forms ARE oracle-checked
in __spark_entry__: count_distinct_suppliers, price_percentiles).
"""

from pyspark.sql import functions as F

from vector_search_test_spark.io import load_table


def test_hll_approx_count_distinct_within_rsd(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    exact = li.select(F.countDistinct("l_partkey").alias("n")).first().n
    for rsd in (0.05, 0.01):
        approx = (
            li.select(F.approx_count_distinct("l_partkey", rsd=rsd).alias("n"))
            .first()
            .n
        )
        # HLL guarantees rsd as the *standard deviation* of relative
        # error; 4 sigma is a negligible-flake bound
        assert abs(approx - exact) <= max(4 * rsd * exact, 1)


def test_hll_sketch_agg_mergeable(spark, sf_dir):
    """Datasketches HLL: sketches built on disjoint partitions union to
    the same estimate as one global sketch — the property that makes
    distributed distinct-counting a map-side aggregation."""
    li = load_table(spark, sf_dir, "lineitem")
    whole = li.select(
        F.hll_sketch_estimate(F.hll_sketch_agg("l_partkey")).alias("n")
    ).first().n
    merged = (
        li.groupBy("l_returnflag")
        .agg(F.hll_sketch_agg("l_partkey").alias("sk"))
        .select(F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("n"))
        .first()
        .n
    )
    assert whole == merged


def test_percentile_approx_brackets_exact(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    row = li.select(
        F.expr("percentile(l_extendedprice, 0.5)").alias("exact"),
        F.percentile_approx("l_extendedprice", 0.5, 10000).alias("approx"),
    ).first()
    # accuracy=10000 -> rank error <= n/10000; fixture n is far below
    # that, so the approx quantile must land within one data point —
    # compare on relative value with a loose 1% guard
    assert abs(row.approx - row.exact) / row.exact < 0.01
