"""Fixture-drift guards for the two driver-scored entries that aggregate
fixture columns (text_stats_per_source, events_json_extract).

The oracles assume two fixture invariants:
- documents.n_chars equals the unicode character length of documents.text
  (both engines' length() agree with it), and
- events.value carries at most 2 decimals, so round(value*100) is an
  exact integer-cents representation.

If either drifts in the driver's fixture copy, these tests fail with a
precise count, so a red driver row can be attributed to data — with
evidence — rather than to the queries.
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_ORACLE, SF_SMOKE

SF_DIRS = [SF_SMOKE, SF_ORACLE]


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_n_chars_matches_text_length_duckdb(sf_dir):
    con = duckdb.connect()
    bad = con.execute(
        f"""
        SELECT count(*) FROM read_parquet('{sf_dir}/documents.parquet')
        WHERE length(text) <> n_chars
        """
    ).fetchone()[0]
    assert bad == 0, f"{bad} documents rows where length(text) != n_chars"


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_events_value_is_two_decimal(sf_dir):
    con = duckdb.connect()
    bad = con.execute(
        f"""
        SELECT count(*) FROM read_parquet('{sf_dir}/events.parquet')
        WHERE value IS NOT NULL
          AND abs(value * 100 - round(value * 100, 0)) > 1e-6
        """
    ).fetchone()[0]
    assert bad == 0, f"{bad} events rows where value has > 2 decimals"


def test_n_chars_matches_spark_length(spark):
    """Spark's length() must agree with the same fixture column the oracle
    sums — closes the Spark-vs-DuckDB half of the invariant."""
    docs = spark.read.parquet(f"{SF_ORACLE}/documents.parquet")
    bad = docs.filter(F.length("text") != F.col("n_chars")).count()
    assert bad == 0
