"""S1/S2/S5 ingest/export contract tests (reference app.py:198-228, 283)."""

import pytest
from pyspark.sql import functions as F

from vector_search_test_spark.io import load_table
from vector_search_test_spark.sources import (
    read_sentences_csv,
    read_text_lines,
    write_clusters_csv,
)


def test_csv_roundtrip_preserves_texts(spark, sf_dir, tmp_path):
    docs = load_table(spark, sf_dir, "documents")
    path = str(tmp_path / "sentences_csv")
    docs.select(F.col("text").alias("sentences")).write.option("header", True).csv(path)
    back = read_sentences_csv(spark, path)
    assert back.columns == ["sentences"]
    want = sorted(r.text for r in docs.collect())
    got = sorted(r.sentences for r in back.collect())
    assert got == want


def test_csv_missing_column_error(spark, tmp_path):
    path = str(tmp_path / "bad_csv")
    spark.createDataFrame([("x",)], "not_sentences string").write.option(
        "header", True
    ).csv(path)
    with pytest.raises(ValueError, match="must contain a column named 'sentences'"):
        read_sentences_csv(spark, path)


def test_text_lines_trim_and_drop_blanks(spark, tmp_path):
    p = tmp_path / "lines.txt"
    p.write_text("  hello world \n\n   \nsecond line\n\t\n")
    got = [r.sentences for r in read_text_lines(spark, str(p)).collect()]
    assert sorted(got) == ["hello world", "second line"]


def test_clusters_csv_export_roundtrip(spark, tmp_path):
    df = spark.createDataFrame(
        [("a", 0), ("b", 0), ("c", -1)], "sentence string, cluster_id long"
    )
    path = str(tmp_path / "clusters_csv")
    write_clusters_csv(df, path)
    back = (
        spark.read.option("header", True)
        .csv(path)
        .select("sentence", F.col("cluster_id").cast("long").alias("cluster_id"))
    )
    assert sorted((r.sentence, r.cluster_id) for r in back.collect()) == [
        ("a", 0),
        ("b", 0),
        ("c", -1),
    ]
