"""Text ingest/export parity with the reference (SURVEY §2.1 S1/S2/S5).

S1 — CSV source: the reference uploads a CSV, requires a column literally
named `sentences`, casts it to str (app.py:201-208). Same contract here,
including the error on a missing column.
S2 — text-lines source: textarea split on newlines, strip, drop blanks
(app.py:214-223).
S5 — CSV sink: the cluster export (sentence, cluster_id) with header
(app.py:112, 283, 313-319).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

SENTENCES_COL = "sentences"


def read_sentences_csv(spark: SparkSession, path: str) -> DataFrame:
    """S1 + P1 — CSV with a required `sentences` column, cast to string.

    Raises ValueError with the reference's contract message when the
    column is absent (app.py:207-208). multiLine handles quoted embedded
    newlines (pandas' C parser does; Spark's default line-split reader
    would shred them). Empty-string cells read back as NULL — the
    reference's own pandas path turns them into the literal 'nan' via
    astype(str) (app.py:204), so neither engine preserves them; callers
    needing '' semantics should fillna downstream.
    """
    df = (
        spark.read.option("header", True)
        .option("multiLine", True)
        .option("escape", '"')
        .csv(path)
    )
    if SENTENCES_COL not in df.columns:
        raise ValueError("CSV must contain a column named 'sentences'")
    return df.select(F.col(SENTENCES_COL).cast("string").alias(SENTENCES_COL))


def read_text_lines(spark: SparkSession, path: str) -> DataFrame:
    """S2 + P2 — one sentence per line, trimmed, blanks dropped
    (app.py:223: `[s.strip() for s in ... if s.strip()]`).

    Python's str.strip() removes all ASCII whitespace; Spark's trim()
    removes only spaces, so btrim with the full whitespace set keeps the
    semantics identical."""
    ws = " \t\r\n\x0b\x0c"
    return (
        spark.read.text(path)
        .select(F.btrim(F.col("value"), F.lit(ws)).alias(SENTENCES_COL))
        .filter(F.length(SENTENCES_COL) > 0)
    )


def write_clusters_csv(df: DataFrame, path: str) -> None:
    """S5 — cluster export as headered CSV (app.py:112, 283).

    Expects (sentence/text, cluster_id)-shaped input; writes one
    directory of part files (the distributed analog of the reference's
    single download blob — coalesce(1) would serialize the write through
    one task, so it is left to the caller for small exports).
    """
    df.write.mode("overwrite").option("header", True).csv(path)
