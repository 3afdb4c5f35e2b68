"""Index-quality evaluation operators: ANN recall measurement and IVF
list-size statistics.

The reference exposes no evaluation surface (its quality knob is the
nprobe slider, app.py:58, consumed on faith); a production ANN deployment
needs BOTH a recall gauge (is nprobe high enough?) and an index-balance
gauge (is a retrain/rebalance due? — the signal `ivf_rebalance` in
operators/ivf.py acts on). Both operators work on already-reduced
inputs — per-query top-k tables and per-list counts — so they are
output-bound and trivially scale-free: at 100 TB the expensive parts
(the searches, the postings scan) are the operators being measured, not
the measurement.

`imbalance_factor` follows the faiss convention: nlist_used *
sum(n_i^2) / ntotal^2 — 1.0 for perfectly even lists, → nlist for a
single hot list. Integer sums, one double division at the end, so the
value hashes identically across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def recall_at_k(
    exact: DataFrame,
    approx: DataFrame,
    query_col: str = "query_id",
    id_col: str = "vec_id",
) -> DataFrame:
    """Per-query recall of `approx` against `exact` ground truth.

    Both inputs are (query, id) result tables (anything extra is
    ignored); output is one row per query in `exact`:
    (query_id, n_exact, n_hit, recall) with recall = n_hit / n_exact
    rounded to 6dp. Queries the approx side missed entirely still get a
    row (n_hit = 0) — a silent-miss recall gauge must not drop them.

    Plan shape: two output-bound groupBys on the query key plus one
    broadcast-sized join — the inputs are top-k tables (rows = queries
    * k), never the corpus.
    """
    hit = (
        exact.select(query_col, id_col)
        .join(approx.select(query_col, id_col), [query_col, id_col])
        .groupBy(query_col)
        .agg(F.count("*").alias("n_hit"))
    )
    base = exact.groupBy(query_col).agg(F.count("*").alias("n_exact"))
    return base.join(hit, [query_col], "left").select(
        query_col,
        "n_exact",
        F.coalesce("n_hit", F.lit(0)).cast("long").alias("n_hit"),
        F.round(
            F.coalesce("n_hit", F.lit(0)) / F.col("n_exact"), 6
        ).alias("recall"),
    )


def key_skew_stats(
    df: DataFrame,
    key_col: str,
    top_n: int = 10,
) -> DataFrame:
    """Shuffle-key skew diagnostic: the heaviest `top_n` keys of
    `key_col` with their row counts, global share, and the key's load
    RELATIVE TO A PERFECTLY EVEN SPREAD (`skew` = n_rows * n_keys /
    total — 1.0 means the key carries exactly its fair share; 50 means
    a join/groupBy partition on it runs 50x longer than average).

    This is the measurement behind SCALE.md's "salting for skew"
    prescription: run it on a join/groupBy key BEFORE sizing the job;
    keys with skew >> 1 get salted or AQE-skew-split. Plan: one count
    shuffle on the key (map-side combine), a scalar-aggregate broadcast
    back, and a global top-n (TakeOrdered — top_n rows, not a sort).
    Deterministic (count desc, key asc) tie-break. Output:
    (key, n_rows, frac, skew, rank).
    """
    per = df.groupBy(F.col(key_col).cast("string").alias("key")).agg(
        F.count("*").alias("n_rows")
    )
    tot = per.agg(
        F.sum("n_rows").cast("long").alias("__total"),
        F.count("*").cast("long").alias("__n_keys"),
    )
    ranked = (
        per.crossJoin(F.broadcast(tot))
        .orderBy(F.desc("n_rows"), F.asc("key"))
        .limit(top_n)
    )
    from pyspark.sql import Window

    w = Window.orderBy(F.desc("n_rows"), F.asc("key"))
    return ranked.select(
        "key",
        "n_rows",
        F.round(F.col("n_rows") / F.col("__total"), 6).alias("frac"),
        F.round(
            F.col("n_rows").cast("double")
            * F.col("__n_keys")
            / F.col("__total"),
            6,
        ).alias("skew"),
        F.row_number().over(w).cast("long").alias("rank"),
    )


def ivf_index_stats(postings: DataFrame, list_col: str = "list_id") -> DataFrame:
    """One-row balance summary of an IVF postings table:
    (ntotal, nlist_used, min_list, max_list, avg_list, imbalance).

    The drift dashboard for append-heavy indexes: `imbalance` rising
    toward nlist means probes concentrate on hot lists and p99 search
    latency climbs — the trigger for ivf_rebalance (which splits only
    the hot lists) or a full retrain. One narrow shuffle on list_id
    (nlist keys — thousands, regardless of corpus size) then a scalar
    aggregate; map-side combine does the heavy counting in place.
    """
    per = postings.groupBy(list_col).agg(F.count("*").alias("n_vecs"))
    # integer sums (exact, summation-order-free) — ONE double division at
    # the end so the value is bit-identical across engines
    ntotal = F.sum("n_vecs").cast("double")
    sum_sq = F.sum(F.col("n_vecs") * F.col("n_vecs")).cast("double")
    nlist = F.count("*").cast("double")
    return per.agg(
        F.sum("n_vecs").alias("ntotal"),
        F.count("*").alias("nlist_used"),
        F.min("n_vecs").alias("min_list"),
        F.max("n_vecs").alias("max_list"),
        F.round(ntotal / nlist, 6).alias("avg_list"),
        F.round(nlist * sum_sq / (ntotal * ntotal), 6).alias("imbalance"),
    )
