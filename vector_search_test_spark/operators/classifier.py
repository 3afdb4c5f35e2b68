"""In-engine quality classifier: the GPT-3-style "looks like the
reference corpus" logistic filter, trained and scored entirely inside
the engine (extension — no reference counterpart; the reference has no
quality ops beyond trim, app.py:204).

Published method being re-expressed: the web-corpus quality classifiers
of GPT-3 (Brown et al. 2020, Appendix A — a linear classifier over
hashed features separating the reference corpus from raw CommonCrawl),
CCNet (Wenzek et al. 2020) and LLaMA's Wikipedia-reference filter,
whose standard implementation is fastText (Joulin et al. 2016) — i.e.
logistic regression over hashed bag-of-words features (the hashing
trick, Weinberger et al. 2009).

What this module contributes beyond DSIR (`sampling.dsir_select`, the
importance-WEIGHTING view of the same problem): a trained DISCRIMINATIVE
score with a decision boundary — the filter shape production pipelines
actually deploy in front of pre-training ingestion.

Training is full-batch gradient descent with a BOUNDED number of
rounds, which is what makes the DuckDB value-oracle possible: bounded
rounds unroll into a deterministic CTE chain (the repo's bpe_merges /
pagerank precedent — the bound exists to keep the twin unrollable; at
production scale you iterate to convergence or hand the same feature
table to MLlib's LogisticRegression, which this module's feature seam
feeds unchanged).

Features are corpus-STANDARDIZED hashed token frequencies: raw
frequency-scale features (x ~ 1/n_tokens) leave full-batch GD moving
at a crawl — measured flat at the majority-class logit after any
bounded round count — while z-scored features converge in single-digit
rounds (the standard conditioning argument; fastText gets away with
raw counts only because it runs many SGD epochs).

Determinism contract (the cross-engine argument, component by
component):

- raw features: x_j = cnt_j / n_tokens — BIGINT/BIGINT division
  producing identical doubles.
- standardization: per-bucket moment sums quantize x and x*x to 1e-12
  BIGINTs before the (order-free) integer sum; mu/var derive by the
  same IEEE expression on both engines, and sqrt is CORRECTLY ROUNDED
  by IEEE 754 (unlike exp), so sd and every z = (x - mu) / sd are
  bit-identical. Constant buckets get sd = 1.0 on both engines.
- margins: per-term products w_j * z_j are quantized to 1e-12 BIGINTs
  BEFORE the per-doc sum (order-free integer addition — the repo's
  quantized-sum pattern), so the sigmoid argument is bit-identical.
- sigmoid: p = 1/(1+exp(-m)) is rounded to 9 dp before it feeds the
  gradient (libm exp may differ by 1 ULP across engines; the rounding
  absorbs it — the semdedup round-before-compare precedent).
- gradient: per-(doc, j) contributions (p - y) * z_j quantized to
  1e-12 BIGINTs, integer-summed per j; the weight update
  w_j - lr * ((g_j / 1e12) / N) is the same IEEE double expression on
  the Python driver and in the twin's CTE, fed identical integers.

Scale shape (100 TB): the sparse counts are ONE Arrow batch pass —
each document's {bucket: count/n_tokens} map is a pure function of its
own row, so no explode, no shuffle, and the kernel hashes each
DISTINCT token once per task (r17; previously a token explode + two
hash aggregates); the per-bucket moments come straight off the sparse
table (absent cells contribute round(0 * Q) = 0 to both quantized sums
and the dense row count is just n_docs — so the dense grid the math is
defined over is never materialized); features are ONE (n_buckets + 1)-
wide z-vector per document (map lookup against broadcast moment
arrays), localCheckpoint'ed once. Each GD round is then a single scan:
the margin is a zip_with/aggregate over the vector (no groupBy — one
row per doc already), and the gradient is one map-side-combined
global aggregate producing a single (n_buckets + 1)-column row (the
k-means-centroid bounded-collect pattern: the driver sees one gradient
vector per round, never data rows). Scoring is one broadcast-literal
projection. No row-at-a-time Python anywhere (the feature kernel is
Arrow-batched). r12 note: this vector layout
replaced the r11 long-format (id, j, xj) table whose per-round
groupBy(id) + join cost two 660k-row shuffles per round at sf0.1 —
6.9 s -> the round cost is now the scan itself; identical quantized
terms, oracle unchanged. For n_buckets beyond ~10^4, switch to the
sparse identity: absent entries share the constant z0_j = -mu_j /
sd_j, so the margin decomposes as sum_present(w_j * x_j / sd_j) +
(b - sum_all(w_j * mu_j / sd_j)) — a per-model scalar.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from vector_search_test_spark.functions.vector import const_double_array  # noqa: E501
from vector_search_test_spark.functions.hashing import hash48_sql

_Q = 1e12  # the repo's standard quantization for order-free sums


def _feature_table(
    docs: DataFrame,
    is_target,
    n_buckets: int,
    id_col: str,
    text_col: str,
) -> "tuple[DataFrame, int]":
    """((id, y, z), n_docs): corpus-STANDARDIZED hashed token-frequency
    feature VECTOR per document — z has n_buckets + 1 slots, the last
    being the bias term (always 1.0). Documents with zero tokens carry
    no signal and are excluded (mirrored in the twin). The math is
    defined over the dense (doc x bucket) grid, but the grid is never
    materialized: absent cells contribute round(0 * Q) = 0 to both
    quantized moment sums and their count is just n_docs, so the
    moments come straight off the per-doc sparse maps; the <= n_buckets
    moment rows are collected to the driver (the k-means-centroid
    bounded-collect pattern — mu/sd stay Spark-computed doubles, only
    round-tripped exactly through binary64) and embedded as literal
    maps, making the z projection join-free. The returned frame is a
    cheap codegen'd projection over the checkpointed sparse maps."""
    d = int(n_buckets)
    # one row per doc: the sparse bucket->x map, computed by ONE Arrow
    # batch pass (r17; the contamination-kernel precedent: a kernel
    # whose output is one row per document beats the explode + two hash
    # aggregates + two Exchanges it replaces — measured 0.76 -> 0.57 s
    # warm, values identical). Tokenization (lower + split + drop-empty)
    # stays JVM-side so its semantics cannot drift; the kernel hashes
    # each DISTINCT token once per task (md5 via hashlib == the
    # portable_hash48 bytes, the fingerprint-kernel-pinned identity)
    # and emits {bucket: count/nt} — cnt/nt is the same long/long ->
    # binary64 division Spark evaluates. Checkpointed once — the z
    # projection, every GD round, and scoring all replay it.
    base = docs.select(
        F.col(id_col).alias("id"),
        is_target.cast("double").alias("y"),
        F.filter(
            F.split(F.lower(F.col(text_col)), " "), lambda t: t != ""
        ).alias("toks"),
    ).filter(F.size("toks") > 0)

    def _xmap_kernel(batches):
        import hashlib
        from collections import Counter

        import pandas as pd

        jcache: "dict[str, int]" = {}
        for pdf in batches:
            ids: "list" = []
            ys: "list[float]" = []
            xms: "list[dict]" = []
            for i, y, tk in zip(pdf["id"], pdf["y"], pdf["toks"]):
                nt = len(tk)
                cnt: Counter = Counter()
                for t in tk:
                    j = jcache.get(t)
                    if j is None:
                        j = (
                            int(
                                hashlib.md5(t.encode("utf-8")).hexdigest()[
                                    :12
                                ],
                                16,
                            )
                            % d
                        )
                        jcache[t] = j
                    cnt[j] += 1
                ids.append(i)
                ys.append(y)
                xms.append({int(j): c / nt for j, c in cnt.items()})
            yield pd.DataFrame({"id": ids, "y": ys, "xm": xms})

    id_type = docs.schema[id_col].dataType.simpleString()
    xmap = base.mapInPandas(
        _xmap_kernel, f"id {id_type}, y double, xm map<int,double>"
    ).localCheckpoint()
    n_docs = xmap.count()
    # per-bucket moments over ALL docs: identical to the dense-grid
    # sums (absent cells quantize to 0; each bucket's N = n_docs) ->
    # identical mu/sd doubles on both engines; buckets whose variance
    # is <= 0 (constant, incl. never-hit buckets: mu = 0) get sd = 1.0
    stats = (
        xmap.select(F.explode("xm").alias("j", "x"))
        .groupBy("j")
        .agg(
            F.sum(F.round(F.col("x") * F.lit(_Q)).cast("long")).alias("sx"),
            F.sum(
                F.round(F.col("x") * F.col("x") * F.lit(_Q)).cast("long")
            ).alias("sxx"),
        )
        .select(
            "j",
            ((F.col("sx") / F.lit(_Q)) / F.lit(n_docs)).alias("mu"),
            (
                (F.col("sxx") / F.lit(_Q)) / F.lit(n_docs)
                - ((F.col("sx") / F.lit(_Q)) / F.lit(n_docs))
                * ((F.col("sx") / F.lit(_Q)) / F.lit(n_docs))
            ).alias("var"),
        )
        .select(
            "j",
            "mu",
            F.when(F.col("var") <= 0, F.lit(1.0))
            .otherwise(F.sqrt("var"))
            .alias("sd"),
        )
        .collect()
    )
    # literal moment maps (bounded: <= n_buckets entries); a bucket no
    # token ever hit is absent -> mu 0.0, sd 1.0 (the exact values the
    # dense grid would have produced for an all-zero column)
    mu = {int(r.j): float(r.mu) for r in stats}
    sd = {int(r.j): float(r.sd) for r in stats}
    # materialize z once (each GD round reads it; leaving it as a lazy
    # projection re-expands the 33-term array into every z[j] reference
    # of the gradient agg — a several-thousand-node plan per round) and
    # right-size partitions for the CONSUMER, not just for bytes: every
    # GD round runs an interpreted quantized-margin fold over this
    # table, so the partition count must BALANCE fold time against task
    # overhead. The fold runs ~23 us/doc interpreted (r16: 0.22 s for
    # 5000 docs single-task), so ~1250 docs/task keeps each task's fold
    # near the per-task scheduling cost — an r17 sweep of the 8-round
    # loop at n = 5000 measured parts {25: 2.48 s, 16: 1.81, 8: 1.60,
    # 4: 1.62, 1: 2.41}: the r16 rule of one partition per ~200 docs
    # over-sliced the table and the 8 rounds paid 25 x 2 stages of task
    # overhead each. Cluster parallelism still caps the count and the
    # 50k-doc (~13 MB at d = 32) upper bound still caps partition size
    # once the corpus outgrows the cluster. Quantized sums are
    # order-free, so the layout never touches results.
    par = xmap.sparkSession.sparkContext.defaultParallelism
    parts = max(min(par, -(-n_docs // 1250)), -(-n_docs // 50_000))
    feats = (
        xmap.select(
            "id",
            "y",
            F.concat(
                F.array(
                    *[
                        (
                            F.coalesce(F.col("xm")[j], F.lit(0.0))
                            - F.lit(mu.get(j, 0.0))
                        )
                        / F.lit(sd.get(j, 1.0))
                        for j in range(d)
                    ]
                ),
                F.array(F.lit(1.0)),
            ).alias("z"),
        )
        .repartition(parts)
        .localCheckpoint()
    )
    return feats, n_docs


def _p_expr(weights: "list[float]"):
    """Column: sigmoid of the quantized-sum margin of the z-vector
    under `weights` (an array literal), rounded 9 dp (see module doc).
    A pure codegen'd expression over the `z` column."""
    wlit = const_double_array(weights)
    mq = F.aggregate(
        F.zip_with(
            F.col("z"),
            wlit,
            lambda z, w: F.round(w * z * F.lit(_Q)).cast("long"),
        ),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )
    return F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-(mq / F.lit(_Q)))), 9)


def _margins(feats: DataFrame, weights: "list[float]") -> DataFrame:
    """(id, y, p): per-doc sigmoid margins — one row per doc already,
    no aggregation."""
    return feats.select("id", "y", _p_expr(weights).alias("p"))


def quality_classifier_train(
    docs: DataFrame,
    is_target,
    n_buckets: int = 32,
    rounds: int = 4,
    lr: float = 2.0,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> "tuple[list[float], DataFrame]":
    """Train the logistic quality filter; returns (weights, feats).

    `weights` is the (n_buckets + 1)-vector after `rounds` full-batch
    GD steps from w = 0 (last slot = bias); `feats` is the checkpointed
    per-doc feature-vector table so scoring (and MLlib handoff —
    array_to_vector(z) is LogisticRegression's features column) reuses
    it without re-tokenizing. One bounded single-row collect per round
    (the gradient: n_buckets + 1 quantized sums)."""
    if rounds < 1:
        raise ValueError(f"rounds must be >= 1, got {rounds}")
    if n_buckets < 1:
        raise ValueError(f"n_buckets must be >= 1, got {n_buckets}")
    feats, n_docs = _feature_table(
        docs, is_target, n_buckets, id_col, text_col
    )
    if n_docs == 0:
        raise ValueError("no documents with at least one token to train on")
    w = [0.0] * (n_buckets + 1)
    # gradient agg expressions don't depend on w — build once
    gexprs = [
        F.sum(
            F.round(
                (F.col("p") - F.col("y")) * F.col("z")[j] * F.lit(_Q)
            ).cast("long")
        ).alias(f"g{j}")
        for j in range(n_buckets + 1)
    ]
    for _ in range(int(rounds)):
        # p is a projection of feats (no join needed): the whole round
        # is ONE map-side-combined global agg — (n_buckets + 1)
        # quantized sums, a single driver row
        withz = feats.select("y", "z", _p_expr(w).alias("p"))
        grow = withz.groupBy().agg(*gexprs).collect()[0]
        # the exact double expression the twin's CTE computes — keep
        # the association identical (see module determinism contract)
        w = [
            w[j] - lr * ((int(grow[f"g{j}"] or 0) / _Q) / n_docs)
            for j in range(n_buckets + 1)
        ]
    return w, feats


def quality_classifier_scores(
    docs: DataFrame,
    is_target,
    n_buckets: int = 32,
    rounds: int = 4,
    lr: float = 2.0,
    threshold: float = 0.5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Train on the corpus and score every (tokenized) document:
    (id_col, y label 0/1, qscore = sigmoid margin rounded 6 dp,
    pred 0/1 at `threshold`). The deployment shape: filter raw data on
    `pred` (or rank by qscore with a noisy threshold, as GPT-3 did with
    a Pareto draw — that variant composes as qscore + sampling.gumbel
    machinery downstream)."""
    w, feats = quality_classifier_train(
        docs,
        is_target,
        n_buckets=n_buckets,
        rounds=rounds,
        lr=lr,
        id_col=id_col,
        text_col=text_col,
    )
    p = _margins(feats, w)
    return p.select(
        F.col("id").alias(id_col),
        F.col("y").cast("int").alias("y"),
        F.round("p", 6).alias("qscore"),
        (F.col("p") >= F.lit(float(threshold))).cast("int").alias("pred"),
    )


def quality_classifier_oracle_sql(
    target_pred: str,
    n_buckets: int = 32,
    rounds: int = 4,
    lr: float = 2.0,
    threshold: float = 0.5,
) -> str:
    """DuckDB twin: the identical feature table, the identical
    quantized margins/gradients, and the `rounds` GD steps UNROLLED as
    a CTE chain (the bpe_merges/pagerank bounded-rounds pattern).
    `target_pred` is the SQL label predicate (e.g. "lang = 'en'")."""
    d = int(n_buckets)
    q = f"{_Q!r}"
    h = hash48_sql("tok")
    ctes = [
        # tokenized corpus; zero-token docs excluded (mirrors Spark)
        f"""base AS MATERIALIZED (
            SELECT doc_id,
                   CASE WHEN {target_pred} THEN 1.0 ELSE 0.0 END AS y,
                   list_filter(string_split(lower(text), ' '),
                               t -> t <> '') AS toks
            FROM documents
        )""",
        """docs2 AS MATERIALIZED (
            SELECT doc_id, y, len(toks) AS nt, toks
            FROM base WHERE len(toks) > 0
        )""",
        """toked AS MATERIALIZED (
            SELECT doc_id, nt, unnest(toks) AS tok FROM docs2
        )""",
        f"""sparse AS MATERIALIZED (
            SELECT doc_id, CAST({h} % {d} AS INT) AS j,
                   (count(*)::DOUBLE / nt) AS x
            FROM toked GROUP BY doc_id, nt, {h} % {d}
        )""",
        f"""grid AS MATERIALIZED (
            SELECT d.doc_id, d.y, CAST(r.j AS INT) AS j,
                   COALESCE(s.x, 0.0) AS x
            FROM docs2 d CROSS JOIN range({d}) r(j)
            LEFT JOIN sparse s
              ON s.doc_id = d.doc_id AND s.j = CAST(r.j AS INT)
        )""",
        f"""stats AS MATERIALIZED (
            SELECT j,
                   ((sx / {q}) / n) AS mu,
                   CASE WHEN ((sxx / {q}) / n
                              - ((sx / {q}) / n) * ((sx / {q}) / n)) <= 0
                        THEN 1.0
                        ELSE sqrt((sxx / {q}) / n
                                  - ((sx / {q}) / n) * ((sx / {q}) / n))
                   END AS sd
            FROM (
                SELECT j,
                       SUM(CAST(round(x * {q}) AS BIGINT)) AS sx,
                       SUM(CAST(round(x * x * {q}) AS BIGINT)) AS sxx,
                       count(*) AS n
                FROM grid GROUP BY j
            )
        )""",
        f"""feats AS MATERIALIZED (
            SELECT g.doc_id, g.y, g.j, ((g.x - t.mu) / t.sd) AS xj
            FROM grid g JOIN stats t USING (j)
            UNION ALL
            SELECT doc_id, y, {d} AS j, 1.0 AS xj FROM docs2
        )""",
        "nn AS MATERIALIZED (SELECT count(DISTINCT doc_id) AS n FROM feats)",
        f"w0 AS MATERIALIZED (SELECT CAST(r.j AS INT) AS j, 0.0 AS w FROM range({d + 1}) r(j))",
    ]
    for r in range(1, int(rounds) + 1):
        ctes.append(
            f"""m{r} AS MATERIALIZED (
            SELECT f.doc_id, f.y,
                   SUM(CAST(round(w.w * f.xj * {q}) AS BIGINT)) AS mq
            FROM feats f JOIN w{r - 1} w USING (j)
            GROUP BY f.doc_id, f.y
        )"""
        )
        ctes.append(
            f"""p{r} AS MATERIALIZED (
            SELECT doc_id, y,
                   round(1.0 / (1.0 + exp(-(mq / {q}))), 9) AS p
            FROM m{r}
        )"""
        )
        ctes.append(
            f"""g{r} AS MATERIALIZED (
            SELECT f.j,
                   SUM(CAST(round((p.p - f.y) * f.xj * {q}) AS BIGINT)) AS gs
            FROM feats f JOIN p{r} p USING (doc_id)
            GROUP BY f.j
        )"""
        )
        ctes.append(
            f"""w{r} AS MATERIALIZED (
            SELECT w.j,
                   w.w - {lr!r} * ((COALESCE(g.gs, 0) / {q}) / nn.n) AS w
            FROM w{r - 1} w LEFT JOIN g{r} g USING (j) CROSS JOIN nn
        )"""
        )
    rr = int(rounds)
    return (
        "WITH "
        + ",\n".join(ctes)
        + f""",
        mf AS (
            SELECT f.doc_id, f.y,
                   SUM(CAST(round(w.w * f.xj * {q}) AS BIGINT)) AS mq
            FROM feats f JOIN w{rr} w USING (j)
            GROUP BY f.doc_id, f.y
        )
        SELECT doc_id,
               CAST(y AS INT) AS y,
               round(round(1.0 / (1.0 + exp(-(mq / {q}))), 9), 6) AS qscore,
               CAST(round(1.0 / (1.0 + exp(-(mq / {q}))), 9)
                    >= {float(threshold)!r} AS INT) AS pred
        FROM mf
    """
    )
