"""Time-series operators: as-of join, interval (range) join, and
gap-based sessionization.

Not in the reference (no time/order semantics exist there — SURVEY §2.8);
these are the standard event-log operators a large-scale pipeline needs,
implemented with the one-shuffle union+window pattern (as-of) and
time-bucket equi-joins (interval) rather than naive range joins (which
explode to O(|L| x |R|) per key before filtering).

as-of join (backward): for each left row, the latest right row of the
same key with right_ts <= left_ts. Plan: tag both sides, union, one
window over (key) ordered by (ts, side, id) carrying the last non-null
right payload forward (`last(..., ignorenulls=True)`), then keep left
rows. One shuffle on the key; no range explosion; ties at equal ts
resolve right-row-first (i.e. a right row AT the left timestamp matches),
matching DuckDB's `ASOF JOIN ... ON l.ts >= r.ts` oracle semantics.

sessionize: the classic gap-based session id — a new session starts when
the gap to the previous event of the same key exceeds `gap_seconds`;
session_id = running sum of new-session flags. Two window passes over the
same (key, ts) partitioning — Catalyst evaluates both in ONE Window node
(same partition/order spec), so it is still a single shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_payload: list[str] | None = None,
    direction: str = "backward",
) -> DataFrame:
    """As-of join, both directions. Returns every left row plus the
    payload columns of the matched right row (NULLs when none):
    `backward` (default) matches the LATEST right row with
    right_ts <= left_ts; `forward` matches the EARLIEST right row with
    right_ts >= left_ts (the "next reading after" flavor — e.g. the
    first sensor sample at-or-after an order). Same one-shuffle
    union+window plan either way — the only differences are the window
    frame side (preceding/following), the carry function (last/first),
    and the equal-ts interleave order, which places right rows inside
    the left row's frame in BOTH directions (ties match, mirroring <=
    / >= semantics). Right rows should be unique per (key, ts) for
    fully deterministic output (dedupe upstream if not)."""
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    payload = right_payload or [c for c in right.columns if c not in (key, right_ts)]
    l_tag = left.select(
        F.col(key).alias("__k"),
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__is_left"),
        F.struct(*left.columns).alias("__l"),
        F.lit(None).cast(
            "struct<" + ",".join(f"{c}:{right.schema[c].dataType.simpleString()}" for c in payload) + ">"
        ).alias("__r"),
    )
    r_tag = right.select(
        F.col(key).alias("__k"),
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__is_left"),
        F.lit(None).cast(
            "struct<" + ",".join(f"{c}:{left.schema[c].dataType.simpleString()}" for c in left.columns) + ">"
        ).alias("__l"),
        F.struct(*payload).alias("__r"),
    )
    if direction == "backward":
        # at equal ts the right row sorts BEFORE the left row, so it
        # falls inside the left row's preceding frame (<= matches)
        w = (
            Window.partitionBy("__k")
            .orderBy("__ts", "__is_left")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        carry = F.last("__r", ignorenulls=True).over(w)
    else:
        # mirrored: right rows sort AFTER left at equal ts, inside the
        # left row's following frame (>= matches)
        w = (
            Window.partitionBy("__k")
            .orderBy(F.col("__ts").asc(), F.col("__is_left").desc())
            .rowsBetween(Window.currentRow, Window.unboundedFollowing)
        )
        carry = F.first("__r", ignorenulls=True).over(w)
    carried = l_tag.unionByName(r_tag).withColumn("__match", carry)
    out = carried.filter(F.col("__is_left") == 1).select(
        *[F.col("__l")[c].alias(c) for c in left.columns],
        *[F.col("__match")[c].alias(f"r_{c}") for c in payload],
    )
    return out


def interval_join(
    events: DataFrame,
    intervals: DataFrame,
    ts_col: str = "ts",
    start_col: str = "start",
    end_col: str = "end",
    bucket_seconds: int = 86400,
) -> DataFrame:
    """Range (interval) join: every (event, interval) pair with
    start <= ts <= end — WITHOUT an equi-key and WITHOUT a cross product.

    Plan: quantize time into `bucket_seconds` buckets; each interval
    explodes to the buckets it overlaps (native `sequence`), each event
    carries its single bucket; equi-join on bucket, then the exact range
    filter. An event's bucket always lies inside a covering interval's
    bucket span, and the pair shares exactly ONE bucket (the event's own),
    so the join is complete and duplicate-free with no distinct step.
    Work scales with overlaps (output-bound), not |events| x |intervals|;
    pick `bucket_seconds` near the median interval length so intervals
    explode to O(1) buckets. Skewed hot buckets split via AQE.
    """
    b = lambda c: F.floor(F.unix_timestamp(c) / bucket_seconds)  # noqa: E731
    ev = events.withColumn("__b", b(F.col(ts_col)))
    iv = intervals.withColumn(
        "__b", F.explode(F.sequence(b(F.col(start_col)), b(F.col(end_col))))
    )
    return (
        ev.join(iv, "__b")
        .filter((F.col(ts_col) >= F.col(start_col)) & (F.col(ts_col) <= F.col(end_col)))
        .drop("__b")
    )


def next_event_examples(
    events: DataFrame,
    key: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    gap_seconds: int = 1800,
    id_cols: tuple[str, ...] = ("event_id",),
) -> DataFrame:
    """Supervised next-event-prediction pairs off a clickstream — the
    events-table analogue of the text pipeline's chunk/pack step:
    each event labeled with the NEXT event's type for the same key,
    but only within a session (gap <= `gap_seconds`; the first event
    after a session break must not be the label of the last event of
    the previous session, and each key's final event has no label) —
    the standard training-example builder for sequential-recommendation
    / behavior models.

    Output: (key, *id_cols, event_type, next_type, gap_sec) — one row
    per event that HAS an in-session successor. ONE window over
    (key, ts, id_cols): lead() for the label and the gap in the same
    pass — the sessionize shuffle shape exactly, no join, no second
    shuffle. Deterministic tie-break on `id_cols`.
    """
    order = [F.col(ts_col).asc()] + [F.col(c).asc() for c in id_cols]
    w = Window.partitionBy(key).orderBy(*order)
    sec = F.unix_timestamp(ts_col)
    gap = F.lead(sec).over(w) - sec
    out = events.select(
        key,
        *id_cols,
        F.col(type_col).alias("event_type"),
        F.lead(type_col).over(w).alias("next_type"),
        gap.cast("long").alias("gap_sec"),
    )
    return out.filter(
        F.col("next_type").isNotNull()
        & (F.col("gap_sec") <= F.lit(int(gap_seconds)))
    )


def sessionize(
    events: DataFrame,
    key: str = "user_id",
    ts_col: str = "ts",
    gap_seconds: int = 1800,
    id_cols: tuple[str, ...] = ("event_id",),
) -> DataFrame:
    """Append a per-key `session_id` (0-based, in time order): a new
    session starts when the gap to the previous event exceeds
    `gap_seconds`. Deterministic tie-break on `id_cols`."""
    order = [F.col(ts_col).asc()] + [F.col(c).asc() for c in id_cols]
    w = Window.partitionBy(key).orderBy(*order)
    prev_ts = F.lag(ts_col).over(w)
    new_session = F.when(
        prev_ts.isNull()
        | (F.unix_timestamp(ts_col) - F.unix_timestamp(prev_ts) > gap_seconds),
        1,
    ).otherwise(0)
    return events.withColumn(
        "session_id",
        F.sum(new_session)
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast("long")
        - 1,
    )


def retention_cohorts(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Weekly cohort retention matrix — the classic product-analytics
    rollup (and the freshness/engagement dashboard a 100 TB clickstream
    pipeline materializes daily): cohort a user by the ISO week of
    their FIRST event, then count, for every (cohort_week, week_offset)
    cell, the distinct cohort users still active `week_offset` weeks
    later. week_offset 0 is the cohort size itself; a row's
    n_users / cohort-size column-0 value is the retention rate.

    Returns (cohort_week date, week_offset int, n_users bigint).

    Not in the reference (no time semantics there — SURVEY §2.8); the
    standard companion to `sessionize` / funnel_counts on the events
    table.

    Plan (100 TB): distinct (user, week) projection — ONE shuffle with
    map-side partial dedup, output bounded by users x active-weeks —
    then a per-user min for the cohort week (second shuffle on the
    already-narrow table, co-partitioned with the join-back that
    follows, so the join itself is shuffle-free; AQE broadcasts the
    cohort table when it is small), and a final (cohort, offset)
    aggregate whose output is at most weeks^2 rows. No window over raw
    events, no self-join on the event table. Week truncation is ISO
    Monday in both engines, so offsets are exact multiples of 7 days
    and the integer division is exact."""
    active = events.select(
        F.col(user_col).alias("user_id"),
        F.to_date(F.date_trunc("week", F.col(ts_col))).alias("week"),
    ).distinct()
    first = active.groupBy("user_id").agg(F.min("week").alias("cohort_week"))
    return (
        active.join(first, "user_id")
        .groupBy(
            "cohort_week",
            (F.datediff(F.col("week"), F.col("cohort_week")) / 7)
            .cast("int")
            .alias("week_offset"),
        )
        .agg(F.countDistinct("user_id").alias("n_users"))
    )


def robust_stats(
    events: DataFrame,
    key_col: str = "event_type",
    value_col: str = "value",
) -> tuple[DataFrame, DataFrame]:
    """Per-key exact (median, MAD) — the shared core of the batch
    `value_anomalies` gauge and the frozen-stats streaming gate.
    Returns (med, mad): med = (k, med, n), mad = (k, mad), both
    UNROUNDED doubles (bit-identical to DuckDB's quantile_cont; callers
    round at the output edge only). One shuffle per percentile on the
    gauge key; the medians broadcast back for the deviations. Both
    gauge tables are localCheckpoint()ed — each feeds 2-4 downstream
    consumers (joins + flag pass) and Spark does not CSE repeated
    subplans, so without the checkpoints the percentile aggregates
    re-execute per consumer (the repo's multi-consumer rule)."""
    kc, vc = F.col(key_col), F.col(value_col)
    med = events.groupBy(kc.alias("k")).agg(
        F.expr(f"percentile({value_col}, 0.5)").alias("med"),
        F.count(value_col).alias("n"),
    ).localCheckpoint(eager=False)
    mad = (
        events.select(kc.alias("k"), vc.alias("v"))
        .join(F.broadcast(med), "k")
        .withColumn("adev", F.abs(F.col("v") - F.col("med")))
        .groupBy("k")
        .agg(F.expr("percentile(adev, 0.5)").alias("mad"))
    ).localCheckpoint(eager=False)
    return med, mad


def value_anomalies(
    events: DataFrame,
    key_col: str = "event_type",
    value_col: str = "value",
    z: float = 3.0,
) -> DataFrame:
    """Robust per-key outlier gauge — the Hampel identifier (median /
    MAD with the Gaussian consistency constant 1.4826), the standard
    data-validation monitor a pipeline runs on every numeric column:
    unlike mean/stddev, a contaminated tail cannot mask itself (50%
    breakdown point). Flags value rows with
    |v - median| > z * 1.4826 * MAD.

    Returns per key: (key, n, med, mad, n_anomalies, anomaly_frac) —
    med/mad rounded 6dp, frac = anomalies/n rounded 6dp.

    Plan (100 TB): per-key exact median (ONE shuffle on the key),
    broadcast the per-key medians back for the absolute deviations,
    second per-key percentile for the MAD, broadcast again for the
    final count — the key table is gauge-sized (distinct keys), so
    both join-backs broadcast. Exact `percentile` buffers one group's
    values per aggregation state: fine for gauge keys (event types,
    sources, labels); for high-cardinality keys swap in
    approx_percentile — the documented seam, not taken here because
    the DuckDB twin (quantile_cont) is bit-identical to Spark's exact
    percentile (verified: interpolation arithmetic agrees) and keeps
    the oracle value-exact. Threshold compares are bit-deterministic
    cross-engine: same input doubles, same literal, same expression
    shape."""
    med, mad = robust_stats(events, key_col, value_col)
    kc, vc = F.col(key_col), F.col(value_col)
    dev = events.select(kc.alias("k"), vc.alias("v")).join(
        F.broadcast(med), "k"
    )
    thresh = F.lit(float(z)) * F.lit(1.4826) * F.col("mad")
    flagged = (
        dev.join(F.broadcast(mad), "k")
        .groupBy("k")
        .agg(
            F.sum(
                (F.abs(F.col("v") - F.col("med")) > thresh).cast("long")
            ).alias("n_anomalies")
        )
    )
    return (
        med.join(F.broadcast(mad), "k")
        .join(F.broadcast(flagged), "k")
        .select(
            F.col("k").alias(key_col),
            "n",
            F.round("med", 6).alias("med"),
            F.round("mad", 6).alias("mad"),
            "n_anomalies",
            F.round(F.col("n_anomalies") / F.col("n"), 6).alias(
                "anomaly_frac"
            ),
        )
    )


def value_anomalies_oracle_sql(
    key_col: str = "event_type",
    value_col: str = "value",
    z: float = 3.0,
) -> str:
    """DuckDB twin of `value_anomalies` (quantile_cont is bit-identical
    to Spark's exact interpolated percentile; same literals, same
    expression shape, so the threshold compares agree row-for-row)."""
    return f"""
        WITH med AS (
            SELECT {key_col} AS k,
                   quantile_cont({value_col}, 0.5) AS med,
                   count({value_col})::BIGINT AS n
            FROM events GROUP BY 1
        ),
        mad AS (
            SELECT e.{key_col} AS k,
                   quantile_cont(abs(e.{value_col} - m.med), 0.5) AS mad
            FROM events e JOIN med m ON e.{key_col} = m.k
            GROUP BY 1
        ),
        fl AS (
            SELECT e.{key_col} AS k,
                   sum((abs(e.{value_col} - m.med)
                        > {float(z)!r} * 1.4826 * d.mad)::BIGINT)::BIGINT
                       AS n_anomalies
            FROM events e
            JOIN med m ON e.{key_col} = m.k
            JOIN mad d ON e.{key_col} = d.k
            GROUP BY 1
        )
        SELECT m.k AS {key_col}, m.n,
               round(m.med, 6) AS med,
               round(d.mad, 6) AS mad,
               fl.n_anomalies,
               round(fl.n_anomalies / m.n, 6) AS anomaly_frac
        FROM med m JOIN mad d ON m.k = d.k JOIN fl ON m.k = fl.k
    """


def retention_cohorts_oracle_sql() -> str:
    """DuckDB twin of `retention_cohorts` — the single shared copy the
    driver oracle AND the pytest both consume (same week truncation,
    same exact day/7 division; offsets are multiples of 7 by
    construction so the integer cast is exact in both engines)."""
    return """
        WITH a AS (
            SELECT DISTINCT user_id,
                   CAST(date_trunc('week', CAST(ts AS TIMESTAMP))
                        AS DATE) AS week
            FROM events
        ),
        f AS (
            SELECT user_id, min(week) AS cohort_week
            FROM a GROUP BY user_id
        )
        SELECT f.cohort_week,
               CAST(date_diff('day', f.cohort_week, a.week) / 7
                    AS INT) AS week_offset,
               count(DISTINCT a.user_id)::BIGINT AS n_users
        FROM a JOIN f USING (user_id)
        GROUP BY 1, 2
    """
