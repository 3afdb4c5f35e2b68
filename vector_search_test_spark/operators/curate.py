"""End-to-end corpus curation: the full pretraining-data assembly line
as ONE composed operator (extension — no reference counterpart; the
reference's pipeline stops at embed -> index -> cluster, app.py:30-85).

`curate_corpus` chains the individually-certified stages into the
product a training run actually consumes:

    quality gate -> exact dedup -> near-dedup decisions ->
    benchmark decontamination -> chunk -> pack -> train/val/test split

yielding one row per (split, bucket, pack_id, chunk) — the final packed
training table. Every stage is the existing operator (textstats.
quality_score, dedup.dedup_exact, dedup.neardup_dedup_decisions,
sampling.contamination_report, chunking.chunk_documents / pack_chunks,
sampling.hash_split); this module contributes the COMPOSITION and its
reuse seams.

Scale shape (the 100 TB story):

- Stage outputs handed between filters are NARROW id-only keep-sets,
  `localCheckpoint()`ed so no downstream consumer re-executes an
  upstream pipeline (MinHash banding, connected components) — the
  id set is ~1e-4 of corpus width (at cluster scale the same seam is a
  parquet checkpoint; the plan shape is identical). The corpus itself
  is RE-SCANNED per stage (projection + pushed filters + one hash join
  against the checkpointed id set) — scans are the cheap, elastic
  resource; pipelines run exactly once, pinned by plan test.
- The text is chunk-tokenized exactly ONCE (chunk_documents's single
  posexplode); packing consumes the chunk rows' precomputed n_tokens
  (one shuffle on the pack bucket) and the split column is a scan-side
  projection over the packed rows (md5 hash-range on the DOCUMENT id,
  so every chunk of a document lands in the same split — no
  train/test leakage through overlapping chunks).
- Nothing is all-pairs and nothing full-width shuffles: quality is a
  scan filter, exact dedup one hash shuffle on normalized text,
  near-dedup the banded LSH equi-join + CC on the (tiny) edge list,
  decontamination a broadcast-semi against the benchmark shingle set.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_SPLIT_WEIGHTS = {"train": 0.8, "val": 0.1, "test": 0.1}


def _rules_pred(rules: "tuple[str, ...]", text_col: str):
    """Boolean Column conjunction for the published rule families the
    quality stage stacks onto the numeric score (Gopher ∧ C4) — ONE
    definition so curate_corpus, curation_funnel, and curation_explain
    gate on literally the same predicate (ADVICE r14: explain used to
    omit `rules` while claiming identical stage semantics). Returns
    None when no families are requested; still scan-side either way."""
    pred = None
    for fam in rules:
        if fam == "gopher":
            from ..functions.textstats import gopher_flags

            cond = gopher_flags(text_col)["gopher_pass"] == 1
        elif fam == "c4":
            from ..functions.textstats import c4_flags

            cond = c4_flags(text_col)["c4_pass"] == 1
        else:
            raise ValueError(
                f"unknown rule family {fam!r}; expected 'gopher' or 'c4'"
            )
        pred = cond if pred is None else (pred & cond)
    return pred


def curate_corpus(
    docs: DataFrame,
    benchmark: DataFrame,
    *,
    quality_min: float = 0.55,
    neardup_n: int = 3,
    neardup_hashes: int = 16,
    neardup_bands: int = 4,
    neardup_threshold: float = 0.9,
    contam_n: int = 3,
    contam_threshold: float = 0.5,
    chunk_size: int = 64,
    chunk_overlap: int = 8,
    pack_budget: int = 256,
    pack_buckets: int = 16,
    split_weights: "dict[str, float] | None" = None,
    rules: "tuple[str, ...]" = (),
    id_col: str = "doc_id",
    text_col: str = "text",
    stage_times: "dict[str, float] | None" = None,
    neardup_prebuilt: "MinhashTables | None" = None,
) -> DataFrame:
    """The curated, chunked, packed, split training table.

    Returns one row per chunk of every SURVIVING document:
    (id, chunk_id, chunk_text, n_tokens, bucket, pack_id, split).
    A document survives iff it (1) scores >= `quality_min`, (2) is the
    min-id representative of its exact (normalized-text) duplicate
    group, (3) is the min-id representative of its near-duplicate
    connected component (MinHash-LSH at `neardup_threshold`), and
    (4) has < `contam_threshold` word-`contam_n`-gram overlap with the
    benchmark set. Stage order is fixed: each stage sees only the
    previous stage's survivors, so e.g. a contaminated document can
    still have been the dedup representative that eliminated its
    duplicates (matching how production pipelines sequence these).

    All decisions are deterministic (hash-based, order-free), so the
    output is stable across runs, partitionings, and engines — the
    DuckDB twin reproduces it value-for-value.

    `stage_times` (optional, VERDICT r10 next-#2): a dict the caller
    supplies to receive wall-clock seconds for the EAGER stage
    boundaries — the three `localCheckpoint()` materializations:
    ``quality_exact_dedup`` (quality scan + the exact-dedup hash
    shuffle), ``near_dedup`` (MinHash banding + candidate verify + CC),
    ``decontam`` (broadcast shingle overlap + anti-join). The
    chunk/pack/split tail is lazy — it executes in the caller's sink
    and is the remainder bench.py reports."""
    from ..functions.chunking import chunk_documents, pack_chunks
    from ..functions.textstats import quality_score
    from .dedup import dedup_exact, neardup_dedup_decisions
    from .sampling import contamination_report, hash_split

    import time as _time

    from ..io import spread

    weights = split_weights or DEFAULT_SPLIT_WEIGHTS
    _t0 = _time.perf_counter()
    # spread: every stage's map side (quality scoring, normalize-and-
    # hash, shingling, chunk tokenize) re-scans this base — off a 1-2
    # file source they would all run 1-2 tasks wide (no-op at scale)
    base = spread(docs.select(F.col(id_col), F.col(text_col)), id_col)

    # stage 1 — quality gate: native-expression filter, reaches the scan.
    # `rules` stacks published rule families (Gopher ∧ C4) onto the
    # numeric score — still one scan-side conjunction, no extra pass
    good = base.filter(quality_score(text_col) >= F.lit(float(quality_min)))
    rules_pred = _rules_pred(rules, text_col)
    if rules_pred is not None:
        good = good.filter(rules_pred)

    # stage 2 — exact dedup: min-id representative per normalized text.
    # The keep-set is id-only and checkpointed: every later consumer
    # joins it instead of re-running the dedup shuffle.
    exact_ids = (
        dedup_exact(good, id_col=id_col, text_col=text_col)
        .select(F.col("rep_id").alias(id_col))
        .localCheckpoint()
    )
    if stage_times is not None:
        stage_times["quality_exact_dedup"] = round(_time.perf_counter() - _t0, 4)
        _t0 = _time.perf_counter()
    # joined against BASE, not `good`: exact_ids is a subset of good's
    # ids by construction (reps come from good), so the rows are
    # identical either way — but joining `good` would re-evaluate the
    # quality predicate over the whole corpus once per downstream
    # consumer of this frame (r16 measurement: the near-dedup stage
    # read it 3x through the prebuilt semi-joins + nodes set)
    exact_kept = base.join(exact_ids, id_col)

    # stage 3 — near-dedup: LSH pairs -> connected components -> keep
    # min-id per component. Runs once; only the keep-set survives it.
    # `neardup_prebuilt`: an optional full-corpus minhash_tables()
    # bundle (dedup.MinhashTables — the persistent signature-table
    # asset, carrying its family params for mismatch validation);
    # neardup_minhash restricts it to this stage's survivors with a
    # semi-join instead of re-shingling and re-hashing them
    nd_ids = (
        neardup_dedup_decisions(
            exact_kept,
            id_col=id_col,
            text_col=text_col,
            n=neardup_n,
            num_hashes=neardup_hashes,
            bands=neardup_bands,
            threshold=neardup_threshold,
            prebuilt=neardup_prebuilt,
        )
        .filter("keep")
        .select(F.col("id").alias(id_col))
        .localCheckpoint()
    )
    if stage_times is not None:
        stage_times["near_dedup"] = round(_time.perf_counter() - _t0, 4)
        _t0 = _time.perf_counter()
    nd_kept = base.join(nd_ids, id_col)

    # stage 4 — decontamination: overlap vs the (broadcast) benchmark
    # shingle set. Documents too short to shingle are absent from the
    # report and therefore kept (nothing to match on).
    contaminated = (
        contamination_report(
            nd_kept,
            benchmark,
            n=contam_n,
            threshold=contam_threshold,
            id_col=id_col,
            text_col=text_col,
        )
        .filter("contaminated")
        .select(F.col("id").alias(id_col))
    )
    kept_ids = nd_ids.join(contaminated, id_col, "left_anti").localCheckpoint()
    if stage_times is not None:
        stage_times["decontam"] = round(_time.perf_counter() - _t0, 4)
    curated = base.join(kept_ids, id_col)

    # stages 5-7 — chunk once (single posexplode), pack on the
    # precomputed token counts (one bucket shuffle), split on the
    # document id (scan-side projection; doc-granular so overlapping
    # chunks can never straddle train/test)
    chunks = chunk_documents(
        curated,
        size=chunk_size,
        overlap=chunk_overlap,
        id_col=id_col,
        text_col=text_col,
    )
    packed = pack_chunks(chunks, budget=pack_budget, n_buckets=pack_buckets)
    return hash_split(packed, weights, id_col="id")


def curation_funnel(
    docs: DataFrame,
    benchmark: DataFrame,
    *,
    quality_min: float = 0.55,
    neardup_n: int = 3,
    neardup_hashes: int = 16,
    neardup_bands: int = 4,
    neardup_threshold: float = 0.9,
    contam_n: int = 3,
    contam_threshold: float = 0.5,
    rules: "tuple[str, ...]" = (),
    id_col: str = "doc_id",
    text_col: str = "text",
    neardup_prebuilt: "MinhashTables | None" = None,
) -> DataFrame:
    """The curation FUNNEL — per-stage survivor counts for the exact
    doc-granular gate sequence `curate_corpus` applies (quality ->
    exact dedup -> near-dedup -> decontamination), the retention chart
    every curation report leads with and the first thing a pipeline
    owner checks when a stage starts over- or under-dropping.

    Output: one row per stage — (stage_id, stage, n_docs, n_dropped,
    drop_frac, retention) with stage_id 0 = 'input', n_dropped vs the
    previous stage, drop_frac = round(n_dropped / previous, 6), and
    retention = round(n_docs / input, 6) (cumulative). Stage semantics
    and order are IDENTICAL to curate_corpus (same operators, same
    params, same keep-set seams), so the funnel is the measurement of
    that pipeline, not a reimplementation of it.

    Scale shape: each stage count is ONE map-side-combined aggregate;
    the dedup keep-sets are id-only and localCheckpoint()ed exactly
    like curate_corpus's seams, so the MinHash banding and the CC run
    once; the final window runs over 5 rows. Nothing wide shuffles.
    """
    from functools import reduce

    from pyspark.sql import Window

    from ..functions.textstats import quality_score
    from ..io import spread
    from .dedup import dedup_exact, neardup_dedup_decisions
    from .sampling import contamination_report

    base = spread(docs.select(F.col(id_col), F.col(text_col)), id_col)
    good = base.filter(quality_score(text_col) >= F.lit(float(quality_min)))
    rules_pred = _rules_pred(rules, text_col)
    if rules_pred is not None:
        good = good.filter(rules_pred)
    exact_ids = (
        dedup_exact(good, id_col=id_col, text_col=text_col)
        .select(F.col("rep_id").alias(id_col))
        .localCheckpoint()
    )
    # base, not good: identical rows (exact_ids ⊆ good ids), without
    # re-evaluating the quality predicate per downstream consumer —
    # see the curate_corpus note
    exact_kept = base.join(exact_ids, id_col)
    nd_ids = (
        neardup_dedup_decisions(
            exact_kept,
            id_col=id_col,
            text_col=text_col,
            n=neardup_n,
            num_hashes=neardup_hashes,
            bands=neardup_bands,
            threshold=neardup_threshold,
            prebuilt=neardup_prebuilt,
        )
        .filter("keep")
        .select(F.col("id").alias(id_col))
        .localCheckpoint()
    )
    nd_kept = base.join(nd_ids, id_col)
    contaminated = (
        contamination_report(
            nd_kept,
            benchmark,
            n=contam_n,
            threshold=contam_threshold,
            id_col=id_col,
            text_col=text_col,
        )
        .filter("contaminated")
        .select(F.col("id").alias(id_col))
    )
    kept_ids = nd_ids.join(contaminated, id_col, "left_anti")

    stages = [
        (0, "input", base),
        (1, "quality", good),
        (2, "exact_dedup", exact_ids),
        (3, "near_dedup", nd_ids),
        (4, "decontam", kept_ids),
    ]
    counts = reduce(
        DataFrame.unionByName,
        [
            df.agg(
                F.lit(sid).cast("int").alias("stage_id"),
                F.lit(name).alias("stage"),
                F.count("*").alias("n_docs"),
            )
            for sid, name, df in stages
        ],
    )
    w = Window.orderBy("stage_id")
    wall = Window.orderBy("stage_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    prev = F.lag("n_docs").over(w)
    return counts.select(
        "stage_id",
        "stage",
        "n_docs",
        F.coalesce(prev - F.col("n_docs"), F.lit(0)).cast("long").alias(
            "n_dropped"
        ),
        # nullif guards: when a stage empties (prev = 0 — e.g. a
        # stacked rule gate rejecting everything), ANSI Spark would
        # raise DIVIDE_BY_ZERO where the DuckDB twin yields NULL; the
        # nullif reproduces DuckDB's x/0 -> NULL, then the same
        # coalesce both engines apply
        F.coalesce(
            F.round(
                (prev - F.col("n_docs")) / F.nullif(prev, F.lit(0)), 6
            ),
            F.lit(0.0),
        ).alias("drop_frac"),
        F.round(
            F.col("n_docs")
            / F.nullif(F.first("n_docs").over(wall), F.lit(0)),
            6,
        ).alias("retention"),
    )


def curation_explain(
    docs: DataFrame,
    benchmark: DataFrame,
    *,
    quality_min: float = 0.55,
    neardup_n: int = 3,
    neardup_hashes: int = 16,
    neardup_bands: int = 4,
    neardup_threshold: float = 0.9,
    contam_n: int = 3,
    contam_threshold: float = 0.5,
    rules: "tuple[str, ...]" = (),
    id_col: str = "doc_id",
    text_col: str = "text",
    neardup_prebuilt: "MinhashTables | None" = None,
) -> DataFrame:
    """Row-level curation EXPLAIN — the per-document companion of
    `curation_funnel`: for EVERY input document, which gate decided
    its fate, and who absorbed it. The debugging surface a pipeline
    owner actually uses ("why did doc X disappear?") and the
    provenance record a takedown/audit request needs at scale.

    Output: one row per input doc — (id, verdict, rep_id, q_score,
    overlap) with verdict ∈ {'quality', 'exact_dup', 'near_dup',
    'contaminated', 'kept'} following the pipeline's fixed stage
    order (a document is attributed to the FIRST gate that dropped
    it); rep_id = the representative that absorbed it (exact-group
    min id, or the near-dup connected-component representative),
    NULL for the other verdicts; q_score always present (6dp);
    overlap = the decontamination report's benchmark n-gram overlap
    where the doc reached that stage and had shingles, else NULL.

    Stage semantics are IDENTICAL to curate_corpus/curation_funnel
    (same operators, same params, same keep-set seams); the exact-dup
    representative comes from a min-over-window on the same
    normalized-text key dedup_exact groups on. Scale shape: one
    window on the normalized-text hash partition, the same banded
    near-dup machinery (via `neardup_prebuilt` it reuses persistent
    signatures), broadcast contamination — plus narrow left joins to
    assemble verdicts. Nothing all-pairs; the wide text column never
    shuffles (only id-keyed decision rows do)."""
    from pyspark.sql import Window

    from ..functions.textstats import quality_score
    from ..io import spread
    from .dedup import neardup_dedup_decisions
    from .sampling import contamination_report

    base = spread(docs.select(F.col(id_col), F.col(text_col)), id_col)
    # the gate compares the RAW score, exactly like curate_corpus /
    # curation_funnel; q_score is rounded for display only. `rules`
    # folds the same _rules_pred conjunction those two filter on into
    # the verdict gate (ADVICE r14); the coalesce makes the boolean
    # column exactly filter-equivalent (a NULL predicate DROPS in a
    # filter, so it must read as not-good here, never as undecided)
    gate = quality_score(text_col) >= F.lit(float(quality_min))
    rules_pred = _rules_pred(rules, text_col)
    if rules_pred is not None:
        gate = gate & rules_pred
    scored = base.withColumn(
        "q_score", F.round(quality_score(text_col), 6)
    ).withColumn("__good", F.coalesce(gate, F.lit(False)))
    # exact representative among the quality survivors: min id over the
    # SAME normalized-text key dedup_exact groups on
    norm = F.trim(F.lower(F.col(text_col)))
    w = Window.partitionBy(norm)
    scored = scored.withColumn(
        "__exact_rep",
        F.min(F.when(F.col("__good"), F.col(id_col))).over(w),
    )
    exact_kept = scored.filter(
        F.col("__good") & (F.col(id_col) == F.col("__exact_rep"))
    ).select(F.col(id_col), F.col(text_col))
    nd = neardup_dedup_decisions(
        exact_kept,
        id_col=id_col,
        text_col=text_col,
        n=neardup_n,
        num_hashes=neardup_hashes,
        bands=neardup_bands,
        threshold=neardup_threshold,
        prebuilt=neardup_prebuilt,
    ).select(
        F.col("id").alias(id_col),
        F.col("rep_id").alias("__nd_rep"),
        F.col("keep").alias("__nd_keep"),
    )
    nd_kept = base.join(
        nd.filter("__nd_keep").select(id_col), id_col
    )
    contam = contamination_report(
        nd_kept,
        benchmark,
        n=contam_n,
        threshold=contam_threshold,
        id_col=id_col,
        text_col=text_col,
    ).select(
        F.col("id").alias(id_col),
        F.round("overlap", 6).alias("overlap"),
        F.col("contaminated").alias("__contam"),
    )
    out = (
        scored.join(nd, id_col, "left")
        .join(contam, id_col, "left")
    )
    verdict = (
        F.when(~F.col("__good"), F.lit("quality"))
        .when(F.col(id_col) != F.col("__exact_rep"), F.lit("exact_dup"))
        .when(~F.col("__nd_keep"), F.lit("near_dup"))
        .when(F.coalesce(F.col("__contam"), F.lit(False)), F.lit("contaminated"))
        .otherwise(F.lit("kept"))
    )
    rep = (
        F.when(~F.col("__good"), F.lit(None).cast("long"))
        .when(F.col(id_col) != F.col("__exact_rep"), F.col("__exact_rep"))
        .when(~F.col("__nd_keep"), F.col("__nd_rep"))
        .otherwise(F.lit(None).cast("long"))
    )
    return out.select(
        F.col(id_col).alias("id"),
        verdict.alias("verdict"),
        rep.alias("rep_id"),
        "q_score",
        "overlap",
    )
