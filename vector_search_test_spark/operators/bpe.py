"""Distributed byte-pair-encoding merge training (Sennrich, Haddow &
Birch, ACL 2016 — the subword-vocabulary algorithm behind GPT/BERT-class
tokenizers; Gage 1994 for the original compression form).

The key scale fact BPE training exploits: after the first projection the
algorithm never touches the corpus again — it runs on the WORD VOCABULARY
with counts (Heaps-law sublinear in corpus size), exactly how the
reference implementations (subword-nmt, HuggingFace trainers) structure
it. Per round: count adjacent symbol pairs weighted by word frequency,
take the argmax, merge it greedily left-to-right inside every word,
repeat. The merge list IS the tokenizer artifact.

Spark shape (100 TB):
- ONE corpus-sized token-explode shuffle builds the (word, count) vocab;
  every later round is vocabulary-sized.
- Pair counts per round: shifted-slice zip over the symbol arrays (the
  bigram_lm_scores trick) -> (a, b) sum(count) shuffle with map-side
  combine.
- The argmax is a 1-row `orderBy(count desc, a, b).limit(1)` collect —
  the same bounded driver step as k-means centroid selection (BASELINE:
  driver-trained codebooks pattern); rounds are inherently sequential,
  so BPE cannot avoid one driver round-trip per merge.
- The merge application is a pure JVM `aggregate` fold over each word's
  symbol array (greedy non-overlapping left-to-right, the paper's rule)
  — no Python, no shuffle; the vocab is `localCheckpoint()`ed each
  round so round r+1 does not replay rounds 1..r's folds (the repo's
  multi-consumer rule).

Determinism: counts are integers; argmax ties break (count desc, a asc,
b asc); the greedy fold is sequential by definition — the DuckDB twin
unrolls the same rounds with a string-encoded `list_reduce` fold and
matches value-for-value.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def merge_pair(s: Column, a: Column, b: Column) -> Column:
    """Greedy left-to-right non-overlapping merge of adjacent (a, b)
    into the concatenated symbol a||b inside one symbol array — the BPE
    merge-application rule. Runs of a == b merge floor(run/2) times
    ([a,a,a] -> [aa, a]), matching subword-nmt. Pure JVM fold
    (F.aggregate with a (out, pending) struct accumulator): scan-only,
    no Python."""
    init = F.struct(
        F.array().cast("array<string>").alias("out"), F.lit("").alias("pend")
    )

    def step(acc, x):
        return (
            F.when(
                (acc["pend"] == a) & (x == b),
                F.struct(
                    F.array_append(acc["out"], F.concat(a, b)).alias("out"),
                    F.lit("").alias("pend"),
                ),
            )
            .when(
                acc["pend"] == F.lit(""),
                F.struct(acc["out"].alias("out"), x.alias("pend")),
            )
            .otherwise(
                F.struct(
                    F.array_append(acc["out"], acc["pend"]).alias("out"),
                    x.alias("pend"),
                ),
            )
        )

    def fin(acc):
        return F.when(acc["pend"] == F.lit(""), acc["out"]).otherwise(
            F.array_append(acc["out"], acc["pend"])
        )

    return F.aggregate(s, init, step, fin)


def _pair_counts(vocab: DataFrame) -> DataFrame:
    """(a, b, pair_count) over the symbolized vocab, weighted by word
    frequency — one vocabulary-sized shuffle with map-side combine."""
    n = F.size("s")
    pairs = F.when(
        n >= 2,
        F.zip_with(
            F.slice("s", 1, n - 1),
            F.slice("s", 2, n - 1),
            lambda x, y: F.struct(x.alias("a"), y.alias("b")),
        ),
    ).otherwise(F.array().cast("array<struct<a:string,b:string>>"))
    return (
        vocab.select("cnt", F.explode(pairs).alias("p"))
        .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
        .agg(F.sum("cnt").cast("long").alias("pair_count"))
    )


def bpe_merges(
    docs: DataFrame,
    text_col: str = "text",
    rounds: int = 8,
) -> DataFrame:
    """Train `rounds` BPE merges on the corpus; returns the merge table
    (round, left, right, merged, pair_count) — round 1-based, in merge
    order (the artifact a tokenizer replays). Stops early if no pair is
    left to merge (every word fully fused). See the module docstring
    for the scale argument; the returned table is rounds-sized and
    driver-assembled from one bounded 1-row collect per round, the
    k-means-centroid pattern."""
    if rounds < 1:
        raise ValueError(f"rounds must be >= 1, got {rounds}")
    spark = docs.sparkSession
    vocab = (
        docs.select(
            F.explode(F.split(F.lower(F.col(text_col)), " ")).alias("w")
        )
        .filter((F.col("w") != "") & (~F.col("w").contains("\x1f")))
        .groupBy("w")
        .agg(F.count("*").alias("cnt"))
        .select(F.split("w", "").alias("s"), "cnt")
        .localCheckpoint(eager=False)
    )
    merges: list[tuple[int, str, str, str, int]] = []
    for r in range(1, rounds + 1):
        best = (
            _pair_counts(vocab)
            .orderBy(F.desc("pair_count"), F.asc("a"), F.asc("b"))
            .limit(1)
            .collect()
        )
        if not best:
            break
        a, b, c = best[0].a, best[0].b, best[0].pair_count
        merges.append((r, a, b, a + b, int(c)))
        vocab = vocab.select(
            merge_pair(F.col("s"), F.lit(a), F.lit(b)).alias("s"), "cnt"
        ).localCheckpoint(eager=False)
    return spark.createDataFrame(
        merges,
        "round int, left string, right string, merged string, pair_count long",
    )


_FOLD_LAMBDA = """list_reduce(s, (acc, x) ->
    CASE
      WHEN len(string_split(acc, chr(31))) = 2 THEN
        CASE
          WHEN string_split(acc, chr(31))[2] = a AND x = b
            THEN concat(string_split(acc, chr(31))[1], ' ', a, b, chr(31))
          WHEN string_split(acc, chr(31))[2] = ''
            THEN concat(string_split(acc, chr(31))[1], chr(31), x)
          ELSE concat(string_split(acc, chr(31))[1], ' ',
                      string_split(acc, chr(31))[2], chr(31), x)
        END
      ELSE
        CASE WHEN acc = a AND x = b
             THEN concat(' ', a, b, chr(31))
             ELSE concat(' ', acc, chr(31), x) END
    END)"""

_FOLD_FINISH = """list_filter(string_split(trim(CASE
    WHEN len(string_split(f, chr(31))) = 2
    THEN concat(string_split(f, chr(31))[1], ' ',
                string_split(f, chr(31))[2])
    ELSE f END), ' '), x -> x != '')"""


def bpe_merges_oracle_sql(rounds: int = 8) -> str:
    """DuckDB twin of `bpe_merges`: the same rounds unrolled as chained
    CTEs. The greedy merge fold is a `list_reduce` with a
    string-encoded (out, pending) accumulator (chr(31) separator —
    words containing the US control char are excluded from the
    vocabulary on BOTH sides so the separator is genuinely
    unreachable; a bare accumulator with no separator is the reduce's
    implicit first-element init, a lone pending symbol); the argmax is the same (pair_count desc, a, b)
    limit 1. Fold verified equivalent to merge_pair on runs
    ([a,a,a] -> [aa, a]), alternations, and single-symbol words
    (tests/test_bpe.py)."""
    ctes = [
        """v0 AS (
            SELECT string_split(w, '') AS s, count(*)::BIGINT AS cnt
            FROM (
                SELECT unnest(string_split(lower(text), ' ')) AS w
                FROM documents
            ) WHERE w != '' AND strpos(w, chr(31)) = 0 GROUP BY w
        )"""
    ]
    selects = []
    for r in range(1, rounds + 1):
        ctes.append(
            f"""p{r} AS (
            SELECT s[i] AS a, s[i + 1] AS b, sum(cnt)::BIGINT AS pair_count
            FROM v{r - 1}, unnest(range(1, len(s))) AS u(i)
            GROUP BY 1, 2
        )"""
        )
        ctes.append(
            f"""b{r} AS (
            SELECT a, b, pair_count FROM p{r}
            ORDER BY pair_count DESC, a, b LIMIT 1
        )"""
        )
        ctes.append(
            f"""v{r} AS (
            SELECT {_FOLD_FINISH} AS s, cnt
            FROM (
                SELECT cnt, {_FOLD_LAMBDA} AS f
                FROM v{r - 1} CROSS JOIN b{r}
            )
        )"""
        )
        selects.append(
            f"SELECT {r} AS round, a AS left, b AS right,"
            f" a || b AS merged, pair_count FROM b{r}"
        )
    return "WITH " + ",\n".join(ctes) + "\n" + "\nUNION ALL\n".join(selects)


def bpe_fertility(
    docs: DataFrame,
    text_col: str = "text",
    strata_col: str = "source",
    rounds: int = 8,
    merges: list[tuple[str, str]] | None = None,
) -> DataFrame:
    """Tokenizer-eval composition: train `rounds` BPE merges
    (`bpe_merges`), REPLAY them over the corpus, and report per-stratum
    fertility — subwords per word, the standard tokenizer-quality
    metric (a rising fertility on a source means the vocabulary fits it
    badly). Returns (source, n_words, n_subwords, fertility) with
    fertility rounded 6dp.

    Plan (100 TB): the merges apply to the DISTINCT-WORD vocabulary
    (Heaps-sublinear), as `rounds` chained scan-only JVM folds in ONE
    projection; the corpus then joins word -> subword_count via
    broadcast of that vocab table and aggregates per stratum — the
    corpus is scanned once and never carries symbol arrays. The
    training rounds are bpe_merges' (bounded 1-row argmax collect per
    round); pass `merges` (ordered (left, right) pairs) to replay an
    already-trained table instead of retraining."""
    trained = (
        list(merges)
        if merges is not None
        else [
            (r.left, r.right)
            for r in bpe_merges(docs, text_col=text_col, rounds=rounds)
            .orderBy("round")
            .collect()
        ]
    )
    words = docs.select(
        F.col(strata_col).alias("source"),
        F.explode(F.split(F.lower(F.col(text_col)), " ")).alias("w"),
    ).filter((F.col("w") != "") & (~F.col("w").contains("\x1f")))
    sym = F.split("w", "")
    for a, b in trained:
        sym = merge_pair(sym, F.lit(a), F.lit(b))
    vocab = (
        words.select("w").distinct().select("w", F.size(sym).alias("n_sub"))
    )
    return (
        words.join(F.broadcast(vocab), "w")
        .groupBy("source")
        .agg(
            F.count("*").alias("n_words"),
            F.sum("n_sub").cast("long").alias("n_subwords"),
        )
        .select(
            "source",
            "n_words",
            "n_subwords",
            F.round(F.col("n_subwords") / F.col("n_words"), 6).alias(
                "fertility"
            ),
        )
    )


def bpe_encode(
    docs: DataFrame,
    merges: "list[tuple[str, str]]",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """APPLY a trained BPE merge table to the corpus — the step a
    tokenizer change actually costs at 100 TB (bpe_merges trains,
    bpe_fertility evaluates; this RE-TOKENIZES). One row per document:
    (id, n_words, n_chars, n_subwords, fertility, tokens_md5) — the
    before/after token counts plus an md5 fingerprint of the full
    ORDERED subword stream (space-joined, words in document order), so
    the oracle certifies the actual encoding, not just its size.

    Scale shape: a corpus rewrite is inherently a full scan, so the
    encode runs as ONE scan-side projection with ZERO shuffles — the
    greedy merge folds (merge_pair, bounded rounds = len(merges))
    apply per word inside a `transform` over the split array, all JVM
    HOFs, no Python, no explode, no groupBy; output rows = input rows
    and each document's row never leaves its partition. (This trades
    away bpe_fertility's Heaps-law distinct-word optimization for the
    shuffle-free map: re-tokenization materializes per document
    anyway, and a per-occurrence fold beats shuffling the corpus
    twice to reassemble ordered token streams from a vocab join.)
    Word filtering matches the trainer exactly (empty and
    chr(31)-containing words dropped; the filter runs JVM-side so
    tokenization semantics — lower(), split — cannot drift from the
    trainer's); `fertility` is NULL for documents with no valid words,
    tokens_md5 = md5('') for them.

    r16 kernel: the merge folds run in an Arrow batch kernel with a
    per-TASK distinct-word cache (guide §4.2) instead of per-occurrence
    JVM HOF folds. The fold chain is CodegenFallback-interpreted on the
    JVM (~rounds * |word| boxed steps per OCCURRENCE — measured 6.7 s
    at sf0.1); the kernel encodes each distinct word once per task
    (Heaps-law sublinear, the same distinct-word fact bpe_fertility
    exploits — a 31-word fixture vocabulary collapses 270k folds to 31
    per task) and reassembles per-document counts + the ordered-stream
    md5 with hashlib (byte-identical to F.md5 over the identical
    UTF-8 join). The cache is per task, so executor memory stays
    bounded by a task's distinct words; zero shuffles, still one
    scan-side map, document rows never leave their partition.
    fertility stays a JVM F.round (HALF_UP) over the kernel's counts.
    The Python fold mirrors merge_pair exactly (greedy left-to-right
    non-overlapping, [a,a,a] -> [aa,a]); agreement is pytest-pinned
    including astral-plane code points."""
    import hashlib

    import pandas as pd

    merge_list = [(str(a), str(b)) for a, b in merges]

    def _encode(word: str) -> "list[str]":
        sym = list(word)
        for a, b in merge_list:
            ab = a + b
            out: list[str] = []
            pend = ""
            for x in sym:
                if pend == a and x == b:
                    out.append(ab)
                    pend = ""
                elif pend == "":
                    pend = x
                else:
                    out.append(pend)
                    pend = x
            if pend != "":
                out.append(pend)
            sym = out
        return sym

    def _kernel(batches):
        cache: dict[str, list[str]] = {}
        for pdf in batches:
            ids = pdf["id"]
            rows = []
            for ws in pdf["__w"]:
                if ws is None:
                    # NULL text -> NULL words array: propagate NULLs
                    # exactly like the previous all-JVM projection
                    rows.append((None, None, None, None))
                    continue
                n_words = len(ws)
                n_chars = 0
                n_sub = 0
                h = hashlib.md5()
                first = True
                for w in ws:
                    toks = cache.get(w)
                    if toks is None:
                        toks = _encode(w)
                        cache[w] = toks
                    n_chars += len(w)
                    n_sub += len(toks)
                    for t in toks:
                        if first:
                            first = False
                        else:
                            h.update(b" ")
                        h.update(t.encode("utf-8"))
                rows.append((n_words, n_chars, n_sub, h.hexdigest()))
            yield pd.DataFrame(
                {
                    "id": ids,
                    "n_words": [r[0] for r in rows],
                    "n_chars": [r[1] for r in rows],
                    "n_subwords": [r[2] for r in rows],
                    "tokens_md5": [r[3] for r in rows],
                }
            )

    words = F.filter(
        F.split(F.lower(F.col(text_col)), " "),
        lambda w: (w != F.lit("")) & (~w.contains("\x1f")),
    )
    base = docs.select(F.col(id_col).alias("id"), words.alias("__w"))
    counted = base.mapInPandas(
        _kernel,
        "id long, n_words long, n_chars long, n_subwords long, "
        "tokens_md5 string",
    )
    return counted.select(
        "id",
        "n_words",
        "n_chars",
        "n_subwords",
        F.round(
            F.col("n_subwords") / F.nullif(F.col("n_words"), F.lit(0)), 6
        ).alias("fertility"),
        "tokens_md5",
    )


def bpe_encode_oracle_sql(rounds: int = 8) -> str:
    """DuckDB twin of `bpe_encode` over merges trained in-SQL by the
    bpe_merges_oracle_sql CTE chain (the same bounded-rounds pattern as
    the fertility twin, bx fallback included): the positioned word
    stream joins the replayed distinct-word vocabulary, per-doc token
    streams reassemble with string_agg ORDER BY word position, and a
    LEFT JOIN from `documents` keeps no-valid-word docs as md5('')
    rows exactly like the Spark side."""
    train = bpe_merges_oracle_sql(rounds)
    cte_body = train[len("WITH ") : train.index("\nSELECT 1 AS round")]
    ctes = [cte_body]
    ctes.append(
        """cw AS (
            SELECT d.doc_id AS id, ws[pos] AS w, pos
            FROM (
                SELECT doc_id, string_split(lower(text), ' ') AS ws
                FROM documents
            ) d, unnest(range(1, len(ws) + 1)) AS u(pos)
            WHERE ws[pos] != '' AND strpos(ws[pos], chr(31)) = 0
        )""".strip()
    )
    ctes.append(
        "a0 AS (SELECT DISTINCT w, string_split(w, '') AS s FROM cw)"
    )
    for r in range(1, rounds + 1):
        ctes.append(
            f"""bx{r} AS (
            SELECT coalesce((SELECT a FROM b{r}), '') AS a,
                   coalesce((SELECT b FROM b{r}), '') AS b
        )"""
        )
        ctes.append(
            f"""a{r} AS (
            SELECT w, {_FOLD_FINISH} AS s
            FROM (
                SELECT w, {_FOLD_LAMBDA} AS f
                FROM a{r - 1} CROSS JOIN bx{r}
            )
        )"""
        )
    ctes.append(
        f"""per AS (
            SELECT cw.id,
                   count(*)::BIGINT AS n_words,
                   sum(len(cw.w))::BIGINT AS n_chars,
                   sum(len(v.s))::BIGINT AS n_subwords,
                   md5(string_agg(array_to_string(v.s, ' '), ' '
                       ORDER BY cw.pos)) AS tmd5
            FROM cw JOIN a{rounds} v ON cw.w = v.w
            GROUP BY cw.id
        )"""
    )
    return (
        "WITH "
        + ",\n".join(ctes)
        + """
        SELECT d.doc_id AS id,
               coalesce(p.n_words, 0)::BIGINT AS n_words,
               coalesce(p.n_chars, 0)::BIGINT AS n_chars,
               coalesce(p.n_subwords, 0)::BIGINT AS n_subwords,
               round(p.n_subwords / p.n_words, 6) AS fertility,
               coalesce(p.tmd5, md5('')) AS tokens_md5
        FROM documents d LEFT JOIN per p ON d.doc_id = p.id
    """
    )


def bpe_fertility_oracle_sql(rounds: int = 8) -> str:
    """DuckDB twin of `bpe_fertility`: the bpe_merges_oracle_sql CTE
    chain, plus the same `rounds` folds replayed over the distinct-word
    vocabulary and joined back to the corpus word stream."""
    train = bpe_merges_oracle_sql(rounds)
    # reuse the training CTE chain (strip the final merge-table SELECTs)
    cte_body = train[len("WITH ") : train.index("\nSELECT 1 AS round")]
    ctes = [cte_body]
    ctes.append(
        """cw AS (
            SELECT source, w
            FROM (
                SELECT source,
                       unnest(string_split(lower(text), ' ')) AS w
                FROM documents
            ) WHERE w != '' AND strpos(w, chr(31)) = 0
        )""".strip()
    )
    ctes.append(
        "a0 AS (SELECT DISTINCT w, string_split(w, '') AS s FROM cw)"
    )
    for r in range(1, rounds + 1):
        # b{r} is EMPTY when merges exhausted before `rounds`; a bare
        # CROSS JOIN would wipe the replay vocabulary (Spark replays
        # only the trained merges). bx{r} falls back to the no-op
        # ('', '') pair — '' is not a symbol (split of a non-empty
        # word never yields it), so the fold passes through untouched.
        ctes.append(
            f"""bx{r} AS (
            SELECT coalesce((SELECT a FROM b{r}), '') AS a,
                   coalesce((SELECT b FROM b{r}), '') AS b
        )"""
        )
        ctes.append(
            f"""a{r} AS (
            SELECT w, {_FOLD_FINISH} AS s
            FROM (
                SELECT w, {_FOLD_LAMBDA} AS f
                FROM a{r - 1} CROSS JOIN bx{r}
            )
        )"""
        )
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"""
        SELECT cw.source,
               count(*)::BIGINT AS n_words,
               sum(len(v.s))::BIGINT AS n_subwords,
               round(sum(len(v.s)) / count(*), 6) AS fertility
        FROM cw JOIN a{rounds} v ON cw.w = v.w
        GROUP BY cw.source
    """
    )
