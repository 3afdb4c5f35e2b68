"""Unigram-LM tokenizer training (Kudo, ACL 2018 — the SentencePiece
subword algorithm; the OTHER tokenizer family every LLM pipeline
chooses between, next to BPE in operators/bpe.py).

Reference scope note: the reference app (app.py) ships no tokenizer at
all — both trainers are extension operators for the LLM-data pipeline
surface (SURVEY §6 / VERDICT r15 next-#7).

Algorithm (Viterbi-EM form): seed a bounded candidate vocabulary (all
substrings up to `max_len`, weighted by occurrence count, capped at
`vocab_size` with every single character force-retained so every word
stays segmentable), then iterate EM — the E-step Viterbi-segments each
word under the current piece costs and accumulates piece counts
weighted by word frequency, the M-step re-derives integer costs
cost(p) = round(-ln((n_p + 1) / (T + V)) * 1e6) (add-one smoothing over
the candidate set), and pieces that won zero occurrences are pruned
(single characters never are). Hard-EM (Viterbi instead of
forward-backward expectations) is the standard scalable simplification;
the objective still decreases monotonically (pytest-pinned).

Spark shape (100 TB):
- like BPE, after one corpus-sized token explode the trainer never
  touches the corpus again: every E-step runs on the WORD VOCABULARY
  with counts (Heaps-law sublinear in corpus size).
- the Viterbi DP is a bounded-window integer fold per word (JVM HOFs —
  the over-UNROLL_MAX_TERMS path, CodegenFallback by design), so an
  E-step is one vocabulary-sized scan + one map-side-combined
  (piece, count) aggregate.
- per round the driver collects exactly V rows (the piece counts) —
  the bounded-collect trainer pattern of bpe_merges' 1-row argmax and
  the k-means centroid selection.

Determinism contract (the oracle relies on every clause):
- seeding weights and E-step counts are exact integers; seeding keeps
  (weight DESC, piece ASC), pruning keeps single chars plus pieces
  with n_occ > 0;
- the DP is pure int64 arithmetic — cost ties break on the
  segmentation string (binary/UTF8 order, identical in Spark, DuckDB
  and Python);
- M-step costs are derived by ONE shared Python function (_m_step) so
  the Spark trainer and the pure-Python twin (unigram_train_py, the
  oracle's literal source) cannot drift float-wise;
- the final E-step stays IN-PLAN: the returned DataFrame computes
  segmentation + counts + probs distributed, and the DuckDB twin
  replays the identical integer DP as a recursive CTE given the same
  (keys, costs) literals — so a drift anywhere in the Spark EM loop
  changes the trained costs and the driver hash catches it against
  the independently-trained twin.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_BIG = 10**15  # unreachable DP cost: real costs are <= ~36e6 per piece
_COST_SCALE = 1_000_000


# ---------------------------------------------------------------------------
# shared (engine-free) trainer pieces
# ---------------------------------------------------------------------------


def _m_step(counts: "dict[str, int]", keys: "list[str]") -> "list[int]":
    """Integer piece costs from integer occurrence counts — the ONE
    cost derivation both trainers share. cost = round(-ln((n + 1) /
    (T + V)) * 1e6) with round = half-away-from-zero (the argument is
    always positive), matching DuckDB/Spark round semantics if a twin
    ever re-derives it."""
    total = sum(counts.get(k, 0) for k in keys)
    denom = float(total + len(keys))
    return [
        int(math.floor(-math.log((counts.get(k, 0) + 1) / denom) * _COST_SCALE + 0.5))
        for k in keys
    ]


def seed_candidates(
    word_counts: "dict[str, int]", vocab_size: int, max_len: int
) -> "list[str]":
    """Bounded candidate vocabulary: every substring of length
    1..max_len weighted by occurrence count (overlaps counted, times
    word frequency); ALL single characters force-retained, the
    remaining slots to the top multi-char substrings by
    (weight DESC, piece ASC)."""
    weights: "dict[str, int]" = {}
    for w, cnt in word_counts.items():
        n = len(w)
        for i in range(n):
            for l in range(1, min(max_len, n - i) + 1):
                p = w[i : i + l]
                weights[p] = weights.get(p, 0) + cnt
    chars = sorted(p for p in weights if len(p) == 1)
    if vocab_size <= len(chars):
        raise ValueError(
            f"vocab_size {vocab_size} must exceed the corpus alphabet "
            f"({len(chars)} single chars)"
        )
    multi = sorted(
        (p for p in weights if len(p) >= 2),
        key=lambda p: (-weights[p], p),
    )[: vocab_size - len(chars)]
    return sorted(chars + multi), weights


def viterbi_segment_py(
    w: str, key_pos: "dict[str, int]", costs: "list[int]", max_len: int
) -> "tuple[int, list[str]]":
    """Pure-Python twin of the Spark DP fold below — the SAME windowed
    int64 DP with the SAME (cost, seg-string) tie-break, used by the
    engine-free trainer twin the oracle builds its literals from."""
    win: "list[tuple[int, str]]" = [(_BIG, "")] * (max_len - 1) + [(0, "")]
    for j in range(1, len(w) + 1):
        cands = []
        for l in range(1, max_len + 1):
            if l > j:
                continue
            prev = win[max_len - l]
            if prev[0] >= _BIG:
                continue
            piece = w[j - l : j]
            pos = key_pos.get(piece, 0)
            if pos <= 0:
                continue
            seg = piece if prev[1] == "" else prev[1] + " " + piece
            cands.append((prev[0] + costs[pos - 1], seg))
        best = min(cands)  # never empty: single chars always in keys
        win = win[1:] + [best]
    c, seg = win[-1]
    return c, seg.split(" ")


def unigram_train_py(
    word_counts: "dict[str, int]",
    vocab_size: int = 64,
    rounds: int = 3,
    max_len: int = 4,
) -> "tuple[list[str], list[int], dict[str, int]]":
    """Engine-free trainer twin (seed -> rounds x (E, prune, M)):
    returns the FINAL (keys, costs) plus the final E-step counts —
    exactly what the Spark trainer's last in-plan E-step recomputes
    distributed and the DuckDB oracle replays. The same shared
    _m_step/seed/DP functions make the agreement exact (pytest-pinned
    in tests/test_unigram.py)."""
    if rounds < 1:
        raise ValueError(f"rounds must be >= 1, got {rounds}")
    keys, weights = seed_candidates(word_counts, vocab_size, max_len)
    costs = _m_step({k: weights[k] for k in keys}, keys)
    for _ in range(rounds):
        key_pos = {k: i + 1 for i, k in enumerate(keys)}
        counts: "dict[str, int]" = {}
        for w, cnt in word_counts.items():
            _, pieces = viterbi_segment_py(w, key_pos, costs, max_len)
            for p in pieces:
                counts[p] = counts.get(p, 0) + cnt
        keys = sorted(
            k for k in keys if len(k) == 1 or counts.get(k, 0) > 0
        )
        costs = _m_step(counts, keys)
    # final counts under the FINAL keys/costs (what the output reports)
    key_pos = {k: i + 1 for i, k in enumerate(keys)}
    final_counts: "dict[str, int]" = {}
    for w, cnt in word_counts.items():
        _, pieces = viterbi_segment_py(w, key_pos, costs, max_len)
        for p in pieces:
            final_counts[p] = final_counts.get(p, 0) + cnt
    return keys, costs, final_counts


# ---------------------------------------------------------------------------
# Spark DP + trainer
# ---------------------------------------------------------------------------


def viterbi_state(
    w: Column, keys: "list[str]", costs: "list[int]", max_len: int = 4
) -> Column:
    """Viterbi segmentation state struct(c BIGINT, seg STRING) for one
    word column under literal (keys, costs) — the windowed integer DP
    as ONE JVM fold (F.aggregate over char positions; the accumulator
    is the last `max_len` prefix states, so the fold is O(n) with an
    O(max_len) window exactly like the DuckDB recursive-CTE twin).
    All arithmetic int64; ties break on the segmentation string —
    binary UTF8 order in every engine. HOFs are CodegenFallback by
    design (the over-UNROLL_MAX_TERMS rule, vector.py): the containing
    stage compiles, the fold runs interpreted over the vocabulary-sized
    (never corpus-sized) input."""
    assert len(keys) == len(costs) and keys
    KEYS = F.array(*[F.lit(k) for k in keys])
    COSTS = F.array(*[F.lit(int(c)).cast("long") for c in costs])
    init = F.array(
        *(
            [
                F.struct(
                    F.lit(_BIG).cast("long").alias("c"),
                    F.lit("").alias("seg"),
                )
            ]
            * (max_len - 1)
        ),
        F.struct(F.lit(0).cast("long").alias("c"), F.lit("").alias("seg")),
    )

    def step(acc, j):
        def cand(l):
            piece = w.substr(j - l + F.lit(1), l)
            pos = F.array_position(KEYS, piece)
            prev = F.element_at(acc, (F.lit(max_len) - l + 1).cast("int"))
            seg = F.when(prev["seg"] == "", piece).otherwise(
                F.concat(prev["seg"], F.lit(" "), piece)
            )
            return F.when(
                (l <= j) & (pos > 0) & (prev["c"] < F.lit(_BIG)),
                F.struct(
                    (prev["c"] + F.element_at(COSTS, pos.cast("int"))).alias(
                        "c"
                    ),
                    seg.alias("seg"),
                ),
            )

        best = F.array_min(
            F.filter(
                F.transform(
                    F.sequence(F.lit(1), F.lit(max_len)), lambda l: cand(l)
                ),
                lambda x: x.isNotNull(),
            )
        )
        return F.concat(F.slice(acc, 2, max_len - 1), F.array(best))

    return F.aggregate(
        F.sequence(F.lit(1), F.length(w)),
        init,
        step,
        lambda acc: F.element_at(acc, max_len),
    )


def word_vocab(
    docs: DataFrame, text_col: str = "text"
) -> DataFrame:
    """(w, cnt) corpus word vocabulary — the one corpus-sized shuffle
    every tokenizer-training round rides on (map-side combined)."""
    return (
        docs.select(
            F.explode(F.split(F.lower(F.col(text_col)), " ")).alias("w")
        )
        .filter(F.col("w") != "")
        .groupBy("w")
        .agg(F.count("*").cast("long").alias("cnt"))
    )


def unigram_counts(
    vocab: DataFrame,
    keys: "list[str]",
    costs: "list[int]",
    max_len: int = 4,
) -> DataFrame:
    """The E-step's COUNT table only: Viterbi-segment every vocab word
    under literal (keys, costs), count pieces weighted by word
    frequency (map-side combined), keep every candidate key with
    zero-count pieces as 0. Output: (piece, n_occ), a lazy V-row plan —
    the trainer's rounds collect exactly this, so they must not pay for
    the prob column's checkpoint + total broadcast + crossJoin
    (Catalyst prunes the COLUMN but still executes the 1-row-side join
    and the eager checkpoint — measured r16, ~2 extra jobs/round)."""
    spark = vocab.sparkSession
    st = vocab.select(
        "cnt",
        viterbi_state(F.col("w"), keys, costs, max_len).alias("__st"),
    )
    occ = st.select(
        "cnt", F.explode(F.split(F.col("__st")["seg"], " ")).alias("piece")
    )
    cnts = occ.groupBy("piece").agg(
        F.sum("cnt").cast("long").alias("n_occ")
    )
    keys_df = spark.createDataFrame(
        [(k,) for k in keys], "piece string"
    )
    return keys_df.join(cnts, "piece", "left").select(
        "piece",
        F.coalesce("n_occ", F.lit(0)).cast("long").alias("n_occ"),
    )


def unigram_apply(
    vocab: DataFrame,
    keys: "list[str]",
    costs: "list[int]",
    max_len: int = 4,
) -> DataFrame:
    """One distributed E-step under literal (keys, costs): Viterbi-
    segment every vocab word, count pieces weighted by word frequency
    (map-side combined), keep EVERY candidate key (zero-count pieces
    included), and report smoothed probabilities. Output: (piece,
    n_occ, prob) — prob = round((n_occ + 1) / (T + V), 6) with T the
    in-plan total (1-row broadcast, the scalar-frame pattern)."""
    joined = (
        unigram_counts(vocab, keys, costs, max_len)
        # V rows, materialized once: the __t scalar broadcast build
        # otherwise re-ran the whole Viterbi fold + piece shuffle (r16:
        # 2x the E-step per action)
        .localCheckpoint()
    )
    tot = joined.agg(F.sum("n_occ").cast("long").alias("__t"))
    return joined.crossJoin(F.broadcast(tot)).select(
        "piece",
        "n_occ",
        F.round(
            (F.col("n_occ") + 1)
            / (F.col("__t") + F.lit(len(keys))).cast("double"),
            6,
        ).alias("prob"),
    )


def unigram_train(
    docs: DataFrame,
    text_col: str = "text",
    vocab_size: int = 64,
    rounds: int = 3,
    max_len: int = 4,
) -> "tuple[DataFrame, list[str], list[int]]":
    """Full Spark Viterbi-EM trainer. Seeding and every E-step run
    distributed (vocabulary-sized scans, map-side-combined aggregates);
    the driver holds only V-row collects per round (the bpe_merges
    bounded-collect pattern) and the shared _m_step float derivation.
    Returns (final E-step DataFrame — still a lazy plan, the entry's
    output — plus the trained keys and costs). Agreement with the
    engine-free unigram_train_py twin is exact by construction
    (integer seeding/counts, shared _m_step) and pytest-pinned."""
    if rounds < 1:
        raise ValueError(f"rounds must be >= 1, got {rounds}")
    vocab = word_vocab(docs, text_col).localCheckpoint(eager=False)

    # distributed seeding: every (start, len<=max_len) substring of
    # every vocab word, weighted by word count — one vocab-sized
    # explode + combine
    n = F.length("w")
    subs = F.flatten(
        F.transform(
            F.sequence(F.lit(1), n),
            lambda i: F.transform(
                F.sequence(
                    F.lit(1), F.least(F.lit(max_len), n - i + 1)
                ),
                lambda l: F.col("w").substr(i, l),
            ),
        )
    )
    weights = (
        vocab.select("cnt", F.explode(subs).alias("p"))
        .groupBy("p")
        .agg(F.sum("cnt").cast("long").alias("weight"))
        .localCheckpoint(eager=False)
    )
    # ONE bounded collect instead of three jobs over the checkpointed
    # weights (chars / top-multi / wmap — r16): every single char, plus
    # the top `vocab_size` multi-char candidates (a superset of the
    # vocab_size - len(chars) actually kept, since len(chars) >= 1 —
    # and of every key _m_step needs a weight for). Selection and
    # ordering are replayed driver-side on the identical (weight, p)
    # values, so keys and costs are unchanged.
    seed_rows = (
        weights.filter(F.length("p") == 1)
        .unionByName(
            weights.filter(F.length("p") >= 2)
            .orderBy(F.desc("weight"), F.asc("p"))
            .limit(vocab_size)
        )
        .collect()
    )
    chars = sorted(r.p for r in seed_rows if len(r.p) == 1)
    if vocab_size <= len(chars):
        raise ValueError(
            f"vocab_size {vocab_size} must exceed the corpus alphabet "
            f"({len(chars)} single chars)"
        )
    multi = [
        r.p
        for r in sorted(
            (r for r in seed_rows if len(r.p) >= 2),
            key=lambda r: (-int(r.weight), r.p),
        )
    ][: vocab_size - len(chars)]
    keys = sorted(chars + multi)
    wmap = {r.p: int(r.weight) for r in seed_rows if r.p in set(keys)}
    costs = _m_step(wmap, keys)

    for _ in range(rounds):
        # counts-only E-step: ONE job per round (unigram_counts) — the
        # prob-reporting wrapper's checkpoint/total/crossJoin stays out
        # of the training loop (r16)
        counted = {
            r.piece: int(r.n_occ)
            for r in unigram_counts(vocab, keys, costs, max_len).collect()
        }
        keys = sorted(
            k for k in keys if len(k) == 1 or counted.get(k, 0) > 0
        )
        costs = _m_step(counted, keys)

    return unigram_apply(vocab, keys, costs, max_len), keys, costs


def unigram_fertility(
    docs: DataFrame,
    keys: "list[str]",
    costs: "list[int]",
    strata_col: str = "source",
    text_col: str = "text",
    max_len: int = 4,
) -> DataFrame:
    """Corpus APPLICATION of a trained unigram tokenizer (the
    bpe_encode-style face): per-stratum fertility — subwords per word,
    the tokenizer-quality metric. The DP runs ONCE per DISTINCT word
    (Heaps-law sublinear — bpe_fertility's optimization) and joins
    back to per-stratum occurrence counts; output rows = strata.
    Output: (source, n_words, n_subwords, fertility 6dp)."""
    per_word = (
        docs.select(
            F.col(strata_col).alias("source"),
            F.explode(
                F.split(F.lower(F.col(text_col)), " ")
            ).alias("w"),
        )
        .filter(F.col("w") != "")
        .groupBy("source", "w")
        .agg(F.count("*").cast("long").alias("cnt"))
    )
    distinct_words = per_word.select("w").distinct()
    npieces = distinct_words.select(
        "w",
        F.size(
            F.split(
                viterbi_state(F.col("w"), keys, costs, max_len)["seg"],
                " ",
            )
        )
        .cast("long")
        .alias("np"),
    )
    n_sub = F.sum(F.col("cnt") * F.col("np")).cast("long")
    n_w = F.sum("cnt").cast("long")
    return (
        per_word.join(npieces, "w")
        .groupBy("source")
        .agg(
            n_w.alias("n_words"),
            n_sub.alias("n_subwords"),
            F.round(
                n_sub.cast("double") / n_w.cast("double"), 6
            ).alias("fertility"),
        )
    )


# ---------------------------------------------------------------------------
# DuckDB twins
# ---------------------------------------------------------------------------


def _sql_str(s: str) -> str:
    return "'" + s.replace("'", "''") + "'"


def _dp_ctes(
    keys: "list[str]", costs: "list[int]", max_len: int
) -> str:
    """The shared recursive-CTE Viterbi replay: vocabw -> dp -> fin
    (w, cnt, seg). Identical integer DP, window arithmetic and
    (cost, seg) tie-break as viterbi_state/viterbi_segment_py."""
    KEYS = "[" + ", ".join(_sql_str(k) for k in keys) + "]"
    COSTS = "[" + ", ".join(str(int(c)) for c in costs) + "]::BIGINT[]"
    L = int(max_len)
    init_c = ", ".join([str(_BIG)] * (L - 1) + ["0"])
    init_s = ", ".join(["''"] * L)
    piece = f"substr(w, j - l + 2, l)"
    cand = f"""CASE WHEN l <= j + 1
                AND wc[{L + 1} - l] < {_BIG}
                AND list_position({KEYS}, {piece}) > 0
           THEN {{'c': wc[{L + 1} - l]
                      + ({COSTS})[list_position({KEYS}, {piece})],
                 'seg': CASE WHEN ws[{L + 1} - l] = '' THEN {piece}
                             ELSE ws[{L + 1} - l] || ' ' || {piece} END}}
           END"""
    return f"""vocabw AS (
  SELECT w, count(*)::BIGINT AS cnt FROM (
    SELECT unnest(string_split(lower(text), ' ')) AS w FROM documents
  ) WHERE w != '' GROUP BY w
),
dp(w, cnt, n, j, wc, ws) AS (
  SELECT w, cnt, length(w), 0,
         [{init_c}]::BIGINT[], [{init_s}]
  FROM vocabw
  UNION ALL
  SELECT w, cnt, n, j + 1,
         wc[2:{L}] || [best.c], ws[2:{L}] || [best.seg]
  FROM (
    SELECT w, cnt, n, j, wc, ws,
           (list_sort(list_filter(list_transform(
               range(1, {L + 1}), l -> {cand}),
               x -> x IS NOT NULL)))[1] AS best
    FROM dp WHERE j < n
  )
),
fin AS (SELECT w, cnt, ws[{L}] AS seg FROM dp WHERE j = n)"""


def unigram_tokenizer_oracle_sql(
    keys: "list[str]", costs: "list[int]", max_len: int = 4
) -> str:
    """DuckDB twin of the trainer entry's final in-plan E-step given
    the trained (keys, costs) literals (from the engine-free twin —
    the shared-trainer pattern of _pq_artifacts): the recursive-CTE
    Viterbi, the weighted piece counts, every candidate key retained,
    the same smoothed rounded probs."""
    KEYS = "[" + ", ".join(_sql_str(k) for k in keys) + "]"
    V = len(keys)
    return f"""
WITH RECURSIVE {_dp_ctes(keys, costs, max_len)},
occ AS (
  SELECT unnest(string_split(seg, ' ')) AS piece, cnt FROM fin
),
cnts AS (SELECT piece, sum(cnt)::BIGINT AS n_occ FROM occ GROUP BY piece),
keysl AS (SELECT unnest({KEYS}) AS piece),
joined AS (
  SELECT k.piece, coalesce(c.n_occ, 0)::BIGINT AS n_occ
  FROM keysl k LEFT JOIN cnts c USING (piece)
),
tot AS (SELECT sum(n_occ)::BIGINT AS t FROM joined)
SELECT piece, n_occ,
       round((n_occ + 1)::DOUBLE / (t + {V})::DOUBLE, 6) AS prob
FROM joined CROSS JOIN tot
"""


def unigram_fertility_oracle_sql(
    keys: "list[str]", costs: "list[int]", max_len: int = 4
) -> str:
    """DuckDB twin of unigram_fertility: the same recursive-CTE DP
    once per distinct word, joined back to per-(source, word)
    occurrence counts."""
    return f"""
WITH RECURSIVE {_dp_ctes(keys, costs, max_len)},
np AS (
  SELECT w, len(string_split(seg, ' '))::BIGINT AS np FROM fin
),
pw AS (
  SELECT source, w, count(*)::BIGINT AS cnt FROM (
    SELECT source, unnest(string_split(lower(text), ' ')) AS w
    FROM documents
  ) WHERE w != '' GROUP BY source, w
)
SELECT source,
       sum(cnt)::BIGINT AS n_words,
       sum(cnt * np)::BIGINT AS n_subwords,
       round(CAST(sum(cnt * np) AS DOUBLE)
             / CAST(sum(cnt) AS DOUBLE), 6) AS fertility
FROM pw JOIN np USING (w)
GROUP BY source
"""
