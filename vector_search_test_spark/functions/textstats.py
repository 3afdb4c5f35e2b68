"""Text-analysis functions for LLM-data pipelines (driver north star;
absent from the reference, whose only text ops are trim/split at
app.py:204, 223).

Every function is a native Catalyst expression with an exact DuckDB twin
(the *_sql helpers) so the driver can hash-match values. Patterns stick to
ASCII character classes and literal-space splits: Java regex (Spark) and
RE2 (DuckDB) agree on those, where \\w / \\s unicode semantics would drift.

Note on language-ID: the fixture's `lang` column is provenance metadata —
the synthetic text does not encode a language (all rows draw the same
vocabulary) — so `lang_id` is correctness-checked as a deterministic
function of the text (same prediction both engines), not for accuracy
against the `lang` column.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from vector_search_test_spark.functions.hashing import portable_hash48

TOKEN_RE = "[a-z0-9]+|[^a-z0-9 ]"  # BPE-ish: word runs or single punct

STOPWORDS = {
    "en": ["the", "a", "and", "of", "to", "in", "is", "it"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "mit", "ein"],
    "es": ["el", "los", "y", "es", "en", "un", "que", "por"],
    "fr": ["le", "les", "et", "est", "une", "que", "pas", "pour"],
    "zh": ["的", "是", "了", "在", "我", "有", "和", "不"],
}
LANGS = list(STOPWORDS)  # en, de, es, fr, zh — also the tie-break priority


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def char_count(col: Column | str) -> Column:
    return F.length(_col(col))


def token_count_ws(col: Column | str) -> Column:
    """Whitespace token count (single-space split, matching string_split)."""
    return F.size(F.split(_col(col), " "))


def token_count_regex(col: Column | str) -> Column:
    """BPE-ish token count: alnum runs + individual punctuation marks."""
    return F.regexp_count(F.lower(_col(col)), F.lit(TOKEN_RE))


def stopword_hits(col: Column | str, lang: str = "en") -> Column:
    """How many tokens are stopwords of `lang` (duplicates counted)."""
    words = STOPWORDS[lang]
    toks = F.split(F.lower(_col(col)), " ")
    return F.size(F.filter(toks, lambda t: t.isin(*words)))


def punct_ratio(col: Column | str) -> Column:
    """Fraction of characters that are neither alnum nor space."""
    c = F.lower(_col(col))
    return F.regexp_count(c, F.lit("[^a-z0-9 ]")) / F.greatest(
        F.length(c), F.lit(1)
    )


def quality_score(col: Column | str) -> Column:
    """Composite quality heuristic in [0, 1] (length, punctuation,
    stopword presence, average word length) — the standard cheap filters
    a pretraining pipeline runs before expensive scoring."""
    c = _col(col)
    n_tok = token_count_ws(c)
    len_score = F.least(F.lit(1.0), n_tok / F.lit(20.0))
    punct = F.lit(1.0) - punct_ratio(c)
    stop_score = F.least(F.lit(1.0), stopword_hits(c, "en") / F.lit(5.0))
    avg_tok_len = F.length(F.replace(c, F.lit(" "), F.lit(""))) / F.greatest(
        n_tok, F.lit(1)
    )
    word_len_score = F.lit(1.0) - F.least(
        F.lit(1.0), F.abs(avg_tok_len - F.lit(5.0)) / F.lit(5.0)
    )
    return (
        F.lit(0.35) * len_score
        + F.lit(0.25) * punct
        + F.lit(0.2) * stop_score
        + F.lit(0.2) * word_len_score
    )


def lang_hits(col: Column | str) -> dict[str, Column]:
    """Per-language stopword hit counts (the n-gram-heuristic signal)."""
    return {lang: stopword_hits(col, lang) for lang in LANGS}


def lang_id(col: Column | str) -> Column:
    """Predicted language: max stopword hits, ties broken by LANGS order
    (en > de > es > fr > zh) — deterministic, twin-able as a CASE chain."""
    hits = lang_hits(col)
    expr = F.lit(LANGS[-1])
    for i in range(len(LANGS) - 2, -1, -1):
        lang = LANGS[i]
        cond = None
        for other in LANGS[i + 1 :]:
            c = hits[lang] >= hits[other]
            cond = c if cond is None else (cond & c)
        expr = F.when(cond, F.lit(lang)).otherwise(expr)
    return expr


def repetition_ratio(col: Column | str, n: int = 2) -> Column:
    """Gopher-style intra-document repetition signal: the fraction of a
    document's word n-gram OCCURRENCES that repeat an earlier occurrence
    (`1 - distinct/total` over the n-gram multiset — NOT the distinct
    shingle set dedup uses). 0 = no repetition; approaches 1 as the text
    degenerates into a loop ("buy now buy now buy now..."). A pure
    projection over the token array (higher-order functions) — scan-only
    at any corpus size. Documents shorter than n tokens score 0."""
    from functools import reduce

    toks = F.split(F.lower(_col(col)), " ")
    # n shifted views zipped into "w1 w2 ..." gram strings: n-1 zip_with
    # passes over whole arrays instead of a per-gram slice+array_join
    # (or per-gram element_at lookups — both measured slower; the
    # shifted-slice zip was ~2x faster than the slice+join form at
    # sf0.1). Same strings, same distinct counts.
    m = F.size(toks) - (n - 1)
    parts = [F.slice(toks, j + 1, m) for j in range(n)]
    grams = reduce(
        lambda acc, p: F.zip_with(
            acc, p, lambda a, b: F.concat(a, F.lit(" "), b)
        ),
        parts[1:],
        parts[0],
    )
    total = F.size(grams).cast("double")
    distinct = F.size(F.array_distinct(grams)).cast("double")
    return F.when(
        F.size(toks) >= n, F.round((total - distinct) / total, 6)
    ).otherwise(F.lit(0.0))


GOPHER_STOPWORDS = ["the", "be", "to", "of", "and", "that", "have", "with"]


def gopher_signals(col: Column | str) -> dict[str, Column]:
    """Gopher document-quality signals (Rae et al. 2021, arXiv:2112.11446
    Appendix A1.1) — the published rule set a pretraining pipeline runs
    before any model-based scoring. Every signal is a pure Catalyst
    projection over one lowercased token/line split (scan-only at any
    corpus size; no shuffle, no UDF):

    - word_count         whitespace tokens
    - mean_word_len      non-space chars / words
    - symbol_word_ratio  ('#' + '...') occurrences / words
    - frac_lines_bullet  lines starting with a bullet ('- ' / '* ')
    - frac_lines_ellip   lines ending with '...'
    - frac_words_alpha   words containing at least one [a-z]
    - stop_hits          DISTINCT Gopher stopwords present (presence, not
                         occurrences — the paper requires >= 2 distinct)
    """
    c = F.lower(_col(col))
    toks = F.split(c, " ")
    n_tok = F.size(toks)
    lines = F.split(c, "\n")
    n_lines = F.greatest(F.size(lines), F.lit(1))
    denom_tok = F.greatest(n_tok, F.lit(1))
    bullet = F.size(
        F.filter(
            lines,
            lambda ln: ln.startswith("- ") | ln.startswith("* "),
        )
    )
    ellip = F.size(F.filter(lines, lambda ln: ln.endswith("...")))
    alpha = F.size(F.filter(toks, lambda t: t.rlike("[a-z]")))
    stop_hits = F.size(
        F.filter(
            F.array(*[F.lit(w) for w in GOPHER_STOPWORDS]),
            lambda w: F.array_contains(toks, w),
        )
    )
    return {
        "word_count": n_tok.cast("long"),
        "mean_word_len": F.round(
            F.length(F.replace(c, F.lit(" "), F.lit(""))) / denom_tok, 6
        ),
        "symbol_word_ratio": F.round(
            (F.regexp_count(c, F.lit("#")) + F.regexp_count(c, F.lit("\\.\\.\\.")))
            / denom_tok,
            6,
        ),
        "frac_lines_bullet": F.round(bullet / n_lines, 6),
        "frac_lines_ellip": F.round(ellip / n_lines, 6),
        "frac_words_alpha": F.round(alpha / denom_tok, 6),
        "stop_hits": stop_hits.cast("long"),
    }


def gopher_flags(col: Column | str) -> dict[str, Column]:
    """Pass/fail flags at the published Gopher thresholds (0/1 ints so
    the hash oracle is representation-proof), plus the conjunction."""
    s = gopher_signals(col)
    flags = {
        "pass_word_count": (s["word_count"] >= 50) & (s["word_count"] <= 100000),
        "pass_word_len": (s["mean_word_len"] >= 3.0) & (s["mean_word_len"] <= 10.0),
        "pass_symbol": s["symbol_word_ratio"] <= 0.1,
        "pass_bullet": s["frac_lines_bullet"] <= 0.9,
        "pass_ellipsis": s["frac_lines_ellip"] <= 0.3,
        "pass_alpha": s["frac_words_alpha"] >= 0.8,
        "pass_stop": s["stop_hits"] >= 2,
    }
    out = {k: v.cast("int") for k, v in flags.items()}
    conj = None
    for v in flags.values():
        conj = v if conj is None else (conj & v)
    out["gopher_pass"] = conj.cast("int")
    return out


C4_BADWORDS = ("porn", "xxx", "viagra", "casino")
"""Embedded stand-in SUBSET of C4's external badword list (the paper
uses the "List of Dirty, Naughty, Obscene or Otherwise Bad Words",
which ships outside any engine) — the filter plumbing is real; swap the
tuple for the full list in production. Spam-flavored tokens chosen so
fixtures stay printable."""


def c4_signals(col: Column | str) -> dict[str, Column]:
    """C4 document-quality signals (Raffel et al. 2020, arXiv:1910.10683
    §2.2) — the heuristic rule set behind the C4 corpus, complementing
    `gopher_signals`. Pure Catalyst projections over one lowercased
    line/token split — scan-only at any corpus size, no UDF:

    - n_lines         newline-split line count
    - n_sentences     terminal-punctuation ([.!?]) occurrences (the
                      paper's sentence proxy)
    - kept_line_frac  fraction of lines C4's LINE filters retain (ends
                      in terminal punctuation [.!?"], >= 3 words, no
                      'javascript')
    - has_lorem_ipsum / has_brace / has_badword   page-level tripwires
      ('lorem ipsum', '{', badword-list hit)

    C4's fourth page rule — three-sentence-span dedup — is the
    dedicated exact-substring operator (operators/dedup.py,
    dup_span_removal), not a per-doc projection.
    """
    c = F.lower(_col(col))
    # strip \r BEFORE the line split (ADVICE r10): on CRLF text a line
    # keeps its trailing \r after a \n-split, and Java regex `$` matches
    # before that final \r while DuckDB's RE2 `$` matches only
    # end-of-string — kept_line_frac would diverge cross-engine. The
    # twin (c4_signals_sql) applies the same normalization.
    lines = F.split(F.regexp_replace(c, "\r", ""), "\n")
    n_lines = F.greatest(F.size(lines), F.lit(1))
    keep = F.size(
        F.filter(
            lines,
            lambda ln: ln.rlike('[.!?"]$')
            & (F.regexp_count(ln, F.lit("[^ ]+")) >= 3)
            & ~ln.contains("javascript"),
        )
    )
    # word-boundary match, not token equality: C4 removes any page that
    # CONTAINED a listed word — 'casino.' / '(xxx)' must still hit.
    # \b is word-char boundary ([A-Za-z0-9_]) in both Java regex and
    # DuckDB's RE2, so the twin agrees.
    bad_re = "\\b(" + "|".join(C4_BADWORDS) + ")\\b"
    return {
        "n_lines": F.size(lines).cast("long"),
        "n_sentences": F.regexp_count(c, F.lit("[.!?]")).cast("long"),
        "kept_line_frac": F.round(keep / n_lines, 6),
        "has_lorem_ipsum": c.contains("lorem ipsum").cast("int"),
        "has_brace": c.contains("{").cast("int"),
        "has_badword": (F.regexp_count(c, F.lit(bad_re)) > 0).cast("int"),
    }


def c4_flags(col: Column | str) -> dict[str, Column]:
    """Pass/fail flags at the published C4 thresholds (>=5 sentences;
    no lorem ipsum / '{' / badword; at least one line survives the line
    filters), 0/1 ints plus the conjunction — mirror of `gopher_flags`."""
    s = c4_signals(col)
    flags = {
        "pass_sentences": s["n_sentences"] >= 5,
        "pass_lorem": s["has_lorem_ipsum"] == 0,
        "pass_brace": s["has_brace"] == 0,
        "pass_badword": s["has_badword"] == 0,
        "pass_lines": s["kept_line_frac"] > 0.0,
    }
    out = {k: v.cast("int") for k, v in flags.items()}
    conj = None
    for v in flags.values():
        conj = v if conj is None else (conj & v)
    out["c4_pass"] = conj.cast("int")
    return out


def c4_signals_sql(expr: str) -> dict[str, str]:
    """DuckDB twins of `c4_signals` (same lowercase, same splits)."""
    c = f"lower({expr})"
    # \r stripped before the split, mirroring c4_signals (CRLF parity)
    lines = f"string_split(replace({c}, chr(13), ''), chr(10))"
    n_lines = f"greatest(len({lines}), 1)"
    keep = (
        f"len(list_filter({lines}, ln -> "
        f"regexp_matches(ln, '[.!?\"]$') "
        f"AND len(regexp_extract_all(ln, '[^ ]+')) >= 3 "
        f"AND NOT contains(ln, 'javascript')))"
    )
    bad_re = "\\b(" + "|".join(C4_BADWORDS) + ")\\b"
    return {
        "n_lines": f"len({lines})::BIGINT",
        "n_sentences": f"len(regexp_extract_all({c}, '[.!?]'))::BIGINT",
        "kept_line_frac": f"round({keep} / {n_lines}, 6)",
        "has_lorem_ipsum": f"contains({c}, 'lorem ipsum')::INT",
        "has_brace": f"contains({c}, '{{')::INT",
        "has_badword": f"regexp_matches({c}, '{bad_re}')::INT",
    }


def c4_flags_sql(expr: str) -> dict[str, str]:
    """DuckDB twins of `c4_flags`."""
    s = c4_signals_sql(expr)
    flags = {
        "pass_sentences": f"({s['n_sentences']} >= 5)",
        "pass_lorem": f"({s['has_lorem_ipsum']} = 0)",
        "pass_brace": f"({s['has_brace']} = 0)",
        "pass_badword": f"({s['has_badword']} = 0)",
        "pass_lines": f"({s['kept_line_frac']} > 0.0)",
    }
    out = {k: f"{v}::INT" for k, v in flags.items()}
    out["c4_pass"] = "(" + " AND ".join(flags.values()) + ")::INT"
    return out


def doc_fingerprint(col: Column | str) -> Column:
    """48-bit fingerprint of the normalized (lower+trim) text."""
    return portable_hash48(F.trim(F.lower(_col(col))))


def rolling_fingerprint(col: Column | str, n: int = 3) -> Column:
    """Winnowing-lite content fingerprint: min over word n-gram shingle
    hashes — stable under local edits outside the minimizing window
    (Schleimer et al., winnowing; equals the MinHash family member at
    salt 0, so near-identical docs collide)."""
    from vector_search_test_spark.operators.dedup import shingles

    return F.array_min(
        F.transform(shingles(_col(col), n), lambda s: portable_hash48(s, salt=0))
    )


def winnowing_fingerprints(
    docs,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    w: int = 4,
):
    """Winnowing document fingerprints (Schleimer, Wilkerson & Aiken,
    SIGMOD 2003 — the MOSS fingerprinting algorithm): hash every word
    k-gram, slide a w-window over the hash stream, and in each window
    select the MINIMUM hash, rightmost occurrence on ties (the paper's
    tie rule). The guarantee (paper §3): any shared run of at least
    w + k - 1 words between two documents produces at least one shared
    selected fingerprint, while only ~2/(w+1) of grams are kept — the
    density/guarantee dial plagiarism and near-dup indexes tune.
    `rolling_fingerprint` above is the degenerate whole-doc-window
    special case; this is the full positional scheme.

    Returns (id_col, pos, fp): one row per selected fingerprint, pos
    the 0-based gram index, fp the 48-bit gram hash (portable_hash48,
    so the DuckDB twin computes bit-identical values).

    Plan (100 TB): scan-only — gram stream, hash stream, and the
    per-window argmin selection are all array expressions inside ONE
    projection (no explode before selection, no shuffle, no Python);
    only the ~2/(w+1)-dense selected set explodes at the end. Short
    documents (< w grams) winnow their single full-stream window.
    Reference parity: generalizes app.py:96's whole-text keying the
    way SURVEY §2.9 Q1 sketches."""
    from vector_search_test_spark.operators.dedup import shingles_all

    if w < 1 or k < 1:
        raise ValueError(f"winnowing needs k >= 1 and w >= 1, got k={k} w={w}")
    hashes = F.transform(
        shingles_all(_col(text_col), k), lambda g: portable_hash48(g, salt=0)
    )
    d = docs.select(F.col(id_col), hashes.alias("h"))
    m = F.size("h")
    wl = F.least(F.lit(w), m)  # short docs: one whole-stream window

    def _rightmost_min(i):
        win_min = F.array_min(F.slice(F.col("h"), i + 1, wl))
        return F.array_max(
            F.filter(
                F.sequence(i, i + wl - 1),
                lambda j: F.element_at(F.col("h"), (j + 1).cast("int"))
                == win_min,
            )
        )

    sel = F.array_distinct(
        F.transform(F.sequence(F.lit(0), m - wl), _rightmost_min)
    )
    return d.select(F.col(id_col), "h", F.explode(sel).alias("p")).select(
        F.col(id_col),
        F.col("p").cast("int").alias("pos"),
        F.element_at("h", (F.col("p") + 1).cast("int")).alias("fp"),
    )


def winnowing_oracle_sql(k: int = 3, w: int = 4) -> str:
    """DuckDB twin of `winnowing_fingerprints` — same gram stream, same
    hash48 family member, same rightmost-min tie rule (list_max over
    the positions attaining the window minimum)."""
    from vector_search_test_spark.functions.hashing import hash48_sql
    from vector_search_test_spark.operators.dedup import shingles_all_sql

    return f"""
        WITH g AS (
            SELECT doc_id,
                   list_transform({shingles_all_sql("text", k)},
                                  s -> {hash48_sql("s", salt=0)}) AS h
            FROM documents
        ),
        sel AS (
            SELECT doc_id, h,
                   list_distinct(list_transform(
                       range(0, len(h) - least({w}, len(h)) + 1), i ->
                       list_max(list_filter(
                           range(i, i + least({w}, len(h))),
                           j -> h[j + 1] = list_min(
                               h[i + 1:i + least({w}, len(h))])))
                   )) AS ps
            FROM g
        )
        SELECT doc_id, CAST(p AS INT) AS pos,
               h[CAST(p AS INT) + 1] AS fp
        FROM sel, unnest(ps) AS u(p)
    """


def tfidf_top_terms(
    docs,
    id_col: str = "doc_id",
    text_col: str = "text",
    top_n: int = 3,
):
    """Top-N TF-IDF terms per document (smooth IDF: ln((N+1)/(df+1)) + 1).

    Plan: explode tokens -> (doc, term) counts (one shuffle, map-side
    combine) -> document frequencies (second small shuffle on term) ->
    broadcast the corpus size scalar -> per-doc window top-N with
    deterministic (score desc, term asc) ordering. No Python anywhere.
    Returns (id_col, term, score) with score rounded to 6dp.
    """
    from pyspark.sql import Window

    from vector_search_test_spark.io import spread
    from vector_search_test_spark.operators.dedup import tokens

    toks = spread(docs.select(F.col(id_col).alias("id"), F.col(text_col)), "id").select(
        "id", F.explode(tokens(text_col)).alias("term")
    )
    tf = toks.groupBy("id", "term").agg(F.count("*").alias("tf"))
    df_t = tf.groupBy("term").agg(F.count("*").alias("df"))
    n_docs = docs.select(F.countDistinct(id_col).alias("n"))
    scored = (
        tf.join(F.broadcast(df_t), "term")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "score",
            F.col("tf")
            * (F.log((F.col("n") + 1) / (F.col("df") + 1)) + F.lit(1.0)),
        )
    )
    w = Window.partitionBy("id").orderBy(F.desc("score"), F.asc("term"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= top_n)
        .select(
            F.col("id").alias(id_col),
            "term",
            F.round("score", 6).alias("score"),
        )
    )


def vocab_stats_per_source(
    docs,
    strata_col: str = "source",
    text_col: str = "text",
):
    """Vocabulary diagnostics per corpus stratum — the Heaps-law /
    lexical-diversity dashboard of a data pipeline (shrinking type-token
    ratio or hapax fraction across crawl snapshots is the standard
    duplication / boilerplate-creep alarm):

    (source, n_tokens, n_types, n_hapax, ttr, hapax_frac, top_tok,
     top_frac) — ttr = types/tokens, hapax = types occurring once,
    top_tok/top_frac = the modal token and its mass (the head of the
    Zipf curve; a rising top_frac flags TEMPLATE text).

    Plan: explode -> ONE (stratum, token) shuffle with map-side combine
    (the tf table is vocab-sized, not corpus-sized) -> per-stratum
    aggregate + a row_number window over the per-stratum tf table for
    the modal token (deterministic (count desc, token asc) tie-break).
    Integer counts throughout, two double divisions at the end."""
    from pyspark.sql import Window

    toks = docs.select(
        F.col(strata_col).alias("source"),
        F.explode(F.split(F.lower(F.col(text_col)), " ")).alias("tok"),
    )
    tf = toks.groupBy("source", "tok").agg(F.count("*").alias("n"))
    agg = tf.groupBy("source").agg(
        F.sum("n").alias("n_tokens"),
        F.count("*").alias("n_types"),
        F.sum(F.when(F.col("n") == 1, 1).otherwise(0))
        .cast("long")
        .alias("n_hapax"),
    )
    w = Window.partitionBy("source").orderBy(F.desc("n"), F.asc("tok"))
    top = (
        tf.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select("source", F.col("tok").alias("top_tok"), F.col("n").alias("__top_n"))
    )
    return agg.join(top, "source").select(
        "source",
        "n_tokens",
        "n_types",
        "n_hapax",
        F.round(F.col("n_types") / F.col("n_tokens"), 6).alias("ttr"),
        F.round(F.col("n_hapax") / F.col("n_types"), 6).alias("hapax_frac"),
        "top_tok",
        F.round(F.col("__top_n") / F.col("n_tokens"), 6).alias("top_frac"),
    )


def vocab_stats_oracle_sql() -> str:
    """DuckDB twin of vocab_stats_per_source (same split, same integer
    counts, same tie-break, same divisions)."""
    return """
        WITH tf AS (
            SELECT source, t.tok, count(*)::BIGINT AS n
            FROM documents,
                 unnest(string_split(lower(text), ' ')) AS t(tok)
            GROUP BY source, t.tok
        ),
        agg AS (
            SELECT source,
                   sum(n)::BIGINT AS n_tokens,
                   count(*)::BIGINT AS n_types,
                   sum(CASE WHEN n = 1 THEN 1 ELSE 0 END)::BIGINT AS n_hapax
            FROM tf GROUP BY source
        ),
        top AS (
            SELECT source, tok AS top_tok, n AS top_n
            FROM tf
            QUALIFY row_number() OVER (
                PARTITION BY source ORDER BY n DESC, tok
            ) = 1
        )
        SELECT a.source, a.n_tokens, a.n_types, a.n_hapax,
               round(a.n_types / a.n_tokens, 6) AS ttr,
               round(a.n_hapax / a.n_types, 6) AS hapax_frac,
               t.top_tok,
               round(t.top_n / a.n_tokens, 6) AS top_frac
        FROM agg a JOIN top t ON a.source = t.source
    """


def unigram_lm_scores(
    docs,
    id_col: str = "doc_id",
    text_col: str = "text",
    broadcast_vocab: bool = True,
):
    """Unigram language-model quality scores — the classic cheap "LM
    filter" a pretraining pipeline runs before expensive model-based
    scoring: train token unigram counts over the WHOLE corpus, then
    score every document by its mean token log-probability (add-one
    smoothing: p(w) = (c(w)+1)/(N+V)) and the equivalent perplexity.
    Returns (id_col, n_tokens, avg_logprob, ppl); low avg_logprob / high
    ppl marks documents whose token distribution diverges from the
    corpus (gibberish, boilerplate, wrong-language).

    Plan (the 100 TB story): ONE explode -> (doc, term) count shuffle
    with map-side combine, a second small shuffle down to the term
    vocabulary, then the vocabulary re-joins the per-doc counts. A
    natural-language vocabulary is sublinear in corpus size, so the
    vocab side broadcasts (default); set broadcast_vocab=False to flip
    to a shuffle hash join on `term` when the vocabulary itself is too
    big for one executor (e.g. no token cutoff over 100 TB of web
    text). The corpus scalars (N, V) ride a 1-row cross join. Scoring
    reuses the per-doc tf counts — tokens are never exploded twice."""
    from vector_search_test_spark.io import spread
    from vector_search_test_spark.operators.dedup import tokens

    toks = spread(
        docs.select(F.col(id_col).alias("id"), F.col(text_col)), "id"
    ).select("id", F.explode(tokens(text_col)).alias("term"))
    tf = toks.groupBy("id", "term").agg(F.count("*").alias("tf"))
    # vocab materialized once (Heaps-bounded — the natural broadcast
    # asset): it feeds THREE consumers (the join side, the (N, V)
    # scalar frame, and through it the broadcast build), each of which
    # would otherwise re-run the corpus explode + tf shuffle (r16:
    # measured 3x the token pipeline per action)
    vocab = tf.groupBy("term").agg(F.sum("tf").alias("c")).localCheckpoint()
    scalars = vocab.agg(
        F.sum("c").alias("n_total"), F.count("*").alias("v_size")
    )
    vocab_side = F.broadcast(vocab) if broadcast_vocab else vocab
    logp = F.log(
        (F.col("c") + 1) / (F.col("n_total") + F.col("v_size"))
    )
    per_doc = (
        tf.join(vocab_side, "term")
        .crossJoin(F.broadcast(scalars))
        .groupBy("id")
        .agg(
            F.sum("tf").cast("long").alias("n_tokens"),
            (F.sum(F.col("tf") * logp) / F.sum("tf")).alias("alp"),
        )
    )
    return per_doc.select(
        F.col("id").alias(id_col),
        "n_tokens",
        F.round("alp", 6).alias("avg_logprob"),
        F.round(F.exp(-F.col("alp")), 6).alias("ppl"),
    )


def bigram_lm_scores(
    docs,
    id_col: str = "doc_id",
    text_col: str = "text",
    lam: float = 0.7,
    broadcast_model: bool = True,
):
    """Interpolated bigram language-model scores — the next rung above
    `unigram_lm_scores` on the LM-filter ladder (the in-engine analogue
    of CCNet's KenLM perplexity gate, without external model files):
    train corpus bigram + unigram counts, score every document by its
    mean bigram log-probability under Jelinek-Mercer interpolation

        p(v|u) = lam * c2(u,v)/c1(u) + (1-lam) * (c1(v)+1)/(N+V)

    (ML bigram interpolated with the add-one unigram; lam = 0.7).
    Returns (id_col, n_bigrams, avg_logprob, ppl); documents with fewer
    than 2 tokens have no bigrams and are excluded by construction.
    High ppl = the document's word TRANSITIONS diverge from the corpus
    (word-salad that unigram stats cannot see).

    Plan (100 TB): ONE positional explode -> (doc, u, v) count shuffle
    with map-side combine; the bigram model derives from that aggregate
    by a second vocabulary-sized shuffle, joins its two unigram legs
    and the (N, V) scalar, and re-joins the per-doc counts (broadcast
    by default — a natural-language bigram vocabulary is sublinear in
    corpus size; broadcast_model=False flips to a shuffle hash join on
    (u, v) when it isn't). Tokens are exploded once for bigrams and
    once for unigrams, both straight off the scan. Per-doc sums
    quantize log-probs to 1e-12 integers FIRST (exact, order-free),
    multiply by integer counts, and divide back once — the
    source_kl_divergence determinism pattern, so the DuckDB twin is
    value-identical."""
    from vector_search_test_spark.io import spread

    lam = float(lam)
    om = 1.0 - lam
    # spread: both explodes below are compute-heavy per row and must
    # not inherit a 1-file source's single task (no-op at real scale)
    base = spread(
        docs.select(F.col(id_col).alias("id"), F.col(text_col)), "id"
    )
    toks_arr = F.split(F.lower(F.col(text_col)), " ")
    n = F.size(toks_arr)
    # shifted-slice zip (the repetition_ratio trick): two whole-array
    # views zipped into (u, v) structs — no per-gram element_at lookups
    pairs = F.when(
        n >= 2,
        F.zip_with(
            F.slice(toks_arr, 1, n - 1),
            F.slice(toks_arr, 2, n - 1),
            lambda a, b: F.struct(a.alias("u"), b.alias("v")),
        ),
    ).otherwise(F.array().cast("array<struct<u:string,v:string>>"))
    bg = base.select("id", F.explode(pairs).alias("p")).select(
        "id", F.col("p.u").alias("u"), F.col("p.v").alias("v")
    )
    tf2 = bg.groupBy("id", "u", "v").agg(F.count("*").alias("tf"))
    c2 = tf2.groupBy("u", "v").agg(F.sum("tf").cast("long").alias("c2"))
    uni = base.select(
        F.explode(F.split(F.lower(F.col(text_col)), " ")).alias("term")
    ).groupBy("term").agg(F.count("*").alias("c1"))
    nv = uni.agg(
        F.sum("c1").cast("long").alias("n_total"),
        F.count("*").cast("long").alias("v_size"),
    )
    logp = F.log(
        F.lit(lam) * (F.col("c2") / F.col("c1_u"))
        + F.lit(om)
        * ((F.col("c1_v") + 1) / (F.col("n_total") + F.col("v_size")))
    )
    probs = (
        c2.join(
            F.broadcast(uni.select(F.col("term").alias("u"), F.col("c1").alias("c1_u"))),
            "u",
        )
        .join(
            F.broadcast(uni.select(F.col("term").alias("v"), F.col("c1").alias("c1_v"))),
            "v",
        )
        .crossJoin(F.broadcast(nv))
        .select(
            "u", "v", F.round(logp * 1e12, 0).cast("long").alias("qlp")
        )
    )
    model = F.broadcast(probs) if broadcast_model else probs
    alp = (F.sum(F.col("qlp") * F.col("tf")) / F.lit(1e12)) / F.sum("tf")
    return (
        tf2.join(model, ["u", "v"])
        .groupBy("id")
        .agg(
            F.sum("tf").cast("long").alias("n_bigrams"),
            F.round(alp, 6).alias("avg_logprob"),
            F.round(F.exp(-alp), 6).alias("ppl"),
        )
        .select(
            F.col("id").alias(id_col), "n_bigrams", "avg_logprob", "ppl"
        )
    )


def bigram_lm_oracle_sql(lam: float = 0.7) -> str:
    """DuckDB twin of bigram_lm_scores (same splits, same interpolation
    arithmetic, same 1e-12 quantization; BIGINT/BIGINT divisions ->
    DOUBLE in both engines so the ln arguments are bit-identical)."""
    lam = float(lam)
    om = 1.0 - lam
    return f"""
        WITH tk AS (
            SELECT doc_id, string_split(lower(text), ' ') AS t
            FROM documents
        ),
        bg AS (
            SELECT doc_id, t[i] AS u, t[i + 1] AS v
            FROM tk, unnest(range(1, len(t))) AS r(i)
        ),
        tf2 AS (
            SELECT doc_id, u, v, count(*)::BIGINT AS tf
            FROM bg GROUP BY doc_id, u, v
        ),
        c2 AS (
            SELECT u, v, sum(tf)::BIGINT AS c2 FROM tf2 GROUP BY u, v
        ),
        uni AS (
            SELECT term, count(*)::BIGINT AS c1
            FROM (
                SELECT unnest(string_split(lower(text), ' ')) AS term
                FROM documents
            ) GROUP BY term
        ),
        nv AS (
            SELECT sum(c1)::BIGINT AS n_total, count(*)::BIGINT AS v_size
            FROM uni
        ),
        probs AS (
            SELECT c2.u, c2.v,
                   round(ln({lam!r} * (c2.c2 / cu.c1)
                         + {om!r} * ((cv.c1 + 1) / (nv.n_total + nv.v_size)))
                         * 1e12)::BIGINT AS qlp
            FROM c2
            JOIN uni cu ON c2.u = cu.term
            JOIN uni cv ON c2.v = cv.term
            CROSS JOIN nv
        )
        SELECT t.doc_id,
               sum(t.tf)::BIGINT AS n_bigrams,
               round((sum(p.qlp * t.tf) / 1e12) / sum(t.tf), 6)
                   AS avg_logprob,
               round(exp(-((sum(p.qlp * t.tf) / 1e12) / sum(t.tf))), 6)
                   AS ppl
        FROM tf2 t JOIN probs p ON t.u = p.u AND t.v = p.v
        GROUP BY t.doc_id
    """


def pmi_phrases(
    docs,
    text_col: str = "text",
    min_count: int = 5,
    top_n: int = 50,
):
    """word2phrase-style collocation mining (Mikolov et al. 2013 §4 —
    the phrase-merge pass run before tokenizer/vocab construction):
    rank adjacent token pairs by pointwise mutual information
    PMI(u,v) = ln(N * c(u,v) / (c(u) * c(v))), keep pairs seen at
    least `min_count` times (the support filter that kills
    one-off-juxtaposition noise), return the global top_n as
    (u, v, pair_count, pmi) — pmi rounded 6dp. Positive PMI = the
    pair co-occurs more than its parts predict: a merge candidate.

    Plan (100 TB): the bigram extraction shape of bigram_lm_scores
    (one shifted-slice zip explode -> (u, v) count shuffle with
    map-side combine; output vocabulary-sized), unigram counts from a
    second explode off the same scan, broadcast unigram legs + the
    1-row N scalar, and a global TakeOrdered top_n (no full sort).
    Determinism: the ln argument is assembled double-by-double in the
    same shape both engines fold ((c2::double * N) / (c1u::double *
    c1v)), the score quantizes to a 1e-12 integer (the bigram-LM
    pattern) and ordering is (quantized pmi desc, u asc, v asc) — no
    float-tie ambiguity cross-engine.

    Empty tokens from repeated whitespace are filtered BEFORE the
    unigram/bigram counts (ADVICE r10): '' is not a word, and counting
    it skews N and every PMI that shares a doc with a double space.
    Tokens the filter removes make their neighbors adjacent — the
    word2phrase reading of 'a  b' is the pair (a, b)."""
    toks_arr = F.filter(
        F.split(F.lower(F.col(text_col)), " "), lambda t: t != ""
    )
    n = F.size(toks_arr)
    pairs = F.when(
        n >= 2,
        F.zip_with(
            F.slice(toks_arr, 1, n - 1),
            F.slice(toks_arr, 2, n - 1),
            lambda a, b: F.struct(a.alias("u"), b.alias("v")),
        ),
    ).otherwise(F.array().cast("array<struct<u:string,v:string>>"))
    bg = docs.select(F.explode(pairs).alias("p")).select(
        F.col("p.u").alias("u"), F.col("p.v").alias("v")
    )
    c2 = (
        bg.groupBy("u", "v")
        .agg(F.count("*").alias("pair_count"))
        .filter(F.col("pair_count") >= int(min_count))
    )
    uni = (
        docs.select(F.explode(toks_arr).alias("term"))
        .groupBy("term")
        .agg(F.count("*").alias("c1"))
    )
    n_total = uni.agg(F.sum("c1").cast("long").alias("n_total"))
    qpmi = F.round(
        F.log(
            (F.col("pair_count").cast("double") * F.col("n_total"))
            / (F.col("c1_u").cast("double") * F.col("c1_v"))
        )
        * F.lit(1e12)
    ).cast("long")
    scored = (
        c2.join(
            F.broadcast(
                uni.select(F.col("term").alias("u"), F.col("c1").alias("c1_u"))
            ),
            "u",
        )
        .join(
            F.broadcast(
                uni.select(F.col("term").alias("v"), F.col("c1").alias("c1_v"))
            ),
            "v",
        )
        .crossJoin(F.broadcast(n_total))
        .select("u", "v", "pair_count", qpmi.alias("qpmi"))
    )
    return (
        scored.orderBy(F.desc("qpmi"), F.asc("u"), F.asc("v"))
        .limit(int(top_n))
        .select(
            "u",
            "v",
            "pair_count",
            F.round(F.col("qpmi") / 1e12, 6).alias("pmi"),
        )
    )


def pmi_phrases_oracle_sql(min_count: int = 5, top_n: int = 50) -> str:
    """DuckDB twin of `pmi_phrases` — same double-assembly shape, same
    1e-12 quantization, same (qpmi desc, u, v) top-n order, same
    empty-token filter before the counts."""
    return f"""
        WITH tk AS (
            SELECT list_filter(string_split(lower(text), ' '),
                               x -> x <> '') AS t
            FROM documents
        ),
        bg AS (
            SELECT t[i] AS u, t[i + 1] AS v
            FROM tk, unnest(range(1, len(t))) AS r(i)
        ),
        c2 AS (
            SELECT u, v, count(*)::BIGINT AS pair_count
            FROM bg GROUP BY u, v
            HAVING count(*) >= {int(min_count)}
        ),
        uni AS (
            SELECT term, count(*)::BIGINT AS c1
            FROM (SELECT unnest(t) AS term FROM tk) GROUP BY term
        ),
        nt AS (SELECT sum(c1)::BIGINT AS n_total FROM uni),
        scored AS (
            SELECT c2.u, c2.v, c2.pair_count,
                   round(ln((c2.pair_count::DOUBLE * nt.n_total)
                            / (cu.c1::DOUBLE * cv.c1)) * 1e12)::BIGINT
                       AS qpmi
            FROM c2
            JOIN uni cu ON c2.u = cu.term
            JOIN uni cv ON c2.v = cv.term
            CROSS JOIN nt
        )
        SELECT u, v, pair_count, round(qpmi / 1e12, 6) AS pmi
        FROM scored
        ORDER BY qpmi DESC, u, v
        LIMIT {int(top_n)}
    """


_PPL_BUCKET_LABELS = ("head", "middle", "tail")


def ppl_buckets(
    docs,
    strata_col: str = "source",
    lam: float = 0.7,
):
    """CCNet-style perplexity bucketing (Wenzek et al., LREC 2020 §4.3):
    score every document with the corpus bigram LM (`bigram_lm_scores`,
    the in-engine KenLM stand-in) and split each stratum into
    equal-count head / middle / tail thirds by ascending perplexity —
    head = the slice the LM finds most natural, which CCNet keeps (or
    up-weights) for LM pre-training; tail = the word-salad end. Returns
    (doc_id, source, ppl, bucket); documents with < 2 tokens have no
    bigrams and are excluded upstream by construction.

    Plan (100 TB): the bigram-LM plan (see bigram_lm_scores) plus ONE
    per-stratum ntile window — a range-partitioned sort of the
    (doc_id, ppl) table, which is id+double wide, orders of magnitude
    narrower than the corpus. CCNet itself materializes exactly this
    per-language sort to find its cutoffs; an approx_percentile
    variant would avoid the sort at the cost of oracle-exact bucket
    edges (documented seam, not taken). Determinism: ntile orders by
    (ppl, doc_id) and ppl is bit-identical across engines (the
    quantized-sum argument in bigram_lm_scores), so the DuckDB twin
    buckets identically; Spark and DuckDB both deal ntile remainders
    to the leading buckets (standard SQL)."""
    from pyspark.sql import Window

    scored = bigram_lm_scores(docs, lam=lam)
    src = docs.select("doc_id", F.col(strata_col).alias("source"))
    win = Window.partitionBy("source").orderBy(F.asc("ppl"), F.asc("doc_id"))
    labels = F.array(*[F.lit(b) for b in _PPL_BUCKET_LABELS])
    return (
        scored.join(src, "doc_id")
        .withColumn("nt", F.ntile(len(_PPL_BUCKET_LABELS)).over(win))
        .select(
            "doc_id",
            "source",
            "ppl",
            F.element_at(labels, F.col("nt")).alias("bucket"),
        )
    )


def ppl_buckets_oracle_sql(lam: float = 0.7) -> str:
    """DuckDB twin of `ppl_buckets`: the bigram-LM oracle as a nested
    CTE + the identical (ppl, doc_id)-ordered per-source ntile."""
    return f"""
        WITH base AS ({bigram_lm_oracle_sql(lam)})
        SELECT doc_id, source, ppl,
               CASE nt WHEN 1 THEN 'head' WHEN 2 THEN 'middle'
                       ELSE 'tail' END AS bucket
        FROM (
            SELECT b.doc_id, s.source, b.ppl,
                   ntile(3) OVER (PARTITION BY s.source
                                  ORDER BY b.ppl, b.doc_id) AS nt
            FROM base b JOIN documents s USING (doc_id)
        )
    """


def source_kl_divergence(
    docs,
    strata_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
):
    """Per-stratum KL divergence from the corpus token distribution —
    the drift / mixture-skew metric corpus dashboards track:
    KL(p_s || p) = sum over the FULL shared vocabulary of
    p_s(w) * ln(p_s(w) / p(w)) with add-one smoothing, where p_s is
    stratum s's unigram distribution and p the whole corpus's (so p_s
    normalizes to 1 and the metric is a true KL — ADVICE r6 fixed the
    round-6 version, which silently truncated the sum to
    stratum-present terms). Returns (source, n_tokens, kl) rounded to
    6dp; 0 means the stratum reads like the corpus.

    Absent terms never materialize: for a term absent from stratum s,
    p_s(w) = 1/(n_s+V) is CONSTANT, so the absent-terms mass folds into
    two closed-form pieces — sum over ALL terms of the absent-form
    contribution p_s0*(ln p_s0 - ln p(w)) = p_s0*(V*ln p_s0 - L) with
    L = sum_w ln p(w) a corpus scalar, minus the absent-form value at
    each PRESENT term (subtracted row-wise where the real contribution
    is added). A sources x vocabulary cross join would compute the same
    number at |S|*V rows; this stays at the present-(stratum, term)
    cardinality.

    Plan: ONE (stratum, term) count shuffle with map-side combine; the
    vocabulary, the per-stratum totals, and the corpus scalars (N, V,
    quantized L) all derive lazily from that aggregate and re-join it
    (broadcasts + 1-row cross joins, identical subtrees reused via
    exchange reuse — no separate driver actions, ADVICE r6).
    Per-(stratum, term) contributions are deterministic doubles, but a
    grouped float sum is order-dependent — so contributions (and the
    ln p(w) terms of L) quantize to 1e-12-scaled integers and the sums
    are exact, making the DuckDB twin value-identical."""
    from vector_search_test_spark.operators.dedup import tokens

    toks = docs.select(
        F.col(strata_col).alias("source"),
        F.explode(tokens(text_col)).alias("term"),
    )
    st = toks.groupBy("source", "term").agg(F.count("*").alias("c_s"))
    vocab = st.groupBy("term").agg(F.sum("c_s").alias("c"))
    totals = st.groupBy("source").agg(
        F.sum("c_s").cast("long").alias("n_s")
    )
    nv = vocab.agg(
        F.sum("c").cast("long").alias("n_total"),
        F.count("*").cast("long").alias("v_size"),
    )
    # corpus scalars incl. L = sum_w ln p(w), quantized for order-exactness.
    # The L sum accumulates V terms of magnitude ~|ln p|*1e12 (~1e13 each
    # for rare terms), so a 64-bit sum overflows around V ~ 1e6 — the
    # accumulator is DECIMAL(38,0) (Spark) / HUGEINT (DuckDB), both
    # exact, then converted to double ONCE for the closed form.
    lnp = F.log((F.col("c") + 1) / (F.col("n_total") + F.col("v_size")))
    scalars = (
        vocab.crossJoin(F.broadcast(nv))
        .agg(
            F.max("n_total").alias("n_total"),
            F.max("v_size").alias("v_size"),
            F.sum(
                F.round(lnp * 1e12, 0).cast("decimal(38,0)")
            ).alias("l_q"),
        )
    )
    joined = (
        st.join(F.broadcast(vocab), "term")
        .join(F.broadcast(totals), "source")
        .crossJoin(F.broadcast(scalars))
    )
    p_s = (F.col("c_s") + 1) / (F.col("n_s") + F.col("v_size"))
    p = (F.col("c") + 1) / (F.col("n_total") + F.col("v_size"))
    p_s0 = F.lit(1.0) / (F.col("n_s") + F.col("v_size"))
    # present-term contribution MINUS the absent-form value the global
    # closed form below will add back for this term
    delta = p_s * F.log(p_s / p) - p_s0 * F.log(p_s0 / p)
    q = F.round(delta * 1e12, 0).cast("long")
    g_p_s0 = F.lit(1.0) / (F.max("n_s") + F.max("v_size"))
    return (
        joined.withColumn("q", q)
        .groupBy("source")
        .agg(
            F.max("n_s").alias("n_tokens"),
            F.round(
                F.sum("q") / 1e12
                + g_p_s0
                * (
                    F.max("v_size") * F.log(g_p_s0)
                    - F.max("l_q").cast("double") / 1e12
                ),
                6,
            ).alias("kl"),
        )
    )


def source_kl_oracle_sql() -> str:
    """DuckDB twin of source_kl_divergence (same smoothing, same
    full-vocabulary closed-form absent-terms correction, same
    quantization; every division is BIGINT/BIGINT -> DOUBLE in both
    engines so the ln arguments are bit-identical)."""
    return """
        WITH toks AS (
            SELECT source, unnest(string_split(lower(text), ' ')) AS term
            FROM documents
        ),
        st AS (
            SELECT source, term, count(*) AS c_s
            FROM toks GROUP BY source, term
        ),
        vocab AS (SELECT term, CAST(sum(c_s) AS BIGINT) AS c FROM st GROUP BY term),
        nv AS (
            SELECT CAST(sum(c) AS BIGINT) AS n_total,
                   CAST(count(*) AS BIGINT) AS v_size
            FROM vocab
        ),
        scalars AS (
            -- sum stays HUGEINT (exact; Spark's twin accumulator is
            -- DECIMAL(38,0)) — a BIGINT cast here overflows around
            -- vocabulary sizes of ~1e6
            SELECT max(n_total) AS n_total, max(v_size) AS v_size,
                   sum(CAST(round(
                       ln((vocab.c + 1) / (nv.n_total + nv.v_size)) * 1e12,
                   0) AS BIGINT)) AS l_q
            FROM vocab CROSS JOIN nv
        ),
        totals AS (
            SELECT source, CAST(sum(c_s) AS BIGINT) AS n_s
            FROM st GROUP BY source
        ),
        contrib AS (
            SELECT st.source, totals.n_s, s.v_size, s.l_q,
                   CAST(round((
                       ((st.c_s + 1) / (totals.n_s + s.v_size))
                       * ln(((st.c_s + 1) / (totals.n_s + s.v_size))
                            / ((vocab.c + 1) / (s.n_total + s.v_size)))
                       - (1.0 / (totals.n_s + s.v_size))
                       * ln((1.0 / (totals.n_s + s.v_size))
                            / ((vocab.c + 1) / (s.n_total + s.v_size)))
                       ) * 1e12, 0) AS BIGINT) AS q
            FROM st
            JOIN vocab USING (term)
            JOIN totals USING (source)
            CROSS JOIN scalars s
        )
        SELECT source, max(n_s) AS n_tokens,
               round(sum(q) / 1e12
                     + (1.0 / (max(n_s) + max(v_size)))
                     * (max(v_size) * ln(1.0 / (max(n_s) + max(v_size)))
                        - CAST(max(l_q) AS DOUBLE) / 1e12), 6) AS kl
        FROM contrib GROUP BY source
    """


def unigram_lm_oracle_sql() -> str:
    """DuckDB twin of unigram_lm_scores over the documents view (same
    tokens, same smoothing, same double math)."""
    return """
        WITH toks AS (
            SELECT doc_id AS id, unnest(string_split(lower(text), ' ')) AS term
            FROM documents
        ),
        tf AS (SELECT id, term, count(*) AS tf FROM toks GROUP BY id, term),
        vocab AS (SELECT term, sum(tf) AS c FROM tf GROUP BY term),
        scalars AS (
            SELECT CAST(sum(c) AS DOUBLE) AS n_total,
                   CAST(count(*) AS DOUBLE) AS v_size
            FROM vocab
        )
        SELECT tf.id AS doc_id,
               CAST(sum(tf.tf) AS BIGINT) AS n_tokens,
               round(sum(tf.tf * ln((vocab.c + 1) / (n_total + v_size)))
                     / sum(tf.tf), 6) AS avg_logprob,
               round(exp(-(sum(tf.tf * ln((vocab.c + 1) / (n_total + v_size)))
                     / sum(tf.tf))), 6) AS ppl
        FROM tf JOIN vocab USING (term) CROSS JOIN scalars
        GROUP BY tf.id
    """


def tfidf_oracle_sql(top_n: int = 3) -> str:
    """DuckDB twin of tfidf_top_terms over the documents view."""
    return f"""
        WITH toks AS (
            SELECT doc_id AS id, unnest(string_split(lower(text), ' ')) AS term
            FROM documents
        ),
        tf AS (SELECT id, term, count(*) AS tf FROM toks GROUP BY id, term),
        df_t AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
        n_docs AS (SELECT count(DISTINCT doc_id) AS n FROM documents)
        SELECT id AS doc_id, term,
               round(tf * (ln((n + 1.0) / (df + 1.0)) + 1.0), 6) AS score
        FROM tf JOIN df_t USING (term) CROSS JOIN n_docs
        QUALIFY row_number() OVER (
            PARTITION BY id
            ORDER BY tf * (ln((n + 1.0) / (df + 1.0)) + 1.0) DESC, term ASC
        ) <= {top_n}
    """


# ---------------------------------------------------------------------------
# DuckDB twins
# ---------------------------------------------------------------------------


def token_count_ws_sql(expr: str) -> str:
    return f"len(string_split({expr}, ' '))"


def token_count_regex_sql(expr: str) -> str:
    return f"len(regexp_extract_all(lower({expr}), '{TOKEN_RE}'))"


def stopword_hits_sql(expr: str, lang: str = "en") -> str:
    words = ", ".join(f"'{w}'" for w in STOPWORDS[lang])
    return (
        f"len(list_filter(string_split(lower({expr}), ' '), t -> t IN ({words})))"
    )


def punct_ratio_sql(expr: str) -> str:
    return (
        f"len(regexp_extract_all(lower({expr}), '[^a-z0-9 ]'))::DOUBLE"
        f" / greatest(length(lower({expr})), 1)"
    )


def quality_score_sql(expr: str) -> str:
    n_tok = token_count_ws_sql(expr)
    len_score = f"least(1.0, {n_tok} / 20.0)"
    punct = f"(1.0 - {punct_ratio_sql(expr)})"
    stop_score = f"least(1.0, {stopword_hits_sql(expr, 'en')} / 5.0)"
    avg_tok = f"(length(replace({expr}, ' ', ''))::DOUBLE / greatest({n_tok}, 1))"
    word_len = f"(1.0 - least(1.0, abs({avg_tok} - 5.0) / 5.0))"
    return (
        f"(0.35 * {len_score} + 0.25 * {punct}"
        f" + 0.2 * {stop_score} + 0.2 * {word_len})"
    )


def lang_id_sql(expr: str) -> str:
    hits = {lang: stopword_hits_sql(expr, lang) for lang in LANGS}
    cases = []
    for i, lang in enumerate(LANGS[:-1]):
        conds = " AND ".join(
            f"{hits[lang]} >= {hits[other]}" for other in LANGS[i + 1 :]
        )
        cases.append(f"WHEN {conds} THEN '{lang}'")
    return "CASE " + " ".join(cases) + f" ELSE '{LANGS[-1]}' END"


def repetition_ratio_sql(expr: str, n: int = 2) -> str:
    """DuckDB twin of `repetition_ratio` (same grams, same arithmetic)."""
    toks = f"string_split(lower({expr}), ' ')"
    grams = (
        f"list_transform(range(1, len({toks}) - {n - 2}), "
        f"i -> array_to_string({toks}[i:i+{n - 1}], ' '))"
    )
    return (
        f"CASE WHEN len({toks}) >= {n} THEN "
        f"round((len({grams}) - len(list_distinct({grams}))) "
        f"/ CAST(len({grams}) AS DOUBLE), 6) ELSE 0.0 END"
    )


def gopher_signals_sql(expr: str) -> dict[str, str]:
    """DuckDB twin of `gopher_signals` (same splits, same arithmetic)."""
    c = f"lower({expr})"
    toks = f"string_split({c}, ' ')"
    lines = f"string_split({c}, chr(10))"
    n_tok = f"len({toks})"
    denom = f"greatest({n_tok}, 1)"
    n_lines = f"greatest(len({lines}), 1)"
    stop_list = "[" + ", ".join(f"'{w}'" for w in GOPHER_STOPWORDS) + "]"
    return {
        "word_count": f"{n_tok}::BIGINT",
        "mean_word_len": (
            f"round(length(replace({c}, ' ', ''))::DOUBLE / {denom}, 6)"
        ),
        "symbol_word_ratio": (
            f"round((len(regexp_extract_all({c}, '#'))"
            f" + len(regexp_extract_all({c}, '\\.\\.\\.')))::DOUBLE"
            f" / {denom}, 6)"
        ),
        "frac_lines_bullet": (
            f"round(len(list_filter({lines}, ln -> starts_with(ln, '- ')"
            f" OR starts_with(ln, '* ')))::DOUBLE / {n_lines}, 6)"
        ),
        "frac_lines_ellip": (
            f"round(len(list_filter({lines}, ln -> ln LIKE '%...'))::DOUBLE"
            f" / {n_lines}, 6)"
        ),
        "frac_words_alpha": (
            f"round(len(list_filter({toks}, t -> regexp_matches(t, '[a-z]')))"
            f"::DOUBLE / {denom}, 6)"
        ),
        "stop_hits": (
            f"len(list_filter({stop_list}, w -> list_contains({toks}, w)))"
            f"::BIGINT"
        ),
    }


def gopher_flags_sql(expr: str) -> dict[str, str]:
    """DuckDB twin of `gopher_flags` (thresholds applied to the SAME
    rounded signal expressions, conjunction last)."""
    s = gopher_signals_sql(expr)
    flags = {
        "pass_word_count": (
            f"({s['word_count']} >= 50 AND {s['word_count']} <= 100000)"
        ),
        "pass_word_len": (
            f"({s['mean_word_len']} >= 3.0 AND {s['mean_word_len']} <= 10.0)"
        ),
        "pass_symbol": f"({s['symbol_word_ratio']} <= 0.1)",
        "pass_bullet": f"({s['frac_lines_bullet']} <= 0.9)",
        "pass_ellipsis": f"({s['frac_lines_ellip']} <= 0.3)",
        "pass_alpha": f"({s['frac_words_alpha']} >= 0.8)",
        "pass_stop": f"({s['stop_hits']} >= 2)",
    }
    out = {k: f"{v}::INT" for k, v in flags.items()}
    out["gopher_pass"] = "(" + " AND ".join(flags.values()) + ")::INT"
    return out


def doc_fingerprint_sql(expr: str) -> str:
    from vector_search_test_spark.functions.hashing import hash48_sql

    return hash48_sql(f"trim(lower({expr}))")


def rolling_fingerprint_sql(expr: str, n: int = 3) -> str:
    from vector_search_test_spark.functions.hashing import hash48_sql
    from vector_search_test_spark.operators.dedup import shingles_sql

    return (
        f"list_min(list_transform({shingles_sql(expr, n)}, "
        f"s -> {hash48_sql('s', salt=0)}))"
    )
