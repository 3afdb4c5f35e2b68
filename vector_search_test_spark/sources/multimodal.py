"""Multimodal columns (driver north star): image/audio/video as opaque
binary columns with typed metadata, processed by Arrow-batched UDFs.

The decode libraries (PIL/ffmpeg/librosa) are not in this container, so
the *decode* step is environment-gated (clearly marked):
- `decode_media` is the pluggable seam: pass a codec FACTORY (loaded
  once per worker — the exact contract a real PIL/ffmpeg decoder needs)
  and it runs the full Arrow path; with no codec it raises
  NotImplementedError. `fake_grid_codec` is the deterministic
  pure-Python stand-in that proves the seam end-to-end (r11).
- `extract_byte_features` is a deterministic FAKE feature extractor
  (byte histogram -> unit vector) so the Spark-side plumbing — binary
  schema, Arrow batch shape, partitioning, downstream joins — is real
  and testable end-to-end; it composes with decode_media's output.

Scale notes: payloads stay columnar (Parquet binary) until the UDF; the
feature extraction is a stateless mapInPandas (no shuffle); frame
sampling explodes rows *after* slicing, so the shuffle (if any downstream)
moves frames, not whole videos.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_KINDS = ("image", "audio", "video")

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("payload", T.BinaryType(), False),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("n_bytes", T.LongType(), False),
                    T.StructField("format", T.StringType(), True),
                ]
            ),
            False,
        ),
    ]
)


def media_from_documents(docs: DataFrame, kind: str = "image") -> DataFrame:
    """Deterministic synthetic media: the document text's UTF-8 bytes as
    the binary payload, with typed metadata — native expressions only
    (encode/octet_length are JVM-side)."""
    if kind not in MEDIA_KINDS:
        raise ValueError(f"kind must be one of {MEDIA_KINDS}")
    payload = F.encode(F.col("text"), "UTF-8")
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit(kind).alias("kind"),
        payload.alias("payload"),
        F.struct(
            F.octet_length(payload).cast("long").alias("n_bytes"),
            F.lit("utf8-fake").alias("format"),
        ).alias("meta"),
    )


def dedup_media_exact(
    media: DataFrame,
    id_col: str = "media_id",
    payload_col: str = "payload",
) -> DataFrame:
    """Byte-identical media dedup — the multimodal analogue of
    dedup_exact: group on the RAW binary payload (exact, no hash-
    collision caveat), keep the min-id representative, count copies.
    Output: (payload_md5, rep_id, n_copies); the md5 is a reporting
    column, not the grouping key. One hash shuffle with map-side
    combine; at 100 TB the payloads are large, so production would
    pre-project a strong digest at ingest and group on that — the
    plan shape is identical."""
    p = F.col(payload_col)
    return (
        media.groupBy(p.alias("__payload"))
        .agg(
            F.min(id_col).alias("rep_id"),
            F.count("*").alias("n_copies"),
        )
        .select(
            F.md5(F.col("__payload")).alias("payload_md5"),
            "rep_id",
            "n_copies",
        )
    )


def fake_grid_codec(height: int = 8, width: int = 8):
    """Deterministic pure-Python stand-in codec (VERDICT r10 next-#7):
    'decodes' any payload into a fixed-shape (height, width) uint8 grid
    by cyclically tiling the payload bytes (np.resize) — zeros for an
    empty payload. Fake pixels, REAL contract: a factory that is called
    once per Python worker and returns `bytes -> np.uint8[(h, w)]`,
    exactly what a PIL/ffmpeg-backed codec supplies. Swapping in a real
    decoder changes this function only — none of the Spark plumbing."""

    def factory():
        def decode(buf: bytes) -> np.ndarray:
            arr = np.frombuffer(bytes(buf), dtype=np.uint8)
            if arr.size == 0:
                return np.zeros((height, width), dtype=np.uint8)
            return np.resize(arr, (height, width))

        return decode

    return factory


def decode_media(
    df: DataFrame,
    codec=None,
    payload_col: str = "payload",
    out_col: str = "decoded",
    expected_shape: "tuple[int, ...] | None" = None,
) -> DataFrame:
    """The decode seam: payload bytes -> fixed-shape decoded grid.

    `codec` is a FACTORY (zero-arg callable) invoked once per Python
    worker task — the load-the-model-once contract a real decoder needs
    (PIL/ffmpeg/librosa handles are per-process, not per-row) — whose
    return value maps one payload's bytes to a uint8 numpy array of
    fixed shape. The decoded grid is appended as `out_col`: a BINARY
    column of exactly prod(shape) bytes (row-major), so the output
    composes directly with every downstream payload consumer —
    `extract_byte_features(..., payload_col=out_col)`, `frame_sample`,
    `dedup_media_exact` — with zero re-plumbing.

    `codec=None` (the default) raises NotImplementedError: real codec
    libraries are not in this container; `fake_grid_codec` is the
    deterministic stand-in that proves the seam end-to-end (pinned in
    tests/test_multimodal.py). Scale shape: stateless mapInPandas over
    Arrow batches — no shuffle, no state, decode parallelism = scan
    parallelism.

    `expected_shape` (ADVICE r11): the caller-declared grid shape,
    validated against EVERY decoded grid. Without it the fixed-shape
    guard is pinned by each task's first grid, which misses a codec
    that is internally consistent per task but varies across tasks
    (e.g. shape derived from worker-local state); callers that know
    the shape (fake_grid_codec callers always do) should pass it."""
    if codec is None:
        raise NotImplementedError(
            "media decoding requires image/audio codecs not present in "
            "this environment; pass codec=fake_grid_codec() for the "
            "deterministic plumbing proof, or plug a real decoder factory "
            "into this seam"
        )
    out_schema = T.StructType(
        df.schema.fields + [T.StructField(out_col, T.BinaryType(), False)]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        decode = codec()  # once per worker task, NOT per row/batch
        # fixed-shape contract: validated against `expected_shape` when
        # the caller declared one (cross-task safe), else pinned by the
        # task's first grid — the per-task guard catches a codec
        # emitting per-payload native resolutions but not one that is
        # constant within a task and different across tasks.
        shape = tuple(expected_shape) if expected_shape is not None else None
        for pdf in batches:
            out = []
            for buf in pdf[payload_col]:
                grid = decode(buf)
                if grid.dtype != np.uint8:
                    raise TypeError(
                        f"codec must return uint8 arrays, got {grid.dtype}"
                    )
                if shape is None:
                    shape = grid.shape
                elif grid.shape != shape:
                    # loud, like the dtype check: a variable-shape codec
                    # silently breaks every downstream consumer that
                    # assumes prod(shape) bytes per row (r11 review)
                    raise ValueError(
                        f"codec must return fixed-shape grids: got "
                        f"{grid.shape} after {shape}"
                    )
                out.append(grid.tobytes())
            pdf = pdf.copy()
            pdf[out_col] = out
            yield pdf

    return df.mapInPandas(run, schema=out_schema)


def extract_byte_features(
    df: DataFrame,
    dim: int = 64,
    payload_col: str = "payload",
    out_col: str = "features",
) -> DataFrame:
    """Deterministic FAKE feature extractor: byte-value histogram folded
    into `dim` buckets, L2-normalized. Real Arrow plumbing (mapInPandas,
    numpy-vectorized batch), fake semantics — stands in for an image/audio
    embedding model."""
    out_schema = T.StructType(
        df.schema.fields + [T.StructField(out_col, T.ArrayType(T.FloatType()), False)]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = np.zeros((len(pdf), dim), dtype=np.float64)
            for i, buf in enumerate(pdf[payload_col]):
                arr = np.frombuffer(bytes(buf), dtype=np.uint8)
                if arr.size:
                    hist = np.bincount(arr % dim, minlength=dim).astype(np.float64)
                    n = np.linalg.norm(hist)
                    feats[i] = hist / n if n > 0 else hist
            pdf = pdf.copy()
            pdf[out_col] = [row.astype(np.float32) for row in feats]
            yield pdf

    return df.mapInPandas(run, schema=out_schema)


def frame_sample(
    df: DataFrame,
    n_frames: int = 4,
    payload_col: str = "payload",
) -> DataFrame:
    """'Video' frame sampling plumbing: slice the payload into n_frames
    even chunks and explode one row per frame — native byte slicing
    (substring on binary), no Python. A real implementation would seek to
    keyframes; the partitioning/row-shape contract is identical."""
    total = F.octet_length(F.col(payload_col))
    chunk = F.greatest((total / n_frames).cast("long"), F.lit(1))
    # the LAST frame absorbs the floor-division remainder — every payload
    # byte lands in exactly one frame (a plain chunk-sized last frame
    # would silently drop up to n_frames-1 trailing bytes)
    frames = F.transform(
        F.sequence(F.lit(0), F.lit(n_frames - 1)),
        lambda i: F.struct(
            i.cast("int").alias("frame_id"),
            F.substring(
                F.col(payload_col),
                (i * chunk + 1).cast("int"),
                F.when(
                    i < n_frames - 1, chunk
                ).otherwise(F.greatest(total - (n_frames - 1) * chunk, F.lit(0))).cast("int"),
            ).alias("frame"),
        ),
    )
    return df.select(
        "media_id",
        F.explode(frames).alias("f"),
    ).select(
        "media_id",
        F.col("f.frame_id").alias("frame_id"),
        F.col("f.frame").alias("frame"),
        F.octet_length("f.frame").cast("long").alias("frame_bytes"),
    )


# --------------------------------------------------------------------------
# Perceptual near-dup — average hash (aHash) over the decode seam.
#
# Byte-exact dedup (dedup_media_exact) misses re-encoded / slightly-
# edited media; the standard first-line answer is a perceptual hash:
# decode to a fixed small grid, threshold each cell against the grid
# mean into one bit, compare hashes by Hamming distance. Near-dup
# candidates come from the SAME banded-LSH shape the text family uses:
# split the 64 bits into `bands` 16-bit band keys — two hashes within
# Hamming distance k < bands MUST agree on at least one band
# (pigeonhole), so the banded equi-join is exact for the chosen radius,
# never all-pairs.
#
# The hash is computed INSIDE the decode pass (one Arrow batch, the
# realistic shape: hash at ingest, store bands as the persistent
# index); bands are plain ints, so the verify stage is JVM-side
# bit_count(xor) — no Python. With fake_grid_codec the full decision is
# value-replayable in SQL (grid = cyclic byte tiling), which is what
# the oracle certifies; a real PIL decoder swaps in at the same factory
# seam with zero plumbing changes.
# --------------------------------------------------------------------------


def ahash_bands(
    df: DataFrame,
    codec=None,
    payload_col: str = "payload",
    out_col: str = "pbands",
    shape: tuple = (8, 8),
    bands: int = 4,
) -> DataFrame:
    """Decode each payload with `codec` (the decode_media factory
    contract — once per worker task) and append the aHash as `bands`
    16-bit band keys (array<int>): bit_i = grid_i > mean(grid), band_j
    packs bits [16j, 16j+16) little-endian. Stateless mapInPandas; no
    shuffle."""
    if codec is None:
        raise NotImplementedError(
            "perceptual hashing requires a decoder; pass "
            "codec=fake_grid_codec() for the deterministic plumbing proof"
        )
    n_bits = int(shape[0]) * int(shape[1])
    if bands <= 0 or n_bits % bands or (n_bits // bands) > 31:
        raise ValueError(
            "bands must divide the grid size into <=31-bit band keys"
        )
    width = n_bits // bands
    out_schema = T.StructType(
        df.schema.fields
        + [T.StructField(out_col, T.ArrayType(T.IntegerType()), False)]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        decode = codec()  # once per worker task
        weights = (1 << np.arange(width, dtype=np.int64)).astype(np.int64)
        for pdf in batches:
            out = []
            for buf in pdf[payload_col]:
                grid = decode(buf)
                if grid.shape != tuple(shape):
                    raise ValueError(
                        f"codec returned shape {grid.shape}, expected {shape}"
                    )
                flat = grid.reshape(-1).astype(np.float64)
                bits = (flat > flat.mean()).astype(np.int64)
                keys = [
                    int(bits[j * width : (j + 1) * width] @ weights)
                    for j in range(bands)
                ]
                out.append(keys)
            pdf = pdf.copy()
            pdf[out_col] = out
            yield pdf

    return df.mapInPandas(run, schema=out_schema)


def media_neardup_ahash(
    media: DataFrame,
    codec=None,
    max_hamming: int = 3,
    shape: tuple = (8, 8),
    bands: int = 4,
    id_col: str = "media_id",
    payload_col: str = "payload",
) -> DataFrame:
    """Perceptual near-duplicate media pairs: (a, b, hamming) with
    hamming(aHash_a, aHash_b) <= max_hamming, a < b. Exact for the
    radius when max_hamming < bands (pigeonhole over the banded keys).

    Plan: one decode+hash pass (Arrow), posexplode band keys, self
    equi-join on (band_id, band_key) — bucketed, never all-pairs —
    distinct candidates, then a JVM-side verify: hamming is
    aggregate(zip_with(xor)) over the two band arrays via bit_count.
    The band table is the persistent artifact an ingest pipeline keeps
    (exactly the MinHash-signature shape, one array per medium)."""
    if max_hamming >= bands:
        raise ValueError(
            "max_hamming must be < bands for the banded join to be exact"
        )
    hashed = (
        ahash_bands(
            media.select(id_col, payload_col),
            codec=codec,
            payload_col=payload_col,
            shape=shape,
            bands=bands,
        )
        .select(F.col(id_col).alias("id"), "pbands")
        # three consumers (band explode + both verify sides) and Spark
        # does not CSE shared subplans: unpinned, the Arrow decode+hash
        # pass re-executes per consumer — with a real codec that is
        # every payload decoded 3x (the minhash_tables precedent)
        .localCheckpoint()
    )
    bt = hashed.select(
        "id", F.posexplode("pbands").alias("band_id", "band_key")
    )
    cand = (
        bt.alias("x")
        .join(
            bt.alias("y"),
            (F.col("x.band_id") == F.col("y.band_id"))
            & (F.col("x.band_key") == F.col("y.band_key"))
            & (F.col("x.id") < F.col("y.id")),
        )
        .select(F.col("x.id").alias("a"), F.col("y.id").alias("b"))
        .dropDuplicates()
    )
    ha = hashed.select(F.col("id").alias("a"), F.col("pbands").alias("pa"))
    hb = hashed.select(F.col("id").alias("b"), F.col("pbands").alias("pb"))
    hamming = F.aggregate(
        F.zip_with("pa", "pb", lambda x, y: F.bit_count(x.bitwiseXOR(y))),
        F.lit(0),
        lambda acc, v: acc + v,
    ).cast("int")
    return (
        cand.join(ha, "a")
        .join(hb, "b")
        .withColumn("hamming", hamming)
        .filter(F.col("hamming") <= F.lit(int(max_hamming)))
        .select("a", "b", "hamming")
    )


def media_neardup_ahash_sql(
    max_hamming: int = 3,
    shape: tuple = (8, 8),
    bands: int = 4,
    docs_table: str = "documents",
) -> str:
    """DuckDB twin of `media_neardup_ahash` over
    `media_from_documents(docs)` + `fake_grid_codec(*shape)`: the fake
    decode is cyclic byte tiling, so grid cell i holds the byte at
    payload position i mod len (the corpus is ASCII, so character codes
    ARE the UTF-8 bytes — same assumption the frame-features oracle is
    certified under); empty payloads decode to zeros. Same mean
    threshold, same little-endian band packing, same banded candidate
    join, same Hamming verify via per-band xor bit counts."""
    n_bits = int(shape[0]) * int(shape[1])
    width = n_bits // bands
    grid = (
        f"CASE WHEN length(text) = 0 THEN [0 for i in range({n_bits})] "
        f"ELSE list_transform(range({n_bits}), "
        f"i -> ord(substring(text, CAST(i % length(text) AS INT) + 1, 1))) END"
    )
    return f"""
WITH g AS (
  SELECT doc_id AS id, {grid} AS cells FROM {docs_table}
),
m AS (
  SELECT id, cells, list_sum(cells) / {float(n_bits)!r} AS mu FROM g
),
bits AS (
  SELECT id,
         list_transform(cells, c -> CASE WHEN c > mu THEN 1 ELSE 0 END) AS b
  FROM m
),
bandkeys AS (
  SELECT id,
         list_transform(range({bands}), j ->
           list_sum(list_transform(range({width}),
             k -> b[CAST(j * {width} + k AS INT) + 1] * (1 << CAST(k AS INT))))
         ) AS pbands
  FROM bits
),
bt AS (
  SELECT id, j - 1 AS band_id, pbands[j] AS band_key
  FROM bandkeys, UNNEST(range(1, {bands} + 1)) AS t(j)
),
cand AS (
  SELECT DISTINCT x.id AS a, y.id AS b
  FROM bt x JOIN bt y
    ON x.band_id = y.band_id AND x.band_key = y.band_key AND x.id < y.id
),
verified AS (
  SELECT c.a, c.b,
         CAST(list_sum(list_transform(range({bands}),
           j -> bit_count(xor(CAST(ba.pbands[CAST(j AS INT) + 1] AS BIGINT),
                              CAST(bb.pbands[CAST(j AS INT) + 1] AS BIGINT)))))
              AS INT) AS hamming
  FROM cand c
  JOIN bandkeys ba ON c.a = ba.id
  JOIN bandkeys bb ON c.b = bb.id
)
SELECT a, b, hamming FROM verified WHERE hamming <= {int(max_hamming)}
"""


# --------------------------------------------------------------------------
# Image-text pair filtering — the CLIP-score gate (VERDICT r13 next-#5).
#
# The LAION / DataComp curation recipe keeps an (image, caption) pair
# only when the cosine similarity of the image-tower and text-tower
# embeddings clears a threshold (LAION-400M used 0.28 with CLIP
# ViT-B/32; DataComp sweeps the percentile). This is the multimodal
# family's missing LLM-data-pipeline operator: the decode/embed seams
# produce the two towers, and this operator is the gate + the per-source
# retention report a curation run keys on.
#
# The operator is generic over any pair table that holds both embedding
# columns: pass `caption_emb` to equi-join the towers on `id_col` (the
# production shape when the towers are embedded by separate jobs — at
# 100 TB both sides should be bucketed/pre-partitioned on the id so the
# join co-locates instead of shuffling the wide arrays), or pass
# caption_emb=None when one scan already produced both towers (the
# LAION-parquet shape, rows holding image+caption together — no join,
# no shuffle of anything). Scoring is JVM-side (zip_with/aggregate
# folds from functions.vector); the per-source retention table is a
# tiny aggregate broadcast back onto the pair rows, so the wide
# embedding columns never shuffle in either form.
# --------------------------------------------------------------------------


def clip_score_pairs(
    media_emb: DataFrame,
    caption_emb: "DataFrame | None",
    threshold: float,
    img_col: str = "img_emb",
    txt_col: str = "txt_emb",
    id_col: str = "id",
    source_col: str = "source",
) -> DataFrame:
    """The STATELESS core of the CLIP-score gate: one row per pair —
    (id, source, clip_score, kept) — 6dp-rounded cosine of the two
    embedding columns with the zero-norm NULL guard, kept decided on
    the ROUNDED score. No aggregate, no state: this is the form a
    streaming micro-batch runs unchanged (stream_clip_gate) and the
    batch report (`clip_pair_filter`) extends with per-source
    retention. Pass `caption_emb` to equi-join separately-embedded
    towers on `id_col`, or None when one scan produced both. In the
    two-frame form the caption side is projected down to
    (id_col, txt_col) before the join — `source` resolves from
    `media_emb` when that side carries it (kept from the caption side
    only when media lacks it), so two embed jobs that each tagged
    provenance cannot produce an ambiguous-reference error
    (ADVICE r14)."""
    from vector_search_test_spark.functions.vector import dot, l2_norm

    if caption_emb is None:
        pairs = media_emb
    else:
        cap_cols = [F.col(id_col), F.col(txt_col)]
        if (
            source_col in caption_emb.columns
            and source_col not in media_emb.columns
        ):
            cap_cols.append(F.col(source_col))
        pairs = media_emb.join(caption_emb.select(*cap_cols), id_col)
    denom = l2_norm(img_col) * l2_norm(txt_col)
    score = F.round(
        dot(img_col, txt_col) / F.nullif(denom, F.lit(0.0)), 6
    )
    return pairs.select(
        F.col(id_col).alias("id"),
        F.col(source_col).alias("source"),
        score.alias("clip_score"),
    ).withColumn(
        "kept",
        F.coalesce(
            F.col("clip_score") >= F.lit(float(threshold)), F.lit(False)
        ),
    )


def clip_pair_filter(
    media_emb: DataFrame,
    caption_emb: "DataFrame | None",
    threshold: float,
    img_col: str = "img_emb",
    txt_col: str = "txt_emb",
    id_col: str = "id",
    source_col: str = "source",
) -> DataFrame:
    """CLIP-score image-text pair gate + per-source retention report.

    Output: one row per pair — (id, source, clip_score, kept,
    src_n_pairs, src_n_kept, src_retention). `clip_score` is the
    6dp-rounded cosine of the two embedding columns (double math over
    the float32 arrays, the functions.vector fold order); it is NULL
    when either tower has zero norm (an empty payload/caption — a real
    CLIP tower never emits zero vectors, but the gate must not turn
    0/0 into NaN-passes). `kept` applies `threshold` to the ROUNDED
    score (deterministic at the boundary on every engine) and is False
    for NULL scores. The src_* columns repeat each source's totals on
    its rows: n_pairs, n_kept, retention = round(n_kept / n_pairs, 6)
    — the per-source health numbers a DataComp-style sweep plots.
    """
    scored = clip_score_pairs(
        media_emb,
        caption_emb,
        threshold,
        img_col=img_col,
        txt_col=txt_col,
        id_col=id_col,
        source_col=source_col,
    )
    per_src = scored.groupBy("source").agg(
        F.count("*").alias("src_n_pairs"),
        F.sum(F.col("kept").cast("long")).alias("src_n_kept"),
    )
    per_src = per_src.withColumn(
        "src_retention",
        F.round(F.col("src_n_kept") / F.col("src_n_pairs"), 6),
    )
    return scored.join(F.broadcast(per_src), "source").select(
        "id", "source", "clip_score", "kept",
        "src_n_pairs", "src_n_kept", "src_retention",
    )


def _clip_cte_prefix(
    threshold: float,
    dim: int = 64,
    shape: tuple = (8, 8),
    docs_table: str = "documents",
) -> str:
    """Shared WITH-body (codes -> histograms -> float32 features ->
    scored -> gated) of the CLIP-gate oracles — used by BOTH the batch
    report twin (`clip_pair_filter_sql`) and the streaming gate twin
    (`clip_gate_sql`), so the two cannot drift. Replays the full entry
    pipeline over
    `media_from_documents(docs)` + `fake_grid_codec(*shape)` +
    `extract_byte_features(dim)` on BOTH towers: the image tower's
    grid is the cyclic byte tiling (cell i = byte at i mod len, the
    ahash-twin pattern, ASCII-certified), the caption tower reads the
    raw text bytes; both histograms fold byte % dim, L2-normalize in
    double (sums of squared integer counts are exact in any order),
    store as REAL (float32 — the array<float> contract), and the
    cosine runs in double over the float32 values with the zero-norm
    NULL guard and the rounded-score threshold, exactly like the Spark
    side."""
    n_bits = int(shape[0]) * int(shape[1])
    grid = (
        f"CASE WHEN length(text) = 0 THEN list_transform(range({n_bits}), i -> 0) "
        f"ELSE list_transform(range({n_bits}), "
        f"i -> ord(substring(text, CAST(i % length(text) AS INT) + 1, 1))) END"
    )
    def hist(codes: str) -> str:
        return (
            f"list_transform(range({dim}), b -> "
            f"CAST(len(list_filter({codes}, c -> c % {dim} = b)) AS DOUBLE))"
        )
    feat = (
        "CASE WHEN sqrt(list_sum(list_transform({h}, x -> x * x))) > 0 "
        "THEN list_transform({h}, x -> CAST(x / "
        "sqrt(list_sum(list_transform({h}, y -> y * y))) AS REAL)) "
        "ELSE list_transform({h}, x -> CAST(x AS REAL)) END"
    )
    dot = (
        "list_sum(list_transform(list_zip(fi, fc), "
        "p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))"
    )
    norm = "sqrt(list_sum(list_transform({f}, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))"
    na, nb = norm.format(f="fi"), norm.format(f="fc")
    return f"""
WITH codes AS (
  SELECT doc_id AS id, source,
         {grid} AS gcodes,
         list_transform(list_filter(string_split(text, ''), c -> c <> ''),
                        c -> ord(c)) AS ccodes
  FROM {docs_table}
),
h AS (
  SELECT id, source, {hist('gcodes')} AS hi, {hist('ccodes')} AS hc
  FROM codes
),
f AS (
  SELECT id, source,
         {feat.format(h='hi')} AS fi,
         {feat.format(h='hc')} AS fc
  FROM h
),
scored AS (
  SELECT id, source,
         round({dot} / nullif({na} * {nb}, 0.0), 6) AS clip_score
  FROM f
),
gated AS (
  SELECT id, source, clip_score,
         coalesce(clip_score >= {float(threshold)!r}, FALSE) AS kept
  FROM scored
)"""


def clip_pair_filter_sql(
    threshold: float,
    dim: int = 64,
    shape: tuple = (8, 8),
    docs_table: str = "documents",
) -> str:
    """DuckDB twin of `clip_pair_filter` (the batch report): the shared
    gate prefix plus the per-source retention join."""
    return f"""{_clip_cte_prefix(threshold, dim=dim, shape=shape, docs_table=docs_table)},
per_src AS (
  SELECT source, count(*)::BIGINT AS src_n_pairs,
         sum(kept::INT)::BIGINT AS src_n_kept,
         round(sum(kept::INT) / count(*), 6) AS src_retention
  FROM gated GROUP BY source
)
SELECT g.id, g.source, g.clip_score, g.kept,
       p.src_n_pairs, p.src_n_kept, p.src_retention
FROM gated g JOIN per_src p USING (source)
"""


def clip_gate_sql(
    threshold: float,
    dim: int = 64,
    shape: tuple = (8, 8),
    docs_table: str = "documents",
) -> str:
    """DuckDB twin of `stream_clip_gate`'s drained output: the shared
    gate prefix, keepers only (the stateless micro-batch emits exactly
    the batch filter's rows)."""
    return f"""{_clip_cte_prefix(threshold, dim=dim, shape=shape, docs_table=docs_table)}
SELECT id, source, clip_score FROM gated WHERE kept
"""
