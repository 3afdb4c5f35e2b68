"""Scalar quantization (SQ8): int8 vector compression + compressed
search (extension — the compression axis faiss's IndexScalarQuantizer
occupies between raw floats and PQ; reference app.py:47-48 holds raw
float vectors in IndexIVFFlat).

Per-vector symmetric int8: scale = float32(max|x| / 127), code_i =
round(x_i / scale) clamped to [-127, 127]. 4 bytes -> 1 byte per
dimension (4x scan compression) with far higher fidelity than PQ's
m-byte codes — the right tradeoff when the corpus fits at 1/4 cost and
recall tolerances are tight. Decode is code_i * scale, so distances run
directly on the codes with one multiply — no codebook, no LUT.

Scale shape: encode is a scan-only columnar projection (JVM
higher-order functions — no Python, no shuffle); search is the same
TakeOrdered top-k as the float path but over a 4x-smaller scan. Every
step is deterministic double arithmetic on float32-rounded scales, so
DuckDB twins replay it bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from vector_search_test_spark.functions.vector import const_double_array


def sq8_encode(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    extra_cols: "tuple[str, ...]" = (),
) -> DataFrame:
    """Encode float vectors to (id, scale float, codes array<int>).

    scale is rounded to float32 BEFORE quantizing (it is what a binary
    format would store alongside the codes); a zero vector gets
    scale 0 and all-zero codes (decode gives the zero vector back).
    Codes are ints in [-127, 127] — stored as array<int> here because
    Spark has no int8 array, but the INFORMATION is one byte per dim
    (+4 bytes per vector for the scale), which is what a real sink
    would write. `extra_cols` pass through untouched (e.g. an IVF
    list_id riding alongside the codes)."""
    x = F.col(vec_col)
    amax = F.array_max(F.transform(x, lambda v: F.abs(v)))
    scale = (amax / F.lit(127.0)).cast("float")
    staged = df.select(
        *extra_cols, F.col(id_col), scale.alias("scale"), x.alias("__v")
    )
    codes = F.when(
        F.col("scale") == 0.0,
        F.transform(F.col("__v"), lambda v: F.lit(0)),
    ).otherwise(
        F.transform(
            F.col("__v"),
            lambda v: F.greatest(
                F.lit(-127),
                F.least(
                    F.lit(127),
                    F.round(v / F.col("scale"), 0).cast("int"),
                ),
            ),
        )
    )
    return staged.select(*extra_cols, id_col, "scale", codes.alias("codes"))


def sq8_l2_topk(
    codes_df: DataFrame,
    query_vec: "list[float]",
    k: int = 5,
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact squared-L2 between the query and DECODED vectors
    (code*scale), global top-k: TakeOrderedAndProject over the
    compressed scan — the float table is never read. Returns
    (id, dist) ascending, ties broken by id."""
    q = const_double_array(query_vec)
    scl = F.col("scale").cast("double")  # decode in double, explicitly —
    # int*float would stay float32 in Spark but engines differ on
    # promotion; double-everywhere is what the DuckDB twin replays
    dist = F.aggregate(
        F.zip_with(
            F.col("codes"),
            q,
            lambda c, qv: (c * scl - qv) * (c * scl - qv),
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    # nulls last for the same wrong-dimension defense as bq_hamming_topk
    # (and DuckDB's ASC default is NULLS LAST, so the twins agree)
    return (
        codes_df.select(F.col(id_col), dist.alias("dist"))
        .orderBy(F.asc_nulls_last("dist"), F.asc(id_col))
        .limit(k)
    )


def ivfsq8_search(
    postings: DataFrame,
    query_vec: "list[float]",
    centroids,
    k: int = 5,
    nprobe: int = 2,
    id_col: str = "vec_id",
) -> DataFrame:
    """IVF + SQ8 — faiss's workhorse large-scale configuration
    (IndexIVFScalarQuantizer): coarse cells prune the scan to nprobe
    inverted lists, int8 codes quarter the bytes of what remains.
    `postings` is (list_id, id, scale, codes) — assign_cells composed
    with sq8_encode(extra_cols=("list_id",)). The probed-cell set is
    computed driver-side and applied as a static IN filter, so against
    postings persisted partitionBy(list_id) this is partition pruning,
    exactly like the float-IVF and IVF-PQ paths."""
    from vector_search_test_spark.operators.ivf import rank_cells

    probed = rank_cells(query_vec, centroids, nprobe)
    return sq8_l2_topk(
        postings.filter(F.col("list_id").isin(probed)),
        query_vec,
        k=k,
        id_col=id_col,
    )


def ivfsq8_save(postings: DataFrame, centroids, path: str) -> None:
    """Persist the IVF-SQ8 index: `<path>/centroids/` (KBs) and
    `<path>/postings/` partitioned by list_id — the same inverted-list
    directory layout as the float index (ivf.py::ivf_save) and the
    IVF-PQ index (pq.py::ivfpq_save), at 1 byte/dim + 4 bytes/vector.
    Same hash-shuffle-on-list_id write: file count bounded by nlist at
    defaultParallelism tasks."""
    import os as _os

    from vector_search_test_spark.operators.ivf import (
        write_centroid_table,
        write_partitioned_postings,
    )

    spark = postings.sparkSession
    write_centroid_table(spark, centroids, _os.path.join(path, "centroids"))
    write_partitioned_postings(
        postings, _os.path.join(path, "postings"), nlist=len(centroids)
    )


def ivfsq8_load(spark, path: str, id_col: str = "vec_id"):
    """Load a saved IVF-SQ8 index: (postings, centroids). Pure IO; the
    partitioned postings scan prunes to the probed list_id directories
    exactly like the float and PQ variants. `id_col` must match the
    column the index was encoded with."""
    import os as _os

    from vector_search_test_spark.operators.ivf import read_centroid_table

    centroids = read_centroid_table(spark, _os.path.join(path, "centroids"))
    postings = spark.read.parquet(_os.path.join(path, "postings")).select(
        F.col("list_id").cast("int").alias("list_id"),
        id_col,
        "scale",
        "codes",
    )
    return postings, centroids


def bq_encode(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Binary quantization — the 1-bit end of the compression ladder
    (float32 -> SQ8 -> PQ -> binary; faiss's IndexBinaryFlat): one sign
    bit per dimension, packed 32 bits per array element (32-bit chunks
    in BIGINT slots keep every value positive — a 64-bit pack would
    overflow the sign bit on dimension 63). 32x compression; distances
    become XOR+popcount integer ops. Scan-only JVM projection."""
    x = F.col(vec_col)
    nchunks = F.ceil(F.size(x) / F.lit(32)).cast("int")
    # guard nchunks >= 1 INSIDE the when: sequence(0, -1) counts DOWN in
    # Spark, so an empty vector would otherwise pack as [0, 0] instead
    # of [] (bq_pack and the DuckDB twin both give [])
    packed = F.transform(
        F.sequence(F.lit(0), nchunks - 1),
        lambda j: F.aggregate(
            F.sequence(F.lit(0), F.lit(31)),
            F.lit(0).cast("long"),
            lambda acc, i: acc
            + F.when(
                # F.get (0-based) returns NULL past the end — element_at
                # would THROW under Spark 4's default ANSI mode when the
                # dimension is not a multiple of 32. shiftleft() needs a
                # Python-int bit count, so the bit weight is pow(2, i) —
                # exact in doubles through 2^52, cast back to long.
                F.get(x, (j * 32 + i).cast("int")) > 0,
                F.pow(F.lit(2.0), i).cast("long"),
            ).otherwise(F.lit(0).cast("long")),
        ),
    )
    codes = F.when(nchunks >= 1, packed).otherwise(
        F.array().cast("array<bigint>")
    )
    return df.select(F.col(id_col), codes.alias("bits"))


def bq_pack(vec: "list[float]") -> "list[int]":
    """Driver-side twin of bq_encode for a query vector."""
    out = []
    for j in range(0, len(vec), 32):
        word = 0
        for i, v in enumerate(vec[j : j + 32]):
            if v > 0:
                word += 1 << i
        out.append(word)
    return out


def bq_hamming_topk(
    bits_df: DataFrame,
    query_vec: "list[float]",
    k: int = 5,
    id_col: str = "vec_id",
) -> DataFrame:
    """Global top-k by Hamming distance between packed sign bits:
    per-chunk XOR + popcount, summed — pure integer arithmetic (the
    oracle is exact by construction, no float parity argument needed),
    TakeOrderedAndProject over a 32x-compressed scan. The standard
    first-pass filter in a binary-then-rerank stack."""
    q = F.array(*[F.lit(int(w)).cast("long") for w in bq_pack(query_vec)])
    dist = F.aggregate(
        F.zip_with(
            F.col("bits"), q, lambda a, b: F.bit_count(a.bitwiseXOR(b))
        ),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )
    # nulls LAST: a row whose bit array mismatches the query's chunk
    # count (empty/wrong-dim vector) zips to a NULL distance — it must
    # sink below every real match, not outrank them (plain asc puts
    # NULLs first)
    return (
        bits_df.select(F.col(id_col), dist.alias("hamming"))
        .orderBy(F.asc_nulls_last("hamming"), F.asc(id_col))
        .limit(k)
    )


def bq_rerank(
    bits_df: DataFrame,
    corpus: DataFrame,
    query_vec: "list[float]",
    k: int = 5,
    r: int = 50,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """The binary-then-rerank stack closed: Hamming over the packed
    bits picks an R-candidate shortlist (32x-compressed scan, integer
    ops), then ONLY those R rows join back to the float table for exact
    L2 re-ranking — the same two-stage shape as pq_rerank, with the
    cheapest possible first pass. At scale the float scan is replaced
    by an R-row broadcast join; returns (id, dist) ascending."""
    from vector_search_test_spark.functions.vector import l2_sq_const

    shortlist = bq_hamming_topk(bits_df, query_vec, k=r, id_col=id_col)
    dist = l2_sq_const(vec_col, [float(v) for v in query_vec])
    return (
        corpus.join(F.broadcast(shortlist.select(id_col)), id_col)
        .select(F.col(id_col), dist.alias("dist"))
        .orderBy(F.asc("dist"), F.asc(id_col))
        .limit(k)
    )


def bq_encode_sql(vec_expr: str = "embedding") -> str:
    """DuckDB twin of bq_encode: same 32-bit chunking, same sign
    predicate, BIGINT shifts."""
    return (
        f"list_transform(range(0, CAST(ceil(len({vec_expr}) / 32.0) AS INTEGER)), "
        f"j -> list_sum(list_transform(range(0, 32), "
        f"i -> CASE WHEN {vec_expr}[j * 32 + i + 1] > 0 "
        f"THEN (CAST(1 AS BIGINT) << i) ELSE CAST(0 AS BIGINT) END)))"
    )


def sq8_encode_sql(vec_expr: str = "embedding") -> str:
    """DuckDB twin of sq8_encode's (scale, codes) for one vector
    expression. Every arithmetic step is forced to the same type Spark
    uses: the scale divide runs in DOUBLE then rounds to FLOAT (a bare
    127.0 literal would be DECIMAL in DuckDB and silently change the
    arithmetic); the code divide promotes the float element to DOUBLE
    (Spark's `/` always does; DuckDB FLOAT/FLOAT would stay float32)."""
    scale = (
        f"CAST(CAST(list_max(list_transform({vec_expr}, v -> abs(v))) "
        f"AS DOUBLE) / CAST(127.0 AS DOUBLE) AS FLOAT)"
    )
    return (
        f"CASE WHEN {scale} = 0 THEN "
        f"list_transform({vec_expr}, v -> 0) "
        f"ELSE list_transform({vec_expr}, v -> "
        f"greatest(-127, least(127, "
        f"CAST(round(CAST(v AS DOUBLE) / {scale}, 0) AS INTEGER)))) "
        f"END AS codes, {scale} AS scale"
    )
