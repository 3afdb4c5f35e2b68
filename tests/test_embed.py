"""F1/Q1 tests: embedder determinism, unit norm, batch==single, and the
end-to-end text query path (VERDICT round-1 item 4)."""

import numpy as np
from pyspark.sql import functions as F

from vector_search_test_spark.functions.embed import HashingEmbedder, embed_text
from vector_search_test_spark.io import load_table
from vector_search_test_spark.operators.search import build_text_index, search_text


def test_embedder_deterministic_unit_norm():
    e = HashingEmbedder(dim=64)
    a = e.encode(["the quick brown fox", "jumps over the lazy dog"])
    b = e.encode(["the quick brown fox", "jumps over the lazy dog"])
    assert np.array_equal(a, b)
    assert a.dtype == np.float32 and a.shape == (2, 64)
    np.testing.assert_allclose(np.linalg.norm(a.astype(np.float64), axis=1), 1.0, atol=1e-6)
    # a fresh embedder (empty token cache) gives identical vectors
    c = HashingEmbedder(dim=64).encode(["the quick brown fox"])
    assert np.array_equal(a[0], c[0])


def test_embedder_batch_matches_single():
    e = HashingEmbedder(dim=32)
    texts = ["alpha beta", "beta gamma delta", "", "alpha alpha alpha"]
    batch = e.encode(texts)
    singles = np.vstack([HashingEmbedder(dim=32).encode_one(t) for t in texts])
    assert np.array_equal(batch, singles)
    # empty text -> zero vector (norm guard, not NaN)
    assert np.all(batch[2] == 0)


def test_embed_text_dataframe(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").limit(20)
    out = embed_text(docs, text_col="text", dim=64)
    assert out.schema["embedding"].dataType.simpleString() == "array<float>"
    rows = out.select("doc_id", "text", "embedding").collect()
    assert len(rows) == 20
    e = HashingEmbedder(dim=64)
    for r in rows[:5]:
        np.testing.assert_allclose(
            np.array(r.embedding), e.encode([r.text])[0], atol=1e-7
        )


def test_search_text_end_to_end(spark, sf_dir):
    """Q1: a document's own text is its nearest neighbor at distance ~0."""
    docs = load_table(spark, sf_dir, "documents").limit(100)
    idx = build_text_index(docs, nlist=2)
    probe = docs.filter(F.col("doc_id") == 3).first().text
    hits = search_text(idx, probe, k=3, nprobe=2).collect()
    assert len(hits) == 3
    assert hits[0].vec_id == 3 and abs(hits[0].dist) < 1e-9


def test_embed_text_mock_model_batch_contract(spark):
    """The F1 seam fits a real batch model (reference app.py:18-20,
    34-43): one weight load per task serves MANY Arrow batches (the
    broadcast-once contract), encode sees bounded BATCHES (Arrow
    batching, never row-at-a-time), and row content maps through
    correctly."""

    class _FakeBatchModel:
        """A stateful mock with a real SentenceTransformer's batch contract
        (VERDICT r11 next-#4): heavy weights load LAZILY on first encode in
        the worker process, every Arrow batch reuses the loaded instance,
        and encode is batch-in/matrix-out. Instrumentation rides inside the
        output vector so worker-side facts survive the Arrow round-trip:
          dim 0: content-derived value (token count) — row fidelity
          dim 1: the batch size this row's encode() call saw
          dim 2: cumulative weight-load count at encode time (must stay 1)
          dim 3: 1-based batch index within this model instance
        """

        dim = 4

        def __init__(self):
            self._weights = None  # not loaded until first worker-side encode
            self._loads = 0
            self._batches = 0

        def encode(self, texts):
            if self._weights is None:  # the lazy one-time load
                self._loads += 1
                self._weights = np.ones(1)
            self._batches += 1
            n = len(texts)
            out = np.zeros((n, self.dim), dtype=np.float64)
            out[:, 0] = [float(len(t.split())) for t in texts]
            out[:, 1] = float(n)
            out[:, 2] = float(self._loads)
            out[:, 3] = float(self._batches)
            return out.astype(np.float32)

    prev = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "16")
    try:
        docs = spark.createDataFrame(
            [(i, "tok " * (i % 7 + 1)) for i in range(100)],
            "doc_id long, text string",
        ).coalesce(1)  # one task -> one model instance sees every batch
        rows = embed_text(
            docs, text_col="text", embedder=_FakeBatchModel()
        ).collect()
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", prev)
    assert len(rows) == 100
    embs = {r.doc_id: r.embedding for r in rows}
    for r in rows:
        v = r.embedding
        # row fidelity through the Arrow round-trip
        assert v[0] == float(len(r.text.split()))
        # Arrow batching: encode saw a BATCH (>1 row, <= configured cap)
        assert 1.0 < v[1] <= 16.0
        # broadcast-once: the heavy load happened exactly once per task
        assert v[2] == 1.0
    # ...and that single loaded instance served MULTIPLE batches
    assert max(v[3] for v in embs.values()) >= 2.0


def test_search_text_with_mock_model_end_to_end(spark, sf_dir):
    """Q1 with a NON-hash model through build + query: both sides of
    the text path (corpus encode in mapInPandas, query encode on the
    driver) consume the same injected model object, mirroring how a
    real SentenceTransformer would be wired (app.py:58-63)."""

    class _LenModel:
        """Deterministic toy model: embeds a text by binned token
        counts — content-derived, so nearest-neighbor is meaningful."""

        def encode(self, texts):
            out = np.zeros((len(texts), 4), dtype=np.float64)
            for i, t in enumerate(texts):
                toks = t.lower().split()
                out[i] = [
                    float(len(toks)),
                    float(sum(len(w) for w in toks) % 17),
                    float(len(set(toks)) % 13),
                    1.0,
                ]
            n = np.linalg.norm(out, axis=1, keepdims=True)
            np.divide(out, n, out=out, where=n > 0)
            return out.astype(np.float32)

    docs = load_table(spark, sf_dir, "documents").limit(60)
    model = _LenModel()
    idx = build_text_index(docs, nlist=2, embedder=model, dim=4)
    probe = docs.filter(F.col("doc_id") == 7).first().text
    hits = search_text(idx, probe, k=3, nprobe=2, embedder=model).collect()
    assert len(hits) == 3
    # the probe document embeds identically on both paths, so doc 7
    # itself must appear among the hits at distance ~0
    assert any(
        h.vec_id == 7 and abs(float(h.dist)) < 1e-9 for h in hits
    )
