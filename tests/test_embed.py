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
