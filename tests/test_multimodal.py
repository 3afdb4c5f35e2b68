"""Multimodal operator tests (sources/multimodal.py)."""

def test_dedup_media_exact_planted(spark):
    from vector_search_test_spark.sources.multimodal import (
        dedup_media_exact,
        media_from_documents,
    )

    docs = spark.createDataFrame(
        [(0, "aaa"), (1, "bbb"), (2, "aaa"), (7, "aaa")],
        "doc_id long, text string",
    )
    media = media_from_documents(docs, kind="image")
    got = {r.rep_id: r.n_copies for r in dedup_media_exact(media).collect()}
    assert got == {0: 3, 1: 1}  # min-id rep wins; byte-identical groups
