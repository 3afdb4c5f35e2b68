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


def test_decode_media_seam_requires_codec(spark):
    """The default seam stays honestly env-gated: no codec libs in this
    container, so decode_media() without a codec raises."""
    import pytest

    from vector_search_test_spark.sources.multimodal import (
        decode_media,
        media_from_documents,
    )

    docs = spark.createDataFrame([(0, "abc")], "doc_id long, text string")
    with pytest.raises(NotImplementedError):
        decode_media(media_from_documents(docs))


def test_decode_media_fake_codec_end_to_end(spark):
    """VERDICT r10 next-#7: the decode seam composes end-to-end through
    the Arrow path with a deterministic pure-Python codec — payload ->
    fixed-shape uint8 grid (binary) -> extract_byte_features on the
    DECODED column — so a real PIL/ffmpeg codec drops in with zero
    plumbing changes. Values pinned against a direct numpy replay."""
    import numpy as np

    from vector_search_test_spark.sources.multimodal import (
        decode_media,
        extract_byte_features,
        fake_grid_codec,
        media_from_documents,
    )

    rows = [(0, "abc"), (1, "a longer payload that tiles"), (2, "")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    media = media_from_documents(docs, kind="image")
    decoded = decode_media(media, codec=fake_grid_codec(height=4, width=8))
    feats = extract_byte_features(
        decoded, dim=16, payload_col="decoded", out_col="features"
    )
    got = {r.media_id: r for r in feats.collect()}
    assert set(got) == {0, 1, 2}
    for doc_id, text in rows:
        r = got[doc_id]
        # fixed-shape contract: every decoded grid is exactly 4*8 bytes
        assert len(bytes(r.decoded)) == 32
        # numpy replay of codec + histogram-feature, bit-for-bit
        payload = np.frombuffer(text.encode("utf-8"), dtype=np.uint8)
        grid = (
            np.zeros((4, 8), np.uint8)
            if payload.size == 0
            else np.resize(payload, (4, 8))
        )
        assert bytes(r.decoded) == grid.tobytes()
        hist = np.bincount(
            grid.reshape(-1) % 16, minlength=16
        ).astype(np.float64)
        n = np.linalg.norm(hist)
        want = (hist / n if n > 0 else hist).astype(np.float32)
        assert np.allclose(np.array(r.features, np.float32), want)
    # determinism across runs (same plan, fresh execution)
    again = {
        r.media_id: bytes(r.decoded)
        for r in decode_media(
            media, codec=fake_grid_codec(height=4, width=8)
        ).collect()
    }
    assert again == {k: bytes(v.decoded) for k, v in got.items()}


def test_decode_media_rejects_variable_shape_codec(spark):
    """The fixed-shape half of the codec contract is validated as
    loudly as the dtype half (r11 review): a codec emitting per-payload
    native resolutions must resize, not leak variable-length binaries."""
    import numpy as np
    import pytest

    from vector_search_test_spark.sources.multimodal import (
        decode_media,
        media_from_documents,
    )

    def varshape_factory():
        # shape depends on payload length -> violates the contract
        return lambda buf: np.zeros((max(1, len(bytes(buf))), 2), np.uint8)

    # single partition so both rows share a task — the guard is
    # per-task by design (see decode_media's in-function comment)
    docs = spark.createDataFrame(
        [(0, "a"), (1, "abcd")], "doc_id long, text string"
    ).coalesce(1)
    out = decode_media(media_from_documents(docs), codec=varshape_factory)
    with pytest.raises(Exception, match="fixed-shape"):
        out.collect()


def test_decode_media_validates_declared_shape(spark):
    """`expected_shape` (ADVICE r11) closes the cross-task hole in the
    per-task guard: a codec that is internally consistent but does not
    match the caller-declared shape is rejected from its FIRST grid,
    even when every task would have agreed with itself."""
    import numpy as np
    import pytest

    from vector_search_test_spark.sources.multimodal import (
        decode_media,
        fake_grid_codec,
        media_from_documents,
    )

    def consistent_wrong_factory():
        # constant within (and across) tasks — the first-grid pin alone
        # would accept it; only the declared shape catches the drift
        return lambda buf: np.zeros((2, 2), np.uint8)

    docs = spark.createDataFrame(
        [(0, "a"), (1, "abcd")], "doc_id long, text string"
    )
    media = media_from_documents(docs)
    bad = decode_media(
        media, codec=consistent_wrong_factory, expected_shape=(4, 8)
    )
    with pytest.raises(Exception, match="fixed-shape"):
        bad.collect()
    # and the matching declaration passes, byte-for-byte like undeclared
    ok = decode_media(
        media,
        codec=fake_grid_codec(height=4, width=8),
        expected_shape=(4, 8),
    ).collect()
    assert all(len(bytes(r.decoded)) == 32 for r in ok)


def test_decode_media_rejects_non_uint8_codec(spark):
    """The seam validates the codec contract loudly (a real decoder
    returning float tensors must convert, not silently reinterpret)."""
    import numpy as np
    import pytest

    from vector_search_test_spark.sources.multimodal import (
        decode_media,
        media_from_documents,
    )

    def bad_factory():
        return lambda buf: np.zeros((2, 2), dtype=np.float32)

    docs = spark.createDataFrame([(0, "abc")], "doc_id long, text string")
    out = decode_media(media_from_documents(docs), codec=bad_factory)
    with pytest.raises(Exception, match="uint8"):
        out.collect()


# --------------------------------------------------------------------------
# Perceptual (aHash) near-dup
# --------------------------------------------------------------------------


def test_ahash_matches_duckdb(spark, sf_dir):
    import duckdb

    from vector_search_test_spark.io import load_table
    from vector_search_test_spark.sources.multimodal import (
        fake_grid_codec,
        media_from_documents,
        media_neardup_ahash,
        media_neardup_ahash_sql,
    )

    docs = load_table(spark, sf_dir, "documents")
    media = media_from_documents(docs, kind="image")
    got = sorted(
        tuple(str(x) for x in r)
        for r in media_neardup_ahash(
            media, codec=fake_grid_codec(8, 8), max_hamming=3
        ).collect()
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf_dir}/documents.parquet')"
    )
    want = sorted(
        tuple(str(x) for x in r)
        for r in con.execute(media_neardup_ahash_sql(max_hamming=3)).fetchall()
    )
    assert got == want and len(got) > 0


def test_ahash_bands_pure_python_crosscheck(spark):
    """Engine band keys equal a straight python re-implementation of
    tile -> mean-threshold -> little-endian packing, including the
    empty-payload zeros case."""
    import numpy as np

    from vector_search_test_spark.sources.multimodal import (
        ahash_bands,
        fake_grid_codec,
    )

    texts = ["hello world this is a test", "aAbBcC", "", "zzzz"]
    df = spark.createDataFrame(
        [(i, t.encode()) for i, t in enumerate(texts)],
        "media_id long, payload binary",
    )
    got = {
        r["media_id"]: list(r["pbands"])
        for r in ahash_bands(df, codec=fake_grid_codec(8, 8)).collect()
    }

    def expect(t):
        b = t.encode()
        arr = (
            np.resize(np.frombuffer(b, np.uint8), (8, 8)).reshape(-1)
            if b
            else np.zeros(64, np.uint8)
        )
        bits = (arr.astype(float) > arr.astype(float).mean()).astype(int)
        return [
            int(sum(bits[16 * j + k] << k for k in range(16)))
            for j in range(4)
        ]

    for i, t in enumerate(texts):
        assert got[i] == expect(t), t
    assert got[2] == [0, 0, 0, 0]  # empty payload -> zero hash


def test_ahash_neardup_radius_and_plan(spark):
    """Identical payloads pair at hamming 0; a payload differing in one
    grid cell's threshold side pairs within radius; pairs beyond the
    radius are excluded; the candidate stage is a banded equi-join
    (never a cartesian)."""
    from vector_search_test_spark.sources.multimodal import (
        fake_grid_codec,
        media_neardup_ahash,
    )

    base = bytes(range(64))  # mean 31.5: bits = cells 32..63
    # nudge cell 32 from 32 to 31: it crosses the (barely moved) mean,
    # every other cell stays on its side -> hamming exactly 1
    onebit = bytes(list(range(32)) + [31] + list(range(33, 64)))
    far = bytes([0, 255] * 32)  # alternating bits: no band matches base
    df = spark.createDataFrame(
        [(0, base), (1, base), (2, onebit), (3, far)],
        "media_id long, payload binary",
    )
    rows = media_neardup_ahash(
        df, codec=fake_grid_codec(8, 8), max_hamming=3
    ).collect()
    got = {(r["a"], r["b"]): r["hamming"] for r in rows}
    assert got[(0, 1)] == 0
    assert got.get((0, 2)) == 1
    assert (0, 3) not in got and (1, 3) not in got
    plan = media_neardup_ahash(
        df, codec=fake_grid_codec(8, 8), max_hamming=3
    )._jdf.queryExecution().executedPlan().toString()
    assert "Cartesian" not in plan and "NestedLoop" not in plan


def test_ahash_validates_params(spark):
    import pytest as _pytest

    from vector_search_test_spark.sources.multimodal import (
        ahash_bands,
        fake_grid_codec,
        media_neardup_ahash,
    )

    df = spark.createDataFrame([(0, b"x")], "media_id long, payload binary")
    with _pytest.raises(NotImplementedError):
        ahash_bands(df)  # no codec -> honest environment seam
    with _pytest.raises(ValueError):
        ahash_bands(df, codec=fake_grid_codec(8, 8), bands=3)  # 64 % 3
    with _pytest.raises(ValueError):
        media_neardup_ahash(
            df, codec=fake_grid_codec(8, 8), max_hamming=4, bands=4
        )  # pigeonhole bound violated


def _clip_pipeline(spark, rows, theta, dim=16, shape=(4, 4)):
    """Run the full entry-shaped pipeline over literal (id, source,
    text) rows: decode seam -> both towers -> gate."""
    from pyspark.sql import functions as F

    from vector_search_test_spark.sources.multimodal import (
        clip_pair_filter,
        decode_media,
        extract_byte_features,
        fake_grid_codec,
    )

    docs = spark.createDataFrame(rows, "id long, source string, text string")
    pairs = docs.select(
        "id", "source", F.encode(F.col("text"), "UTF-8").alias("payload")
    )
    dec = decode_media(
        pairs, codec=fake_grid_codec(*shape), expected_shape=shape
    )
    img = extract_byte_features(
        dec, dim=dim, payload_col="decoded", out_col="img_emb"
    )
    both = extract_byte_features(
        img, dim=dim, payload_col="payload", out_col="txt_emb"
    )
    return clip_pair_filter(both, None, theta, id_col="id")


def test_clip_pair_filter_perfect_and_mismatched_pairs(spark):
    """A caption whose bytes tile the grid exactly scores cosine 1.0
    (both towers see identical byte histograms); a caption disjoint
    in byte values from its tiled grid... is impossible by
    construction (the grid IS tiled caption bytes), so the planted
    mismatch uses a LONG caption whose 16-byte prefix-tiling has a
    different histogram than the full text — the score drops below 1
    and below the perfect pair's."""
    rows = [
        # 16 chars == grid size: tiling preserves the full histogram
        (0, "s1", "abcdefghijklmnop"),
        # long text, skewed tail: the grid sees only the first 16 bytes
        (1, "s1", "abcdefghijklmnop" + "z" * 400),
    ]
    out = {r["id"]: r for r in _clip_pipeline(spark, rows, 0.99).collect()}
    assert out[0]["clip_score"] == 1.0 and out[0]["kept"]
    assert out[1]["clip_score"] < 1.0 and not out[1]["kept"]
    # per-source stats repeat on every row of the source
    for r in out.values():
        assert r["src_n_pairs"] == 2 and r["src_n_kept"] == 1
        assert r["src_retention"] == 0.5


def test_clip_pair_filter_zero_norm_guard(spark):
    """An empty caption gives a zero text tower: the score must be
    NULL (not NaN) and the pair dropped — 0/0 must never pass a
    gate."""
    rows = [(0, "s1", ""), (1, "s1", "hello world")]
    out = {r["id"]: r for r in _clip_pipeline(spark, rows, 0.0).collect()}
    assert out[0]["clip_score"] is None and not out[0]["kept"]
    assert out[1]["clip_score"] is not None and out[1]["kept"]
    assert out[0]["src_n_pairs"] == 2 and out[0]["src_n_kept"] == 1


def test_clip_pair_filter_joined_towers_match_single_scan(spark):
    """The production two-table form (separate media/caption embedding
    jobs, equi-joined on id) must gate identically to the one-scan
    form."""
    from pyspark.sql import functions as F

    from vector_search_test_spark.sources.multimodal import clip_pair_filter

    rows = [
        (0, "s1", [1.0, 0.0], [1.0, 0.0]),
        (1, "s1", [1.0, 0.0], [0.0, 1.0]),
        (2, "s2", [0.5, 0.5], [0.5, 0.5]),
    ]
    both = spark.createDataFrame(
        rows,
        "id long, source string, img_emb array<float>, txt_emb array<float>",
    )
    media = both.select("id", "img_emb")
    caps = both.select("id", "source", "txt_emb")
    one = clip_pair_filter(both, None, 0.9, id_col="id")
    two = clip_pair_filter(media, caps, 0.9, id_col="id")
    assert sorted(map(tuple, one.collect())) == sorted(
        map(tuple, two.collect())
    )
    got = {r["id"]: r for r in two.collect()}
    assert got[0]["kept"] and not got[1]["kept"] and got[2]["kept"]
    assert got[1]["clip_score"] == 0.0
    assert got[0]["src_n_pairs"] == 2 and got[0]["src_retention"] == 0.5
    assert got[2]["src_retention"] == 1.0
    # ADVICE r14: when BOTH embed jobs tagged provenance (the natural
    # two-job output), the join must not raise an ambiguous-reference
    # error — source resolves from the media tower
    media_tagged = both.select(
        "id", F.col("source"), "img_emb"
    )
    caps_retagged = both.select(
        "id", F.lit("WRONG").alias("source"), "txt_emb"
    )
    three = clip_pair_filter(media_tagged, caps_retagged, 0.9, id_col="id")
    assert sorted(map(tuple, one.collect())) == sorted(
        map(tuple, three.collect())
    )


def test_clip_pair_filter_threshold_boundary_on_rounded_score(spark):
    """kept applies the threshold to the 6dp-ROUNDED score, so a score
    that rounds exactly onto theta passes on every engine."""
    from vector_search_test_spark.sources.multimodal import clip_pair_filter

    both = spark.createDataFrame(
        [(0, "s", [1.0, 0.0], [1.0, 0.0])],
        "id long, source string, img_emb array<float>, txt_emb array<float>",
    )
    assert clip_pair_filter(both, None, 1.0, id_col="id").collect()[0]["kept"]
    assert not clip_pair_filter(
        both, None, 1.0000001, id_col="id"
    ).collect()[0]["kept"]
