"""Multimodal plumbing + Structured Streaming tests.

Streaming correctness bar: availableNow run over a static input must
equal the batch equivalent on the same input (stateless assign is a pure
projection; windowed counts compared via complete-mode memory sink).
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from vector_search_test_spark.io import load_table
from vector_search_test_spark.operators.ivf import assign_cells, train_centroids
from vector_search_test_spark.sources.multimodal import (
    decode_media,
    extract_byte_features,
    frame_sample,
    media_from_documents,
)
from vector_search_test_spark.streaming.ingest import (
    run_stream_to_parquet,
    stream_assign_cells,
    stream_event_window_counts,
)
from vector_search_test_spark.streaming.stateful import stream_sessionize


def test_media_schema_and_metadata(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").limit(50)
    media = media_from_documents(docs, kind="image")
    assert [f.name for f in media.schema.fields] == ["media_id", "kind", "payload", "meta"]
    assert media.schema["payload"].dataType.simpleString() == "binary"
    # ASCII corpus: byte length == char length (n_chars fixture anchor)
    joined = media.join(
        load_table(spark, sf_dir, "documents").limit(50),
        media.media_id == F.col("doc_id"),
    )
    bad = joined.filter(F.col("meta.n_bytes") != F.col("n_chars")).count()
    assert bad == 0


def test_decode_media_is_stubbed(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").limit(1)
    with pytest.raises(NotImplementedError, match="codec"):
        decode_media(media_from_documents(docs))


def test_byte_features_match_numpy_twin(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").limit(20)
    media = media_from_documents(docs)
    out = extract_byte_features(media, dim=32).select("media_id", "features").collect()
    texts = {r.doc_id: r.text for r in docs.collect()}
    for r in out:
        arr = np.frombuffer(texts[r.media_id].encode(), dtype=np.uint8)
        hist = np.bincount(arr % 32, minlength=32).astype(np.float64)
        hist /= np.linalg.norm(hist)
        np.testing.assert_allclose(np.array(r.features), hist, atol=1e-6)


def test_frame_sample_shapes(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").limit(10)
    media = media_from_documents(docs, kind="video")
    frames = frame_sample(media, n_frames=4)
    per = frames.groupBy("media_id").agg(F.count("*").alias("n")).collect()
    assert all(r.n == 4 for r in per)
    assert frames.filter(F.col("frame_bytes") < 1).count() == 0


def test_stream_assign_matches_batch(spark, sf_dir, tmp_path):
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    cents = train_centroids(emb, nlist=4)
    inp = str(tmp_path / "stream_in")
    emb.write.parquet(inp)
    out = str(tmp_path / "stream_out")
    ckpt = str(tmp_path / "ckpt")
    run_stream_to_parquet(
        stream_assign_cells(spark, inp, cents), out, ckpt, partition_by="list_id"
    )
    got = sorted(
        (r.vec_id, r.list_id)
        for r in spark.read.parquet(out).select("vec_id", "list_id").collect()
    )
    want = sorted(
        (r.vec_id, r.list_id)
        for r in assign_cells(emb, cents).select("vec_id", "list_id").collect()
    )
    assert got == want


def test_stateful_sessionize_matches_batch(spark, sf_dir, tmp_path):
    """applyInPandasWithState sessionization: closed sessions emitted by
    the stream must equal the batch sessionize result minus each user's
    trailing (still-open) session — exact under time-ordered arrival,
    regardless of how micro-batches split the input."""
    import os

    from vector_search_test_spark.operators.timeseries import sessionize

    ev_batch = load_table(spark, sf_dir, "events")
    inp = tmp_path / "sess_in"
    inp.mkdir()
    # three time-ordered files -> availableNow(maxFilesPerTrigger=1)
    # replays them as three micro-batches crossing session boundaries
    bounds = ev_batch.agg(
        F.min("ts").alias("lo"), F.max("ts").alias("hi")
    ).first()
    cuts = [
        bounds.lo
        + (bounds.hi - bounds.lo) * f
        for f in (1 / 3, 2 / 3)
    ]
    parts = [
        ev_batch.filter(F.col("ts") <= F.lit(cuts[0])),
        ev_batch.filter((F.col("ts") > F.lit(cuts[0])) & (F.col("ts") <= F.lit(cuts[1]))),
        ev_batch.filter(F.col("ts") > F.lit(cuts[1])),
    ]
    for i, p in enumerate(parts):
        sub = tmp_path / f"sess_part{i}"
        p.coalesce(1).write.parquet(str(sub))
        (pq,) = [f for f in os.listdir(sub) if f.endswith(".parquet")]
        os.rename(sub / pq, inp / f"{i:02d}.parquet")
        # mtime order = processing order for the file-stream source
        os.utime(inp / f"{i:02d}.parquet", (1_700_000_000 + i, 1_700_000_000 + i))

    stream = stream_sessionize(spark, str(inp), gap_seconds=1800, max_files_per_trigger=1)
    q = (
        stream.writeStream.format("memory")
        .queryName("closed_sessions")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "sess_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = sorted(
        (r.user_id, r.session_start, r.session_end, r.n_events, round(r.sum_value, 6))
        for r in spark.sql("SELECT * FROM closed_sessions").collect()
    )

    sess = sessionize(ev_batch, gap_seconds=1800)
    agg = sess.groupBy("user_id", "session_id").agg(
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.count("*").alias("n_events"),
        F.sum("value").alias("sum_value"),
    )
    last = sess.groupBy("user_id").agg(F.max("session_id").alias("last_sid"))
    want = sorted(
        (r.user_id, r.session_start, r.session_end, r.n_events, round(r.sum_value, 6))
        for r in agg.join(
            last,
            (agg.user_id == last.user_id) & (agg.session_id == last.last_sid),
            "left_anti",
        ).collect()
    )
    assert got == want
    assert len(got) > 0


def test_stream_window_counts_match_batch(spark, sf_dir, tmp_path):
    import shutil

    ev_batch = load_table(spark, sf_dir, "events")
    # the file-stream source wants a directory of files, not a single file
    inp = tmp_path / "events_in"
    inp.mkdir()
    shutil.copy(f"{sf_dir}/events.parquet", inp / "events.parquet")
    stream = stream_event_window_counts(spark, str(inp))
    q = (
        stream.writeStream.format("memory")
        .queryName("win_counts")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = sorted(
        (r.win_start, r.event_type, r.n_events, r.sum_value)
        for r in spark.sql("SELECT * FROM win_counts").collect()
    )
    want = sorted(
        (r.win_start, r.event_type, r.n_events, r.sum_value)
        for r in ev_batch.groupBy(
            F.window("ts", "1 hour").alias("win"), "event_type"
        )
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 6).alias("sum_value"),
        )
        .select(
            F.col("win.start").alias("win_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
        .collect()
    )
    assert got == want


def test_stream_ivfpq_encode_matches_batch(spark, sf_dir, tmp_path):
    """Streaming compressed add: encoding a vector stream against the
    frozen two-level quantizer yields exactly the batch ivfpq_encode
    postings (stateless map — identical per row no matter how the
    micro-batches split)."""
    import numpy as np

    from vector_search_test_spark.operators.pq import (
        ivfpq_encode,
        train_ivfpq_numpy,
    )
    from vector_search_test_spark.streaming.ingest import stream_ivfpq_encode

    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    X = np.array(
        [np.asarray(r.embedding, dtype=np.float32) for r in
         emb.orderBy("vec_id").collect()],
        dtype=np.float64,
    )
    coarse, books = train_ivfpq_numpy(X, nlist=4, m=8, ksub=8)
    inp = str(tmp_path / "pq_stream_in")
    emb.write.parquet(inp)
    out = str(tmp_path / "pq_stream_out")
    ckpt = str(tmp_path / "pq_ckpt")
    run_stream_to_parquet(
        stream_ivfpq_encode(spark, inp, coarse, books),
        out,
        ckpt,
        partition_by="list_id",
    )
    got = sorted(
        (r.vec_id, r.list_id, tuple(r.codes))
        for r in spark.read.parquet(out).collect()
    )
    want = sorted(
        (r.vec_id, r.list_id, tuple(r.codes))
        for r in ivfpq_encode(emb, coarse, books).collect()
    )
    assert got == want and len(got) > 0


def test_stream_static_enrichment_matches_batch(spark, sf_dir, tmp_path):
    """Stream-static join: the streamed events-x-customer segment rollup
    (availableNow, two micro-batches) equals the batch join + GROUP BY."""
    from vector_search_test_spark.streaming.ingest import (
        stream_enriched_segment_counts,
    )

    ev = load_table(spark, sf_dir, "events")
    cust = load_table(spark, sf_dir, "customer")
    inp = tmp_path / "enrich_in"
    inp.mkdir()
    b = ev.agg(F.min("ts").alias("lo"), F.max("ts").alias("hi")).first()
    mid = b.lo + (b.hi - b.lo) / 2
    for i, part in enumerate(
        [ev.filter(F.col("ts") <= F.lit(mid)), ev.filter(F.col("ts") > F.lit(mid))]
    ):
        sub = tmp_path / f"enr_stage{i}"
        part.coalesce(1).write.parquet(str(sub))
        import os as _os

        (pq,) = [f for f in _os.listdir(sub) if f.endswith(".parquet")]
        _os.rename(sub / pq, inp / f"{i:02d}.parquet")
        _os.utime(inp / f"{i:02d}.parquet", (1_700_000_000 + i,) * 2)

    q = (
        stream_enriched_segment_counts(spark, str(inp), cust)
        .writeStream.format("memory")
        .queryName("enrich_twin")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "enr_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = sorted(
        (r.c_mktsegment, r.n_events, round(r.sum_value, 2))
        for r in spark.sql("SELECT * FROM enrich_twin").collect()
    )
    want = sorted(
        (r.c_mktsegment, r.n_events, round(r.sum_value, 2))
        for r in ev.join(
            cust, ev.user_id == cust.c_custkey
        )
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(38,2)"))
            .cast("double")
            .alias("sum_value"),
        )
        .collect()
    )
    assert got == want and len(got) > 1


def test_stream_stream_join_matches_batch(spark, sf_dir, tmp_path):
    """Stream-stream inner join across two micro-batches equals the
    batch interval join (watermark delay >= window keeps each side's
    state alive for every possible cross-batch match)."""
    import os as _os

    from vector_search_test_spark.streaming.ingest import (
        stream_click_purchase_join,
    )

    ev = load_table(spark, sf_dir, "events")
    inp = tmp_path / "ssj_in"
    inp.mkdir()
    b = ev.agg(F.min("ts").alias("lo"), F.max("ts").alias("hi")).first()
    mid = b.lo + (b.hi - b.lo) / 2
    for i, part in enumerate(
        [ev.filter(F.col("ts") <= F.lit(mid)), ev.filter(F.col("ts") > F.lit(mid))]
    ):
        sub = tmp_path / f"ssj_stage{i}"
        part.coalesce(1).write.parquet(str(sub))
        (pq,) = [f for f in _os.listdir(sub) if f.endswith(".parquet")]
        _os.rename(sub / pq, inp / f"{i:02d}.parquet")
        _os.utime(inp / f"{i:02d}.parquet", (1_700_000_000 + i,) * 2)

    q = (
        stream_click_purchase_join(spark, str(inp))
        .writeStream.format("memory")
        .queryName("ssj_twin")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ssj_ckpt"))
        .option("maxFilesPerTrigger", 1)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = sorted(
        (r.user_id, r.purchase_id, r.click_id)
        for r in spark.sql("SELECT * FROM ssj_twin").collect()
    )
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("u"), F.col("event_id").alias("pid"),
        F.col("ts").alias("pts"),
    )
    c = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("cu"), F.col("event_id").alias("cid"),
        F.col("ts").alias("cts"),
    )
    want = sorted(
        (r.u, r.pid, r.cid)
        for r in p.join(
            c,
            (F.col("u") == F.col("cu"))
            & (F.col("cts") >= F.col("pts") - F.expr("INTERVAL 1 HOUR"))
            & (F.col("cts") <= F.col("pts")),
        ).collect()
    )
    assert got == want and len(got) > 0


def test_stream_stream_left_outer_drains_completely(spark, sf_dir, tmp_path):
    """Left-outer stream-stream join with the drain sentinel: EVERY
    purchase emits (matched or NULL click) — including the trailing
    watermark-delay window, which only drains because the sentinel
    advances both watermarks. Guards the Catalyst trap: a sentinel
    filter INSIDE the streaming plan gets pushed beneath the watermark
    nodes (directly, and via the join-key constraint onto the other
    side) and silently un-drains the tail, so the filter must run on
    the sink table."""
    import os as _os
    import shutil as _shutil

    from vector_search_test_spark.streaming.ingest import (
        stream_click_purchase_join,
    )
    from vector_search_test_spark.streaming.stateful import (
        SENTINEL_USER_ID,
        _ensure_drain_sentinel,
    )

    src = load_table(spark, sf_dir, "events")
    inp = tmp_path / "ssouter_in"
    inp.mkdir()
    _shutil.copy(
        f"{sf_dir}/events.parquet", str(inp / "events.parquet")
    )
    _ensure_drain_sentinel(str(inp), gap_seconds=3600, delay_seconds=7200)
    q = (
        stream_click_purchase_join(spark, str(inp), how="left_outer")
        .writeStream.format("memory")
        .queryName("ssouter_twin")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "sso_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    out = spark.sql("SELECT * FROM ssouter_twin").where(
        F.col("user_id") != SENTINEL_USER_ID
    )
    got = sorted(
        (r.user_id, r.purchase_id, r.click_id) for r in out.collect()
    )
    p = src.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("u"), F.col("event_id").alias("pid"),
        F.col("ts").alias("pts"),
    )
    c = src.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("cu"), F.col("event_id").alias("cid"),
        F.col("ts").alias("cts"),
    )
    want = sorted(
        (r.u, r.pid, r.cid)
        for r in p.join(
            c,
            (F.col("u") == F.col("cu"))
            & (F.col("cts") >= F.col("pts") - F.expr("INTERVAL 1 HOUR"))
            & (F.col("cts") <= F.col("pts")),
            "left_outer",
        ).collect()
    )
    assert got == want
    assert any(cid is None for _, _, cid in got)  # outer rows present
    # the trailing watermark-delay window actually drained
    n_purchases = src.filter(F.col("event_type") == "purchase").count()
    assert len({(u, pid) for u, pid, _ in got}) == n_purchases


def test_sliding_window_expansion_factor(spark, sf_dir, tmp_path):
    """Sliding 1 h windows every 15 min: every event lands in exactly
    window/slide = 4 windows, so the summed counts are 4x the corpus
    and each event's 4 window starts are 15 min apart."""
    from vector_search_test_spark.streaming.ingest import (
        stream_event_window_counts,
    )

    ev = load_table(spark, sf_dir, "events")
    inp = tmp_path / "slide_in"
    inp.mkdir()
    import shutil as _shutil

    _shutil.copy(f"{sf_dir}/events.parquet", str(inp / "events.parquet"))
    q = (
        stream_event_window_counts(spark, str(inp), slide="15 minutes")
        .writeStream.format("memory")
        .queryName("slide_twin")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "slide_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    t = spark.sql("SELECT * FROM slide_twin")
    total = t.agg(F.sum("n_events")).first()[0]
    assert total == 4 * ev.count()
    # window starts align to the 15-minute grid
    bad = t.filter(
        F.unix_timestamp("win_start") % 900 != 0
    ).count()
    assert bad == 0


def test_stream_anomaly_gate_matches_batch(spark, sf_dir, tmp_path):
    """Frozen-stats streaming Hampel gate == the batch filter on the
    same input: same flagged event set, same emitted stats."""
    from vector_search_test_spark.operators.timeseries import robust_stats
    from vector_search_test_spark.streaming.ingest import stream_anomaly_gate

    ev = load_table(spark, sf_dir, "events")
    med, mad = robust_stats(ev)
    stats = [
        (r.k, r.med, r.mad)
        for r in med.join(mad, "k").select("k", "med", "mad").collect()
    ]
    inp = str(tmp_path / "anom_in")
    ev.write.parquet(inp)
    out = str(tmp_path / "anom_out")
    ckpt = str(tmp_path / "anom_ckpt")
    run_stream_to_parquet(stream_anomaly_gate(spark, inp, stats), out, ckpt)
    got = sorted(
        tuple(r) for r in spark.read.parquet(out).collect()
    )
    lut = {k: (m, d) for k, m, d in stats}
    want = sorted(
        (r.event_id, r.event_type, r.value,
         round(lut[r.event_type][0], 6), round(lut[r.event_type][1], 6))
        for r in ev.select("event_id", "event_type", "value").collect()
        if abs(r.value - lut[r.event_type][0])
        > 3.0 * 1.4826 * lut[r.event_type][1]
    )
    assert got == want and len(got) > 0


def test_stream_neardup_ingest_keeper_only_propagation(spark, tmp_path):
    """The growing-store semantics of stream_neardup_ingest: a batch-1
    doc near a DROPPED batch-0 doc (but below theta vs that doc's
    standing match) must be KEPT — only keepers' signatures join the
    store, so drops do not propagate across batches (within a batch
    they still cascade). Exact copies of a batch-0 KEEPER are dropped
    with the keeper as match."""
    import os

    from vector_search_test_spark.operators.dedup import (
        minhash_store,
        minhash_tables,
    )
    from vector_search_test_spark.streaming.ingest import (
        stream_neardup_ingest,
    )

    base = [f"qq{i}word" for i in range(100)]
    x_words = list(base); x_words[20] = "editx"          # j(X,S) ~ 0.94
    y_words = list(x_words); y_words[60] = "edity"       # j(Y,X) ~ 0.94, j(Y,S) ~ 0.885
    keeper = [f"kk{i}tok" for i in range(60)]            # unrelated batch-0 keeper
    standing_df = spark.createDataFrame(
        [(1, " ".join(base))], "doc_id long, text string"
    )
    batch0 = spark.createDataFrame(
        [(100, " ".join(x_words)), (101, " ".join(keeper))],
        "doc_id long, text string",
    )
    batch1 = spark.createDataFrame(
        [(200, " ".join(y_words)), (201, " ".join(keeper))],
        "doc_id long, text string",
    )
    assets = str(tmp_path / "assets")
    out = str(tmp_path / "dec")
    inp = tmp_path / "in"
    inp.mkdir()
    minhash_store(minhash_tables(standing_df)).coalesce(1).write.parquet(
        os.path.join(assets, "ingest_batch=-1")
    )
    for i, b in enumerate((batch0, batch1)):
        stage = tmp_path / f"stage{i}"
        b.coalesce(1).write.parquet(str(stage))
        (pq,) = [f for f in os.listdir(stage) if f.endswith(".parquet")]
        os.rename(stage / pq, inp / f"{i:02d}.parquet")
        os.utime(inp / f"{i:02d}.parquet", (1_700_000_000 + i,) * 2)
    q = (
        stream_neardup_ingest(spark, str(inp), assets, out)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        r.id: (r.keep, r.match_id)
        for r in spark.read.parquet(out).collect()
    }
    assert got[100] == (0, 1)      # batch 0: X dropped by standing S
    assert got[101] == (1, None)   # batch 0: keeper survives
    # the point of the test: Y is near the DROPPED X, below theta vs S
    assert got[200] == (1, None)
    assert got[201] == (0, 101)    # exact copy of a batch-0 keeper
    # the store grew by exactly the keepers (standing + 101 + 200)
    store = spark.read.parquet(assets)
    assert sorted(r.id for r in store.select("id").collect()) == [1, 101, 200]


def test_neardup_ingest_epoch_retry_is_idempotent(spark, tmp_path):
    """The replay-safety contract itself: re-running an epoch whose
    writes already landed (crash AFTER both writes, BEFORE the
    streaming commit) must reproduce identical decisions and an
    identical store — the retried epoch must NOT see its own prior
    attempt's append (a keeper would self-match at jaccard 1.0, flip
    to drop, and erase its signatures from the store)."""
    import os

    from vector_search_test_spark.operators.dedup import (
        minhash_store,
        minhash_tables,
    )
    from vector_search_test_spark.streaming.ingest import (
        neardup_ingest_epoch,
    )

    base = [f"rr{i}tok" for i in range(80)]
    near = list(base); near[10] = "editz"
    standing_df = spark.createDataFrame(
        [(1, " ".join(base))], "doc_id long, text string"
    )
    batch = spark.createDataFrame(
        [(100, " ".join(near)), (101, " ".join(f"uu{i}w" for i in range(50)))],
        "doc_id long, text string",
    )
    assets = str(tmp_path / "assets")
    out = str(tmp_path / "dec")
    minhash_store(minhash_tables(standing_df)).coalesce(1).write.parquet(
        os.path.join(assets, "ingest_batch=-1")
    )

    def snapshot():
        dec = sorted(
            map(tuple, spark.read.parquet(out).drop("ingest_batch").collect())
        )
        store = sorted(
            r.id for r in spark.read.parquet(assets).select("id").collect()
        )
        return dec, store

    neardup_ingest_epoch(batch, 0, assets, out)
    first = snapshot()
    # keeper 101 present in the store after attempt 1
    assert 101 in first[1]
    # simulate the crashed-commit retry: same batch, same epoch id
    neardup_ingest_epoch(batch, 0, assets, out)
    assert snapshot() == first


def test_stream_clip_gate_matches_batch(spark, sf_dir, tmp_path):
    """availableNow drain of the streaming CLIP gate over a static
    staged input == the batch gate's keepers on the same rows."""
    from vector_search_test_spark.sources.multimodal import (
        clip_score_pairs,
        fake_grid_codec,
    )
    from vector_search_test_spark.streaming.ingest import stream_clip_gate

    docs = load_table(spark, sf_dir, "documents").limit(80)
    inp = str(tmp_path / "clip_in")
    docs.write.parquet(inp)

    q = (
        stream_clip_gate(spark, inp, 0.9, dim=16, shape=(4, 4))
        .writeStream.format("memory")
        .queryName("t_clipgate")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (r["id"], r["clip_score"])
        for r in spark.table("t_clipgate").collect()
    }

    pairs = docs.select(
        F.col("doc_id").alias("id"),
        "source",
        F.encode(F.col("text"), "UTF-8").alias("payload"),
    )
    dec = decode_media(
        pairs, codec=fake_grid_codec(4, 4), expected_shape=(4, 4)
    )
    img = extract_byte_features(dec, dim=16, payload_col="decoded", out_col="img_emb")
    both = extract_byte_features(img, dim=16, payload_col="payload", out_col="txt_emb")
    want = {
        (r["id"], r["clip_score"])
        for r in clip_score_pairs(both, None, 0.9, id_col="id")
        .filter("kept")
        .collect()
    }
    assert got == want and len(got) > 0
