"""Corpus snapshot maintenance (operators/snapshot.py): upsert/delete
row-count algebra, replacement semantics, broadcast-anti plan shape."""

from pyspark.sql import functions as F

from vector_search_test_spark.io import load_table
from vector_search_test_spark.operators.snapshot import delete_keys, upsert


def test_upsert_semantics_and_counts(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    n = docs.count()
    edited = docs.filter(F.col("doc_id") < 7).withColumn(
        "text", F.lit("edited")
    )
    appended = docs.filter(F.col("doc_id") < 3).withColumn(
        "doc_id", F.col("doc_id") + 50_000
    )
    snap = upsert(docs, edited.unionByName(appended))
    assert snap.count() == n + 3  # |base| - 7 + 10
    got = {r.doc_id: r.text for r in snap.filter(
        (F.col("doc_id") < 7) | (F.col("doc_id") >= 50_000)
    ).collect()}
    assert all(got[i] == "edited" for i in range(7))
    assert all(50_000 + i in got for i in range(3))
    untouched = snap.join(docs, ["doc_id", "text"]).filter(
        F.col("doc_id") >= 7
    )
    assert untouched.count() == n - 7  # every other base row byte-equal


def test_delete_keys(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    n = docs.count()
    tomb = docs.filter(F.col("doc_id") % 10 == 0).select("doc_id")
    nt = tomb.count()
    out = delete_keys(docs, tomb)
    assert out.count() == n - nt
    assert out.filter(F.col("doc_id") % 10 == 0).count() == 0


def test_upsert_plan_broadcasts_updates(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    upd = docs.filter(F.col("doc_id") < 5)
    plan = (
        upsert(docs, upd)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan


def _stage_stream_batches(spark, tmp_path, schema, batches):
    """Write each batch as one parquet file with increasing mtimes so
    maxFilesPerTrigger=1 replays them as separate micro-batches."""
    import os

    inp = tmp_path / "ups_in"
    inp.mkdir()
    for i, df in enumerate(batches):
        sub = tmp_path / f"ups_stage{i}"
        df.coalesce(1).write.parquet(str(sub))
        (pq,) = [f for f in os.listdir(sub) if f.endswith(".parquet")]
        os.rename(sub / pq, inp / f"{i:02d}.parquet")
        os.utime(inp / f"{i:02d}.parquet", (1_700_000_000 + i,) * 2)
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(inp))
    )


def test_stream_upsert_snapshots_foreachbatch(spark, sf_dir, tmp_path):
    """Streaming upserts across two micro-batches: the _CURRENT
    snapshot equals the sequential batch upsert chain (edit wins, new
    key appends, untouched rows survive), and version v0 still holds
    the full pre-edit state (copy-on-write — the previous version's
    buckets were never mutated; batch 1 wrote only ITS buckets into
    v1)."""
    import os

    from pyspark.sql import types as T

    from vector_search_test_spark.operators.snapshot import (
        read_current_snapshot,
        stream_upsert_snapshots,
    )

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType(), True),
            T.StructField("text", T.StringType(), True),
        ]
    )
    b1 = spark.createDataFrame(
        [(1, "one"), (2, "two"), (3, "three")], schema
    )
    b2 = spark.createDataFrame(
        [(2, "two-edited"), (9, "nine")], schema
    )
    stream = _stage_stream_batches(spark, tmp_path, schema, [b1, b2])
    out = tmp_path / "snapdir"
    out.mkdir()
    q = (
        stream_upsert_snapshots(stream, str(out))
        .option("checkpointLocation", str(tmp_path / "ups_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = sorted(
        (r.doc_id, r.text)
        for r in read_current_snapshot(spark, str(out))
        .select("doc_id", "text")
        .collect()
    )
    assert got == [
        (1, "one"),
        (2, "two-edited"),
        (3, "three"),
        (9, "nine"),
    ]
    assert os.path.isdir(out / "v0") and os.path.isdir(out / "v1")
    # the previous version still holds the pre-edit state (never mutated)
    v0 = sorted(
        (r.doc_id, r.text)
        for r in spark.read.parquet(str(out / "v0"))
        .select("doc_id", "text")
        .collect()
    )
    assert v0 == [(1, "one"), (2, "two"), (3, "three")]
    # partition-scoped: v1 holds ONLY the buckets batch 2 touched
    from vector_search_test_spark.operators.snapshot import bucket_col

    touched = {
        r.b
        for r in b2.select(bucket_col("doc_id", 16).alias("b")).collect()
    }
    v1_buckets = {
        int(d.split("=")[1])
        for d in os.listdir(out / "v1")
        if d.startswith("bucket=")
    }
    assert v1_buckets == touched


def test_upsert_bucketed_untouched_bucket_files_identical(spark, tmp_path):
    """The partition-scoped contract itself (VERDICT r6 next-#3): after
    an upsert touching one key, every bucket directory the change set
    does NOT hash into is byte-identical — same file list, same bytes,
    same mtimes — and the new manifest still points those buckets at
    the OLD version directory."""
    import hashlib
    import json
    import os

    from vector_search_test_spark.operators.snapshot import (
        bucket_col,
        read_current_snapshot,
        upsert_bucketed,
    )

    base = spark.createDataFrame(
        [(i, f"text-{i}") for i in range(200)], "doc_id long, text string"
    )
    out = tmp_path / "bucketed"
    out.mkdir()
    upsert_bucketed(base, str(out), "v0", n_buckets=8)

    def snap_files():
        state = {}
        for root, _dirs, files in os.walk(out):
            for f in files:
                if not f.endswith(".parquet"):
                    continue
                p = os.path.join(root, f)
                with open(p, "rb") as fh:
                    digest = hashlib.md5(fh.read()).hexdigest()
                state[os.path.relpath(p, out)] = (
                    digest,
                    os.path.getmtime(p),
                )
        return state

    before = snap_files()
    upd = spark.createDataFrame(
        [(7, "edited"), (1000, "appended")], "doc_id long, text string"
    )
    upsert_bucketed(upd, str(out), "v1", n_buckets=8)

    touched = {
        r.b for r in upd.select(bucket_col("doc_id", 8).alias("b")).collect()
    }
    after = snap_files()
    untouched_before = {
        p: v
        for p, v in before.items()
        if int(p.split("/")[1].split("=")[1]) not in touched
    }
    assert untouched_before  # the fixture must actually have untouched buckets
    for p, v in untouched_before.items():
        assert after[p] == v, f"untouched bucket file changed: {p}"

    with open(out / "_MANIFEST_v1.json") as f:
        manifest = json.load(f)
    for b in range(8):
        want = "v1" if b in touched else "v0"
        assert manifest["buckets"][str(b)] == want

    got = {
        r.doc_id: r.text
        for r in read_current_snapshot(spark, str(out))
        .select("doc_id", "text")
        .collect()
    }
    assert len(got) == 201
    assert got[7] == "edited" and got[1000] == "appended"
    assert got[8] == "text-8"


def test_upsert_bucketed_replay_after_commit_is_noop(spark, tmp_path):
    """ADVICE r6 (medium): a foreachBatch replay that finds _CURRENT
    already pointing at its own version (crash between the marker
    repoint and the stream-checkpoint commit) must be a no-op — the old
    code re-read the version dir as base and failed with 'cannot
    overwrite a path being read' on every recovery."""
    from vector_search_test_spark.operators.snapshot import (
        read_current_snapshot,
        upsert_bucketed,
    )

    base = spark.createDataFrame(
        [(i, f"t{i}") for i in range(20)], "doc_id long, text string"
    )
    out = tmp_path / "replay"
    out.mkdir()
    upsert_bucketed(base, str(out), "v0", n_buckets=4)
    upd = spark.createDataFrame([(3, "edited")], "doc_id long, text string")
    upsert_bucketed(upd, str(out), "v1", n_buckets=4)
    before = sorted(
        tuple(r)
        for r in read_current_snapshot(spark, str(out))
        .select("doc_id", "text")
        .collect()
    )
    # replay of the already-committed batch: must not raise, must not change
    upsert_bucketed(upd, str(out), "v1", n_buckets=4)
    after = sorted(
        tuple(r)
        for r in read_current_snapshot(spark, str(out))
        .select("doc_id", "text")
        .collect()
    )
    assert after == before


def test_delete_keys_bucketed_and_time_travel(spark, tmp_path):
    """Bucketed GDPR delete rewrites only the tombstones' buckets (other
    bucket files byte-identical), a fully-emptied bucket drops out of
    the manifest, and read_snapshot_at reconstructs the pre-delete
    state from the retained old manifest."""
    import hashlib
    import json
    import os

    from vector_search_test_spark.operators.snapshot import (
        bucket_col,
        delete_keys_bucketed,
        read_current_snapshot,
        read_snapshot_at,
        upsert_bucketed,
    )

    base = spark.createDataFrame(
        [(i, f"text-{i}") for i in range(100)], "doc_id long, text string"
    )
    out = tmp_path / "gdpr"
    out.mkdir()
    upsert_bucketed(base, str(out), "v0", n_buckets=8)

    # tombstone every key of ONE bucket (empties it) plus one key of
    # another (partial delete)
    buckets = {
        r.doc_id: r.b
        for r in base.select(
            "doc_id", bucket_col("doc_id", 8).alias("b")
        ).collect()
    }
    empty_b = buckets[0]
    all_of_b = [k for k, b in buckets.items() if b == empty_b]
    partial_key = next(k for k, b in buckets.items() if b != empty_b)
    tomb = spark.createDataFrame(
        [(k,) for k in all_of_b + [partial_key]], "doc_id long"
    )

    def file_state():
        st = {}
        for root, _d, files in os.walk(out):
            for f in files:
                if f.endswith(".parquet"):
                    p = os.path.join(root, f)
                    with open(p, "rb") as fh:
                        st[os.path.relpath(p, out)] = hashlib.md5(
                            fh.read()
                        ).hexdigest()
        return st

    before = file_state()
    delete_keys_bucketed(tomb, str(out), "v1", n_buckets=8)
    after = file_state()

    touched = {empty_b, buckets[partial_key]}
    for p, h in before.items():
        b = int(p.split("/")[1].split("=")[1])
        if b not in touched:
            assert after[p] == h

    with open(out / "_MANIFEST_v1.json") as f:
        m1 = json.load(f)
    assert str(empty_b) not in m1["buckets"]  # emptied bucket dropped
    assert m1["buckets"][str(buckets[partial_key])] == "v1"

    live = {
        r.doc_id
        for r in read_current_snapshot(spark, str(out))
        .select("doc_id")
        .collect()
    }
    assert live == set(range(100)) - set(all_of_b) - {partial_key}
    # time travel: v0 manifest still retained -> full pre-delete state
    old = {
        r.doc_id
        for r in read_snapshot_at(spark, str(out), "v0")
        .select("doc_id")
        .collect()
    }
    assert old == set(range(100))


def test_compact_snapshot_rehomes_all_buckets(spark, tmp_path):
    """After a run of small upserts scatters the live snapshot across
    versions, compaction rewrites every live bucket under ONE version,
    the manifest points everywhere at it, content is unchanged, and a
    subsequent keep-last-1 vacuum deletes every older version dir."""
    import json
    import os

    from vector_search_test_spark.operators.snapshot import (
        compact_snapshot,
        read_current_snapshot,
        upsert_bucketed,
        vacuum_snapshots,
    )

    out = tmp_path / "compact"
    out.mkdir()
    base = spark.createDataFrame(
        [(i, f"t{i}") for i in range(60)], "doc_id long, text string"
    )
    upsert_bucketed(base, str(out), "v0", n_buckets=4)
    for i in range(1, 4):
        upd = spark.createDataFrame(
            [(i * 7, f"edit-{i}")], "doc_id long, text string"
        )
        upsert_bucketed(upd, str(out), f"v{i}", n_buckets=4)
    want = sorted(
        tuple(r)
        for r in read_current_snapshot(spark, str(out))
        .select("doc_id", "text")
        .collect()
    )

    compact_snapshot(spark, str(out), "v4")
    with open(out / "_MANIFEST_v4.json") as f:
        m = json.load(f)
    assert set(m["buckets"].values()) == {"v4"}
    got = sorted(
        tuple(r)
        for r in read_current_snapshot(spark, str(out))
        .select("doc_id", "text")
        .collect()
    )
    assert got == want

    vacuum_snapshots(str(out), keep_last=1)
    vdirs = sorted(
        d for d in os.listdir(out) if d.startswith("v") and (out / d).is_dir()
    )
    assert vdirs == ["v4"]
    assert sorted(
        tuple(r)
        for r in read_current_snapshot(spark, str(out))
        .select("doc_id", "text")
        .collect()
    ) == want


def test_bucketed_protocol_edges(spark, tmp_path):
    """Review-pinned edges: deleting EVERY key reads back as an empty
    DataFrame with the recorded schema (not a zero-path scan error);
    version names must be v<digits> commit ids; a bucket-layout or key
    mismatch raises ValueError."""
    import pytest

    from vector_search_test_spark.operators.snapshot import (
        delete_keys_bucketed,
        read_current_snapshot,
        upsert_bucketed,
    )

    base = spark.createDataFrame(
        [(i, f"t{i}") for i in range(10)], "doc_id long, text string"
    )
    out = tmp_path / "edges"
    out.mkdir()
    upsert_bucketed(base, str(out), "v0", n_buckets=4)

    with pytest.raises(ValueError, match="v<digits>"):
        upsert_bucketed(base, str(out), "compacted-1", n_buckets=4)
    with pytest.raises(ValueError, match="n_buckets"):
        upsert_bucketed(base, str(out), "v1", n_buckets=8)
    with pytest.raises(ValueError, match="keyed by"):
        delete_keys_bucketed(
            base.select(F.col("doc_id").alias("text")),
            str(out),
            "v1",
            key="text",
            n_buckets=4,
        )

    # delete every key -> empty current snapshot, schema intact
    delete_keys_bucketed(
        base.select("doc_id"), str(out), "v1", n_buckets=4
    )
    cur = read_current_snapshot(spark, str(out))
    assert cur.count() == 0
    assert [f.name for f in cur.schema.fields] == ["doc_id", "text"]


def test_noop_batches_do_not_burn_retention(spark, tmp_path):
    """Review pin: an empty update batch, and a tombstone batch whose
    keys hit no existing bucket, must NOT publish a new version — K
    consecutive no-ops would otherwise vacuum every data-bearing
    manifest out of the keep-last-K window."""
    from vector_search_test_spark.operators.snapshot import (
        delete_keys_bucketed,
        upsert_bucketed,
    )

    out = tmp_path / "noop"
    out.mkdir()
    base = spark.createDataFrame(
        [(i, f"t{i}") for i in range(10)], "doc_id long, text string"
    )
    upsert_bucketed(base, str(out), "v0", n_buckets=4)

    empty = spark.createDataFrame([], "doc_id long, text string")
    upsert_bucketed(empty, str(out), "v1", n_buckets=4)
    # tombstones for keys that were never ingested
    miss = spark.createDataFrame([(999,), (1000,)], "doc_id long")
    delete_keys_bucketed(miss, str(out), "v2", n_buckets=4)

    import os

    assert (out / "_CURRENT").read_text() == "v0"
    manifests = [f for f in os.listdir(out) if f.startswith("_MANIFEST_")]
    assert manifests == ["_MANIFEST_v0.json"]


def test_stream_delete_snapshots_tombstone_sink(spark, tmp_path):
    """Tombstone stream over a standing bucketed snapshot: each batch
    deletes its keys (versions continue AFTER the upsert's, no batch-id
    collision), the final snapshot holds exactly the never-tombstoned
    rows, and a dir-wide vacuum with keep_last=1 leaves a readable
    single-manifest state."""
    import os

    from pyspark.sql import types as T

    from vector_search_test_spark.operators.snapshot import (
        read_current_snapshot,
        stream_delete_snapshots,
        upsert_bucketed,
        vacuum_snapshots,
    )

    base = spark.createDataFrame(
        [(i, f"t{i}") for i in range(30)], "doc_id long, text string"
    )
    out = tmp_path / "tomb"
    out.mkdir()
    upsert_bucketed(base, str(out), "v0", n_buckets=4)

    schema = T.StructType([T.StructField("doc_id", T.LongType(), True)])
    batches = [
        spark.createDataFrame([(i,) for i in range(0, 10)], schema),
        spark.createDataFrame([(i,) for i in range(20, 25)], schema),
    ]
    stream = _stage_stream_batches(spark, tmp_path, schema, batches)
    q = (
        stream_delete_snapshots(stream, str(out), n_buckets=4, keep_last=3)
        .option("checkpointLocation", str(tmp_path / "tomb_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    live = {
        r.doc_id
        for r in read_current_snapshot(spark, str(out))
        .select("doc_id")
        .collect()
    }
    assert live == set(range(10, 20)) | set(range(25, 30))
    # versions continued after the base's v0 (no collision): v1, v2
    assert os.path.exists(out / "_MANIFEST_v2.json")

    vacuum_snapshots(str(out), keep_last=1)
    manifests = [f for f in os.listdir(out) if f.startswith("_MANIFEST_")]
    assert manifests == ["_MANIFEST_v2.json"]
    assert {
        r.doc_id
        for r in read_current_snapshot(spark, str(out))
        .select("doc_id")
        .collect()
    } == live


def test_snapshot_diff_cdc_classification_and_bounded_read(spark, tmp_path):
    """CDC off the manifests: added/updated/deleted classified per key,
    unchanged rows in rewritten buckets suppressed — and the diff reads
    ONLY repointed buckets, proven by corrupting every non-repointed
    bucket's parquet files on disk before diffing (if the diff touched
    them it would crash)."""
    import os

    from vector_search_test_spark.operators.snapshot import (
        bucket_col,
        delete_keys_bucketed,
        snapshot_diff,
        upsert_bucketed,
    )

    base = spark.createDataFrame(
        [(i, f"t{i}") for i in range(200)], "doc_id long, text string"
    )
    out = tmp_path / "cdc"
    out.mkdir()
    upsert_bucketed(base, str(out), "v0", n_buckets=8)
    upd = spark.createDataFrame(
        [(7, "edited"), (1000, "appended")], "doc_id long, text string"
    )
    upsert_bucketed(upd, str(out), "v1", n_buckets=8)
    tomb = spark.createDataFrame([(13,)], "doc_id long")
    delete_keys_bucketed(tomb, str(out), "v2", n_buckets=8)

    touched = {
        r.b
        for r in upd.select(bucket_col("doc_id", 8).alias("b"))
        .union(tomb.select(bucket_col("doc_id", 8).alias("b")))
        .collect()
    }
    # corrupt every NON-repointed bucket of v0: the diff must never
    # open them (their manifest pointers are identical on both sides)
    for b in range(8):
        if b in touched:
            continue
        bdir = out / "v0" / f"bucket={b}"
        for f in os.listdir(bdir):
            if f.endswith(".parquet"):
                (bdir / f).write_bytes(b"not parquet at all")

    diff = {
        r.doc_id: (r.change, r.text)
        for r in snapshot_diff(spark, str(out), "v0", "v2").collect()
    }
    assert diff == {
        7: ("updated", "edited"),
        1000: ("added", "appended"),
        13: ("deleted", None),
    }


def test_snapshot_diff_map_columns_and_reserved_name(spark, tmp_path):
    """Review pins: CDC works on snapshots whose payload includes a
    map column (struct <=> cannot order maps — field-wise comparison
    with sorted map entries is required), and a payload column named
    'change' is rejected up front instead of producing an ambiguous
    duplicate output column."""
    import pytest

    from vector_search_test_spark.operators.snapshot import (
        snapshot_diff,
        upsert_bucketed,
    )

    base = spark.createDataFrame(
        [(i, {"lang": "en", "n": str(i)}) for i in range(20)],
        "doc_id long, meta map<string,string>",
    )
    out = tmp_path / "mapcdc"
    out.mkdir()
    upsert_bucketed(base, str(out), "v0", n_buckets=4)
    upd = spark.createDataFrame(
        [(3, {"lang": "fr", "n": "3"})], "doc_id long, meta map<string,string>"
    )
    upsert_bucketed(upd, str(out), "v1", n_buckets=4)
    diff = {
        r.doc_id: (r.change, dict(r.meta))
        for r in snapshot_diff(spark, str(out), "v0", "v1").collect()
    }
    assert diff == {3: ("updated", {"lang": "fr", "n": "3"})}

    bad = spark.createDataFrame(
        [(1, "x")], "doc_id long, change string"
    )
    out2 = tmp_path / "reserved"
    out2.mkdir()
    upsert_bucketed(bad, str(out2), "v0", n_buckets=2)
    upsert_bucketed(
        spark.createDataFrame([(1, "y")], "doc_id long, change string"),
        str(out2),
        "v1",
        n_buckets=2,
    )
    with pytest.raises(ValueError, match="reserved"):
        snapshot_diff(spark, str(out2), "v0", "v1")


def test_stream_upsert_retention_vacuum(spark, tmp_path):
    """VERDICT r6 next-#4: after N>K batches with keep_last=K, exactly
    K manifests remain, read_current_snapshot still reconstructs the
    full chain, and every version dir still on disk is referenced by a
    retained manifest (old fully-superseded versions were vacuumed)."""
    import json
    import os

    from pyspark.sql import types as T

    from vector_search_test_spark.operators.snapshot import (
        read_current_snapshot,
        stream_upsert_snapshots,
    )

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType(), True),
            T.StructField("text", T.StringType(), True),
        ]
    )
    # 6 batches, each rewriting the SAME small key set plus one new key
    # per batch — early versions become fully superseded and vacuumable
    batches = [
        spark.createDataFrame(
            [(j, f"b{i}-k{j}") for j in range(4)] + [(100 + i, f"new-{i}")],
            schema,
        )
        for i in range(6)
    ]
    stream = _stage_stream_batches(spark, tmp_path, schema, batches)
    out = tmp_path / "retain"
    out.mkdir()
    q = (
        stream_upsert_snapshots(stream, str(out), n_buckets=4, keep_last=2)
        .option("checkpointLocation", str(tmp_path / "retain_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    manifests = sorted(
        f for f in os.listdir(out) if f.startswith("_MANIFEST_")
    )
    assert manifests == ["_MANIFEST_v4.json", "_MANIFEST_v5.json"]
    referenced = set()
    for m in manifests:
        with open(out / m) as f:
            referenced.update(json.load(f)["buckets"].values())
    vdirs = {
        d for d in os.listdir(out) if d.startswith("v") and (out / d).is_dir()
    }
    assert vdirs == referenced  # nothing unreferenced survives
    got = {
        r.doc_id: r.text
        for r in read_current_snapshot(spark, str(out))
        .select("doc_id", "text")
        .collect()
    }
    assert {got[j] for j in range(4)} == {f"b5-k{j}" for j in range(4)}
    assert all(got[100 + i] == f"new-{i}" for i in range(6))


def test_advice_r7_guards(spark, tmp_path):
    """ADVICE r7 hardening: (1) NULL change-set keys are rejected (a
    NULL key hashes to pmod(xxhash64-seed, N) and would silently
    accumulate duplicates across batches); (2) a committed version name
    lower than _CURRENT is refused instead of overwriting a referenced
    version dir (checkpoint-wiped-stream scenario); (3) snapshot_diff
    refuses evolved payload schemas at the protocol layer; (4)
    vacuum_snapshots(keep_last=0) raises instead of silently keeping
    everything."""
    import pytest

    from vector_search_test_spark.operators.snapshot import (
        delete_keys_bucketed,
        snapshot_diff,
        upsert_bucketed,
        vacuum_snapshots,
    )

    out = tmp_path / "guards"
    out.mkdir()
    base = spark.createDataFrame(
        [(i, f"t{i}") for i in range(8)], "doc_id long, text string"
    )
    upsert_bucketed(base, str(out), "v0", n_buckets=4)

    # (1) NULL keys rejected in both bucketed writers
    with_null = spark.createDataFrame(
        [(None, "oops")], "doc_id long, text string"
    )
    with pytest.raises(ValueError, match="NULL"):
        upsert_bucketed(with_null, str(out), "v1", n_buckets=4)
    with pytest.raises(ValueError, match="NULL"):
        delete_keys_bucketed(
            with_null.select("doc_id"), str(out), "v1", n_buckets=4
        )

    # (2) version reuse / regression refused (replay of _CURRENT itself
    # is still the sanctioned no-op)
    upsert_bucketed(
        spark.createDataFrame([(1, "upd")], "doc_id long, text string"),
        str(out),
        "v2",
        n_buckets=4,
    )
    upsert_bucketed(base, str(out), "v2", n_buckets=4)  # replay: no-op
    with pytest.raises(ValueError, match="not after the current"):
        upsert_bucketed(base, str(out), "v1", n_buckets=4)
    with pytest.raises(ValueError, match="not after the current"):
        delete_keys_bucketed(
            base.select("doc_id"), str(out), "v0", n_buckets=4
        )

    # (3) snapshot_diff refuses evolved schemas. An evolved upsert can
    # only commit into a bucket with no base rows (the bucket-scoped
    # base read selects the updates' columns), so seed a one-key
    # snapshot and evolve via a key hashing to a DIFFERENT bucket.
    out2 = tmp_path / "guards2"
    out2.mkdir()
    upsert_bucketed(
        spark.createDataFrame([(0, "t0")], "doc_id long, text string"),
        str(out2),
        "v0",
        n_buckets=16,
    )
    bucket_of = {
        r.doc_id: r.b
        for r in spark.range(0, 50)
        .select(
            F.col("id").alias("doc_id"),
            F.pmod(F.xxhash64(F.col("id")), F.lit(16)).cast("int").alias("b"),
        )
        .collect()
    }
    other = next(i for i in range(1, 50) if bucket_of[i] != bucket_of[0])
    evolved = spark.createDataFrame(
        [(other, "tx", 9.0)], "doc_id long, text string, score double"
    )
    upsert_bucketed(evolved, str(out2), "v1", n_buckets=16)
    with pytest.raises(ValueError, match="different schemas"):
        snapshot_diff(spark, str(out2), "v0", "v1")

    # (4) keep_last floor
    with pytest.raises(ValueError, match="keep_last"):
        vacuum_snapshots(str(out), keep_last=0)


def test_single_writer_commit_guards(spark, tmp_path):
    """VERDICT r8 next-#6: the protocol is single-writer per base_dir.
    Two seams guard a second commit of the same version: (1) a stale
    writer that raced past the _CURRENT read hits the already-published
    manifest in _check_commit_version and fails loudly BEFORE writing
    data; (2) the publish itself is an atomic exclusive create, so of
    two writers racing inside the commit window exactly one wins and
    the loser raises instead of silently repointing _CURRENT over mixed
    bucket directories."""
    import json

    import pytest

    from vector_search_test_spark.operators.snapshot import (
        _publish,
        upsert_bucketed,
    )

    out = tmp_path / "single_writer"
    out.mkdir()
    base = spark.createDataFrame(
        [(i, f"t{i}") for i in range(8)], "doc_id long, text string"
    )
    upsert_bucketed(base, str(out), "v0", n_buckets=4)

    # (1) concurrent-writer interleave: writer B read _CURRENT=v0, then
    # writer A published _MANIFEST_v1 (but B never re-reads _CURRENT —
    # simulate A's publish by dropping the manifest file in directly).
    # B's commit of v1 must fail loudly, with no v1 data dir written.
    with open(out / "_MANIFEST_v1.json", "w") as f:
        json.dump({"n_buckets": 4, "key": "doc_id", "buckets": {}}, f)
    with pytest.raises(ValueError, match="already has a published"):
        upsert_bucketed(
            spark.createDataFrame([(1, "B")], "doc_id long, text string"),
            str(out),
            "v1",
            n_buckets=4,
        )
    assert not (out / "v1").exists()
    (out / "_MANIFEST_v1.json").unlink()

    # (2) the commit point itself: second _publish of one version loses
    _publish(str(out), "v1", {"n_buckets": 4, "buckets": {}})
    with pytest.raises(FileExistsError, match="single-writer"):
        _publish(str(out), "v1", {"n_buckets": 4, "buckets": {}})
    # the winner's manifest survives untouched and _CURRENT points at it
    assert json.load(open(out / "_MANIFEST_v1.json"))["buckets"] == {}
    assert (out / "_CURRENT").read_text().strip() == "v1"
    # no orphaned tmp files from the losing publish
    assert not [p for p in out.iterdir() if p.name.endswith(".tmp")]


def test_maintenance_cycle_disk_effects(spark, tmp_path):
    """The composed upsert -> delete -> compact -> vacuum lifecycle:
    live rows are exactly (base + edits + appends - tombstones); the
    pre-compaction version dirs are REMOVED from disk; the surviving
    manifest references only the compacted version."""
    import os

    from vector_search_test_spark.operators.snapshot import (
        _current_version,
        _read_manifest,
        compact_snapshot,
        delete_keys_bucketed,
        read_current_snapshot,
        upsert_bucketed,
        vacuum_snapshots,
    )

    base = spark.createDataFrame(
        [(i, f"t{i}") for i in range(40)], "doc_id long, text string"
    )
    edits = spark.createDataFrame(
        [(3, "E3"), (40, "A40")], "doc_id long, text string"
    )
    path = str(tmp_path / "mc")
    upsert_bucketed(base, path, "v0", key="doc_id", n_buckets=4)
    upsert_bucketed(edits, path, "v1", key="doc_id", n_buckets=4)
    tomb = spark.createDataFrame([(7,), (40,)], "doc_id long")
    delete_keys_bucketed(tomb, path, "v2", key="doc_id", n_buckets=4)
    compact_snapshot(spark, path, "v3")
    removed = sorted(vacuum_snapshots(path, keep_last=1))
    assert removed == ["v0", "v1", "v2"]
    for v in removed:
        assert not os.path.exists(os.path.join(path, v))
    manifest = _read_manifest(path, _current_version(path))
    assert set(manifest["buckets"].values()) == {"v3"}
    live = {r.doc_id: r.text for r in read_current_snapshot(spark, path).collect()}
    want = {i: f"t{i}" for i in range(40) if i != 7}
    want[3] = "E3"
    assert live == want


# --------------------------------------------------------------------------
# Z-order layout audit
# --------------------------------------------------------------------------


def test_zorder_matches_duckdb(spark, sf_dir):
    import duckdb

    from vector_search_test_spark.operators.snapshot import (
        zorder_layout_stats,
        zorder_layout_stats_sql,
    )

    li = load_table(spark, sf_dir, "lineitem")
    got = sorted(
        tuple(str(x) for x in r)
        for r in zorder_layout_stats(
            li, "l_partkey", "l_suppkey", bits=8, n_files=32
        ).collect()
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW lineitem AS SELECT * FROM "
        f"read_parquet('{sf_dir}/lineitem.parquet')"
    )
    want = sorted(
        tuple(str(x) for x in r)
        for r in con.execute(
            zorder_layout_stats_sql(
                "l_partkey", "l_suppkey", bits=8, n_files=32
            )
        ).fetchall()
    )
    assert got == want and len(got) > 0


def test_zorder_interleave_is_morton(spark):
    """The z value must be the textbook Morton interleave: engine
    assignment equals a pure-python bit-interleave cross-check."""
    from vector_search_test_spark.operators.snapshot import (
        zorder_layout_stats,
    )

    # 16x16 grid, 4 bits, 16 files -> each file is one z-contiguous run
    rows = [(a, b) for a in range(16) for b in range(16)]
    df = spark.createDataFrame(rows, "a long, b long")
    got = {
        (r["layout"], r["file_id"]): r["n_rows"]
        for r in zorder_layout_stats(
            df, "a", "b", bits=4, n_files=16
        ).collect()
    }

    def morton(a, b):
        z = 0
        for i in range(4):
            z |= ((a >> i) & 1) << (2 * i)
            z |= ((b >> i) & 1) << (2 * i + 1)
        return z

    from collections import Counter

    zc = Counter(morton(a, b) >> 4 for a, b in rows)
    for f, n in zc.items():
        assert got[("zorder", f)] == n
    # balanced: the full grid fills every file equally
    assert all(got[("zorder", f)] == 16 for f in range(16))


def test_zorder_skips_more_than_linear_on_two_dim_box(spark, sf_dir):
    """The reason the operator exists: for a predicate on BOTH
    dimensions, the z-order layout must scan no more files than the
    A-sorted linear layout, and fewer on the fixtures."""
    from vector_search_test_spark.operators.snapshot import (
        zorder_layout_stats,
    )

    li = load_table(spark, sf_dir, "lineitem")
    rows = zorder_layout_stats(
        li, "l_partkey", "l_suppkey", bits=8, n_files=64
    ).collect()
    z = sum(1 for r in rows if r["layout"] == "zorder" and r["scanned"])
    lin = sum(1 for r in rows if r["layout"] == "linear" and r["scanned"])
    assert 0 < z < lin
    # rows partition exactly under both layouts
    n = li.count()
    for layout in ("zorder", "linear"):
        assert sum(r["n_rows"] for r in rows if r["layout"] == layout) == n


def test_zorder_rejects_bad_file_count(spark):
    import pytest as _pytest

    from vector_search_test_spark.operators.snapshot import (
        zorder_layout_stats,
    )

    df = spark.createDataFrame([(1, 2)], "a long, b long")
    with _pytest.raises(ValueError):
        zorder_layout_stats(df, "a", "b", bits=4, n_files=24)
    with _pytest.raises(ValueError):
        zorder_layout_stats(df, "a", "b", bits=4, n_files=32)


def test_compaction_plan_planted(spark):
    """Planted manifest: next-fit-decreasing groups, oversized
    singleton, per-partition independence, and the compact/keep
    actions are all exact."""
    from vector_search_test_spark.operators.snapshot import (
        compaction_plan,
    )

    rows = [
        # partition A: sizes desc = 900, 500, 400, 300, 200 @ target 1000
        # NFD: [900] overflow at +500 -> g0={900}; g1={500,400}; g2={300,200}
        ("A", "f1", 500), ("A", "f2", 900), ("A", "f3", 400),
        ("A", "f4", 300), ("A", "f5", 200),
        # partition B: one oversized file + two tiny
        ("B", "g1", 5000), ("B", "g2", 10), ("B", "g3", 10),
    ]
    files = spark.createDataFrame(
        rows, "partition string, file string, bytes long"
    )
    out = {
        (r["partition"], r["file"]): r
        for r in compaction_plan(files, 1000).collect()
    }
    a = {f: out[("A", f)] for f in ("f1", "f2", "f3", "f4", "f5")}
    assert a["f2"].group_id == 0 and a["f2"].action == "keep"
    assert a["f1"].group_id == 1 and a["f3"].group_id == 1
    assert a["f1"].action == "compact"
    assert a["f1"].group_bytes == 900 and a["f1"].group_files == 2
    assert a["f4"].group_id == 2 and a["f5"].group_id == 2
    assert a["f4"].group_bytes == 500
    # oversized file is its own 'keep' group; the tiny pair compacts
    b = {f: out[("B", f)] for f in ("g1", "g2", "g3")}
    assert b["g1"].action == "keep" and b["g1"].group_files == 1
    assert b["g2"].group_id == b["g3"].group_id
    assert b["g2"].action == "compact" and b["g2"].group_bytes == 20
    # group ids are per-partition (both partitions start at 0)
    assert b["g1"].group_id == 0
    # no group of 2+ files exceeds the target
    assert all(
        r.group_bytes <= 1000 for r in out.values() if r.group_files >= 2
    )


def test_compact_files_executes_plan(spark, tmp_path):
    """The executor's physical promises (VERDICT r15 next-#8): staged
    small files -> plan -> rewrite leaves exactly ONE parquet file per
    rewrite group, groups never mix rows across partitions or plan
    groups, and no row is lost or duplicated."""
    import glob
    import os

    from pyspark.sql import functions as F

    from vector_search_test_spark.operators.snapshot import (
        compact_files,
        compaction_plan,
        stage_small_files,
    )

    rows = spark.createDataFrame(
        [
            ("A", f"f{i % 3}", i, "x" * (10 + i))
            for i in range(30)
        ]
        + [("B", "g0", 100, "y" * 5000), ("B", "g1", 101, "z" * 8)],
        "partition string, file string, doc_id long, text string",
    )
    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    stage_small_files(rows, src)
    # one physical file per (partition, file) label
    for leaf in glob.glob(os.path.join(src, "partition=*", "file=*")):
        assert (
            len([f for f in os.listdir(leaf) if f.endswith(".parquet")])
            == 1
        ), leaf
    staged = spark.read.parquet(src)
    manifest = staged.groupBy("partition", "file").agg(
        F.sum(F.length("text")).cast("long").alias("bytes")
    )
    plan = compaction_plan(manifest, 600).localCheckpoint()
    compact_files(staged, plan, dst)

    planned = {
        (r["partition"], int(r.group_id))
        for r in plan.select("partition", "group_id").distinct().collect()
    }
    seen = {}
    for leaf in glob.glob(os.path.join(dst, "partition=*", "group_id=*")):
        parts = leaf.split(os.sep)
        key = (parts[-2].split("=")[1], int(parts[-1].split("=")[1]))
        seen[key] = len(
            [f for f in os.listdir(leaf) if f.endswith(".parquet")]
        )
    assert set(seen) == planned
    assert all(v == 1 for v in seen.values()), seen

    # row preservation: every doc_id exactly once, in its plan group
    out = spark.read.parquet(dst)
    assert out.count() == 32
    assert out.select("doc_id").distinct().count() == 32
    got = {
        int(r.doc_id): (r["partition"], int(r.group_id))
        for r in out.collect()
    }
    want = {
        int(r.doc_id): (r["partition"], int(r.group_id))
        for r in staged.join(
            plan.select("partition", "file", "group_id"),
            ["partition", "file"],
        ).collect()
    }
    assert got == want
