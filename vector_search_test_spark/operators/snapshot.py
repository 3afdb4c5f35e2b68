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

At 100 TB the practical refinement is PARTITION-scoped copy-on-write:
partition the base by a stable hash bucket of the key
(`partitionBy(pmod(hash(key), N))`), compute affected buckets from the
change set (tiny), and rewrite only those directories — the plan shape
here is unchanged; only the write targets fewer files. Row counts obey
|upsert| = |base| - |matched| + |updates| and |delete| = |base| -
|matched|, pinned in tests."""

from __future__ import annotations

from pyspark.sql import DataFrame
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
    column lists."""
    return f"""
        SELECT * FROM ({base_sql}) b
        WHERE b.{key} NOT IN (SELECT {key} FROM ({updates_sql}))
        UNION ALL
        SELECT * FROM ({updates_sql})
    """


def stream_upsert_snapshots(
    stream: DataFrame,
    base_dir: str,
    key: str = "doc_id",
):
    """foreachBatch sink that maintains a copy-on-write snapshot from a
    stream of row upserts — the standard production pattern for "keep a
    queryable corpus current from a firehose" when the sink format has
    no native MERGE.

    Per micro-batch: read the current snapshot version, `upsert` the
    batch into it, write the result as a NEW version directory
    (`v<batch_id>`), then atomically repoint the `_CURRENT` marker.
    Restart safety: foreachBatch may replay a batch after recovery; the
    version dir is keyed by batch id, so a replay overwrites ITS OWN
    output and repoints to the same version — the previous snapshot is
    never mutated (copy-on-write), so a crash mid-write leaves
    `_CURRENT` on the last complete version. The local-file `_CURRENT`
    marker is the commit-protocol seam: on a real deployment that
    rename is a metastore / table-format commit (the plan shape —
    broadcast anti-join upsert + full rewrite, or partition-scoped
    rewrite per SCALE.md — is unchanged).

    Returns the DataStreamWriter (caller adds trigger/checkpoint and
    starts it)."""
    import os

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        cur_file = os.path.join(base_dir, "_CURRENT")
        if os.path.exists(cur_file):
            with open(cur_file) as f:
                cur = f.read().strip()
            base = spark.read.parquet(os.path.join(base_dir, cur))
            nxt = upsert(base, batch_df, key=key)
        else:
            nxt = batch_df
        vdir = f"v{batch_id}"
        nxt.write.mode("overwrite").parquet(os.path.join(base_dir, vdir))
        tmp = cur_file + ".tmp"
        with open(tmp, "w") as f:
            f.write(vdir)
        os.replace(tmp, cur_file)

    return stream.writeStream.foreachBatch(_apply)


def read_current_snapshot(spark, base_dir: str) -> DataFrame:
    """Read the live snapshot the `_CURRENT` marker points at."""
    import os

    with open(os.path.join(base_dir, "_CURRENT")) as f:
        cur = f.read().strip()
    return spark.read.parquet(os.path.join(base_dir, cur))
