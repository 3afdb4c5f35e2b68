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
