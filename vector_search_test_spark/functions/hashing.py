"""Portable deterministic hashing.

`portable_hash48` maps a string to a 48-bit non-negative bigint by taking
the first 12 hex chars of md5. The SAME value is computable in DuckDB SQL
(see `hash48_sql` in this module), which is what lets MinHash / SimHash /
fingerprint operators be oracle-checked value-for-value.

At 100 TB scale you would swap this for `xxhash64` (cheaper, also a
Catalyst-native expression); md5 is chosen here only because both engines
expose it with identical semantics. Both are JVM-side expressions — no
Python in the loop.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

HASH48_MOD = 1 << 48


def portable_hash48(col: Column | str, salt: int | None = None) -> Column:
    """48-bit hash of a string column, identical in Spark and DuckDB.

    With `salt`, a distinct hash family member: md5 of '<salt>:' || s.
    """
    c = F.col(col) if isinstance(col, str) else col
    if salt is not None:
        c = F.concat(F.lit(f"{salt}:"), c)
    return F.conv(F.substring(F.md5(c), 1, 12), 16, 10).cast("long")


def hash48_sql(expr: str, salt: int | None = None) -> str:
    """The DuckDB-SQL twin of `portable_hash48` for oracle queries."""
    if salt is not None:
        expr = f"('{salt}:' || {expr})"
    return (
        "CAST(list_sum(list_transform(range(1, 13), i -> "
        f"(strpos('0123456789abcdef', substring(md5({expr}), i, 1)) - 1) * (16.0 ** (12 - i))"
        ")) AS BIGINT)"
    )
