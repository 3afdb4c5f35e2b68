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


# --- MinHash hash family -----------------------------------------------------
#
# The textbook construction (Broder 1997; what datasketch ships): every
# family member i is an affine map of ONE base hash, h_i(s) = (a_i * h(s)
# + b_i) mod P, instead of i independent salted md5 computations. One md5
# per shingle + H multiply-adds replaces H md5s — the signature projection
# was the hash-heavy stage of every MinHash pipeline here (16x fewer md5 +
# base-16 conv calls). P = 2^31 - 1 keeps every intermediate product under
# 2^62 (h mod P < 2^31, a_i < 2^31), so the arithmetic is exact in both
# engines' BIGINTs; the a_i/b_i constants derive from a fixed splitmix-
# style expansion so Spark and DuckDB embed the identical literals.
#
# Correlated-collision caveat (ADVICE r12): the 48-bit base hash is
# reduced mod P BEFORE the per-member affine map, so two distinct
# fingerprints that collide mod P (~2^-31 per pair) collide in ALL H
# members at once — on such pairs the members are not independent and
# signature agreement is slightly inflated. Engine/oracle parity is
# unaffected (both sides share the construction), and at H=16 the
# expected excess agreement is ~2^-31 per candidate pair — far below
# the 1/H = 0.0625 estimator granularity, so the monitor entry
# (minhash_estimate_error) cannot observe it at any tested scale. If a
# deployment needs full member independence, mix per-member BEFORE the
# reduction (e.g. xor the full 48-bit value with a member constant,
# then % P) — both `minhash_member` and `minhash_member_sql` must
# change in lockstep since every oracle twin derives from them.

MINHASH_P = 2147483647  # 2^31 - 1 (Mersenne prime)


def minhash_ab(i: int) -> tuple[int, int]:
    """Deterministic (a_i, b_i) for family member i: a in [1, P-1],
    b in [0, P-1]. Same constants on the Spark and DuckDB sides."""
    x = ((i + 1) * 0x9E3779B97F4A7C15) % (1 << 64)
    x ^= x >> 31
    a = x % (MINHASH_P - 1) + 1
    y = ((i + 1) * 0xBF58476D1CE4E5B9) % (1 << 64)
    y ^= y >> 29
    b = y % MINHASH_P
    return a, b


def minhash_member(h: Column, i: int) -> Column:
    """Family member i applied to a base-hash column (a 48-bit
    `portable_hash48` value): (a_i * (h % P) + b_i) % P."""
    a, b = minhash_ab(i)
    return (F.lit(a) * (h % F.lit(MINHASH_P)) + F.lit(b)) % F.lit(MINHASH_P)


def minhash_member_sql(hexpr: str, i: int) -> str:
    """The DuckDB-SQL twin of `minhash_member`."""
    a, b = minhash_ab(i)
    return f"(({a} * ({hexpr} % {MINHASH_P}) + {b}) % {MINHASH_P})"
