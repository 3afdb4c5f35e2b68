"""PII detection / redaction for training-corpus preparation (extension
— no reference counterpart; standard pre-training hygiene alongside
dedup and quality filtering).

Patterns are deliberately ASCII-only and alternation-free where engines
could disagree: Spark compiles Java regex, DuckDB compiles RE2, and the
two agree on ASCII character classes, bounded quantifiers, and literal
anchors — not on `\\w`/`\\b` unicode semantics. Every pattern has a
DuckDB twin the tests hold to bit-equality (same matches, same
replacement output). This keeps redaction a pure projection
(`regexp_replace` / `regexp_count` chains): scan-only, no shuffle, no
Python — the shape that survives 100 TB.

Conservative by construction: the phone pattern requires an
international `+` prefix or a separator-delimited US form, so ordinary
large numbers in prose are not mangled. Recall-first variants belong in
a tuned config, not hardcoded here.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# ordered: emails first (contain digits/dots a later pattern could eat),
# then IPv4 (dotted digits would match inside no other pattern), then
# phones. Each entry: (kind, regex, replacement token).
PII_PATTERNS: list[tuple[str, str, str]] = [
    (
        "email",
        r"[a-zA-Z0-9._%+\-]+@[a-zA-Z0-9.\-]+\.[a-zA-Z]{2,}",
        "<EMAIL>",
    ),
    (
        "ipv4",
        r"[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}",
        "<IP>",
    ),
    (
        "phone",
        r"\+[0-9]{8,15}|[0-9]{3}[\- ][0-9]{3}[\- ][0-9]{4}",
        "<PHONE>",
    ),
]


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def redact_pii(col: Column | str, kinds: list[str] | None = None) -> Column:
    """Replace every PII match with its `<KIND>` token, applying the
    patterns in PII_PATTERNS order (emails before IPs before phones, so
    no pattern eats another's context). One chained `regexp_replace`
    projection — scan-only."""
    out = _col(col)
    for kind, pat, tok in PII_PATTERNS:
        if kinds is not None and kind not in kinds:
            continue
        out = F.regexp_replace(out, pat, tok)
    return out


def redact_pii_sql(expr: str, kinds: list[str] | None = None) -> str:
    """DuckDB twin of `redact_pii` (global-flag regexp_replace chain)."""
    out = expr
    for kind, pat, tok in PII_PATTERNS:
        if kinds is not None and kind not in kinds:
            continue
        sql_pat = pat.replace("'", "''")
        out = f"regexp_replace({out}, '{sql_pat}', '{tok}', 'g')"
    return out


def pii_counts(col: Column | str) -> dict[str, Column]:
    """Per-kind PII match counts ({kind: Column}); counts are taken on
    the progressively-redacted text exactly as `redact_pii` sees it, so
    kinds never double-count each other's matches."""
    out = _col(col)
    counts: dict[str, Column] = {}
    for kind, pat, tok in PII_PATTERNS:
        counts[kind] = F.regexp_count(out, F.lit(pat))
        out = F.regexp_replace(out, pat, tok)
    return counts


def pii_counts_sql(expr: str) -> dict[str, str]:
    """DuckDB twin of `pii_counts` (len(regexp_extract_all) over the same
    progressive redaction)."""
    out = expr
    counts: dict[str, str] = {}
    for kind, pat, tok in PII_PATTERNS:
        sql_pat = pat.replace("'", "''")
        counts[kind] = f"len(regexp_extract_all({out}, '{sql_pat}'))"
        out = f"regexp_replace({out}, '{sql_pat}', '{tok}', 'g')"
    return counts
