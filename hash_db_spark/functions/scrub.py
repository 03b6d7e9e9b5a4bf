"""PII / pattern scrubbing for training-data pipelines.

No reference counterpart (the reference stores opaque strings —
/root/reference/server.py keeps values verbatim); this is part of the
LLM-pipeline capability tier: before text reaches a training corpus,
emails / IPs / phone numbers are redacted and per-document match counts
feed filtering rules.

Everything here is a pure column expression (map-side, codegen'd, no
shuffle — scales linearly to 100 TB). Patterns are written in the
intersection of Java regex (Spark) and RE2 (DuckDB) syntax — character
classes spelled [0-9] rather than \\d, no backreferences, no lookahead —
so the DuckDB oracle computes byte-identical results.

Redaction order is significant and fixed: specific shapes (email, ipv4,
phone) run before the generic number pattern, which would otherwise eat
their digits. Both engines apply the same chain in the same order.
"""

from __future__ import annotations

from pyspark.sql import Column
import pyspark.sql.functions as F

# Ordered: specific before generic (number must run last).
PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ipv4": r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b",
    "phone": r"\b[0-9]{3}[-. ][0-9]{3}[-. ][0-9]{4}\b",
    "number": r"[0-9]+",
}

DEFAULT_KINDS = ("email", "ipv4", "phone")

# Replacement tokens are digit-free on purpose: a later pass (the generic
# number pattern) must never rewrite an earlier pass's token.
TOKENS: dict[str, str] = {
    "email": "<EMAIL>",
    "ipv4": "<IP>",
    "phone": "<PHONE>",
    "number": "<NUM>",
}


def _ordered(kinds: tuple[str, ...]) -> list[str]:
    unknown = set(kinds) - PATTERNS.keys()
    if unknown:
        raise ValueError(f"unknown scrub kinds: {sorted(unknown)}")
    return [k for k in PATTERNS if k in kinds]


def redact(col: Column | str, kinds: tuple[str, ...] = DEFAULT_KINDS) -> Column:
    """Replace every match of each requested pattern with a ``<KIND>``
    token, applying patterns in the canonical specific-to-generic order."""
    c = F.col(col) if isinstance(col, str) else col
    for k in _ordered(kinds):
        c = F.regexp_replace(c, PATTERNS[k], TOKENS[k])
    return c


def _sql_pat(kind: str) -> str:
    """DuckDB single-quoted string literals do NOT process backslash
    escapes (unlike e'...'), so the regex goes in verbatim — doubling
    backslashes corrupts \\. / \\b / \\d into literal-backslash atoms
    that never match, making the oracle silently pass PII through."""
    return PATTERNS[kind].replace("'", "''")


def sql_redact(col: str, kinds: tuple[str, ...] = DEFAULT_KINDS) -> str:
    expr = col
    for k in _ordered(kinds):
        expr = f"regexp_replace({expr}, '{_sql_pat(k)}', '{TOKENS[k]}', 'g')"
    return expr


def pattern_count(col: Column | str, kind: str) -> Column:
    """Number of matches of one pattern (size of extract-all — the form
    both engines share; Spark's regexp_count has no DuckDB counterpart)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.size(F.regexp_extract_all(c, F.lit(PATTERNS[kind]), F.lit(0)))


def sql_pattern_count(col: str, kind: str) -> str:
    return f"len(regexp_extract_all({col}, '{_sql_pat(kind)}'))"
