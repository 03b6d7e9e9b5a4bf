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


# --- Luhn-validated PAN (payment-card number) scrubbing -----------------------
#
# The generic number pattern can't tell a card number from an order id of
# the same length; the Luhn checksum (ISO/IEC 7812 mod-10, public) can —
# validating candidates before redacting cuts the false-positive rate by
# 10x (a random 13-16 digit run passes Luhn with p = 1/10). Candidates
# that fail stay untouched; candidates that pass are replaced with a
# digit-free token. Pure column expressions (nested higher-order
# functions) — map-side, no shuffle, linear to 100 TB.

PAN_PATTERN = r"\b[0-9]{13,16}\b"
PAN_TOKEN = "<PAN>"


def luhn_valid(c: Column) -> Column:
    """True iff the all-digit string passes the Luhn mod-10 checksum:
    from the RIGHT, double every second digit, subtract 9 from doubles
    over 9, total divisible by 10. Requires a non-empty digit string
    (the PAN_PATTERN guarantees 13-16 digits)."""
    digits = F.split(c, "")
    n = F.length(c)

    def contrib(acc: Column, i: Column) -> Column:
        d = F.element_at(digits, i).cast("int")
        dbl = d * 2
        return acc + F.when(
            (n - i) % 2 == 1,
            F.when(dbl > 9, dbl - 9).otherwise(dbl),
        ).otherwise(d)

    total = F.aggregate(F.sequence(F.lit(1), n), F.lit(0), contrib)
    return total % 10 == 0


def sql_luhn_valid(expr: str) -> str:
    d = f"CAST(string_split({expr}, '')[i] AS INT)"
    return (
        f"(list_sum(list_transform(generate_series(1, len({expr})),"
        f" i -> CASE WHEN (len({expr}) - i) % 2 = 1"
        f" THEN CASE WHEN {d} * 2 > 9 THEN {d} * 2 - 9 ELSE {d} * 2 END"
        f" ELSE {d} END)) % 10 = 0)"
    )


def pan_counts(col: Column | str) -> tuple[Column, Column]:
    """(n_candidates, n_valid): PAN-shaped digit runs and the subset
    passing Luhn."""
    c = F.col(col) if isinstance(col, str) else col
    cands = F.regexp_extract_all(c, F.lit(PAN_PATTERN), F.lit(0))
    valid = F.filter(cands, luhn_valid)
    return F.size(cands), F.size(valid)


def redact_pan(col: Column | str) -> Column:
    """Replace ONLY Luhn-valid PAN candidates with the digit-free token
    (a later generic-number pass never rewrites it); invalid lookalikes
    pass through. Fold over the validated list — exact string replace,
    no second regex pass."""
    c = F.col(col) if isinstance(col, str) else col
    cands = F.regexp_extract_all(c, F.lit(PAN_PATTERN), F.lit(0))
    valid = F.filter(cands, luhn_valid)
    return F.aggregate(
        valid, c, lambda acc, x: F.replace(acc, x, F.lit(PAN_TOKEN))
    )


def sql_pan_exprs(col: str) -> tuple[str, str, str]:
    """(n_candidates, n_valid, redacted) oracle expressions over one
    column — the exact twins of pan_counts/redact_pan."""
    cands = f"regexp_extract_all({col}, '{PAN_PATTERN}')"
    valid = f"list_filter({cands}, x -> {sql_luhn_valid('x')})"
    n_c = f"len({cands})"
    n_v = f"len({valid})"
    red = (
        f"list_reduce(list_prepend({col}, {valid}),"
        f" (acc, x) -> replace(acc, x, '{PAN_TOKEN}'))"
    )
    return n_c, n_v, red


# --- high-entropy secret (credential/API-key) scrubbing ------------------------
#
# Regex shape alone can't tell an API key from a long identifier; Shannon
# entropy of the candidate's character distribution can (the detect-secrets /
# truffleHog heuristic — public). Candidates are alphanumeric runs of 20-128
# chars; those whose per-char entropy clears SECRET_ENTROPY_BITS (hex secrets
# sit near log2(16) ~ 3.7-4.0 bits; English words and repeated filler sit
# under 3) are redacted. Pure column expressions over nested higher-order
# functions — map-side, no shuffle, linear to 100 TB. The 128-char cap bounds
# the O(len^2) per-candidate entropy fold at ~16k char compares.

SECRET_PATTERN = r"\b[A-Za-z0-9]{20,128}\b"
SECRET_TOKEN = "<SECRET>"
SECRET_ENTROPY_BITS = 3.0


def shannon_entropy(c: Column) -> Column:
    """Shannon entropy (bits/char) of a string's character distribution,
    summed in STRING ORDER on both engines: H = -(1/L) * sum_over_
    positions log2(count(char_at_pos)/L). Position-order summation
    (rather than distinct-char order) is what makes the float fold
    replay identically in DuckDB — list_distinct's order is not
    specified there."""
    cs = F.filter(F.split(c, ""), lambda x: x != F.lit(""))
    n = F.size(cs)
    s = F.aggregate(
        cs,
        F.lit(0.0),
        lambda acc, ch: acc
        + F.log2(F.size(F.filter(cs, lambda x: x == ch)) / n),
    )
    return -s / n


def sql_shannon_entropy(expr: str) -> str:
    cs = f"list_filter(string_split({expr}, ''), ch -> ch <> '')"
    return (
        f"(-list_sum(list_transform({cs}, ch -> "
        f"log2(len(list_filter({cs}, x -> x = ch)) / len({cs})))) "
        f"/ len({cs}))"
    )


def secret_exprs(col: Column | str) -> tuple[Column, Column, Column, Column]:
    """(n_candidates, n_secrets, max_entropy, redacted) over one text
    column. Only entropy-validated candidates are redacted — ordinary
    long identifiers (low entropy) pass through untouched."""
    c = F.col(col) if isinstance(col, str) else col
    cands = F.regexp_extract_all(c, F.lit(SECRET_PATTERN), F.lit(0))
    ents = F.transform(cands, lambda x: F.round(shannon_entropy(x), 6))
    valid = F.filter(
        cands,
        lambda x: F.round(shannon_entropy(x), 6) >= SECRET_ENTROPY_BITS,
    )
    max_e = F.coalesce(F.array_max(ents), F.lit(0.0))
    red = F.aggregate(
        valid, c, lambda acc, x: F.replace(acc, x, F.lit(SECRET_TOKEN))
    )
    return F.size(cands), F.size(valid), max_e, red


def sql_secret_exprs(col: str) -> tuple[str, str, str, str]:
    cands = f"regexp_extract_all({col}, '{SECRET_PATTERN}')"
    ent = sql_shannon_entropy("x")
    ents = f"list_transform({cands}, x -> round({ent}, 6))"
    valid = (
        f"list_filter({cands}, x -> round({ent}, 6)"
        f" >= {SECRET_ENTROPY_BITS})"
    )
    n_c = f"len({cands})"
    n_v = f"len({valid})"
    max_e = f"COALESCE(list_max({ents}), 0.0)"
    red = (
        f"list_reduce(list_prepend({col}, {valid}),"
        f" (acc, x) -> replace(acc, x, '{SECRET_TOKEN}'))"
    )
    return n_c, n_v, max_e, red
