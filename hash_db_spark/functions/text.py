"""Text-analysis functions for training-data pipelines (SURVEY §7 Phase 6).

No reference counterpart — these are the north-star LLM-pipeline operators
(BASELINE.json:6): token counting, quality scoring, language ID, document
fingerprinting. All are pure Column expressions (JVM-side, whole-stage
codegen) — no Python UDFs in the hot path — and every one has an exact
DuckDB-SQL rendering so the driver's oracle can hash-match results.

Scale notes: each function is a narrow projection over one string column —
at 100 TB these run map-side with zero shuffle; fingerprints/token stats
should be written once as derived columns rather than recomputed per query.
"""

from __future__ import annotations

from pyspark.sql import Column
import pyspark.sql.functions as F

# Marker stopwords per language for the n-gram/stopword lang-id heuristic.
# Deterministic and tiny by design: hit-count argmax with a fixed
# priority order for ties.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "a", "of", "and", "to"],
    "fr": ["le", "la", "de", "et", "un"],
    "es": ["el", "los", "de", "y", "una"],
    "de": ["der", "die", "das", "und", "ein"],
    "zh": ["de5", "shi4", "le5", "zai4", "he2"],
}
LANG_PRIORITY = ["en", "fr", "es", "de", "zh"]


def tokens(col: Column | str) -> Column:
    """Whitespace tokens, comma-stripped (matches the FTS indexer,
    /root/reference/server.py:733)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.split(F.regexp_replace(c, ",", ""), " ")


def token_count(col: Column | str) -> Column:
    return F.size(tokens(col))


def distinct_token_count(col: Column | str) -> Column:
    return F.size(F.array_distinct(tokens(col)))


def char_count(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.length(c)


def avg_token_length(col: Column | str) -> Column:
    """Mean token length, 4-decimal rounded for cross-engine stability."""
    t = tokens(col)
    total = F.aggregate(
        F.transform(t, lambda x: F.length(x)),
        F.lit(0),
        lambda acc, x: acc + x,
    )
    return F.round(total.cast("double") / F.size(t), 4)


def lexical_diversity(col: Column | str) -> Column:
    """distinct/total token ratio — a standard near-gibberish signal."""
    return F.round(
        distinct_token_count(col).cast("double") / token_count(col), 4
    )


def stopword_ratio(col: Column | str, stopwords: list[str] | None = None) -> Column:
    """Fraction of tokens that are stopwords; natural text sits in a
    mid band, keyword spam near 0, boilerplate near 1."""
    sw = stopwords if stopwords is not None else LANG_MARKERS["en"]
    t = tokens(col)
    sw_arr = F.array(*[F.lit(s) for s in sw])
    hits = F.size(F.filter(t, lambda x: F.array_contains(sw_arr, x)))
    return F.round(hits.cast("double") / F.size(t), 4)


def quality_score(col: Column | str) -> Column:
    """Composite 0..1 quality score: length band * diversity * (1 - excess
    stopword penalty). Deterministic, documented, SQL-renderable."""
    from hash_db_spark.functions.rounding import round_half_away_col

    n = token_count(col)
    length_band = (
        F.when(n < 5, 0.2).when(n > 500, 0.5).otherwise(1.0)
    )
    # same tie hazard as quality_score_fast: scaled-binary rounding
    return round_half_away_col(
        length_band * lexical_diversity(col) * (1.0 - stopword_ratio(col) / 2),
        4,
    )


def stopword_ratio_fast(col: Column | str) -> Column:
    """Codegen twin of stopword_ratio for hot paths: hits counted with
    ONE word-boundary regexp (native codegen) instead of an interpreted
    filter() lambda — identical counts for comma-free \\w/space text
    (the lang_id_fast equivalence), same rounding."""
    c = F.col(col) if isinstance(col, str) else col
    hits = F.size(F.regexp_extract_all(c, F.lit(_marker_re_en()), 0))
    return F.round(hits.cast("double") / F.size(tokens(col)), 4)


def quality_score_fast(col: Column | str) -> Column:
    """quality_score with the interpreted-HOF stopword component
    replaced by stopword_ratio_fast — value-identical on comma-free
    \\w/space text (every other component is already native:
    array_distinct, size, split)."""
    from hash_db_spark.functions.rounding import round_half_away_col

    n = token_count(col)
    length_band = F.when(n < 5, 0.2).when(n > 500, 0.5).otherwise(1.0)
    # round_half_away_col, not F.round: the product lands on decimal
    # ties (observed at sf0.1) where Spark's HALF_UP diverges from the
    # scaled-binary round DuckDB applies (functions/rounding.py).
    return round_half_away_col(
        length_band
        * lexical_diversity(col)
        * (1.0 - stopword_ratio_fast(col) / 2),
        4,
    )


def _marker_re_en() -> str:
    return r"\b(?:" + "|".join(LANG_MARKERS["en"]) + r")\b"


def sql_stopword_ratio_fast(col: str) -> str:
    return (
        f"round(CAST(len(regexp_extract_all({col}, '{_marker_re_en()}'))"
        f" AS DOUBLE) / len({_sql_tokens(col)}), 4)"
    )


def sql_quality_score_fast(col: str) -> str:
    n = sql_token_count(col)
    return (
        f"round((CASE WHEN {n} < 5 THEN 0.2 WHEN {n} > 500 THEN 0.5"
        f" ELSE 1.0 END)"
        f" * {sql_lexical_diversity(col)}"
        f" * (1.0 - {sql_stopword_ratio_fast(col)} / 2), 4)"
    )


def _argmax_priority(hit_cols: list[Column]) -> Column:
    """Language label for an argmax-with-priority-tie-break over per-lang
    hit counts, or 'und' on zero hits.

    Structured as array_max + array_position instead of the old nested
    strictly-greater CASE fold: the fold re-referenced every earlier
    count in both the WHEN condition and the ELSE branch, and codegen's
    common-subexpression elimination does not hoist expressions that
    only occur under conditional branches — so each hit count was
    re-evaluated O(3^k) times (measured 2.10s -> 0.51s per full-doc
    labeling pass at sf0.1). Semantics are identical: array_position
    returns the FIRST index of the maximum (1-based), which is exactly
    the strictly-greater fold's earliest-priority winner, and a zero
    maximum still maps to 'und'."""
    hits = F.array(*hit_cols)
    langs = F.array(*[F.lit(lang) for lang in LANG_PRIORITY])
    mx = F.array_max(hits)
    idx = F.array_position(hits, mx).cast("int")
    return F.when(mx > 0, F.element_at(langs, idx)).otherwise(F.lit("und"))


def lang_id(col: Column | str) -> Column:
    """Stopword-hit argmax over LANG_MARKERS with fixed tie priority."""
    t = tokens(col)
    hit_cols = []
    for lang in LANG_PRIORITY:
        arr = F.array(*[F.lit(s) for s in LANG_MARKERS[lang]])
        hit_cols.append(F.size(F.filter(t, lambda x: F.array_contains(arr, x))))
    return _argmax_priority(hit_cols)


def _marker_re(lang: str) -> str:
    return r"\b(?:" + "|".join(LANG_MARKERS[lang]) + r")\b"


def lang_id_fast(col: Column | str) -> Column:
    """Codegen twin of lang_id for hot paths (per-chunk labeling):
    marker hits counted with ONE word-boundary regexp per language —
    native whole-stage codegen — instead of interpreted filter()
    lambdas (~28ms/doc, the shingle_frame HOF pitfall). Hit counts are
    identical to lang_id's token-membership counts whenever the text is
    comma-free \\w/space tokens (every LANG_MARKERS word is \\w-only,
    and a \\b-delimited match is exactly a whole token then); same
    argmax, same priority tie-break, same 'und' on zero hits."""
    c = F.col(col) if isinstance(col, str) else col
    return _argmax_priority([
        F.size(F.regexp_extract_all(c, F.lit(_marker_re(lang)), 0))
        for lang in LANG_PRIORITY
    ])


def sql_lang_id_fast(col: str) -> str:
    hits = {
        lang: f"len(regexp_extract_all({col}, '{_marker_re(lang)}'))"
        for lang in LANG_PRIORITY
    }
    expr_lang = f"'{LANG_PRIORITY[0]}'"
    expr_hits = hits[LANG_PRIORITY[0]]
    for lang in LANG_PRIORITY[1:]:
        h = hits[lang]
        expr_lang = (
            f"(CASE WHEN {h} > {expr_hits} THEN '{lang}' ELSE {expr_lang} END)"
        )
        expr_hits = (
            f"(CASE WHEN {h} > {expr_hits} THEN {h} ELSE {expr_hits} END)"
        )
    return f"(CASE WHEN {expr_hits} > 0 THEN {expr_lang} ELSE 'und' END)"


# BPE-ish subword pattern: word pieces of up to 4 chars (a crude stand-in
# for byte-pair merges: common short chunks) plus punctuation marks. ASCII
# \w semantics agree between Java regex (Spark) and RE2 (DuckDB).
BPE_PATTERN = r"\w{1,4}|[^\w\s]"


def bpe_token_count(col: Column | str) -> Column:
    """Subword token count under the BPE-ish regex — the 'how many
    LLM-ish tokens is this document' estimator (whitespace tokens
    underestimate; char counts overestimate)."""
    c = F.col(col) if isinstance(col, str) else col
    # Spark SQL string literals process backslash escapes (DuckDB's don't)
    # — double them for the Spark side only.
    pat = BPE_PATTERN.replace("\\", "\\\\")
    return F.size(F.expr(f"regexp_extract_all({_colname(c)}, '{pat}', 0)"))


def _colname(c: Column) -> str:
    # Column expression → SQL fragment for F.expr composition.
    return c._jc.toString()


def char_ngram_count(col: Column | str, n: int = 3) -> Column:
    """Distinct character n-grams of the lowercased text — the unit used
    by character-level language ID and near-dup shingling. substring()
    with a Column start position requires the SQL-expression form."""
    name = _colname(F.col(col) if isinstance(col, str) else col)
    # CASE-guarded: Spark's sequence(1, 0) counts DOWN ([1, 0], not [])
    # — for a string shorter than n the unguarded form produced one
    # phantom gram (count 1 where DuckDB's generate_series(1,0) = []
    # correctly gives 0).
    grams = F.expr(
        f"CASE WHEN length(lower({name})) >= {n} THEN "
        f"transform(sequence(1, length(lower({name})) - {n - 1}), "
        f"i -> substring(lower({name}), i, {n})) "
        f"ELSE array() END"
    )
    return F.size(F.array_distinct(grams))


def sql_bpe_token_count(col: str) -> str:
    return f"len(regexp_extract_all({col}, '{BPE_PATTERN}'))"


def sql_char_ngram_count(col: str, n: int = 3) -> str:
    return (
        f"len(list_distinct(list_transform("
        f"generate_series(1, greatest(len(lower({col})) - {n - 1}, 0)), "
        f"i -> substr(lower({col}), i, {n}))))"
    )


def fingerprint(col: Column | str) -> Column:
    """Exact-dup fingerprint: md5 of lowercased, comma-stripped,
    space-collapsed text."""
    c = F.col(col) if isinstance(col, str) else col
    normalized = F.regexp_replace(
        F.regexp_replace(F.lower(c), ",", ""), " +", " "
    )
    return F.md5(normalized)


def bag_fingerprint(col: Column | str) -> Column:
    """Order-insensitive fingerprint: md5 over the sorted distinct token
    set — catches shuffled/reordered near-exact duplicates."""
    t = tokens(F.lower(F.col(col) if isinstance(col, str) else col))
    t = F.filter(t, lambda x: x != "")  # runs of spaces yield empty tokens
    return F.md5(F.array_join(F.array_sort(F.array_distinct(t)), " "))


# ---------------------------------------------------------------------------
# DuckDB-SQL renderings (oracle side). Each mirrors the Column logic above
# token-for-token so results hash-match.
# ---------------------------------------------------------------------------

def _sql_tokens(col: str) -> str:
    return f"string_split(replace({col}, ',', ''), ' ')"


def sql_token_count(col: str) -> str:
    return f"len({_sql_tokens(col)})"


def sql_distinct_token_count(col: str) -> str:
    return f"len(list_distinct({_sql_tokens(col)}))"


def sql_avg_token_length(col: str) -> str:
    return (
        f"round(CAST(list_sum(list_transform({_sql_tokens(col)}, x -> len(x))) AS DOUBLE)"
        f" / len({_sql_tokens(col)}), 4)"
    )


def sql_lexical_diversity(col: str) -> str:
    return (
        f"round(CAST({sql_distinct_token_count(col)} AS DOUBLE)"
        f" / {sql_token_count(col)}, 4)"
    )


def _sql_list(words: list[str]) -> str:
    return "[" + ", ".join(f"'{w}'" for w in words) + "]"


def sql_stopword_ratio(col: str, stopwords: list[str] | None = None) -> str:
    sw = stopwords if stopwords is not None else LANG_MARKERS["en"]
    return (
        f"round(CAST(len(list_filter({_sql_tokens(col)}, "
        f"x -> list_contains({_sql_list(sw)}, x))) AS DOUBLE)"
        f" / len({_sql_tokens(col)}), 4)"
    )


def sql_quality_score(col: str) -> str:
    n = sql_token_count(col)
    return (
        f"round((CASE WHEN {n} < 5 THEN 0.2 WHEN {n} > 500 THEN 0.5 ELSE 1.0 END)"
        f" * {sql_lexical_diversity(col)}"
        f" * (1.0 - {sql_stopword_ratio(col)} / 2), 4)"
    )


def sql_lang_id(col: str) -> str:
    hits = {
        lang: (
            f"len(list_filter({_sql_tokens(col)}, "
            f"x -> list_contains({_sql_list(LANG_MARKERS[lang])}, x)))"
        )
        for lang in LANG_PRIORITY
    }
    # Same strictly-greater fold as lang_id(): build nested CASE.
    expr_lang = f"'{LANG_PRIORITY[0]}'"
    expr_hits = hits[LANG_PRIORITY[0]]
    for lang in LANG_PRIORITY[1:]:
        h = hits[lang]
        expr_lang = f"(CASE WHEN {h} > {expr_hits} THEN '{lang}' ELSE {expr_lang} END)"
        expr_hits = f"(CASE WHEN {h} > {expr_hits} THEN {h} ELSE {expr_hits} END)"
    return f"(CASE WHEN {expr_hits} > 0 THEN {expr_lang} ELSE 'und' END)"


def sql_fingerprint(col: str) -> str:
    return f"md5(regexp_replace(replace(lower({col}), ',', ''), ' +', ' ', 'g'))"


def sql_bag_fingerprint(col: str) -> str:
    return (
        f"md5(list_aggregate(list_sort(list_distinct(list_filter("
        f"string_split(replace(lower({col}), ',', ''), ' '), x -> x != ''))), "
        f"'string_agg', ' '))"
    )


# ---------------------------------------------------------------------------
# Encoding quality (mojibake / control-char / replacement-char gate)
# ---------------------------------------------------------------------------

# UTF-8-decoded-as-Latin-1 tell-tales (the classic mojibake sequences:
# curly quotes, accented Latin letters, dashes). Literal alternation --
# kept regex-feature-free so Java regex (Spark) and RE2 (DuckDB) agree.
MOJIBAKE_MARKERS: tuple[str, ...] = (
    "\u00c3\u00a9",            # "A~(c)" pair  <- e-acute
    "\u00c3\u00a8",            #               <- e-grave
    "\u00c3\u00bc",            #               <- u-umlaut
    "\u00c3\u00b1",            #               <- n-tilde
    "\u00e2\u20ac\u2122",     # a-hat euro tm <- right single quote
    "\u00e2\u20ac\u0153",     #               <- left double quote
    "\u00e2\u20ac\u201c",     #               <- en dash
)
_MOJIBAKE_RE = "|".join(MOJIBAKE_MARKERS)
# C0 controls except tab/newline/CR, plus DEL -- bytes that never belong
# in decoded text.
_CTRL_RE = "[\\x00-\\x08\\x0b\\x0c\\x0e-\\x1f\\x7f]"
_REPL_CHAR = "\ufffd"  # U+FFFD REPLACEMENT CHARACTER


def _match_count(col: Column | str, pattern: str) -> Column:
    """Occurrences of ``pattern`` -- split-and-count, which both engines
    define identically (trailing empties kept), all codegen."""
    return (F.size(F.split(col, pattern, -1)) - 1).cast("long")


def _sql_match_count(col: str, pattern: str) -> str:
    pat = pattern.replace("'", "''")
    return f"(len(regexp_split_to_array({col}, '{pat}')) - 1)::BIGINT"


def replacement_char_count(col: Column | str) -> Column:
    """U+FFFD count -- each one is a byte sequence some decoder already
    gave up on; any non-zero value means the document was transcoded
    lossily upstream."""
    return _match_count(col, _REPL_CHAR)


def control_char_count(col: Column | str) -> Column:
    """C0-control/DEL count (tab/newline/CR excluded)."""
    return _match_count(col, _CTRL_RE)


def mojibake_marker_count(col: Column | str) -> Column:
    """Count of classic UTF-8-as-Latin-1 double-decode tell-tales."""
    return _match_count(col, _MOJIBAKE_RE)


def encoding_ok(col: Column | str) -> Column:
    """The gate itself: no replacement chars, no mojibake markers, no
    raw control bytes. Boolean column, all codegen."""
    return (
        (replacement_char_count(col) == 0)
        & (control_char_count(col) == 0)
        & (mojibake_marker_count(col) == 0)
    )


def sql_replacement_char_count(col: str) -> str:
    return _sql_match_count(col, _REPL_CHAR)


def sql_control_char_count(col: str) -> str:
    return _sql_match_count(col, _CTRL_RE)


def sql_mojibake_marker_count(col: str) -> str:
    return _sql_match_count(col, _MOJIBAKE_RE)


def sql_encoding_ok(col: str) -> str:
    return (
        f"({sql_replacement_char_count(col)} = 0 AND "
        f"{sql_control_char_count(col)} = 0 AND "
        f"{sql_mojibake_marker_count(col)} = 0)"
    )


# ---------------------------------------------------------------------------
# Text normalization (the repair stage the encoding gate's flags feed)
# ---------------------------------------------------------------------------

# Unicode punctuation folded to ASCII before tokenization (C4/CCNet-style
# cleaning): curly quotes, dashes, ellipsis, NBSP. Pairs of
# (regex, replacement); every pattern is RE2-and-Java-safe.
_NORM_FOLDS: tuple[tuple[str, str], ...] = (
    ("[\u2018\u2019]", "'"),          # curly single quotes
    ('[\u201c\u201d]', '"'),          # curly double quotes
    ("[\u2013\u2014]", "-"),          # en/em dashes
    ("\u2026", "..."),                 # ellipsis
    ("\u00a0", " "),                   # NBSP
)


def normalize_text(col: Column | str) -> Column:
    """Single-line normal form: fold unicode punctuation to ASCII,
    strip control bytes, collapse every whitespace run to one space,
    trim. This is the REPAIR stage downstream of the encoding gate
    (the gate flags, this fixes what is fixable) and the contract the
    house tokenizers assume (clean_tokens splits on single spaces).
    Idempotent by construction (pinned by property test); pure codegen
    regexp chain, zero shuffles at any scale."""
    c = F.col(col) if isinstance(col, str) else col
    for pat, rep in _NORM_FOLDS:
        c = F.regexp_replace(c, pat, rep)
    c = F.regexp_replace(c, _CTRL_RE, "")
    c = F.regexp_replace(c, "\\s+", " ")
    return F.trim(c)


def sql_normalize_text(col: str) -> str:
    expr = col
    for pat, rep in _NORM_FOLDS + ((_CTRL_RE, ""), ("\\s+", " ")):
        rep_sql = rep.replace("'", "''")
        expr = f"regexp_replace({expr}, '{pat}', '{rep_sql}', 'g')"
    return f"trim({expr})"
