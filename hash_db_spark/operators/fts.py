"""Full-text search operator (SURVEY §2.2 R5).

The reference maintains FTS posting lists at insert time — values are
comma-stripped, whitespace-tokenized, and each token writes a
``FTS.<table>.<field>.<token>.<rowid>`` key (/root/reference/server.py:729-739).
At query time ``WHERE t.f ~ 'a & b | c'`` splits the query on spaces; ``&``
and ``|`` switch the combine mode for *subsequent* tokens (mode starts AND),
and token match-sets fold left-to-right — no precedence grammar
(/root/reference/client.py:683-709,730-736).

Spark-first design: no posting-list table needed. The token array is a
derived expression (or a precomputed array column for repeated queries);
each token test is ``array_contains``, and the fold produces ONE boolean
Column, so the whole predicate stays inside whole-stage codegen and is
evaluated in a single scan — the posting-list semi-joins the reference does
per token collapse into a vectorized filter.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
import pyspark.sql.functions as F


def fts_tokens(col: Column | str) -> Column:
    """Tokenize exactly as the reference's indexer does: strip commas,
    split on single spaces (/root/reference/server.py:733)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.split(F.regexp_replace(c, ",", ""), " ")


def compile_fts(col: Column | str, query: str) -> Column:
    """Compile ``'a & b | c'`` into one boolean Column.

    Left-to-right fold with mode switching (reference semantics,
    /root/reference/client.py:687-695): start in AND mode; ``&``/``|``
    tokens change the mode applied to every following term.
    """
    tokens = fts_tokens(col)
    pred: Column | None = None
    mode = "and"
    for tok in query.split(" "):
        if not tok:
            continue
        if tok in ("&", "|"):
            mode = "and" if tok == "&" else "or"
            continue
        term = F.array_contains(tokens, tok)
        if pred is None:
            pred = term
        elif mode == "and":
            pred = pred & term
        else:
            pred = pred | term
    if pred is None:
        raise ValueError(f"empty FTS query: {query!r}")
    return pred


def fts_filter(df: DataFrame, col: str, query: str) -> DataFrame:
    """R5: WHERE <col> ~ '<query>'."""
    return df.filter(compile_fts(col, query))


def compile_phrase(col: Column | str, phrase: str) -> Column:
    """Adjacency phrase match (extension — the reference grammar has only
    ``&``/``|`` term folds): true when the phrase's tokens appear
    consecutively in order. One boolean Column over the token array
    (EXISTS over start positions), still inside a single scan; no
    positional posting lists needed.
    """
    words = [w for w in phrase.split(" ") if w]
    if not words:
        raise ValueError(f"empty phrase: {phrase!r}")
    tokens = fts_tokens(col)
    n = len(words)
    if n == 1:
        return F.array_contains(tokens, words[0])
    starts = F.sequence(F.lit(1), F.size(tokens) - (n - 1))
    at = lambda i, w: F.element_at(tokens, i) == w  # noqa: E731
    match_at = lambda i: F.aggregate(  # noqa: E731
        F.array(*[at(i + j, w) for j, w in enumerate(words)]),
        F.lit(True),
        lambda acc, x: acc & x,
    )
    # CASE-guarded, not bare conjunction: for a doc shorter than the
    # phrase, sequence(1, size-(n-1)) counts DOWN through 0 and
    # element_at(tokens, 0) throws. Relying on the preceding
    # size>=n conjunct's short-circuit is not contractual — the
    # optimizer may split or reorder predicate conjuncts.
    return F.when(
        F.size(tokens) >= n, F.exists(starts, match_at)
    ).otherwise(F.lit(False))


def phrase_filter(df: DataFrame, col: str, phrase: str) -> DataFrame:
    """WHERE <col> ~ '"<phrase>"' (quoted-phrase extension)."""
    return df.filter(compile_phrase(col, phrase))


def compile_phrase_oracle(col: str, phrase: str) -> str:
    """DuckDB rendering of the same adjacency test."""
    words = [w for w in phrase.split(" ") if w]
    tok = f"string_split(replace({col}, ',', ''), ' ')"
    n = len(words)
    if n == 1:
        return f"list_contains({tok}, '{words[0]}')"
    conj = " AND ".join(
        f"t.toks[i+{j}] = '{w}'" for j, w in enumerate(words)
    )
    return (
        f"(SELECT len(t.toks) >= {n} AND coalesce(list_max(list_transform("
        f"generate_series(1, len(t.toks)-{n - 1}), i -> CASE WHEN {conj} "
        f"THEN 1 ELSE 0 END)), 0) = 1 FROM (SELECT {tok} AS toks) t)"
    )


def compile_fts_oracle(col: str, query: str) -> str:
    """DuckDB-SQL rendering of the same fold, for oracle queries.
    Raises on an empty/operator-only query exactly like compile_fts —
    returning '' would splice an invalid 'WHERE ' into the caller's
    SQL and surface as an unrelated DuckDB parse error. Term quotes are
    SQL-escaped so a term like o'brien can't break the statement."""
    tok_expr = f"string_split(replace({col}, ',', ''), ' ')"
    pred = ""
    mode = "and"
    for tok in query.split(" "):
        if not tok:
            continue
        if tok in ("&", "|"):
            mode = "and" if tok == "&" else "or"
            continue
        term = f"list_contains({tok_expr}, '{tok.replace(chr(39), chr(39) * 2)}')"
        if not pred:
            pred = term
        else:
            pred = f"({pred} {'AND' if mode == 'and' else 'OR'} {term})"
    if not pred:
        raise ValueError(f"empty FTS query: {query!r}")
    return pred


def fts_index_query(spark, path: str, query: str) -> DataFrame:
    """Serve the reference's FTS fold semantics from the PERSISTED
    inverted index (sources/writers.py:write_fts_index — the same
    artifact BM25 serves from): each term's match set is one pruned
    posting read (term bucket as PartitionFilters + pushed tok filter,
    via writers.fts_index_probe), AND folds as a semi-join, OR as a
    distinct union — left-to-right with mode switching, exactly
    compile_fts (/root/reference/client.py:687-695 semantics).

    Result-identical to filtering the corpus with compile_fts and
    projecting the id (the index tokenizer clean_tokens is fts_tokens
    minus empty strings — membership-equivalent for any non-empty
    term), without touching corpus text: probe IO is O(postings of the
    query's terms), the serving property a 100 TB corpus needs when one
    index answers millions of queries.

    Returns (doc_id)."""
    from hash_db_spark.sources.writers import fts_index_probe, read_fts_index

    postings, _doclens, buckets = read_fts_index(spark, path)

    def match_set(term: str) -> DataFrame:
        return fts_index_probe(
            postings, [term], token_buckets=buckets
        ).select("id")

    out: DataFrame | None = None
    mode = "and"
    for tok in query.split(" "):
        if not tok:
            # Doubled/leading/trailing spaces: compile_fts skips empty
            # tokens, so the index probe must too — probing '' would
            # empty an AND fold that the corpus scan would not.
            continue
        if tok == "&":
            mode = "and"
            continue
        if tok == "|":
            mode = "or"
            continue
        m = match_set(tok)
        if out is None:
            out = m
        elif mode == "and":
            out = out.join(m, "id", "left_semi")
        else:
            out = out.union(m).distinct()
    if out is None:
        raise ValueError("empty FTS query")
    return out.select(F.col("id").alias("doc_id"))
