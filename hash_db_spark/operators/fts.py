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


def compile_fts_oracle(col: str, query: str) -> str:
    """DuckDB-SQL rendering of the same fold, for oracle queries."""
    tok_expr = f"string_split(replace({col}, ',', ''), ' ')"
    pred = ""
    mode = "and"
    for tok in query.split(" "):
        if not tok:
            continue
        if tok in ("&", "|"):
            mode = "and" if tok == "&" else "or"
            continue
        term = f"list_contains({tok_expr}, '{tok}')"
        if not pred:
            pred = term
        else:
            pred = f"({pred} {'AND' if mode == 'and' else 'OR'} {term})"
    return pred
