"""Iterative BPE merge training (SURVEY north-star: tokenizer training).

No reference counterpart; completes the story ``bpe_merge_candidates``
(round-0 pair counts, queries/text_queries.py) started: a real BPE trainer
ITERATES pick-top-pair -> merge-everywhere -> recount, because each merge
changes the next round's counts. Word-level variant: the starting alphabet
is ``clean_tokens`` words (character-level BPE is the same loop with a
different round-0 alphabet) and a merged unit is the space-joined pair —
token identity is the ARRAY ELEMENT, so multi-word units stay unambiguous.

Merge semantics (must be bit-identical in the SQL oracle): greedy
left-to-right, non-overlapping — in ``a a a a`` the pair (a, a) merges
positions 0 and 2, yielding ``[a a, a a]``. For a != b matches can never
be adjacent, so the rule only bites on self-pairs.

Per-round cost: one pair-explode + partial-agg count (map-side combine),
one TakeOrderedAndProject(1) for the winner, one Arrow merge pass. The
winner is a SCALAR collect (like k-means centroids); per-round
``localCheckpoint(eager=True)`` bounds lineage so round k doesn't replay
k-1 Python passes (the kv mutation-burst precedent — lazy markers never
materialize under a pure transformation chain).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
import pyspark.sql.functions as F

from hash_db_spark.operators.dedup import clean_tokens, sql_clean_tokens

from hash_db_spark.localframe import local_frame


def merge_pair_greedy(tokens: list[str], a: str, b: str) -> list[str]:
    """Greedy left-to-right non-overlapping merge of (a, b) -> 'a b'."""
    out: list[str] = []
    i, n = 0, len(tokens)
    while i < n:
        if i + 1 < n and tokens[i] == a and tokens[i + 1] == b:
            out.append(f"{a} {b}")
            i += 2
        else:
            out.append(tokens[i])
            i += 1
    return out


def _merge_pass(toks: DataFrame, a: str, b: str) -> DataFrame:
    """One Arrow pass applying merge_pair_greedy to every token array."""

    def run(batches):
        import pandas as pd

        for pdf in batches:
            yield pd.DataFrame(
                {
                    "id": pdf["id"],
                    "t": [merge_pair_greedy(list(t), a, b) for t in pdf["t"]],
                }
            )

    id_type = dict(toks.dtypes)["id"]
    return toks.mapInPandas(run, f"id {id_type}, t array<string>")


def _pair_counts(toks: DataFrame) -> DataFrame:
    """(a, b, n) adjacent-pair counts over token arrays — map-side
    explode + partial-aggregated groupBy, no window."""
    pairs = F.when(
        F.size("t") >= 2,
        F.zip_with(
            F.slice("t", 1, F.size("t") - 1),
            F.slice("t", 2, F.size("t") - 1),
            lambda x, y: F.struct(x.alias("a"), y.alias("b")),
        ),
    ).otherwise(F.array().cast("array<struct<a:string,b:string>>"))
    return (
        toks.select(F.explode(pairs).alias("p"))
        .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
        .agg(F.count(F.lit(1)).alias("n"))
    )


def bpe_train_merges(
    docs: DataFrame, col: str, id_col: str, k: int = 4
) -> DataFrame:
    """Train ``k`` BPE merges over the corpus; returns the merge table
    (round, pair, n) — round 1-based, n = the pair's count at pick time,
    tie-break (n DESC, a ASC, b ASC) on the pair's COMPONENTS: the
    space-joined string is ambiguous once merged units contain spaces
    (('a b','c') and ('a','b c') both join to 'a b c'), so ordering on
    it could let Spark and the oracle pick different winners on a count
    tie and diverge every subsequent round.

    100 TB shape: the trainer state (current token arrays) stays
    distributed; only the single winning pair crosses to the driver per
    round. k rounds = k shuffles (pair counts) + k Arrow passes — the
    irreducible data-parallel BPE schedule (each round's counts depend
    on the previous round's merge)."""
    spark = docs.sparkSession
    cur = docs.select(
        F.col(id_col).alias("id"), clean_tokens(col).alias("t")
    ).localCheckpoint(eager=True)
    merges: list[tuple[int, str, int]] = []
    for rnd in range(1, k + 1):
        top = (
            _pair_counts(cur)
            .withColumn("pair", F.concat_ws(" ", "a", "b"))
            .orderBy(F.col("n").desc(), F.col("a").asc(), F.col("b").asc())
            .limit(1)
            .collect()
        )
        if not top:
            break  # corpus exhausted (every doc down to one token)
        row = top[0]
        merges.append((rnd, row["pair"], row["n"]))
        if rnd < k:
            cur = _merge_pass(cur, row["a"], row["b"]).localCheckpoint(
                eager=True
            )
    return local_frame(spark, merges, "round int, pair string, n long")


def bpe_train_encode(
    docs: DataFrame, col: str, id_col: str, k: int = 4
) -> DataFrame:
    """Train ``k`` merges (bpe_train_merges' loop, same tie-break) and
    apply ALL of them — the trainer's final state IS the encoded corpus,
    so this is train+encode in one schedule: k count-shuffles, k scalar
    winner collects, k Arrow merge passes, nothing else crossing to the
    driver. Returns (id, n_tokens, enc) with ``enc`` the '|'-joined
    token sequence (merged units keep their internal spaces, so the
    join is unambiguous — clean_tokens emits no '|').

    Encoding a NEW corpus with an existing merge table is the same
    _merge_pass chain minus the counting: broadcast the (a, b) list and
    replay rank order inside one Arrow pass (what production tokenizers
    do per document)."""
    cur = docs.select(
        F.col(id_col).alias("id"), clean_tokens(col).alias("t")
    ).localCheckpoint(eager=True)
    for _rnd in range(1, k + 1):
        top = (
            _pair_counts(cur)
            .orderBy(F.col("n").desc(), F.col("a").asc(), F.col("b").asc())
            .limit(1)
            .collect()
        )
        if not top:
            break
        cur = _merge_pass(cur, top[0]["a"], top[0]["b"]).localCheckpoint(
            eager=True
        )
    return cur.select(
        "id",
        F.size("t").cast("int").alias("n_tokens"),
        F.array_join("t", "|").alias("enc"),
    )


def _sql_bpe_parts(
    table: str, col: str, k: int, replay_last: bool, id_expr: str
) -> list[str]:
    """Shared CTE-chain generator: winner levels w1..wk, greedy-merge
    replays t1..t{k-1} (and t{k} when ``replay_last`` — the encoder
    needs the final state, the trainer only the winners)."""
    parts = [
        f"""t0 AS (
  SELECT {id_expr} AS id, {sql_clean_tokens(col)} AS t
  FROM {table}
)"""
    ]
    for j in range(1, k + 1):
        prev = f"t{j - 1}"
        parts.append(
            f"""p{j} AS (
  SELECT t[i] AS a, t[i + 1] AS b, count(*) AS n
  FROM (SELECT t, unnest(generate_series(1, len(t) - 1)) AS i
        FROM {prev} WHERE len(t) >= 2)
  GROUP BY 1, 2
),
w{j} AS (
  SELECT a, b, a || ' ' || b AS pair, n
  FROM p{j} ORDER BY n DESC, a ASC, b ASC LIMIT 1
)"""
        )
        if j < k or replay_last:
            parts.append(
                f"""pos{j} AS (
  SELECT s.id, s.i, s.t[s.i] AS tok, w.a AS wa, w.b AS wb,
         coalesce(s.t[s.i] = w.a AND s.t[s.i + 1] = w.b, FALSE) AS m
  FROM (SELECT id, t, unnest(generate_series(1, len(t))) AS i
        FROM {prev}) s LEFT JOIN w{j} w ON TRUE
),
isl{j} AS (
  SELECT *, i - row_number() OVER (
           PARTITION BY id, m ORDER BY i) AS grp
  FROM pos{j}
),
mrk{j} AS (
  SELECT *, m AND (i - min(i) OVER (PARTITION BY id, m, grp)) % 2 = 0
           AS merge_at
  FROM isl{j}
),
emit{j} AS (
  SELECT *, coalesce(lag(merge_at) OVER (
          PARTITION BY id ORDER BY i), FALSE) AS merged_prev
  FROM mrk{j}
),
t{j} AS (
  SELECT s.id,
         list(CASE WHEN s.merge_at THEN s.wa || ' ' || s.wb
                   ELSE s.tok END ORDER BY s.i) AS t
  FROM emit{j} s
  WHERE NOT s.merged_prev
  GROUP BY s.id
)"""
            )
    return parts


def sql_bpe_train_merges(table: str, col: str, k: int = 4) -> str:
    """Oracle twin: a generated k-level CTE chain where every level
    recomputes the winner and replays the greedy merge with
    gaps-and-islands arithmetic (merge at a match position iff its
    offset inside a maximal consecutive-match streak is even — streaks
    longer than 1 only occur for self-pairs, where greedy keeps the
    even offsets)."""
    parts = _sql_bpe_parts(
        table, col, k, replay_last=False, id_expr="row_number() OVER ()"
    )
    unions = " UNION ALL ".join(
        f"SELECT {j} AS round, pair, CAST(n AS BIGINT) AS n FROM w{j}"
        for j in range(1, k + 1)
    )
    return (
        "WITH "
        + ",\n".join(parts)
        + f"\nSELECT * FROM ({unions}) ORDER BY round"
    )


def sql_bpe_train_encode(
    table: str, col: str, id_col: str, k: int = 4
) -> str:
    """Oracle twin of bpe_train_encode: the same winner/replay chain
    carried through the FINAL merge, projected per document. Documents
    whose token array came up empty (clean_tokens of symbol-only text)
    still emit a row with n_tokens = 0 — the replay GROUP BY would drop
    them, so they re-enter via the anti-joined t0 base."""
    parts = _sql_bpe_parts(
        table, col, k, replay_last=True, id_expr=id_col
    )
    return (
        "WITH "
        + ",\n".join(parts)
        + f"""
SELECT id, CAST(len(t) AS INT) AS n_tokens,
       array_to_string(t, '|') AS enc
FROM t{k}
UNION ALL
SELECT id, 0 AS n_tokens, '' AS enc
FROM t0
WHERE len(t) = 0
"""
    )
