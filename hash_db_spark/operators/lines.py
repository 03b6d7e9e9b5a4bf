"""Line-level corpus dedup — global first-occurrence line dedup and
boilerplate-line stripping, each with document reassembly.

No reference counterpart (the reference stores and returns whole
values; see /root/reference/server.py:54-1170 for its query surface) —
these are the CCNet/C4-style cleanup stages between crawl extraction
and training: a line that repeats across the corpus is kept exactly
once at its first occurrence (line dedup), and a line that appears in
more than a doc-frequency cap of documents (navigation chrome, cookie
banners, licence footers) is dropped wholesale (boilerplate strip).

The operators take a LINE FRAME ``(id, line_idx, line)`` — any
splitter works (``split(text, '\\n')`` on real corpora; the registry
instantiation uses fixed-stride token windows from
``chunking.token_chunks`` because the synthetic fixture is
single-line text with no delimiter structure).

Plan shapes (100 TB):

* ``dedup_lines`` is ONE groupBy on the line value with a
  ``min(struct(id, line_idx))`` aggregate — fully map-side
  combinable, so a boilerplate line with a billion instances ships
  one partial row per map task, never a billion rows, to the reduce
  side. No window (a ``row_number() OVER (PARTITION BY line)`` sort
  funnels every instance of a hot line through one task; the
  commutative min does not).
* ``boilerplate_lines`` doc-frequency counts ride the same shuffle
  shape (two-phase distinct on (line, id)).
* The hot-line set is broadcast for the strip anti-join: each hot
  line has > ``max_doc_freq`` instances, so |hot| is bounded by
  total_instances / max_doc_freq — the same bound that keeps the
  n-gram hot-shingle list broadcastable (dedup.ngram_jaccard_pairs).
* Reassembly is one groupBy per doc id over surviving instances
  (collect_list + sort — per-doc arrays are line-count bounded).

Documents whose every line is dropped vanish from the reassembled
output on BOTH sides (they are pure duplicates / pure boilerplate);
callers that need tombstones left-join the result against the source.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def dedup_lines(lines: DataFrame) -> DataFrame:
    """Global first-occurrence survivors of ``(id, line_idx, line)``:
    for each distinct line value, the instance with the smallest
    (id, line_idx) wins. One map-side-combinable shuffle."""
    return (
        lines.groupBy("line")
        .agg(F.min(F.struct("id", "line_idx")).alias("k"))
        .select(F.col("k.id").alias("id"), F.col("k.line_idx").alias("line_idx"), "line")
    )


def boilerplate_lines(lines: DataFrame, max_doc_freq: int) -> DataFrame:
    """Line values appearing in more than ``max_doc_freq`` DISTINCT
    documents. Output is one row per hot line — bounded by
    total_instances / max_doc_freq, hence broadcastable."""
    return (
        lines.select("line", "id")
        .distinct()
        .groupBy("line")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") > max_doc_freq)
        .select("line")
    )


def strip_boilerplate(lines: DataFrame, max_doc_freq: int) -> DataFrame:
    """Line instances that survive the boilerplate cap (broadcast
    anti-join against the bounded hot set).

    The line frame is materialized once: it feeds BOTH the hot-line
    aggregation and the anti-join left side, and the two subtrees share
    no exchange Catalyst could reuse, so un-materialized the whole
    upstream line derivation (tokenize → chunk explode) executes twice.
    Measured build+exec at sf0.1: strip 1.42 → 1.26s, clean_prep
    1.58 → 1.33s. The line table is the natural persisted artifact of a
    CCNet-style cleanup stage (same precedent as the CDC chunk table)."""
    lines = lines.localCheckpoint(eager=True)
    hot = boilerplate_lines(lines, max_doc_freq)
    return lines.join(F.broadcast(hot), "line", "left_anti").select(
        "id", "line_idx", "line"
    )


def reassemble_docs(survivors: DataFrame) -> DataFrame:
    """(id, clean_text, n_kept): surviving lines re-joined in original
    line order. Docs with zero survivors are absent."""
    parts = F.transform(
        F.array_sort(F.collect_list(F.struct("line_idx", "line"))),
        lambda s: s.line,
    )
    return survivors.groupBy("id").agg(
        F.array_join(parts, " ").alias("clean_text"),
        F.count(F.lit(1)).alias("n_kept"),
    )


def line_dedup_docs(lines: DataFrame) -> DataFrame:
    """Corpus-global line dedup, reassembled per document."""
    return reassemble_docs(dedup_lines(lines))


def strip_boilerplate_docs(lines: DataFrame, max_doc_freq: int) -> DataFrame:
    """Boilerplate-stripped documents, reassembled."""
    return reassemble_docs(strip_boilerplate(lines, max_doc_freq))


def line_clean_prep(
    lines: DataFrame, max_doc_freq: int, min_lines: int = 2
) -> DataFrame:
    """The composed line-level cleanup a crawl pipeline actually runs,
    as ONE Catalyst plan: boilerplate strip (corpus-frequency cap) →
    global first-occurrence line dedup → document reassembly → drop
    docs left with fewer than ``min_lines`` lines. No driver hops;
    three shuffles total (hot-line agg folds into the strip's
    broadcast, dedup min-struct agg, reassembly by doc)."""
    surv = dedup_lines(strip_boilerplate(lines, max_doc_freq))
    return reassemble_docs(surv).filter(F.col("n_kept") >= min_lines)


def line_containment_pairs(
    lines: DataFrame,
    threshold: float = 0.9,
    max_doc_freq: int = 1000,
) -> DataFrame:
    """Document pairs whose DISTINCT-line sets overlap by at least
    ``threshold`` of the smaller set: containment =
    |lines(A) ∩ lines(B)| / min(|lines(A)|, |lines(B)|). The text
    analog of the image-in-video containment join — catches a doc
    quoted wholesale inside a larger one, which symmetric Jaccard
    misses when the host doc is much bigger.

    Candidate generation follows the hot-postings discipline of
    ``dedup.ngram_jaccard_pairs`` (kept STANDALONE rather than shared:
    that function's shape is driver-verified and this module must not
    taint it): lines with doc-frequency > ``max_doc_freq`` are dropped
    from the equijoin (a line in k docs contributes k² candidate rows —
    boilerplate is a quadratic skew bomb), then the intersection count
    is corrected with per-doc hot-line sets, so the reported
    containment is exact whenever a pair shares at least one non-hot
    line. Returns (id_a, id_b, containment) with id_a < id_b, 6dp.
    """
    # Per-doc distinct-line sets in ONE groupBy (map-side partial via
    # collect_set), size carried into the postings map-side — replaces
    # a distinct + per-doc count + join-back (three shuffles) with one
    # shuffle, the same shape ngram_jaccard_pairs uses for shingles.
    arr = lines.groupBy("id").agg(F.collect_set("line").alias("ls"))
    posts = arr.select(
        "id", F.size("ls").alias("sz"), F.explode("ls").alias("line")
    )
    hot = (
        posts.groupBy("line")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") > max_doc_freq)
        .select("line")
        .cache()
    )
    has_hot = hot.count() > 0
    capped = (
        posts.join(F.broadcast(hot), "line", "left_anti") if has_hot else posts
    )
    a, b = capped.alias("a"), capped.alias("b")
    pair_inter = (
        a.join(
            b,
            (F.col("a.line") == F.col("b.line"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(
            F.count(F.lit(1)).alias("inter_c"),
            F.min("a.sz").alias("sz_a"),
            F.min("b.sz").alias("sz_b"),
        )
    )
    if has_hot:
        hot_sets = (
            posts.join(F.broadcast(hot), "line", "left_semi")
            .groupBy("id")
            .agg(F.collect_set("line").alias("hs"))
        )
        empty = F.array().cast("array<string>")
        pair_inter = (
            pair_inter.join(
                hot_sets.select(F.col("id").alias("id_a"), F.col("hs").alias("hs_a")),
                "id_a",
                "left",
            )
            .join(
                hot_sets.select(F.col("id").alias("id_b"), F.col("hs").alias("hs_b")),
                "id_b",
                "left",
            )
            .withColumn(
                "inter_c",
                F.col("inter_c")
                + F.size(
                    F.array_intersect(
                        F.coalesce(F.col("hs_a"), empty),
                        F.coalesce(F.col("hs_b"), empty),
                    )
                ),
            )
        )
    cont = F.round(
        F.col("inter_c").cast("double") / F.least("sz_a", "sz_b"), 6
    ).alias("containment")
    return (
        pair_inter.select("id_a", "id_b", cont)
        .filter(F.col("containment") >= threshold)
    )


# ---------------------------------------------------------------------------
# DuckDB oracle twins. The oracle optimizes for CLARITY (row_number
# window / NOT IN) where the Spark plan optimizes for scale (min-struct
# partial agg, capped joins) — results are bit-identical.
# ---------------------------------------------------------------------------


def sql_line_dedup_docs(lines_cte: str) -> str:
    """``lines_cte`` must define a relation ``lines(id, line_idx, line)``."""
    return f"""
WITH {lines_cte},
ranked AS (
  SELECT id, line_idx, line,
         row_number() OVER (PARTITION BY line ORDER BY id, line_idx) AS rn
  FROM lines
),
surv AS (SELECT id, line_idx, line FROM ranked WHERE rn = 1)
SELECT id,
       string_agg(line, ' ' ORDER BY line_idx) AS clean_text,
       CAST(count(*) AS BIGINT) AS n_kept
FROM surv GROUP BY id
"""


def sql_line_containment_pairs(
    lines_cte: str, threshold: float = 0.9, max_doc_freq: int = 1000
) -> str:
    return f"""
WITH {lines_cte},
ds AS (SELECT DISTINCT id, line FROM lines),
sz AS (SELECT id, count(*) AS sz FROM ds GROUP BY id),
hot AS (
  SELECT line FROM (SELECT line, count(*) AS df FROM ds GROUP BY line)
  WHERE df > {max_doc_freq}
),
capped AS (SELECT * FROM ds WHERE line NOT IN (SELECT line FROM hot)),
pair_inter AS (
  SELECT a.id AS id_a, b.id AS id_b, count(*) AS inter_c
  FROM capped a JOIN capped b ON a.line = b.line AND a.id < b.id
  GROUP BY a.id, b.id
),
hot_sets AS (
  SELECT id, list(line) AS hs FROM ds
  WHERE line IN (SELECT line FROM hot) GROUP BY id
),
scored AS (
  SELECT id_a, id_b,
         inter_c + len(list_intersect(COALESCE(ha.hs, []), COALESCE(hb.hs, [])))
           AS i,
         sa.sz AS sz_a, sb.sz AS sz_b
  FROM pair_inter
  JOIN sz sa ON sa.id = id_a
  JOIN sz sb ON sb.id = id_b
  LEFT JOIN hot_sets ha ON ha.id = id_a
  LEFT JOIN hot_sets hb ON hb.id = id_b
)
SELECT id_a, id_b,
       round(CAST(i AS DOUBLE) / least(sz_a, sz_b), 6) AS containment
FROM scored
WHERE round(CAST(i AS DOUBLE) / least(sz_a, sz_b), 6) >= {threshold}
"""


def sql_strip_boilerplate_docs(lines_cte: str, max_doc_freq: int) -> str:
    return f"""
WITH {lines_cte},
hot AS (
  SELECT line
  FROM (SELECT line, count(DISTINCT id) AS df FROM lines GROUP BY line)
  WHERE df > {max_doc_freq}
),
surv AS (
  SELECT id, line_idx, line FROM lines
  WHERE line NOT IN (SELECT line FROM hot)
)
SELECT id,
       string_agg(line, ' ' ORDER BY line_idx) AS clean_text,
       CAST(count(*) AS BIGINT) AS n_kept
FROM surv GROUP BY id
"""


def sql_line_clean_prep(
    lines_cte: str, max_doc_freq: int, min_lines: int = 2
) -> str:
    return f"""
WITH {lines_cte},
hot AS (
  SELECT line
  FROM (SELECT line, count(DISTINCT id) AS df FROM lines GROUP BY line)
  WHERE df > {max_doc_freq}
),
stripped AS (
  SELECT id, line_idx, line FROM lines
  WHERE line NOT IN (SELECT line FROM hot)
),
ranked AS (
  SELECT id, line_idx, line,
         row_number() OVER (PARTITION BY line ORDER BY id, line_idx) AS rn
  FROM stripped
),
surv AS (SELECT id, line_idx, line FROM ranked WHERE rn = 1)
SELECT id,
       string_agg(line, ' ' ORDER BY line_idx) AS clean_text,
       CAST(count(*) AS BIGINT) AS n_kept
FROM surv GROUP BY id
HAVING count(*) >= {min_lines}
"""
