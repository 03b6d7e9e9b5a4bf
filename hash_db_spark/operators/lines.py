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
    anti-join against the bounded hot set)."""
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


# ---------------------------------------------------------------------------
# DuckDB oracle twins. The oracle optimizes for CLARITY (row_number
# window) where the Spark plan optimizes for scale (min-struct partial
# agg) — both select the lexicographically-first (id, line_idx) per
# line value, so results are bit-identical.
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
