"""Deduplication operators for training-data pipelines (SURVEY §7 Phase 6).

No reference counterpart (BASELINE.json north-star capability). Five
strategies, all shuffle-architected for 100 TB:

- exact:        md5-fingerprint groupBy — one shuffle on a 32-char key.
- n-gram Jaccard: shingle-explode + shingle-equijoin candidate generation —
                the join key is the shingle, so only docs *sharing* a
                shingle ever meet; no cross join.
- MinHash+LSH:  md5-family signatures, banded; candidates meet on
                (band_idx, band_key) equijoin then verify with true Jaccard.
                The classic Broder scheme — at 100 TB this is the only
                near-dup strategy whose shuffle is O(docs × bands).
- SimHash:      32-bit token-hash sign aggregate; candidate pairs meet on
                any equal signature byte (4 buckets/doc), verified by
                hamming distance.
- embedding:    cosine-threshold pairs (brute force here; LSH/IVF variants
                in operators/similarity.py are the scale path).

Hash discipline: every hash is derived from md5 hex (first 8 nibbles →
int64 via base-16 conv), which DuckDB reproduces exactly as
``('0x' || substr(md5(x),1,8))::BIGINT`` — so every operator here is
oracle-checkable. Spark's built-in xxhash64/hash are NOT used because the
oracle cannot reproduce them.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
import pyspark.sql.functions as F

from hash_db_spark.functions.text import fingerprint, sql_fingerprint

from hash_db_spark.localframe import local_frame

# ---------------------------------------------------------------------------
# shared hash helpers (Spark Column + DuckDB SQL renderings)
# ---------------------------------------------------------------------------


# Target payload bytes per CPU-bound Python task. A flat
# defaultParallelism fan-out over-splits bench-scale corpora into tasks
# whose Python/Arrow setup rivals the work: interleaved A/B at sf0.1
# measured 32-way vs ~10-16-way exec as 0.93/0.74 (ngram_jaccard),
# 0.90/0.61 (top_ngrams), 1.14/0.80 (contamination), 0.75/0.61
# (minhash). Deriving the count from the plan-statistics size keeps
# small inputs coarse; TB-scale scans still clamp to full parallelism.
SPREAD_CPU_TARGET_BYTES = 64 * 1024


def spread_for_cpu(df: DataFrame) -> DataFrame:
    """Round-robin repartition when the source has fewer splits than the
    CPU-bound stage wants. Shingling/hashing is CPU-bound; a compact
    columnar source (one small parquet split) would otherwise serialize
    the whole derivation on one task. The fan-out comes from Catalyst's
    sizeInBytes estimate (driver-side statistic, no extra job), clamped
    to [1, defaultParallelism] — AQE cannot size this exchange because
    it coalesces on post-shuffle bytes while the cost here is per-row
    Python CPU. No-op when the scan is already parallel enough (the
    100 TB case — thousands of splits), so the raw text is not shuffled
    for nothing. Measured 2.6x on the minhash pipeline at sf0.1 vs no
    spread at all."""
    want = df.sparkSession.sparkContext.defaultParallelism
    # _jdf.queryExecution() is private API (pyspark-version-fragile);
    # acceptable here because a stats failure must never fail the query —
    # fall back to full parallelism, the pre-r11 behavior.
    try:
        stats = df._jdf.queryExecution().optimizedPlan().stats()
        est = int(stats.sizeInBytes())
        n = max(1, min(want, -(-est // SPREAD_CPU_TARGET_BYTES)))
        # sizeInBytes can badly undershoot for non-scan inputs (e.g. a
        # one-row-estimated subplan); when the row count IS known, floor
        # the fan-out so a bad size estimate cannot collapse the
        # CPU-bound Python stage onto ~1 task (ADVICE r11).
        rc = stats.rowCount()
        if rc.isDefined():
            n = max(n, min(want, int(rc.get().longValue()) // 2048))
    except Exception:
        n = want
    if n <= 1:
        # repartition(1) can never be needed; skip the RDD conversion
        # (getNumPartitions forces physical planning on the driver).
        return df
    if df.rdd.getNumPartitions() < n:
        return df.repartition(n)
    return df


def md5_hash64(c: Column) -> Column:
    """First 32 bits of md5 as a non-negative int64 — cross-engine stable."""
    return F.conv(F.substring(F.md5(c), 1, 8), 16, 10).cast("long")


def sql_md5_hash64(expr: str) -> str:
    return f"('0x' || substr(md5({expr}), 1, 8))::BIGINT"


def clean_tokens(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.filter(
        F.split(F.regexp_replace(c, ",", ""), " "), lambda x: x != ""
    )


def adjacent_pairs_from_tokens(toks: Column) -> Column:
    """adjacent_token_pairs over an ALREADY-tokenized array column.
    Callers that can stage the token array as a named projection column
    should use this form: the when/slice/zip_with tree references its
    input five times, and conditionally-evaluated subtrees escape
    codegen CSE (the lang-id/ewma class, optimization r11), so an
    inlined clean_tokens would re-tokenize up to five times per row."""
    return F.when(
        F.size(toks) >= 2,
        F.zip_with(
            F.slice(toks, 1, F.size(toks) - 1),
            F.slice(toks, 2, F.size(toks) - 1),
            lambda a, b: F.concat_ws(" ", a, b),
        ),
    ).otherwise(F.array().cast("array<string>"))


def adjacent_token_pairs(col: Column | str) -> Column:
    """'tok_i tok_i+1' strings for every ADJACENT token position —
    positional (repeats count), unlike the distinct shingles() used for
    dedup. The BPE merge-candidate unit; shared by the registry query
    and its property test so they can't drift apart. Guarded: Spark's
    sequence/slice would count DOWN on a sub-2-token doc."""
    return adjacent_pairs_from_tokens(clean_tokens(col))


def sql_clean_tokens(col: str) -> str:
    return f"list_filter(string_split(replace({col}, ',', ''), ' '), x -> x != '')"


def shingles(col: Column | str, n: int = 3) -> Column:
    """Distinct word n-gram shingles ('a b c' strings). Empty when the
    document has fewer than n tokens (guarded: Spark's sequence(1, 0)
    would count *down*)."""
    toks = clean_tokens(col)
    idx = F.sequence(F.lit(1), F.size(toks) - (n - 1))
    grams = F.transform(idx, lambda i: F.array_join(F.slice(toks, i, n), " "))
    return F.when(F.size(toks) >= n, F.array_distinct(grams)).otherwise(
        F.array().cast("array<string>")
    )


def shingle_frame(
    df: DataFrame,
    col: str,
    id_col: str,
    n: int = 3,
    with_hash: bool = False,
    keep: tuple[str, ...] = (),
) -> DataFrame:
    """(id, sh[, hsh][, *keep]) in ONE Arrow pass: tokenize, n-gram,
    distinct — plus optionally hsh = md5-derived int64 per shingle
    (bit-identical to the ``md5_hash64`` Column and ``sql_md5_hash64``).
    ``keep`` columns pass through untouched (lets callers thread a batch
    flag through the pass instead of paying a join to re-attach it).

    Why not the ``shingles()`` Column expression: Spark evaluates
    higher-order array functions interpreted, and the lambda's captured
    token-split chain is re-evaluated per gram — measured ~28ms/doc for
    50-token docs at sf0.1 (4-5x the whole pipeline budget). The Python
    loop does the same work at ~20µs/doc; tokenization is character-
    identical to ``clean_tokens``/``sql_clean_tokens`` (commas removed,
    split on single spaces, empty tokens dropped), so DuckDB oracles
    written against ``sql_shingles`` stay exact."""
    import hashlib

    id_type = df.schema[id_col].dataType.simpleString()
    schema = f"id {id_type}, sh array<string>"
    if with_hash:
        schema += ", hsh array<bigint>"
    for k in keep:
        schema += f", {k} {df.schema[k].dataType.simpleString()}"

    def block(batches):
        import pandas as pd

        for pdf in batches:
            ids, shs, hshs = [], [], []
            for i, t in zip(pdf[id_col], pdf[col]):
                # NULL text arrives as None OR float NaN in the Arrow
                # batch; NaN is truthy, so `t or ""` alone would crash
                # on .replace (same guard as token_gram_posts).
                if not isinstance(t, str):
                    t = ""
                toks = [x for x in t.replace(",", "").split(" ") if x]
                grams = (
                    list(
                        dict.fromkeys(
                            " ".join(toks[j : j + n])
                            for j in range(len(toks) - n + 1)
                        )
                    )
                    if len(toks) >= n
                    else []
                )
                ids.append(i)
                shs.append(grams)
                if with_hash:
                    hshs.append(
                        [
                            int(hashlib.md5(g.encode()).hexdigest()[:8], 16)
                            for g in grams
                        ]
                    )
            out = {"id": ids, "sh": shs}
            if with_hash:
                out["hsh"] = hshs
            for k in keep:
                out[k] = pdf[k]
            yield pd.DataFrame(out)

    return (
        spread_for_cpu(df)
        .select(id_col, col, *keep)
        .mapInPandas(block, schema)
    )


def sql_shingles(col: str, n: int = 3) -> str:
    toks = sql_clean_tokens(col)
    parts = " || ' ' || ".join(f"t.toks[i+{k}]" for k in range(n))
    return (
        f"(SELECT list_distinct(list_transform("
        f"generate_series(1, len(t.toks)-{n - 1}), i -> {parts}))"
        f" FROM (SELECT {toks} AS toks) t)"
    )


# ---------------------------------------------------------------------------
# 1. exact dedup
# ---------------------------------------------------------------------------


def exact_dup_groups(df: DataFrame, col: str, id_col: str) -> DataFrame:
    """Groups of byte-identical (normalized) values: fingerprint, group
    size, and the kept (minimum) id. One shuffle on the fingerprint."""
    return (
        df.select(F.col(id_col), fingerprint(col).alias("fp"))
        .groupBy("fp")
        .agg(F.count(F.lit(1)).alias("cnt"), F.min(id_col).alias("keep_id"))
        .filter(F.col("cnt") > 1)
    )


def exact_dedup_keep_first(df: DataFrame, col: str, id_col: str) -> DataFrame:
    """The ids that survive exact dedup (min id per fingerprint)."""
    return (
        df.select(F.col(id_col), fingerprint(col).alias("fp"))
        .groupBy("fp")
        .agg(F.min(id_col).alias("keep_id"))
        .select("keep_id", "fp")
    )


# ---------------------------------------------------------------------------
# 2. n-gram Jaccard near-dup
# ---------------------------------------------------------------------------


NGRAM_MAX_DOC_FREQ = 1000


def ngram_jaccard_pairs(
    df: DataFrame,
    col: str,
    id_col: str,
    n: int = 3,
    threshold: float = 0.5,
    max_doc_freq: int = NGRAM_MAX_DOC_FREQ,
) -> DataFrame:
    """Near-dup pairs by true Jaccard over distinct n-gram shingles.

    Candidate generation is a shingle equijoin (docs meet only on shared
    shingles) with a **document-frequency cap**: a shingle shared by k
    documents contributes k² candidate rows, so one stop-word shingle
    ('of the and' at corpus scale) is a quadratic skew bomb. Shingles with
    doc-frequency > max_doc_freq are dropped from candidate generation
    (standard hot-postings pruning); verification then computes the TRUE
    Jaccard from the full shingle arrays, so the cap never distorts a
    reported score — it can only miss a pair whose *every* shared shingle
    is hotter than the cap, which at threshold >= 0.5 means near-identical
    boilerplate that the MinHash path still catches.

    The intersection is counted directly on the capped self-join (one
    groupBy on the pair — no candidate distinct, no re-join against the
    full shingle arrays) and then corrected with the per-doc HOT shingle
    sets, which are bounded by |hot| per doc — so the reported jaccard is
    the TRUE jaccard whenever the pair shares at least one non-hot
    shingle. Returns (id_a, id_b, jac) with id_a < id_b, jac at 6dp.

    Measured negative result (kept for the record): PPJoin-style prefix
    filtering (df-ascending order, |s|-ceil(t|s|)+1 prefixes) was tried
    and REVERTED — on this fixture's 31-token vocabulary every shingle
    is common, so prefixes still collide while the extra freq-join +
    per-doc window shuffles cost 1.6x (9.4s vs 5.8s at sf0.1). On a
    Zipfian real corpus prefixes hold near-unique shingles and the
    technique wins; re-evaluate against real data before 100 TB.

    100 TB usage note: this is a CANDIDATE GENERATOR, not a terminal
    operator. A duplicate-heavy corpus has pair counts quadratic in its
    cluster sizes, so *persisting* the pair set is the scale-killer even
    when the plan is right. The scale-safe consumption path composes it
    straight into connected_components / apply_dedup_keep (see
    ``train_prep`` / ``dedup_apply_keep`` / ``dedup_rate_report``) so
    pairs stream into the clustering shuffle without materializing.
    """
    # Cached: the shingle arrays feed the postings (twice on the hot path).
    # Doc size rides along with every posting (4 bytes) so the verify step
    # reads it from the self-join output instead of re-joining a per-doc
    # sizes frame twice.
    sh_arr = (
        shingle_frame(df, col, id_col, n)
        .filter(F.size("sh") > 0)
        .cache()
    )
    posts = sh_arr.select(
        "id", F.size("sh").alias("sz"), F.explode("sh").alias("s")
    )
    hot = (
        posts.groupBy("s")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") > max_doc_freq)
        .select("s")
        .cache()
    )
    # Runtime branch (AQE-style): the hot list is bounded small relative to
    # postings (|hot| <= postings/max_doc_freq) but counting it is one cheap
    # job, and on corpora with NO hot shingles the entire correction
    # machinery — broadcast anti-join, per-doc hot sets, two left joins —
    # drops out of the plan. Both branches are result-identical; the oracle
    # SQL covers the general shape.
    has_hot = hot.count() > 0
    capped = (
        posts.join(F.broadcast(hot), "s", "left_anti") if has_hot else posts
    )
    a, b = capped.alias("a"), capped.alias("b")
    pair_inter = (
        a.join(b, (F.col("a.s") == F.col("b.s")) & (F.col("a.id") < F.col("b.id")))
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(
            F.count(F.lit(1)).alias("inter_c"),
            # sz is functionally dependent on id — min() just picks it.
            F.min("a.sz").alias("sz_a"),
            F.min("b.sz").alias("sz_b"),
        )
    )
    if not has_hot:
        inter = F.col("inter_c")
        pair = pair_inter.withColumn(
            "jac",
            F.round(
                inter.cast("double") / (F.col("sz_a") + F.col("sz_b") - inter), 6
            ),
        )
        return pair.filter(F.col("jac") >= threshold).select(
            "id_a", "id_b", "jac"
        )
    # Per-doc hot-shingle sets: skinny (<= |hot| entries per doc), join by
    # id — NOT broadcast (a stop-word shingle is hot in most docs, so this
    # frame can approach corpus cardinality at scale).
    hot_sets = (
        posts.join(F.broadcast(hot), "s", "left_semi")
        .groupBy("id")
        .agg(F.collect_set("s").alias("hs"))
    )
    empty = F.array().cast("array<string>")
    inter = F.col("inter_c") + F.size(
        F.array_intersect(
            F.coalesce(F.col("hs_a"), empty), F.coalesce(F.col("hs_b"), empty)
        )
    )
    pair = (
        pair_inter
        .join(hot_sets.select(F.col("id").alias("id_a"), F.col("hs").alias("hs_a")), "id_a", "left")
        .join(hot_sets.select(F.col("id").alias("id_b"), F.col("hs").alias("hs_b")), "id_b", "left")
        .withColumn(
            "jac",
            F.round(inter.cast("double") / (F.col("sz_a") + F.col("sz_b") - inter), 6),
        )
    )
    return pair.filter(F.col("jac") >= threshold).select("id_a", "id_b", "jac")


def sql_ngram_jaccard_pairs(
    table: str,
    col: str,
    id_col: str,
    n: int = 3,
    threshold: float = 0.5,
    max_doc_freq: int = NGRAM_MAX_DOC_FREQ,
) -> str:
    return f"""
WITH sh0 AS (
  SELECT {id_col} AS id, {sql_shingles(col, n)} AS sh FROM {table}
),
nonempty AS (SELECT * FROM sh0 WHERE len(sh) > 0),
posts AS (SELECT id, unnest(sh) AS s FROM nonempty),
hot AS (
  SELECT s FROM (SELECT s, count(*) AS df FROM posts GROUP BY s)
  WHERE df > {max_doc_freq}
),
capped AS (SELECT * FROM posts WHERE s NOT IN (SELECT s FROM hot)),
pair_inter AS (
  SELECT a.id AS id_a, b.id AS id_b, count(*) AS inter_c
  FROM capped a JOIN capped b ON a.s = b.s AND a.id < b.id
  GROUP BY a.id, b.id
),
hot_sets AS (
  SELECT id, list(s) AS hs FROM posts WHERE s IN (SELECT s FROM hot) GROUP BY id
),
sizes AS (SELECT id, len(sh) AS sz FROM nonempty),
scored AS (
  SELECT id_a, id_b,
         inter_c + len(list_intersect(COALESCE(ha.hs, []), COALESCE(hb.hs, []))) AS i,
         sa.sz AS sz_a, sb.sz AS sz_b
  FROM pair_inter
  JOIN sizes sa ON sa.id = id_a
  JOIN sizes sb ON sb.id = id_b
  LEFT JOIN hot_sets ha ON ha.id = id_a
  LEFT JOIN hot_sets hb ON hb.id = id_b
)
SELECT id_a, id_b,
       round(CAST(i AS DOUBLE) / (sz_a + sz_b - i), 6) AS jac
FROM scored
WHERE round(CAST(i AS DOUBLE) / (sz_a + sz_b - i), 6) >= {threshold}
"""


def repeated_ngram_spans(
    df: DataFrame,
    col: str,
    id_col: str,
    n: int = 8,
    min_docs: int = 2,
) -> DataFrame:
    """Long token spans (n-grams, n >= ~8) that recur across documents —
    the signal behind exact-substring dedup (memorized boilerplate,
    licenses, quoted passages repeat verbatim across crawled pages, and
    repeated long spans are what a model memorizes).

    Returns (gram, n_docs, doc_ids) for spans in >= min_docs documents,
    doc_ids sorted ascending (deterministic cross-engine).

    Plan shape: one Arrow shingling pass + one shuffle on the gram.
    shingle_frame emits DISTINCT grams per doc, so n_docs is a plain
    count. collect_set is bounded by the span's document frequency; for
    a downstream "cut every doc containing a hot span" rule, drop the
    doc_ids column and the aggregate is a pure count (map-side partial).
    """
    posts = shingle_frame(df, col, id_col, n).select(
        "id", F.explode("sh").alias("gram")
    )
    return (
        posts.groupBy("gram")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sort_array(F.collect_set("id")).alias("doc_ids"),
        )
        .filter(F.col("n_docs") >= min_docs)
    )


def sql_repeated_ngram_spans(
    table: str,
    col: str,
    id_col: str,
    n: int = 8,
    min_docs: int = 2,
) -> str:
    return f"""
WITH sh AS (
  SELECT {id_col} AS id, {sql_shingles(col, n)} AS grams FROM {table}
),
posts AS (SELECT id, unnest(grams) AS gram FROM sh)
SELECT gram, count(*) AS n_docs,
       array_to_string(list_sort(list(id)), ',') AS doc_ids
FROM posts GROUP BY gram HAVING count(*) >= {min_docs}
"""


def token_gram_posts(
    df: DataFrame, col: str, id_col: str, n: int
) -> DataFrame:
    """(id, pos, tok, gram): one row per token (pos 1-based), with gram =
    the n-token span STARTING at pos when it fits, NULL on the tail.
    One Arrow pass — same rationale as shingle_frame (the higher-order
    Column formulation re-evaluates the token chain per gram)."""
    id_type = df.schema[id_col].dataType.simpleString()

    def block(batches):
        import pandas as pd

        for pdf in batches:
            ids, poss, toks_out, grams = [], [], [], []
            for i, txt in zip(pdf["__id"], pdf["__txt"]):
                # parity with clean_tokens: drop commas, split on single
                # spaces, filter empties; NULL text (None/NaN here) must
                # tokenize to [] like the SQL side, not to ['None']
                if not isinstance(txt, str):
                    txt = ""
                toks = [t for t in txt.replace(",", "").split(" ") if t]
                last_start = len(toks) - n
                for p, tok in enumerate(toks):
                    ids.append(i)
                    poss.append(p + 1)
                    toks_out.append(tok)
                    grams.append(
                        " ".join(toks[p : p + n]) if p <= last_start else None
                    )
            yield pd.DataFrame(
                {"id": ids, "pos": poss, "tok": toks_out, "gram": grams}
            )

    return (
        spread_for_cpu(df)
        .select(F.col(id_col).alias("__id"), F.col(col).alias("__txt"))
        .mapInPandas(block, f"id {id_type}, pos int, tok string, gram string")
    )


def strip_hot_spans(
    df: DataFrame,
    col: str,
    id_col: str,
    n: int = 8,
    min_docs: int = 2,
) -> DataFrame:
    """Exact-substring scrub: rewrite every document with all tokens
    covered by a cross-document repeated n-gram span removed — the
    transformation side of ``repeated_ngram_spans`` (strip the memorized
    boilerplate instead of only reporting it).

    Returns (id, text_clean); a fully-covered document becomes ''.

    Plan shape: one Arrow tokenize pass -> hot-gram aggregate (map-side
    partial count over distinct (gram, id)) -> position-range explode of
    the hits (x n, bounded by hit count) -> anti-join on (id, pos) ->
    per-doc ordered re-assembly (one shuffle on id). Everything is
    linear in tokens + n * hot-span instances; no quadratic pair step.
    """
    posts = token_gram_posts(df, col, id_col, n).cache()
    hot = (
        posts.filter(F.col("gram").isNotNull())
        .select("gram", "id")
        .distinct()
        .groupBy("gram")
        .agg(F.count(F.lit(1)).alias("__df"))
        .filter(F.col("__df") >= min_docs)
        .select("gram")
    )
    covered = (
        posts.join(hot, "gram")
        .select(
            "id",
            F.explode(
                F.sequence(F.col("pos"), F.col("pos") + F.lit(n - 1))
            ).alias("pos"),
        )
        .distinct()
    )
    kept = posts.select("id", "pos", "tok").join(
        covered, ["id", "pos"], "left_anti"
    )
    rebuilt = kept.groupBy("id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "tok"))),
                lambda s: s["tok"],
            ),
            " ",
        ).alias("text_clean")
    )
    ids = df.select(F.col(id_col).alias("id")).distinct()
    return ids.join(rebuilt, "id", "left").select(
        "id", F.coalesce("text_clean", F.lit("")).alias("text_clean")
    )


def sql_strip_hot_spans(
    table: str,
    col: str,
    id_col: str,
    n: int = 8,
    min_docs: int = 2,
) -> str:
    gram_parts = " || ' ' || ".join(f"toks[pos+{k}]" for k in range(n))
    return f"""
WITH t AS (
  SELECT {id_col} AS id, {sql_clean_tokens(col)} AS toks FROM {table}
),
posts AS (
  SELECT id, toks,
         unnest(generate_series(1, len(toks))) AS pos
  FROM t
),
posts2 AS (
  SELECT id, pos, toks[pos] AS tok,
         CASE WHEN pos <= len(toks) - {n - 1} THEN {gram_parts} END AS gram
  FROM posts
),
hot AS (
  SELECT gram FROM posts2 WHERE gram IS NOT NULL
  GROUP BY gram HAVING count(DISTINCT id) >= {min_docs}
),
covered AS (
  SELECT DISTINCT p.id,
         p.pos + unnest(generate_series(0, {n - 1})) AS pos
  FROM posts2 p JOIN hot USING (gram)
),
kept AS (
  SELECT p.id, p.pos, p.tok
  FROM posts2 p ANTI JOIN covered c ON p.id = c.id AND p.pos = c.pos
),
agg AS (
  SELECT id, string_agg(tok, ' ' ORDER BY pos) AS text_clean FROM kept
  GROUP BY id
)
SELECT t.id, coalesce(agg.text_clean, '') AS text_clean
FROM t LEFT JOIN agg ON t.id = agg.id
"""


# ---------------------------------------------------------------------------
# 3. MinHash + banded LSH
# ---------------------------------------------------------------------------

NUM_HASHES = 16
BAND_ROWS = 2  # 8 bands of 2 rows → catches jaccard ≳ 0.5 with high prob.


# Affine MinHash family: h_i(x) = (a_i * md5_64(x) + b_i) mod P — one md5
# per shingle total, then integer arithmetic per permutation (the classic
# Broder construction). Constants are md5-seeded at plan-build time.
# Sizing: md5_hash64 < 2^32 and a_i < 2^28, so a*h + b < 2^63 — no signed
# overflow in Spark longs, and DuckDB BIGINT (which *errors* on overflow)
# computes the identical value.
MINHASH_P = 4294967311  # prime > 2^32
BAND_KEY_MULT = 1073741827  # prime > 2^30; band-key fusion multiplier


def _affine_constants(num_hashes: int) -> list[tuple[int, int]]:
    import hashlib

    out = []
    for i in range(num_hashes):
        a = int(hashlib.md5(f"a{i}".encode()).hexdigest()[:7], 16) | 1
        b = int(hashlib.md5(f"b{i}".encode()).hexdigest()[:8], 16) % MINHASH_P
        out.append((a, b))
    return out


def minhash_components(hashed: Column, num_hashes: int = NUM_HASHES) -> Column:
    """Array of ``num_hashes`` min-hash components over a *materialized*
    column of md5_hash64(shingle) values.

    Pass a plain column reference, not an inline expression: Catalyst
    collapses projections, so an inline md5 expression would be
    re-expanded into each of the num_hashes transforms (a measured 6x
    slowdown at sf0.1). Callers cache the hashed column first (see
    minhash_lsh_pairs)."""
    def affine(a: int, b: int):
        # Closure factory: pyspark counts every lambda parameter
        # (including defaults) as a higher-order-function variable.
        return lambda h: (F.lit(a) * h + F.lit(b)) % MINHASH_P

    return F.array(
        *[
            F.array_min(F.transform(hashed, affine(a, b)))
            for a, b in _affine_constants(num_hashes)
        ]
    )


def minhash_signature(col: Column | str, num_hashes: int = NUM_HASHES) -> Column:
    """Convenience single-expression form (fine for one-off use; for the
    LSH pipeline use minhash_components over a cached hashed column)."""
    return minhash_components(
        F.transform(shingles(col), md5_hash64), num_hashes
    )


# Semantic memo for minhash_index: several registry entries build the
# SAME index over the same input plan (full-corpus pairs, apply-keep,
# rate-report); without the memo each re-caches an identical plan —
# Spark's CacheManager warns "already cached" and the shingle/signature
# columns materialize once per caller instead of once per corpus.
# Key = operator params + DataFrame.sameSemantics on the source (public
# API, plan-identity exact). FIFO-capped: entries only pin logical plans
# (the cached blocks are Spark-managed either way).
_INDEX_MEMO: list[tuple[DataFrame, tuple, tuple[DataFrame, DataFrame]]] = []
_INDEX_MEMO_CAP = 16

# Same idea one level up: pairs-consuming entries (full-corpus pairs,
# components, apply-keep, rate-report) re-derive the identical pair plan;
# returning the same DataFrame object also stops split_hot_buckets from
# re-caching an identical hot-keys plan downstream of the memoized bands.
_PAIRS_MEMO: list[tuple[DataFrame, tuple, DataFrame]] = []


def _memo_lookup(memo: list, df: DataFrame, params: tuple):
    """Probe a (src, params, out, pinned) memo. A dead entry — its
    SparkSession was stopped since it was recorded, so sameSemantics
    raises — is EVICTED on sight, not just skipped: dead entries would
    otherwise occupy FIFO slots (pushing out live indexes) and pay a
    failed plan-canonicalization attempt on every future lookup."""
    for entry in list(memo):
        src, p, out, _pinned = entry
        if p != params:
            continue
        try:
            if df.sameSemantics(src):
                return out
        except Exception:
            _memo_evict(memo, entry)
    return None


def _memo_evict(memo: list, entry) -> None:
    """Remove an entry AND unpersist the cached frames it pins: after
    eviction no Python reference to those frames remains, so skipping
    the unpersist would orphan their cached blocks for the session
    lifetime (storage fills monotonically past _INDEX_MEMO_CAP distinct
    corpora)."""
    memo.remove(entry)
    for frame in entry[3]:
        try:
            frame.unpersist()
        except Exception:
            pass  # dead session — blocks died with it


_SHINGLED_MEMO: list = []


def _cached_shingled(
    df: DataFrame, col: str, id_col: str, keep: tuple[str, ...]
) -> DataFrame:
    """Cached (id, sh, hsh[, keep...]) shingle frame, memoized on the
    source plan + shingle params only (no signature params — see
    minhash_index)."""
    params = ("shingled", col, id_col, tuple(keep))
    hit = _memo_lookup(_SHINGLED_MEMO, df, params)
    if hit is not None:
        return hit
    sh = (
        shingle_frame(df, col, id_col, with_hash=True, keep=keep)
        .filter(F.size("sh") > 0)
        .cache()
    )
    if len(_SHINGLED_MEMO) >= _INDEX_MEMO_CAP:
        _memo_evict(_SHINGLED_MEMO, _SHINGLED_MEMO[0])
    _SHINGLED_MEMO.append((df, params, sh, [sh]))
    return sh


def minhash_index(
    df: DataFrame,
    col: str,
    id_col: str,
    num_hashes: int = NUM_HASHES,
    band_rows: int = BAND_ROWS,
    keep: tuple[str, ...] = (),
    with_sigh: bool = False,
) -> tuple[DataFrame, DataFrame]:
    """The reusable LSH index: returns (base, bands) where base =
    (id, sh, sig) — shingle arrays + MinHash signature, cached — and
    bands = (id, band, key) with fused integer band keys.

    Band key: key_j = sig[2j] * K + sig[2j+1] — one multiply-add instead
    of a per-band md5 over string concat, and an 8-byte shuffle key.
    Bounds: sig < P (~2^32), K ~2^30, so key < 2^62.1 — safe in Spark
    longs AND in DuckDB BIGINT (which errors on overflow). Collisions
    merely add candidates, and the oracle computes the identical key, so
    candidate sets stay exactly equal.

    Materialization: shingles are cached FIRST, then signatures derive
    from the stored column — base is consumed multiple times and the
    signature fans the shingle column into num_hashes transforms;
    without the cache barrier Catalyst re-inlines the shingling
    ~3*num_hashes times per row.
    """
    if band_rows > 2:
        raise ValueError(
            "fused integer band keys support band_rows <= 2 (K^2 * sig "
            "overflows int64); widen MINHASH band fusion to md5 keys first"
        )
    params = (col, id_col, num_hashes, band_rows, tuple(keep), with_sigh)
    memoed = _memo_lookup(_INDEX_MEMO, df, params)
    if memoed is not None:
        return memoed
    num_bands = num_hashes // band_rows
    # The shingle frame is num_hashes-INDEPENDENT: memoized one level
    # below the index memo so two signature widths over the same corpus
    # (e.g. the 128-hash pair entries and the 32-hash est-error audit)
    # share one cached frame instead of re-cache()ing an identical plan
    # (the CacheManager "already cached" warning in BENCH_r05).
    shingled = _cached_shingled(df, col, id_col, keep)
    base = shingled.select(
        "id",
        "sh",
        minhash_components(F.col("hsh"), num_hashes).alias("sig"),
        *keep,
    ).cache()
    # with_sigh: band-0 rows carry the fused signature string (NULL on
    # other bands — one copy per doc, not per band) for the hot-bucket
    # rescue join in minhash_lsh_pairs.
    bands = base.select(
        "id",
        *keep,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("band"),
                        sum(
                            (
                                F.col("sig")[j * band_rows + r]
                                * (BAND_KEY_MULT ** (band_rows - 1 - r))
                                for r in range(band_rows)
                            ),
                            F.lit(0),
                        ).alias("key"),
                        *(
                            [
                                (
                                    _sigh_expr()
                                    if j == 0
                                    else F.lit(None).cast("string")
                                ).alias("sigh")
                            ]
                            if with_sigh
                            else []
                        ),
                    )
                    for j in range(num_bands)
                ]
            )
        ).alias("bk"),
    ).select(
        "id",
        F.col("bk.band").alias("band"),
        F.col("bk.key").alias("key"),
        *(["bk.sigh"] if with_sigh else []),
        *keep,
    )
    if len(_INDEX_MEMO) >= _INDEX_MEMO_CAP:
        _memo_evict(_INDEX_MEMO, _INDEX_MEMO[0])
    # shingled is pinned (and unpersisted) by _SHINGLED_MEMO, not here.
    _INDEX_MEMO.append((df, params, (base, bands), [base]))
    return base, bands


# Band buckets larger than this are dropped from all-pairs candidate
# generation: a degenerate band key (mass-identical boilerplate) otherwise
# creates k^2 candidates in one bucket — the same quadratic-skew guard as
# ngram_jaccard_pairs.max_doc_freq. Two linear-cost rescues cover what the
# cap would otherwise lose:
#   1. signature-equality join inside hot band-0 buckets — every
#      identical-signature pair survives exactly (identical signatures
#      collide in EVERY band, so a pair whose band-0 bucket is cold
#      already surfaced in the band join);
#   2. neighbor chaining: within every hot bucket, consecutive members
#      (by id) become candidates — k-1 pairs per bucket — so a cluster of
#      near-identical-but-distinct docs stays CONNECTED and downstream
#      connected_components / keep-one-per-cluster still collapse it,
#      even though the capped operator no longer enumerates the cluster's
#      full k^2 pair list (the documented approximation in capped mode).
MAX_BAND_BUCKET = 64

# Hot-key sets beyond this row count are joined by shuffle instead of
# broadcast (each row is two ints — 5M rows ~ 80 MB broadcast, well
# under Spark's 8 GB hard limit with headroom for many executors).
MAX_BROADCAST_HOT_KEYS = 5_000_000


def split_hot_buckets(
    rows: DataFrame, keys: list[str], cap: int
) -> tuple[DataFrame, DataFrame]:
    """(cold, hot) split of ``rows`` by bucket size over ``keys`` WITHOUT
    shuffling the full relation: bucket sizes come from a groupBy whose
    map-side partial aggregation ships one row per distinct bucket per
    partition, and only the hot keys broadcast back as anti/semi-join
    filters. Structurally the hot-key set holds <= |rows|/cap entries
    (each represents > cap members), so the broadcast is bounded by
    construction — at 100 TB with cap=64 that is <= 1.6% of the band
    rows, and those are skinny (two ints). The previous formulation
    (count() over a (keys) window + cache) shuffled and materialized the
    whole bands relation even when ZERO buckets were hot — the common
    case — measured 2-4x slower at sf0.1."""
    counts = rows.groupBy(*keys).agg(F.count(F.lit(1)).alias("__n"))
    hot_keys = counts.filter(F.col("__n") > cap).select(*keys).cache()
    if hot_keys.isEmpty():
        # Runtime fast path (same pattern as ngram_jaccard_pairs'
        # hot-shingle branch): zero hot buckets — healthy corpora at any
        # scale — means cold == rows and the rescue/chain subplans would
        # be empty; returning hot=None lets the caller keep the plain
        # single-join plan, avoiding ~4 extra subplans whose stage +
        # codegen overhead dominates at bench scale. The isEmpty probe
        # costs one aggregation job over skinny band keys.
        return rows, None
    # Hot buckets exist: the split feeds ~5 consumers (cold self-join x2,
    # rescue x2, chain), each of which would otherwise recompute the
    # bands pipeline — cache the skinny band rows once (measured 22.5s ->
    # ~7s at a duplicate-heavy 10x sf0.1 corpus). Only this branch pays
    # the materialization; the no-hot fast path above stays cache-free.
    rows = rows.cache()
    # The |rows|/cap bound on hot keys is a FRACTION, not an absolute: on
    # a pathologically skewed corpus (e.g. byte-banded simhash past its
    # bucket saturation point, where EVERY bucket is hot by pigeonhole)
    # the hot-key set can exceed Spark's broadcast limit. Past the bound,
    # drop the broadcast hint and let the anti/semi joins shuffle — slow
    # but correct, where a forced broadcast would fail the job.
    bhot = (
        F.broadcast(hot_keys)
        if hot_keys.count() <= MAX_BROADCAST_HOT_KEYS
        else hot_keys
    )
    cold = rows.join(bhot, keys, "left_anti")
    hot = rows.join(bhot, keys, "left_semi")
    return cold, hot


def _sigh_expr() -> "Column":
    """Fused signature string: bijective with the signature array (fixed
    element count, ',' separator), rendered identically by Spark's
    long->string cast and DuckDB's BIGINT->VARCHAR coercion."""
    return F.concat_ws(",", F.col("sig").cast("array<string>"))


def minhash_lsh_pairs(
    df: DataFrame,
    col: str,
    id_col: str,
    threshold: float = 0.5,
    num_hashes: int = NUM_HASHES,
    band_rows: int = BAND_ROWS,
    max_band_bucket: int | None = MAX_BAND_BUCKET,
) -> DataFrame:
    """Candidate pairs via banded LSH, verified with true shingle Jaccard.

    Shuffle profile: explode to docs×bands rows, equijoin on
    (band_idx, band_key) — only same-bucket docs meet. Verification joins
    candidates back to shingle sets (array_intersect on the two shingle
    arrays — candidate count is small, so arrays-in-row beats re-exploding).
    Hot buckets (> max_band_bucket members) are excluded from the band
    join; identical-signature pairs inside them are recovered by a
    signature-equality join restricted to hot band-0 buckets. The
    cold/hot split is split_hot_buckets — an aggregated bucket-size
    frame broadcast back as anti/semi filters, so the bands relation is
    never shuffled just to size buckets. Returns (id_a, id_b, jac) with
    jac >= threshold.

    100 TB usage note: like ngram_jaccard_pairs, this is a CANDIDATE
    GENERATOR — pair counts grow quadratically in duplicate-cluster
    sizes, so don't persist the pair set at scale. Compose it into
    apply_dedup_keep / connected_components (``train_prep``,
    ``dedup_rate_report``) so pairs flow straight into the clustering
    shuffle.
    """
    params = (col, id_col, threshold, num_hashes, band_rows, max_band_bucket)
    memoed = _memo_lookup(_PAIRS_MEMO, df, params)
    if memoed is not None:
        return memoed
    base, bands = minhash_index(
        df, col, id_col, num_hashes, band_rows,
        with_sigh=max_band_bucket is not None,
    )
    hot = None
    if max_band_bucket is not None:
        cold, hot = split_hot_buckets(bands, ["band", "key"], max_band_bucket)
    if hot is not None:
        a, b = cold.alias("a"), cold.alias("b")
        band_pairs = a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.id") < F.col("b.id")),
        ).select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        hot0 = hot.filter(F.col("band") == 0)
        ha, hb = hot0.alias("a"), hot0.alias("b")
        rescue = ha.join(
            hb,
            (F.col("a.key") == F.col("b.key"))
            & (F.col("a.sigh") == F.col("b.sigh"))
            & (F.col("a.id") < F.col("b.id")),
        ).select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        # neighbor chain: k-1 linear candidates per hot bucket keep
        # near-identical (non-equal-signature) clusters connected
        wchain = Window.partitionBy("band", "key").orderBy("id")
        chain = (
            hot.withColumn("__prev", F.lag("id").over(wchain))
            .filter(F.col("__prev").isNotNull())
            .select(F.col("__prev").alias("id_a"), F.col("id").alias("id_b"))
        )
        cands = band_pairs.unionByName(rescue).unionByName(chain).distinct()
    else:
        a, b = bands.alias("a"), bands.alias("b")
        cands = (
            a.join(
                b,
                (F.col("a.band") == F.col("b.band"))
                & (F.col("a.key") == F.col("b.key"))
                & (F.col("a.id") < F.col("b.id")),
            )
            .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
            .distinct()
        )

    sh_a = base.select(F.col("id").alias("id_a"), F.col("sh").alias("sh_a"))
    sh_b = base.select(F.col("id").alias("id_b"), F.col("sh").alias("sh_b"))
    inter = F.size(F.array_intersect(F.col("sh_a"), F.col("sh_b")))
    union = F.size("sh_a") + F.size("sh_b") - inter
    pairs = (
        cands.join(sh_a, "id_a")
        .join(sh_b, "id_b")
        .withColumn("jac", F.round(inter.cast("double") / union, 6))
        .filter(F.col("jac") >= threshold)
        .select("id_a", "id_b", "jac")
    )
    if len(_PAIRS_MEMO) >= _INDEX_MEMO_CAP:
        _memo_evict(_PAIRS_MEMO, _PAIRS_MEMO[0])
    _PAIRS_MEMO.append((df, params, pairs, []))
    return pairs


def minhash_pairs_against(
    new_df: DataFrame,
    corpus_df: DataFrame,
    col: str,
    id_col: str,
    threshold: float = 0.5,
    num_hashes: int = NUM_HASHES,
    band_rows: int = BAND_ROWS,
) -> DataFrame:
    """Incremental dedup: match a NEW batch against an already-indexed
    corpus without recomputing corpus x corpus pairs — the production
    ingest shape (index once, probe per batch). The new batch's bands
    broadcast (a batch is small by definition); the corpus index is only
    scanned, never shuffled. Returns (new_id, old_id, jac >= threshold).

    With a persisted index (sources.writers.write_band_index /
    write_shingle_store) the corpus side reads straight from storage and
    this whole operator touches no corpus text at all.

    When both inputs are fresh (no persisted index), the index is built
    in ONE pass over the tagged union — shingling is the CPU-dominant
    step and tagging costs a literal column, so two separate
    shingle+signature pipelines would double the expensive work.
    """
    tag = "__is_new"
    tagged = new_df.select(
        F.col(id_col), F.col(col), F.lit(True).alias(tag)
    ).unionByName(
        corpus_df.select(F.col(id_col), F.col(col), F.lit(False).alias(tag))
    )
    base, bands = minhash_index(
        tagged, col, id_col, num_hashes, band_rows, keep=(tag,)
    )
    return minhash_pairs_against_index(
        base.filter(F.col(tag)).drop(tag),
        bands.filter(F.col(tag)).drop(tag),
        base.filter(~F.col(tag)).drop(tag),
        bands.filter(~F.col(tag)).drop(tag),
        threshold,
    )


def minhash_pairs_against_index(
    new_base: DataFrame,
    new_bands: DataFrame,
    corpus_shingles: DataFrame,
    corpus_bands: DataFrame,
    threshold: float = 0.5,
    max_band_bucket: int | None = MAX_BAND_BUCKET,
) -> DataFrame:
    """Probe a (possibly persisted — sources.writers.read_minhash_index)
    corpus LSH index with a new batch's index frames. Batch bands
    broadcast; the corpus index is scanned, never shuffled.

    Skew guard: a hot corpus bucket (boilerplate cluster) would fan every
    probing new doc out to bucket-size candidates. Buckets past
    ``max_band_bucket`` instead contribute ONE candidate per probing new
    doc — the bucket's min-id representative — plus an exact-content
    rescue: a shingle-set fingerprint equijoin new-vs-corpus, so an
    EXACT duplicate is always caught even when every shared bucket is
    hot and its representative happens to be dissimilar. Capped-mode
    guarantee: exact-content duplicates always match; a NEAR-identical
    (not exact) pair whose every shared bucket is hot can still be
    missed via a dissimilar representative — the documented capped-mode
    approximation (the full-pairs path's neighbor-chain rescue has no
    cross-batch analogue)."""
    probe = F.broadcast(
        new_bands.select(F.col("id").alias("new_id"), "band", "key")
    )
    corpus = corpus_bands.select(F.col("id").alias("old_id"), "band", "key")
    hot_stats = None
    if max_band_bucket is not None:
        # Aggregated bucket stats (one row per distinct bucket, map-side
        # partial agg) instead of a window over the corpus — the window
        # form shuffled the whole corpus index, violating the
        # scanned-never-shuffled contract above. Runtime fast path as in
        # split_hot_buckets: zero hot corpus buckets -> plain probe join.
        stats = corpus.groupBy("band", "key").agg(
            F.count(F.lit(1)).alias("__n"), F.min("old_id").alias("__rep")
        )
        hot_stats = stats.filter(F.col("__n") > max_band_bucket).cache()
        if hot_stats.isEmpty():
            hot_stats = None
    if hot_stats is not None:
        cold = corpus.join(
            F.broadcast(hot_stats.select("band", "key")),
            ["band", "key"],
            "left_anti",
        )
        reps = hot_stats.select("band", "key", F.col("__rep").alias("old_id"))
        # Exact-content rescue (hot branch only — with no hot buckets
        # an exact dup collides in every cold bucket and the plain join
        # already finds it): fingerprint of the full shingle array,
        # chr(1)-joined (never appears in space-joined word grams) so
        # the 8-byte-ish md5 is the join key, not the array itself.
        fp = F.md5(F.concat_ws(chr(1), "sh"))
        rescue = (
            new_base.select(F.col("id").alias("new_id"), fp.alias("__fp"))
            .join(
                corpus_shingles.select(
                    F.col("id").alias("old_id"), fp.alias("__fp")
                ),
                "__fp",
            )
            .select("new_id", "old_id")
        )
        cands = (
            probe.join(cold, ["band", "key"])
            .select("new_id", "old_id")
            .unionByName(
                probe.join(reps, ["band", "key"]).select("new_id", "old_id")
            )
            .unionByName(rescue)
            .distinct()
        )
    else:
        cands = (
            probe.join(corpus, ["band", "key"])
            .select("new_id", "old_id")
            .distinct()
        )
    sh_new = new_base.select(F.col("id").alias("new_id"), F.col("sh").alias("sh_n"))
    sh_old = corpus_shingles.select(
        F.col("id").alias("old_id"), F.col("sh").alias("sh_o")
    )
    inter = F.size(F.array_intersect(F.col("sh_n"), F.col("sh_o")))
    union = F.size("sh_n") + F.size("sh_o") - inter
    return (
        cands.join(sh_new, "new_id")
        .join(sh_old, "old_id")
        .withColumn("jac", F.round(inter.cast("double") / union, 6))
        .filter(F.col("jac") >= threshold)
        .select("new_id", "old_id", "jac")
    )


def _sql_against_cands(max_band_bucket: int | None) -> str:
    """cands CTE for sql_minhash_pairs_against: cold corpus buckets probe
    all-members; hot buckets probe their min-id representative only —
    mirroring minhash_pairs_against_index's capped candidate set."""
    if max_band_bucket is None:
        return """
cands AS (
  SELECT DISTINCT n.id AS new_id, o.id AS old_id
  FROM flagged n JOIN flagged o
    ON n.band = o.band AND n.key = o.key AND n.is_new AND NOT o.is_new
)"""
    return f"""
corpusn AS (
  SELECT id, band, key,
         count(*) OVER (PARTITION BY band, key) AS n,
         min(id) OVER (PARTITION BY band, key) AS rep
  FROM flagged WHERE NOT is_new
),
cands AS (
  SELECT DISTINCT new_id, old_id FROM (
    SELECT n.id AS new_id, o.id AS old_id
    FROM flagged n JOIN corpusn o ON n.band = o.band AND n.key = o.key
    WHERE n.is_new AND o.n <= {max_band_bucket}
    UNION ALL
    SELECT n.id AS new_id, o.rep AS old_id
    FROM flagged n JOIN corpusn o ON n.band = o.band AND n.key = o.key
    WHERE n.is_new AND o.n > {max_band_bucket}
    UNION ALL
    SELECT n.id AS new_id, o.id AS old_id
    FROM nonempty n JOIN nonempty o
      ON md5(list_aggregate(n.sh, 'string_agg', chr(1)))
       = md5(list_aggregate(o.sh, 'string_agg', chr(1)))
    WHERE n.is_new AND NOT o.is_new
  )
)"""


def sql_minhash_pairs_against(
    table: str,
    col: str,
    id_col: str,
    new_pred: str,
    corpus_pred: str,
    threshold: float = 0.5,
    num_hashes: int = NUM_HASHES,
    band_rows: int = BAND_ROWS,
    max_band_bucket: int | None = MAX_BAND_BUCKET,
) -> str:
    num_bands = num_hashes // band_rows
    sig_exprs = ", ".join(
        f"list_min(list_transform(hsh, h -> ({a} * h + {b}) % {MINHASH_P})) AS h{i}"
        for i, (a, b) in enumerate(_affine_constants(num_hashes))
    )
    band_selects = " UNION ALL ".join(
        f"SELECT id, {j} AS band, "
        + " + ".join(
            f"h{j * band_rows + r} * {BAND_KEY_MULT ** (band_rows - 1 - r)}"
            for r in range(band_rows)
        )
        + " AS key FROM sig"
        for j in range(num_bands)
    )
    return f"""
WITH base AS (
  SELECT {id_col} AS id, {sql_shingles(col)} AS sh,
         ({new_pred}) AS is_new
  FROM {table}
  WHERE ({new_pred}) OR ({corpus_pred})
),
nonempty AS (SELECT * FROM base WHERE len(sh) > 0),
hashed AS (
  SELECT id, sh, is_new, list_transform(sh, s -> {sql_md5_hash64('s')}) AS hsh
  FROM nonempty
),
sig AS (SELECT id, sh, is_new, {sig_exprs} FROM hashed),
bands AS ({band_selects}),
flagged AS (SELECT b.*, s.is_new FROM bands b JOIN sig s USING (id)),{_sql_against_cands(max_band_bucket)}
SELECT new_id, old_id,
       round(CAST(len(list_intersect(sn.sh, so.sh)) AS DOUBLE)
             / (len(sn.sh) + len(so.sh) - len(list_intersect(sn.sh, so.sh))), 6) AS jac
FROM cands
JOIN nonempty sn ON sn.id = new_id
JOIN nonempty so ON so.id = old_id
WHERE round(CAST(len(list_intersect(sn.sh, so.sh)) AS DOUBLE)
            / (len(sn.sh) + len(so.sh) - len(list_intersect(sn.sh, so.sh))), 6)
      >= {threshold}
"""


def sql_minhash_lsh_pairs(
    table: str,
    col: str,
    id_col: str,
    threshold: float = 0.5,
    num_hashes: int = NUM_HASHES,
    band_rows: int = BAND_ROWS,
    max_band_bucket: int | None = MAX_BAND_BUCKET,
) -> str:
    num_bands = num_hashes // band_rows
    sig_exprs = ", ".join(
        f"list_min(list_transform(hsh, h -> ({a} * h + {b}) % {MINHASH_P})) AS h{i}"
        for i, (a, b) in enumerate(_affine_constants(num_hashes))
    )
    sigh_sql = "concat_ws(',', " + ", ".join(
        f"h{i}" for i in range(num_hashes)
    ) + ")"

    def band_select(j: int) -> str:
        key = " + ".join(
            f"h{j * band_rows + r} * {BAND_KEY_MULT ** (band_rows - 1 - r)}"
            for r in range(band_rows)
        )
        sigh = ""
        if max_band_bucket is not None:
            sigh = (
                f", {sigh_sql} AS sigh" if j == 0
                else ", CAST(NULL AS VARCHAR) AS sigh"
            )
        return f"SELECT id, {j} AS band, {key} AS key{sigh} FROM sig"

    band_selects = " UNION ALL ".join(band_select(j) for j in range(num_bands))
    if max_band_bucket is not None:
        cand_ctes = f"""
bandsn AS (
  SELECT *, count(*) OVER (PARTITION BY band, key) AS n,
         lag(id) OVER (PARTITION BY band, key ORDER BY id) AS prev_id
  FROM bands
),
cands AS (
  SELECT DISTINCT id_a, id_b FROM (
    SELECT a.id AS id_a, b.id AS id_b
    FROM bandsn a JOIN bandsn b
      ON a.band = b.band AND a.key = b.key AND a.id < b.id
    WHERE a.n <= {max_band_bucket}
    UNION ALL
    SELECT a.id AS id_a, b.id AS id_b
    FROM bandsn a JOIN bandsn b
      ON a.key = b.key AND a.sigh = b.sigh AND a.id < b.id
    WHERE a.band = 0 AND b.band = 0 AND a.n > {max_band_bucket}
    UNION ALL
    SELECT prev_id AS id_a, id AS id_b FROM bandsn
    WHERE prev_id IS NOT NULL AND n > {max_band_bucket}
  )
)"""
    else:
        cand_ctes = """
cands AS (
  SELECT DISTINCT a.id AS id_a, b.id AS id_b
  FROM bands a JOIN bands b
    ON a.band = b.band AND a.key = b.key AND a.id < b.id
)"""
    return f"""
WITH base AS (
  SELECT {id_col} AS id, {sql_shingles(col)} AS sh FROM {table}
),
nonempty AS (SELECT * FROM base WHERE len(sh) > 0),
hashed AS (
  SELECT id, sh, list_transform(sh, s -> {sql_md5_hash64('s')}) AS hsh
  FROM nonempty
),
sig AS (SELECT id, sh, {sig_exprs} FROM hashed),
bands AS ({band_selects}),{cand_ctes}
SELECT id_a, id_b,
       round(CAST(len(list_intersect(sa.sh, sb.sh)) AS DOUBLE)
             / (len(sa.sh) + len(sb.sh) - len(list_intersect(sa.sh, sb.sh))), 6) AS jac
FROM cands
JOIN nonempty sa ON sa.id = id_a
JOIN nonempty sb ON sb.id = id_b
WHERE round(CAST(len(list_intersect(sa.sh, sb.sh)) AS DOUBLE)
            / (len(sa.sh) + len(sb.sh) - len(list_intersect(sa.sh, sb.sh))), 6)
      >= {threshold}
"""


# ---------------------------------------------------------------------------
# 4. SimHash
# ---------------------------------------------------------------------------

# 60 bits = four 15-bit pigeonhole bands (32768 buckets each). The
# round-3 32-bit/8-bit-band form saturated by pigeonhole at ~64k docs
# (every byte bucket hot at sf0.1 already); 15-bit bands keep expected
# bucket size under the hot cap to ~2M docs, and the whole construction
# stays within non-negative int64 (sum of 2^0..2^59 < 2^63), which the
# cross-engine bit arithmetic requires. Stops at 60, not 64: 2^63
# overflows BIGINT and the sign bit breaks `>>` parity.
SIMHASH_BITS = 60
SIMHASH_BAND_BITS = 15
SIMHASH_BANDS = 4
SIMHASH_BAND_MASK = (1 << SIMHASH_BAND_BITS) - 1


def simhash(
    df: DataFrame, col: str, id_col: str, materialize: bool = False
) -> DataFrame:
    """60-bit SimHash per document (classic Charikar construction with
    term-frequency weights): every token *occurrence* votes +1/-1 per bit
    of its hash, sign of the vote total → bit (sum of ±1 votes > 0 ⟺
    2·set-bit-count > n, the form used here — plain bit-extract sums
    codegen-compile ~3x faster than 60 CASE branches). TF weighting
    matters: on shared-vocab corpora a distinct-token simhash collapses
    (most docs hash identically). Returns (id, simhash:int64). One
    shuffle.

    ``materialize=True`` checkpoints the per-doc vote counts (61 skinny
    numeric columns, one row per doc) before the bit-assembly
    projection — for consumers like ``simhash_near_pairs`` whose plan
    reads the signatures from several subplans (band self-join sides,
    rescue, chain): without it each consumer re-tokenizes the corpus,
    and Spark's cache builder evaluates the 60-term assembly expression
    interpreted at the cache boundary (measured 5s vs 1.5s at sf0.1).
    At 100 TB this is the signature ARTIFACT — one narrow row per doc,
    the thing a real pipeline writes to storage and reuses — same
    lineage-truncation precedent as ``relational.insert_rows``."""
    # 15 hex chars of md5 = exactly SIMHASH_BITS of token hash,
    # non-negative in int64 on both engines.
    tok_hash = F.conv(F.substring(F.md5(F.col("tok")), 1, 15), 16, 10).cast(
        "long"
    )
    toks = df.select(
        F.col(id_col).alias("id"),
        F.explode(clean_tokens(col)).alias("tok"),
    ).withColumn("h", tok_hash)
    votes = toks.groupBy("id").agg(
        F.count(F.lit(1)).alias("n"),
        *[
            F.sum(F.shiftright(F.col("h"), b).bitwiseAND(1)).alias(f"b{b}")
            for b in range(SIMHASH_BITS)
        ],
    )
    if materialize:
        votes = votes.localCheckpoint(eager=True)
    sim = None
    for b in range(SIMHASH_BITS):
        term = F.when(2 * F.col(f"b{b}") > F.col("n"), F.lit(2**b)).otherwise(
            F.lit(0)
        )
        sim = term if sim is None else sim + term
    return votes.select("id", sim.cast("long").alias("simhash"))


def sql_simhash(table: str, col: str, id_col: str) -> str:
    vote_exprs = ", ".join(
        f"sum((h >> {b}) & 1) AS b{b}" for b in range(SIMHASH_BITS)
    )
    sim_expr = " + ".join(
        f"(CASE WHEN 2 * b{b} > n THEN {2**b} ELSE 0 END)"
        for b in range(SIMHASH_BITS)
    )
    return f"""
WITH toks AS (
  SELECT {id_col} AS id,
         unnest({sql_clean_tokens(col)}) AS tok
  FROM {table}
),
hashed AS (SELECT id, ('0x' || substr(md5(tok), 1, 15))::BIGINT AS h FROM toks),
votes AS (SELECT id, count(*) AS n, {vote_exprs} FROM hashed GROUP BY id)
SELECT id, CAST({sim_expr} AS BIGINT) AS simhash FROM votes
"""


def simhash_near_pairs(
    df: DataFrame,
    col: str,
    id_col: str,
    max_hamming: int = 3,
    max_band_bucket: int | None = MAX_BAND_BUCKET,
) -> DataFrame:
    """Near-dup pairs by SimHash hamming distance.

    Candidate generation pigeonholes on four 15-bit signature bands: any
    pair within hamming <= 3 can disturb at most 3 of the 4 bands, so it
    *must* share at least one — the band-bucket equijoin is an exact
    candidate filter for max_hamming <= 3 (docs meet only in shared
    buckets; no cross join), then bit_count(xor) verifies. For larger
    thresholds, widen to overlapping bands. Returns (id_a, id_b, hamming).

    Skew guard (same family as minhash_lsh_pairs / lsh_near_dup_pairs):
    band buckets larger than ``max_band_bucket`` leave the all-pairs join
    and are covered by two linear rescues — identical-simhash pairs
    rejoin inside hot band-0 buckets (hamming-0 recall is exact), and
    consecutive members of every hot bucket chain so near-identical
    clusters stay connected. In capped mode the pigeonhole filter is no
    longer exhaustive inside hot buckets (differing-hash pairs whose
    every shared band is hot reduce to the chain) — pass
    ``max_band_bucket=None`` for the exact enumeration when the corpus
    is known skew-free.

    100 TB lever: band WIDTH, not the cap. 15-bit bands give 32768
    buckets each — expected bucket size stays under cap=64 to ~2M docs
    (the round-3 8-bit-band form saturated at ~64k docs, collapsing
    recall to the rescues at bench scale already). Beyond that, shard
    the band key further (e.g. prefix a token-length bucket) — the
    pigeonhole argument only needs the four bands to partition the 60
    bits, not any particular width.
    """
    sh = simhash(df, col, id_col, materialize=True)
    return hamming_band_pairs(
        sh, "simhash", max_hamming=max_hamming, max_band_bucket=max_band_bucket
    )


def hamming_band_pairs(
    hashed: DataFrame,
    hash_col: str,
    max_hamming: int = 3,
    max_band_bucket: int | None = MAX_BAND_BUCKET,
) -> DataFrame:
    """Near-pairs of (id, <hash_col>) rows by Hamming distance over a
    60-bit hash — the band-pigeonhole candidate join + bit_count verify
    factored out of simhash_near_pairs so every 60-bit Hamming space
    (token SimHash, image dHash, video-frame dHash) shares ONE
    implementation of the banding, the hot-bucket cap, and the two
    rescues. Contract and caveats are simhash_near_pairs' docstring;
    input must expose columns (id, hash_col); returns
    (id_a, id_b, hamming)."""
    sh = hashed.select("id", F.col(hash_col).alias("simhash"))
    bands = sh.select(
        "id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(k).alias("band"),
                        F.shiftright(F.col("simhash"), k * SIMHASH_BAND_BITS)
                        .bitwiseAND(SIMHASH_BAND_MASK)
                        .alias("byte"),
                    )
                    for k in range(SIMHASH_BANDS)
                ]
            )
        ).alias("bk"),
    ).select("id", "simhash", F.col("bk.band").alias("band"), F.col("bk.byte").alias("byte"))
    hot = None
    if max_band_bucket is not None:
        cold, hot = split_hot_buckets(bands, ["band", "byte"], max_band_bucket)
    if hot is not None:
        a, b = cold.alias("a"), cold.alias("b")
        band_pairs = a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.byte") == F.col("b.byte"))
            & (F.col("a.id") < F.col("b.id")),
        ).select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.simhash").alias("sim_a"),
            F.col("b.simhash").alias("sim_b"),
        )
        hot0 = hot.filter(F.col("band") == 0)
        ha, hb = hot0.alias("a"), hot0.alias("b")
        rescue = ha.join(
            hb,
            (F.col("a.byte") == F.col("b.byte"))
            & (F.col("a.simhash") == F.col("b.simhash"))
            & (F.col("a.id") < F.col("b.id")),
        ).select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.simhash").alias("sim_a"),
            F.col("b.simhash").alias("sim_b"),
        )
        wchain = Window.partitionBy("band", "byte").orderBy("id")
        chain = (
            hot.withColumn("__prev", F.lag("id").over(wchain))
            .withColumn("__prev_sim", F.lag("simhash").over(wchain))
            .filter(F.col("__prev").isNotNull())
            .select(
                F.col("__prev").alias("id_a"),
                F.col("id").alias("id_b"),
                F.col("__prev_sim").alias("sim_a"),
                F.col("simhash").alias("sim_b"),
            )
        )
        cands = band_pairs.unionByName(rescue).unionByName(chain)
    else:
        a, b = bands.alias("a"), bands.alias("b")
        cands = a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.byte") == F.col("b.byte"))
            & (F.col("a.id") < F.col("b.id")),
        ).select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.simhash").alias("sim_a"),
            F.col("b.simhash").alias("sim_b"),
        )
    return (
        cands.select(
            "id_a",
            "id_b",
            F.bit_count(
                F.col("sim_a").bitwiseXOR(F.col("sim_b"))
            ).alias("hamming"),
        )
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )


def sql_simhash_near_pairs(
    table: str,
    col: str,
    id_col: str,
    max_hamming: int = 3,
    max_band_bucket: int | None = MAX_BAND_BUCKET,
) -> str:
    return sql_hamming_band_pairs(
        sql_simhash(table, col, id_col), max_hamming, max_band_bucket
    )


def sql_hamming_band_pairs(
    sims_sql: str,
    max_hamming: int = 3,
    max_band_bucket: int | None = MAX_BAND_BUCKET,
) -> str:
    """Oracle twin of hamming_band_pairs: ``sims_sql`` must yield
    (id, simhash) rows; the banding / cap / rescue semantics mirror the
    Spark path term for term."""
    sim = sims_sql
    band_selects = " UNION ALL ".join(
        f"SELECT id, simhash, {k} AS band, "
        f"(simhash >> {k * SIMHASH_BAND_BITS}) & {SIMHASH_BAND_MASK} AS byte "
        f"FROM sims"
        for k in range(SIMHASH_BANDS)
    )
    if max_band_bucket is not None:
        cand_sql = f"""
bandsn AS (
  SELECT *, count(*) OVER (PARTITION BY band, byte) AS n,
         lag(id) OVER (PARTITION BY band, byte ORDER BY id) AS prev_id,
         lag(simhash) OVER (PARTITION BY band, byte ORDER BY id) AS prev_sim
  FROM bands
),
cands AS (
  SELECT a.id AS id_a, b.id AS id_b, a.simhash AS sim_a, b.simhash AS sim_b
  FROM bandsn a JOIN bandsn b
    ON a.band = b.band AND a.byte = b.byte AND a.id < b.id
  WHERE a.n <= {max_band_bucket}
  UNION ALL
  SELECT a.id, b.id, a.simhash, b.simhash
  FROM bandsn a JOIN bandsn b
    ON a.byte = b.byte AND a.simhash = b.simhash AND a.id < b.id
  WHERE a.band = 0 AND b.band = 0 AND a.n > {max_band_bucket}
  UNION ALL
  SELECT prev_id, id, prev_sim, simhash FROM bandsn
  WHERE prev_id IS NOT NULL AND n > {max_band_bucket}
)"""
    else:
        cand_sql = """
cands AS (
  SELECT a.id AS id_a, b.id AS id_b, a.simhash AS sim_a, b.simhash AS sim_b
  FROM bands a JOIN bands b
    ON a.band = b.band AND a.byte = b.byte AND a.id < b.id
)"""
    return f"""
WITH sims AS ({sim}),
bands AS ({band_selects}),{cand_sql}
SELECT DISTINCT id_a, id_b, bit_count(xor(sim_a, sim_b)) AS hamming
FROM cands
WHERE bit_count(xor(sim_a, sim_b)) <= {max_hamming}
"""


def hamming_pairs_against(
    batch: DataFrame,
    corpus: DataFrame,
    hash_col: str,
    max_hamming: int = 3,
    max_band_bucket: int | None = MAX_BAND_BUCKET,
) -> DataFrame:
    """Incremental perceptual dedup: match a probe BATCH of 60-bit
    hashes against an already-hashed corpus without corpus x corpus
    pairs — the hamming analog of minhash_pairs_against (index once,
    probe per batch). Both inputs expose (id, hash_col); returns
    (batch_id, corpus_id, hamming), hamming <= max_hamming.

    Only the CORPUS side is banded and hot-capped (the batch is small
    by contract): corpus band buckets over ``max_band_bucket`` members
    are boilerplate (flat gradients, silence) and leave the band join;
    hot hashes are rescued by EXACT equality against the batch, so an
    exact duplicate of boilerplate is still caught, while near-misses
    of boilerplate are consciously dropped (same trade as
    hamming_band_pairs' rescue). With a persisted index the corpus
    bands come pre-bucketed from parquet and the probe prunes to the
    batch's (band, byte) buckets — scan, never shuffle."""
    bsh = batch.select(F.col("id").alias("batch_id"),
                       F.col(hash_col).alias("bsim"))
    csh = corpus.select(F.col("id").alias("corpus_id"),
                        F.col(hash_col).alias("csim"))

    def banded(sh: DataFrame, id_out: str, sim_col: str) -> DataFrame:
        return sh.select(
            id_out,
            sim_col,
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(k).alias("band"),
                            F.shiftright(F.col(sim_col), k * SIMHASH_BAND_BITS)
                            .bitwiseAND(SIMHASH_BAND_MASK)
                            .alias("byte"),
                        )
                        for k in range(SIMHASH_BANDS)
                    ]
                )
            ).alias("bk"),
        ).select(
            id_out, sim_col,
            F.col("bk.band").alias("band"), F.col("bk.byte").alias("byte"),
        )

    cbands = banded(csh, "corpus_id", "csim")
    hot = None
    if max_band_bucket is not None:
        cbands, hot = split_hot_buckets(cbands, ["band", "byte"], max_band_bucket)
    bbands = banded(bsh, "batch_id", "bsim")
    cands = bbands.join(cbands, ["band", "byte"]).select(
        "batch_id", "corpus_id", "bsim", "csim"
    )
    if hot is not None:
        rescue = bsh.join(
            hot.select("corpus_id", "csim").distinct(),
            F.col("bsim") == F.col("csim"),
        ).select("batch_id", "corpus_id", "bsim", "csim")
        cands = cands.unionByName(rescue)
    ham = F.bit_count(F.col("bsim").bitwiseXOR(F.col("csim")))
    return (
        cands.filter(ham <= max_hamming)
        .select("batch_id", "corpus_id", ham.alias("hamming"))
        .distinct()
    )


def sql_hamming_pairs_against(
    batch_sql: str,
    corpus_sql: str,
    max_hamming: int = 3,
    max_band_bucket: int | None = MAX_BAND_BUCKET,
) -> str:
    """Oracle twin of hamming_pairs_against: both inputs yield
    (id, simhash); corpus-side band-bucket cap + exact-equality hot
    rescue mirrored term for term."""
    cband = " UNION ALL ".join(
        f"SELECT id, simhash, {k} AS band, "
        f"(simhash >> {k * SIMHASH_BAND_BITS}) & {SIMHASH_BAND_MASK} AS byte "
        f"FROM corp"
        for k in range(SIMHASH_BANDS)
    )
    bband = " UNION ALL ".join(
        f"SELECT id, simhash, {k} AS band, "
        f"(simhash >> {k * SIMHASH_BAND_BITS}) & {SIMHASH_BAND_MASK} AS byte "
        f"FROM bat"
        for k in range(SIMHASH_BANDS)
    )
    if max_band_bucket is not None:
        cands = f"""
cbn AS (
  SELECT *, count(*) OVER (PARTITION BY band, byte) AS n FROM cbands
),
cands AS (
  SELECT b.id AS batch_id, c.id AS corpus_id,
         b.simhash AS bsim, c.simhash AS csim
  FROM bbands b JOIN cbn c ON c.band = b.band AND c.byte = b.byte
  WHERE c.n <= {max_band_bucket}
  UNION ALL
  SELECT b.id, c.id, b.simhash, c.simhash
  FROM bat b JOIN (
    SELECT DISTINCT id, simhash FROM cbn WHERE n > {max_band_bucket}
  ) c ON c.simhash = b.simhash
)"""
    else:
        cands = """
cands AS (
  SELECT b.id AS batch_id, c.id AS corpus_id,
         b.simhash AS bsim, c.simhash AS csim
  FROM bbands b JOIN cbands c ON c.band = b.band AND c.byte = b.byte
)"""
    return f"""
WITH bat AS ({batch_sql}),
corp AS ({corpus_sql}),
cbands AS ({cband}),
bbands AS ({bband}),{cands}
SELECT DISTINCT batch_id, corpus_id,
       bit_count(xor(bsim, csim)) AS hamming
FROM cands
WHERE bit_count(xor(bsim, csim)) <= {max_hamming}
"""


# ---------------------------------------------------------------------------
# 5. embedding cosine near-dup
# ---------------------------------------------------------------------------


MAX_BROADCAST_VECTORS = 200_000


def embedding_near_dup_pairs(
    emb: DataFrame,
    threshold: float = 0.4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Pairs with cosine similarity >= threshold — the all-pairs
    correctness baseline for the LSH/IVF scale paths in
    operators/similarity.py.

    Implementation: broadcast the (small) normalized corpus matrix and
    scan it once with Arrow-batched numpy blocks — the classic
    broadcast-join shape with BLAS doing the inner loop. A pure Column
    formulation (zip_with + aggregate over a pair join) is 14x slower at
    sf0.1 because Spark evaluates higher-order array functions
    interpreted, outside whole-stage codegen.

    Float parity: dots accumulate in float64; values are rounded to 6dp,
    far coarser than the ~1e-15 accumulation-order noise vs DuckDB's
    sequential list_cosine_similarity (verified exact at sf0.1).

    Guard: the broadcast side must fit in memory — that is the definition
    of this baseline. Beyond MAX_BROADCAST_VECTORS, use the banded LSH
    (similarity.topk_lsh) or IVF cells instead of all pairs.
    """
    import numpy as np
    import pandas as pd

    # limit(cap+1) bounds the collect itself: guarding AFTER an unbounded
    # collect would OOM the driver on exactly the oversized input the
    # guard exists to reject (same discipline as MAX_IVF_CENTROIDS).
    # One action, not an ids-only probe followed by a second full
    # collect — the two-job variant doubled the scan and cost +0.6s per
    # call at sf0.1 (VERDICT r05 "what's wrong" #1).
    rows = emb.select(id_col, vec_col).limit(MAX_BROADCAST_VECTORS + 1).collect()
    if len(rows) > MAX_BROADCAST_VECTORS:
        raise ValueError(
            f"vector count exceeds the broadcastable baseline "
            f"({MAX_BROADCAST_VECTORS}); use LSH/IVF candidate generation"
        )
    ids = np.array([r[0] for r in rows])
    mat = np.array([r[1] for r in rows], dtype=np.float64)
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    mat = mat / np.where(norms == 0, 1.0, norms)
    bc = emb.sparkSession.sparkContext.broadcast((ids, mat))

    from hash_db_spark.functions.rounding import round_half_away

    def block(batches):
        bids, bmat = bc.value
        for pdf in batches:
            v = np.array(list(pdf[vec_col]), dtype=np.float64)
            n = np.linalg.norm(v, axis=1, keepdims=True)
            v = v / np.where(n == 0, 1.0, n)
            # round_half_away, not np.round: SQL oracles round half away
            # from zero, numpy rounds half to even.
            cos = round_half_away(v @ bmat.T, 6)
            rid = pdf[id_col].to_numpy()
            out_a, out_b, out_c = [], [], []
            for i in range(len(rid)):
                mask = (bids > rid[i]) & (cos[i] >= threshold)
                k = int(mask.sum())
                out_a.extend([rid[i]] * k)
                out_b.extend(bids[mask])
                out_c.extend(cos[i][mask])
            yield pd.DataFrame({"id_a": out_a, "id_b": out_b, "cos": out_c})

    # The guard collect told us the exact row count, so size the scan-side
    # parallelism to the data instead of inheriting the source's partition
    # count. REPARTITION, not coalesce (optimization r11): the fixture
    # parquet is a single split, so the old coalesce(ceil(rows/4096))
    # collapsed to ONE task and the whole O(rows x corpus) cosine block
    # ran on one Python worker — measured 0.6-4.0s/run under suite load
    # (a single straggler worker's GC pause is the whole query) vs a
    # stable ~0.7s for 32-way repartition. The shuffle this adds is
    # bounded by the MAX_BROADCAST_VECTORS guard above (this operator
    # never sees more than cap rows), so it is O(cap x dim) bytes at ANY
    # corpus scale — the banded-LSH path remains the unbounded route.
    # ~64 vectors per task keeps every core busy at bench scale while
    # the per-task Arrow round-trip (~10ms) stays amortized.
    import math

    k = max(
        1,
        min(
            emb.sparkSession.sparkContext.defaultParallelism,
            math.ceil(len(rows) / 64),
        ),
    )
    return emb.select(id_col, vec_col).repartition(k, F.col(id_col)).mapInPandas(
        block, "id_a long, id_b long, cos double"
    )


def sql_embedding_near_dup_pairs(
    table: str = "embeddings",
    threshold: float = 0.4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> str:
    return f"""
SELECT a.{id_col} AS id_a, b.{id_col} AS id_b,
       round(list_cosine_similarity(a.{vec_col}::DOUBLE[], b.{vec_col}::DOUBLE[]), 6) AS cos
FROM {table} a JOIN {table} b ON a.{id_col} < b.{id_col}
WHERE round(list_cosine_similarity(a.{vec_col}::DOUBLE[], b.{vec_col}::DOUBLE[]), 6) >= {threshold}
"""


# ---------------------------------------------------------------------------
# 6. duplicate-cluster assignment (connected components over dup pairs)
# ---------------------------------------------------------------------------


def connected_components(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 20,
    driver_threshold: int = 1_000_000,
) -> DataFrame:
    """Assign every document appearing in a dup pair to a cluster labelled
    by the smallest reachable id — the step a dedup pipeline needs after
    pair generation (keep one representative per CLUSTER, not per pair:
    pairs are not transitive-closed, A~B and B~C without A~C).

    Min-label propagation: each round every node takes the min of its own
    label and its neighbors' labels; converges in O(component diameter)
    rounds — dup clusters are shallow (near-identical docs all pair with
    each other), so a handful of rounds suffices even at corpus scale.
    For adversarially long path-shaped components switch to the
    large-star/small-star algorithm (O(log n) rounds); the per-round
    plan here (one equijoin + one min-aggregate) is the same building
    block. Each round is localCheckpoint()ed: the loop references the
    previous labels twice, so an unmaterialized plan doubles per round.

    Returns (id, cluster). Deterministic: labels are ids, min is
    order-insensitive.

    Hybrid execution: below ``driver_threshold`` edges the component
    graph is collected and solved with union-find on the driver
    (microseconds; each distributed round costs whole jobs of overhead)
    — near-dup graphs are tiny relative to their corpus because pairs
    ARE the rare events. The distributed loop is the ≥threshold path and
    stays covered by tests (driver_threshold=0).
    """
    # Materialize the pair pipeline ONCE before mirroring: the union
    # references fwd twice, and an unmaterialized near-dup pipeline
    # (bands, candidate join, verify) would execute end-to-end twice.
    fwd = pairs.select(
        F.col(id_a).alias("a"), F.col(id_b).alias("b")
    ).localCheckpoint(eager=True)
    # Driver-path probe straight off the checkpoint (optimization r12):
    # the previous shape paid a mirrored-distinct second checkpoint, a
    # count job, AND a collect before union-find — three whole jobs over
    # an already-tiny relation. A limit-guarded collect of the forward
    # pairs decides and feeds the union-find in ONE job; mirroring and
    # distinct are irrelevant to union-find (same components either
    # way), so only the distributed path pays for the doubled relation.
    rows = fwd.limit(driver_threshold + 1).collect() if driver_threshold else []
    if driver_threshold and len(rows) <= driver_threshold:
        parent: dict = {}

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for r in rows:
            parent.setdefault(r.a, r.a)
            parent.setdefault(r.b, r.b)
            ra, rb = find(r.a), find(r.b)
            if ra != rb:
                # union by min so the root IS the smallest member
                lo, hi = (ra, rb) if ra < rb else (rb, ra)
                parent[hi] = lo
        out = [(x, find(x)) for x in parent]
        spark = pairs.sparkSession
        id_type = dict(pairs.dtypes)[id_a]
        # pandas input -> Arrow-batched LocalRelation: one columnar batch
        # instead of row-wise pickled tuples (measured 1.5s -> 0.1s to
        # materialize at 5k rows).
        import pandas as pd

        return spark.createDataFrame(
            pd.DataFrame(out, columns=["id", "cluster"]),
            schema=f"id {id_type}, cluster {id_type}",
        )
    edges = (
        fwd.unionByName(fwd.select(F.col("b").alias("a"), F.col("a").alias("b")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    labels = (
        edges.select("a")
        .distinct()
        .select(F.col("a").alias("id"), F.col("a").alias("lab"))
        .localCheckpoint(eager=True)
    )
    converged = False
    for _ in range(max_iter):
        nbr = edges.join(
            labels.withColumnRenamed("id", "b"), "b"
        ).select(F.col("a").alias("id"), "lab")
        stepped = (
            labels.unionByName(nbr)
            .groupBy("id")
            .agg(F.min("lab").alias("lab"))
        )
        # pointer doubling (path halving): lab <- min(lab, labels[lab]) —
        # a label is itself a node id, so chasing one level per round
        # makes the min label travel 2^k hops after k rounds instead of
        # k. Plain min-propagation needs O(diameter) rounds and the
        # neighbor-chain skew rescue PRODUCES path-shaped components, so
        # log-round convergence is load-bearing, not a nicety.
        lut = stepped.select(
            F.col("id").alias("__lid"), F.col("lab").alias("__llab")
        )
        new_labels = (
            stepped.join(lut, stepped.lab == F.col("__lid"), "left")
            .select(
                "id",
                F.least(
                    F.col("lab"), F.coalesce(F.col("__llab"), F.col("lab"))
                ).alias("lab"),
            )
            .localCheckpoint(eager=True)
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "id")
            .filter(F.col("n.lab") != F.col("o.lab"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            converged = True
            break
    if not converged:
        # Wrong-but-plausible labels are worse than an error: 2^max_iter
        # hop coverage means this only trips on truly adversarial graphs.
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds "
            "(component diameter > 2^max_iter?); raise max_iter"
        )
    return labels.select(F.col("id"), F.col("lab").alias("cluster"))


def connected_components_star(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 30,
) -> DataFrame:
    """(id, cluster) by alternating large-star / small-star rounds
    (Kiveris et al., "Connected Components in MapReduce and Beyond") —
    the O(log n)-round companion to ``connected_components``'s min-label
    loop, whose round count is the component DIAMETER. Near-dup clusters
    are shallow, so min-label wins there; a path-shaped component (chain
    rescues produce exactly those) makes diameter O(n) and this
    formulation the right tool.

    Each round is two shuffles over the current edge list:
    - large-star: every node u points its LARGER neighbors at
      m = min(N(u) ∪ {u});
    - small-star: every node u points its not-larger neighbors (and
      itself) at the min of that set.
    The edge list only shrinks toward stars rooted at component minima;
    at convergence (edge set unchanged) every node's neighbor-min IS its
    component label. Rounds localCheckpoint so plans stay flat.
    """
    raw = pairs.select(F.col(id_a).alias("a"), F.col(id_b).alias("b"))
    # Node universe BEFORE dropping self-pairs: a node whose only pair
    # is (x, x) must still come back as a singleton cluster, exactly as
    # connected_components emits it — drop-in equivalence.
    all_nodes = (
        raw.select("a")
        .unionAll(raw.select(F.col("b").alias("a")))
        .distinct()
        .withColumnRenamed("a", "id")
        .localCheckpoint(eager=True)
    )
    e = (
        raw.filter(F.col("a") != F.col("b"))
        .select(
            F.least("a", "b").alias("a"), F.greatest("a", "b").alias("b")
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    for _ in range(max_iter):
        both = e.select(
            F.col("a").alias("u"), F.col("b").alias("v")
        ).unionAll(e.select(F.col("b").alias("u"), F.col("a").alias("v")))
        # large-star
        mins = both.groupBy("u").agg(
            F.least(F.min("v"), F.first("u")).alias("m")
        )
        ls = (
            both.filter(F.col("v") > F.col("u"))
            .join(mins, "u")
            .select(F.col("v").alias("a"), F.col("m").alias("b"))
        )
        e1 = (
            ls.filter(F.col("a") != F.col("b"))
            .select(
                F.least("a", "b").alias("a"),
                F.greatest("a", "b").alias("b"),
            )
            .distinct()
            .localCheckpoint(eager=True)
        )
        # small-star over e1
        both1 = e1.select(
            F.col("a").alias("u"), F.col("b").alias("v")
        ).unionAll(e1.select(F.col("b").alias("u"), F.col("a").alias("v")))
        le = both1.filter(F.col("v") < F.col("u"))
        mins_s = le.groupBy("u").agg(F.min("v").alias("m"))
        ss = (
            le.join(mins_s, "u")
            .select(F.col("v").alias("a"), F.col("m").alias("b"))
            .unionAll(mins_s.select(F.col("u").alias("a"), F.col("m").alias("b")))
        )
        e2 = (
            ss.filter(F.col("a") != F.col("b"))
            .select(
                F.least("a", "b").alias("a"),
                F.greatest("a", "b").alias("b"),
            )
            .distinct()
            .localCheckpoint(eager=True)
        )
        # converged when the canonical edge set is unchanged
        if (
            e2.exceptAll(e).isEmpty()
            and e.exceptAll(e2).isEmpty()
        ):
            e = e2
            break
        e = e2
    else:
        raise RuntimeError(
            f"connected_components_star: no convergence in {max_iter} rounds"
        )
    # stars rooted at minima: every node's label = min neighbor (roots
    # label themselves); nodes with no surviving edge (self-pair-only)
    # are their own singleton cluster.
    both = e.select(
        F.col("a").alias("id"), F.col("b").alias("nb")
    ).unionAll(e.select(F.col("b").alias("id"), F.col("a").alias("nb")))
    labeled = both.groupBy("id").agg(
        F.least(F.min("nb"), F.first("id")).alias("cluster")
    )
    singles = all_nodes.join(labeled, "id", "left_anti").select(
        "id", F.col("id").alias("cluster")
    )
    return labeled.unionByName(singles)


def sql_connected_components(pairs_sql: str) -> str:
    """DuckDB oracle: transitive closure by recursive label reach over the
    same pair set, then min reachable label per node."""
    return f"""
WITH RECURSIVE pairs AS (SELECT * FROM ({pairs_sql})),
e AS (
  SELECT id_a AS a, id_b AS b FROM pairs
  UNION
  SELECT id_b, id_a FROM pairs
),
nodes AS (SELECT DISTINCT a AS id FROM e),
reach AS (
  SELECT id, id AS lab FROM nodes
  UNION
  SELECT e.b AS id, reach.lab FROM reach JOIN e ON e.a = reach.id
)
SELECT id, min(lab) AS cluster FROM reach GROUP BY id
"""


def apply_dedup_keep(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str,
    id_a: str = "id_a",
    id_b: str = "id_b",
) -> DataFrame:
    """The END of the dedup pipeline: given near-dup pairs, keep one
    representative per duplicate CLUSTER (the smallest id) and every
    unpaired document. Pairs are not transitive-closed, so clustering via
    connected_components first is what makes A~B, B~C collapse to one
    survivor instead of two.

    Plan: components over docs appearing in pairs, then one anti-join of
    the drop-list against the corpus. The drop-list is NOT force-
    broadcast: its size is one row per duplicate document — unbounded on
    a duplicate-heavy corpus (40% dups of 100 TB would OOM the driver
    and blow the 8 GB broadcast hard limit). AQE picks broadcast at
    runtime when the list is actually small (the common case) and falls
    back to a shuffled anti-join when it isn't — the same size-guarded
    pattern as MAX_BROADCAST_HOT_KEYS, decided by measured size instead
    of a hint."""
    clusters = connected_components(pairs, id_a, id_b)
    drop = clusters.filter(F.col("id") != F.col("cluster")).select(
        F.col("id").alias(id_col)
    )
    return df.join(drop, id_col, "left_anti")


def sql_apply_dedup_keep(
    table: str, id_col: str, pairs_sql: str, select: str
) -> str:
    """Oracle: same drop-list via the recursive-closure components."""
    comp = sql_connected_components(pairs_sql)
    return f"""
{select}
FROM {table}
WHERE {id_col} NOT IN (
  SELECT id FROM ({comp}) WHERE id <> cluster
)
"""


def keep_best_per_cluster(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str,
    score: Column,
    id_a: str = "id_a",
    id_b: str = "id_b",
) -> DataFrame:
    """(keep_id, cluster, n_members, q): the highest-scoring member of
    each duplicate cluster — production keep policy. apply_dedup_keep's
    min-id rule is arbitrary; real pipelines keep the BEST copy of a
    duplicated document (canonical URL, cleanest extraction, longest
    text), so the keeper takes a quality column and ranks per cluster
    by (score DESC, id ASC).

    Plan: components over the paired docs only, one join back to the
    corpus for the score column (clusters frame is dup-docs-sized, NOT
    force-broadcast — AQE decides), one per-cluster window. Nothing
    corpus-sized moves except the score projection's shuffle join.
    """
    clusters = connected_components(pairs, id_a, id_b)
    scored = clusters.join(
        df.select(F.col(id_col).alias("id"), score.alias("q")), "id"
    )
    w = Window.partitionBy("cluster").orderBy(
        F.col("q").desc(), F.col("id").asc()
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .withColumn(
            "n_members",
            F.count(F.lit(1)).over(Window.partitionBy("cluster")),
        )
        .filter(F.col("rn") == 1)
        .select(
            F.col("id").alias("keep_id"),
            "cluster",
            F.col("n_members").cast("long").alias("n_members"),
            "q",
        )
    )


def apply_dedup_keep_best(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str,
    score: Column,
    id_a: str = "id_a",
    id_b: str = "id_b",
) -> DataFrame:
    """Corpus minus every clustered doc EXCEPT its best-scoring member
    — apply_dedup_keep with the production keep policy. Same anti-join
    shape (drop-list unhinted; AQE broadcasts when small)."""
    clusters = connected_components(pairs, id_a, id_b)
    scored = clusters.join(
        df.select(F.col(id_col).alias("id"), score.alias("q")), "id"
    )
    w = Window.partitionBy("cluster").orderBy(
        F.col("q").desc(), F.col("id").asc()
    )
    drop = (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") > 1)
        .select(F.col("id").alias(id_col))
    )
    return df.join(drop, id_col, "left_anti")


def sql_keep_best_per_cluster(
    table: str, id_col: str, pairs_sql: str, score_sql: str
) -> str:
    """Oracle: recursive-closure components + the same (score DESC,
    id ASC) per-cluster rank."""
    comp = sql_connected_components(pairs_sql)
    return f"""
WITH comp AS ({comp}),
scored AS (
  SELECT c.id, c.cluster, q.q,
         row_number() OVER (
           PARTITION BY c.cluster ORDER BY q.q DESC, c.id ASC
         ) AS rn,
         count(*) OVER (PARTITION BY c.cluster) AS n_members
  FROM comp c
  JOIN (SELECT {id_col} AS id, {score_sql} AS q FROM {table}) q
    USING (id)
)
SELECT id AS keep_id, cluster, CAST(n_members AS BIGINT) AS n_members, q
FROM scored WHERE rn = 1
"""


# ---------------------------------------------------------------------------
# LSH parameter planner: the (bands x rows) S-curve
# ---------------------------------------------------------------------------

# Candidate configurations a 100 TB dedup run would choose between.
# (num_hashes, rows_per_band) with rows | num_hashes; bands = n // rows.
LSH_PLAN_GRID: tuple[tuple[int, int], ...] = (
    (16, 1), (16, 2), (16, 4),
    (32, 2), (32, 4),
    (64, 2), (64, 4), (64, 8),
    (128, 4), (128, 8),
)
LSH_PLAN_SIM_STEPS = 19  # s = 0.05 .. 0.95


def lsh_s_curve(
    spark: SparkSession,
    grid: tuple[tuple[int, int], ...] = LSH_PLAN_GRID,
    sim_steps: int = LSH_PLAN_SIM_STEPS,
) -> DataFrame:
    """The banded-LSH design table (Mining of Massive Datasets §3.4,
    Leskovec/Rajaraman/Ullman — public): for each (num_hashes,
    rows-per-band) candidate and each Jaccard similarity s on a 0.05
    grid, the probability a dup pair lands in at least one shared band,

        P(collide | s) = 1 - (1 - s^rows)^bands,

    plus the curve's threshold (1/bands)^(1/rows) — the similarity
    where collision probability inflects. This is the table you read
    BEFORE launching a 100 TB dedup: pick the cheapest config whose
    threshold sits just under your target Jaccard and whose P at the
    target is ~1. Pure closed-form arithmetic on literal grids — no
    corpus scan, identical cost at any data scale; the entry exists so
    the planner the heavy jobs rely on is itself driver-verified.

    Cross-engine floats: JVM Math.pow and DuckDB's libm pow agree to
    <=1 ulp; results are rounded to 6dp, 10 orders of magnitude above
    that noise, and the fixed grid makes the parity check exhaustive
    (every cell is compared, data-independent).
    """
    cfg = local_frame(
        spark,
        [(n, n // r, r) for n, r in grid],
        "num_hashes bigint, bands bigint, rows_per_band bigint",
    )
    s = spark.range(1, sim_steps + 1).select(
        (F.col("id") / F.lit(20.0)).alias("s")
    )
    # literal-grid cross product: |grid| x sim_steps rows, planner-only
    return cfg.crossJoin(s).select(
        "num_hashes",
        "bands",
        "rows_per_band",
        F.round("s", 2).alias("s"),
        F.round(
            F.lit(1.0)
            - F.pow(
                F.lit(1.0) - F.pow("s", F.col("rows_per_band")),
                F.col("bands"),
            ),
            6,
        ).alias("collide_p"),
        F.round(
            F.pow(
                F.lit(1.0) / F.col("bands"),
                F.lit(1.0) / F.col("rows_per_band"),
            ),
            6,
        ).alias("threshold_s"),
    )


def sql_lsh_s_curve(
    grid: tuple[tuple[int, int], ...] = LSH_PLAN_GRID,
    sim_steps: int = LSH_PLAN_SIM_STEPS,
) -> str:
    """DuckDB twin of lsh_s_curve — same literal grids, same arithmetic."""
    vals = ", ".join(f"({n}, {n // r}, {r})" for n, r in grid)
    return f"""
WITH cfg(num_hashes, bands, rows_per_band) AS (VALUES {vals}),
sim AS (SELECT i / 20.0 AS s FROM range(1, {sim_steps + 1}) t(i))
SELECT num_hashes, bands, rows_per_band,
       round(s, 2) AS s,
       round(1.0 - pow(1.0 - pow(s, rows_per_band), bands), 6)
         AS collide_p,
       round(pow(1.0 / bands, 1.0 / rows_per_band), 6) AS threshold_s
FROM cfg CROSS JOIN sim
"""


CONTAIN_THRESHOLD = 0.8


def ngram_containment_pairs(
    df: DataFrame,
    col: str,
    id_col: str,
    n: int = 3,
    threshold: float = CONTAIN_THRESHOLD,
    max_doc_freq: int = NGRAM_MAX_DOC_FREQ,
) -> DataFrame:
    """Asymmetric near-duplicate pairs by shingle CONTAINMENT,
    |A ∩ B| / min(|A|, |B|) — the subset/quote detector that symmetric
    Jaccard structurally misses: a page quoting a short document wholesale
    has containment ~1 while Jaccard ~|small|/|large| falls under any
    dedup threshold (Broder's resemblance-vs-containment distinction,
    "On the Resemblance and Containment of Documents", SEQUENCES 1997).

    Returns (id_a, id_b, containment, jac, contained_id) with id_a <
    id_b, both scores at 6dp, containment >= threshold;
    ``contained_id`` is the smaller (quoted) side, ties to id_a. Pairs
    with HIGH containment and LOW jac are the quote-inclusion set a
    curation stage strips spans from (dedup_strip_spans) rather than
    dropping whole documents.

    Same candidate engine as ngram_jaccard_pairs — shingle equijoin
    with the hot-postings doc-frequency cap and exact hot-set
    correction, so the reported containment is TRUE containment
    whenever the pair shares one non-hot shingle; a CANDIDATE
    GENERATOR at 100 TB, composed into clustering/strip stages, never
    persisted (the quadratic-pair-set argument in ngram_jaccard_pairs'
    docstring applies verbatim).

    Division of labor the cap implies: a pair whose EVERY shared
    shingle is hot — a short document quoted wholesale by more than
    max_doc_freq pages — is invisible here BY DESIGN: enumerating its
    pairs is the exact quadratic blowup the cap exists to stop, and
    that popular-boilerplate head is what repeated_ngram_spans +
    dedup_strip_spans handle span-wise in linear work. This operator
    owns the TAIL: inclusions shared by few documents, where pair
    enumeration is cheap and exact."""
    sh_arr = shingle_frame(df, col, id_col, n).filter(F.size("sh") > 0).cache()
    posts = sh_arr.select(
        "id", F.size("sh").alias("sz"), F.explode("sh").alias("s")
    )
    hot = (
        posts.groupBy("s")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") > max_doc_freq)
        .select("s")
        .cache()
    )
    has_hot = hot.count() > 0
    capped = (
        posts.join(F.broadcast(hot), "s", "left_anti") if has_hot else posts
    )
    a, b = capped.alias("a"), capped.alias("b")
    pair_inter = (
        a.join(
            b, (F.col("a.s") == F.col("b.s")) & (F.col("a.id") < F.col("b.id"))
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
            posts.join(F.broadcast(hot), "s", "left_semi")
            .groupBy("id")
            .agg(F.collect_set("s").alias("hs"))
        )
        empty = F.array().cast("array<string>")
        inter = F.col("inter_c") + F.size(
            F.array_intersect(
                F.coalesce(F.col("hs_a"), empty),
                F.coalesce(F.col("hs_b"), empty),
            )
        )
        pair_inter = pair_inter.join(
            hot_sets.select(F.col("id").alias("id_a"), F.col("hs").alias("hs_a")),
            "id_a",
            "left",
        ).join(
            hot_sets.select(F.col("id").alias("id_b"), F.col("hs").alias("hs_b")),
            "id_b",
            "left",
        )
    else:
        inter = F.col("inter_c")
    scored = pair_inter.select(
        "id_a",
        "id_b",
        F.round(
            inter.cast("double") / F.least("sz_a", "sz_b"), 6
        ).alias("containment"),
        F.round(
            inter.cast("double") / (F.col("sz_a") + F.col("sz_b") - inter), 6
        ).alias("jac"),
        F.when(F.col("sz_a") <= F.col("sz_b"), F.col("id_a"))
        .otherwise(F.col("id_b"))
        .alias("contained_id"),
    )
    return scored.filter(F.col("containment") >= threshold)


def sql_ngram_containment_pairs(
    table: str,
    col: str,
    id_col: str,
    n: int = 3,
    threshold: float = CONTAIN_THRESHOLD,
    max_doc_freq: int = NGRAM_MAX_DOC_FREQ,
) -> str:
    cont = "round(CAST(i AS DOUBLE) / least(sz_a, sz_b), 6)"
    return f"""
WITH sh0 AS (
  SELECT {id_col} AS id, {sql_shingles(col, n)} AS sh FROM {table}
),
nonempty AS (SELECT * FROM sh0 WHERE len(sh) > 0),
posts AS (SELECT id, unnest(sh) AS s FROM nonempty),
hot AS (
  SELECT s FROM (SELECT s, count(*) AS df FROM posts GROUP BY s)
  WHERE df > {max_doc_freq}
),
capped AS (SELECT * FROM posts WHERE s NOT IN (SELECT s FROM hot)),
pair_inter AS (
  SELECT a.id AS id_a, b.id AS id_b, count(*) AS inter_c
  FROM capped a JOIN capped b ON a.s = b.s AND a.id < b.id
  GROUP BY a.id, b.id
),
hot_sets AS (
  SELECT id, list(s) AS hs FROM posts WHERE s IN (SELECT s FROM hot) GROUP BY id
),
sizes AS (SELECT id, len(sh) AS sz FROM nonempty),
scored AS (
  SELECT id_a, id_b,
         inter_c + len(list_intersect(COALESCE(ha.hs, []), COALESCE(hb.hs, []))) AS i,
         sa.sz AS sz_a, sb.sz AS sz_b
  FROM pair_inter
  JOIN sizes sa ON sa.id = id_a
  JOIN sizes sb ON sb.id = id_b
  LEFT JOIN hot_sets ha ON ha.id = id_a
  LEFT JOIN hot_sets hb ON hb.id = id_b
)
SELECT id_a, id_b,
       {cont} AS containment,
       round(CAST(i AS DOUBLE) / (sz_a + sz_b - i), 6) AS jac,
       CASE WHEN sz_a <= sz_b THEN id_a ELSE id_b END AS contained_id
FROM scored
WHERE {cont} >= {threshold}
"""


def dedup_method_eval(
    df: DataFrame,
    col: str,
    id_col: str,
    threshold: float = 0.5,
    max_hamming: int = 3,
) -> DataFrame:
    """(method, n_pred, n_true, n_hit, precision_micro, recall_micro,
    f1_micro): pair-retrieval quality of the sub-quadratic candidate
    stages against exact n-gram Jaccard ground truth — the
    method-selection table read before committing a 100 TB dedup run
    to a banding scheme. Complements minhash_est_error (per-pair
    sketch accuracy) and sim_recall_report (ANN recall): this scores
    the END-TO-END pair sets the dedup pipelines actually consume.

      minhash_lsh   banded MinHash, verified true-Jaccard >= threshold
                    (precision ~1 by construction; the number under
                    test is the banding stage's RECALL)
      simhash_h3    hamming <= ``max_hamming`` on 60-bit SimHash — a
                    DIFFERENT similarity; both its precision and
                    recall vs Jaccard truth are the finding

    F1 is computed as 2*hit/(pred+true) — one float expression from
    exact integer counts, not from the two already-rounded ratios.

    Protocol note for 100 TB: exact ground truth is quadratic-adjacent
    work; run the eval on a content-addressed document sample
    (hash_sample) — the standard sampled-eval protocol — and ship the
    chosen method to the full corpus. At fixture scale the full corpus
    IS the sample."""
    spark = df.sparkSession
    truth = (
        ngram_jaccard_pairs(df, col, id_col, threshold=threshold)
        .select("id_a", "id_b")
        .cache()
    )
    n_true = truth.count()  # scalar: plan literal (one bounded job)
    preds = (
        minhash_lsh_pairs(df, col, id_col, threshold=threshold)
        .select(F.lit("minhash_lsh").alias("method"), "id_a", "id_b")
        .unionByName(
            simhash_near_pairs(df, col, id_col, max_hamming=max_hamming)
            .select(F.lit("simhash_h3").alias("method"), "id_a", "id_b")
        )
    )
    pred_cnt = preds.groupBy("method").agg(F.count(F.lit(1)).alias("n_pred"))
    hit_cnt = (
        preds.join(truth, ["id_a", "id_b"])
        .groupBy("method")
        .agg(F.count(F.lit(1)).alias("n_hit"))
    )
    # literal method anchor: a method that predicts NOTHING still gets
    # its row (n_pred = 0, precision NULL) instead of vanishing
    methods = spark.range(1).select(
        F.explode(
            F.array(F.lit("minhash_lsh"), F.lit("simhash_h3"))
        ).alias("method")
    )
    from hash_db_spark.operators.curation import micro_col

    base = (
        methods.join(pred_cnt, "method", "left")
        .join(hit_cnt, "method", "left")
        .select(
            "method",
            F.coalesce("n_pred", F.lit(0)).alias("n_pred"),
            F.lit(n_true).alias("n_true"),
            F.coalesce("n_hit", F.lit(0)).alias("n_hit"),
        )
    )
    precision = F.col("n_hit").cast("double") / F.when(
        F.col("n_pred") != 0, F.col("n_pred").cast("double")
    )
    recall = F.col("n_hit").cast("double") / F.when(
        F.col("n_true") != 0, F.col("n_true").cast("double")
    )
    f1 = (F.lit(2.0) * F.col("n_hit").cast("double")) / F.when(
        (F.col("n_pred") + F.col("n_true")) != 0,
        (F.col("n_pred") + F.col("n_true")).cast("double"),
    )
    return base.select(
        "method",
        "n_pred",
        "n_true",
        "n_hit",
        micro_col(precision).alias("precision_micro"),
        micro_col(recall).alias("recall_micro"),
        micro_col(f1).alias("f1_micro"),
    ).orderBy("method")


def sql_dedup_method_eval(
    table: str,
    col: str,
    id_col: str,
    threshold: float = 0.5,
    max_hamming: int = 3,
) -> str:
    from hash_db_spark.operators.curation import sql_micro

    precision = (
        "(CAST(n_hit AS DOUBLE) / CAST(NULLIF(n_pred, 0) AS DOUBLE))"
    )
    recall = "(CAST(n_hit AS DOUBLE) / CAST(NULLIF(n_true, 0) AS DOUBLE))"
    f1 = (
        "(2.0 * CAST(n_hit AS DOUBLE)"
        " / CAST(NULLIF(n_pred + n_true, 0) AS DOUBLE))"
    )
    return f"""
WITH truth AS (
  SELECT id_a, id_b FROM ({sql_ngram_jaccard_pairs(table, col, id_col, threshold=threshold)})
),
tcnt AS (SELECT count(*) AS n_true FROM truth),
preds AS (
  SELECT 'minhash_lsh' AS method, id_a, id_b
  FROM ({sql_minhash_lsh_pairs(table, col, id_col, threshold=threshold)})
  UNION ALL
  SELECT 'simhash_h3', id_a, id_b
  FROM ({sql_simhash_near_pairs(table, col, id_col, max_hamming=max_hamming)})
),
methods AS (SELECT 'minhash_lsh' AS method UNION ALL SELECT 'simhash_h3'),
pred_cnt AS (SELECT method, count(*) AS n_pred FROM preds GROUP BY method),
hit_cnt AS (
  SELECT method, count(*) AS n_hit
  FROM preds JOIN truth USING (id_a, id_b)
  GROUP BY method
),
base AS (
  SELECT m.method,
         CAST(COALESCE(p.n_pred, 0) AS BIGINT) AS n_pred,
         CAST(t.n_true AS BIGINT) AS n_true,
         CAST(COALESCE(h.n_hit, 0) AS BIGINT) AS n_hit
  FROM methods m
  LEFT JOIN pred_cnt p USING (method)
  LEFT JOIN hit_cnt h USING (method)
  CROSS JOIN tcnt t
)
SELECT method, n_pred, n_true, n_hit,
       {sql_micro(precision)} AS precision_micro,
       {sql_micro(recall)} AS recall_micro,
       {sql_micro(f1)} AS f1_micro
FROM base
ORDER BY method
"""


# --- edit-distance verification of candidate pairs -----------------------------

EDIT_SIM_T = 0.8
EDIT_PREFIX = 256


def edit_verify_pairs(
    df: DataFrame,
    pairs: DataFrame,
    col: str,
    id_col: str,
    threshold: float = EDIT_SIM_T,
    prefix: int = EDIT_PREFIX,
) -> DataFrame:
    """(id_a, id_b, edit_sim): re-verify candidate near-dup pairs with
    normalized Levenshtein similarity 1 - lev/max(len_a, len_b) over
    the first ``prefix`` chars, keeping pairs >= threshold.

    Shingle Jaccard (the LSH verifier) is order-insensitive: a doc and
    its sentence-shuffled twin score high even when no human would call
    them the same edit lineage. Edit similarity is the order-SENSITIVE
    second opinion — the standard confirmation stage before destructive
    span-stripping (it's what near-dup eval suites like Mou et al.'s
    use as ground truth when shingles disagree).

    Scale shape: this stage is OUTPUT-BOUND — cost is linear in the
    CANDIDATE PAIR count, which grows quadratically in duplicate-
    cluster sizes (measured: 10x corpus -> ~100x pairs -> ~150x wall;
    ~1.5x per unit of output). Budget the candidate set upstream (LSH
    threshold, hot-bucket caps) before spending prefix^2 DP cells per
    pair. Per pair the Levenshtein is JVM-codegen (no Python) and the
    prefix cap bounds the DP — a 100 MB outlier doc can't turn one
    pair into a 10^16-cell problem; both engines cut at the same
    boundary so parity is exact. A length-difference prefilter applies
    the exact bound lev >= |len_a - len_b| first, skipping the DP for
    pairs whose sizes already rule them out (free on near-dup inputs,
    decisive when candidates come from looser generators). The two id
    equijoins ship (id, prefix-chars) rows only. Empty-vs-empty scores
    1.0 (the max(len,1) guard); empty-vs-nonempty scores 0.0."""
    t = df.select(
        F.col(id_col).alias("id"),
        F.substring(F.col(col), 1, prefix).alias("t"),
    )
    from hash_db_spark.functions.rounding import round_half_away_col

    la, lb = F.length("ta"), F.length("tb")
    denom = F.greatest(la, lb, F.lit(1))
    # exact pruning bound: lev >= |la - lb|  =>  sim <= 1 - |la-lb|/max;
    # round() is monotone, so filtering on the rounded bound never
    # drops a pair the rounded similarity would keep.
    # round_half_away_col, not F.round: the bound gates the SAME pairs
    # the oracle's DuckDB round() gates, and edit_sim is hash-compared —
    # decimal-tie doubles diverge under F.round (functions/rounding.py)
    bound = round_half_away_col(1.0 - F.abs(la - lb) / denom, 6)
    # banded DP: lev above max_dist can't pass the threshold for ANY
    # pair (lev <= max(len) = denom <= prefix, so lev > (1-T)*prefix
    # => lev/denom > 1-T => sim < T), so the 3-arg levenshtein's -1
    # early-exit is EXACT — it only drops pairs the threshold filter
    # would drop. DP cost falls from prefix^2 to prefix*max_dist.
    # ceil, not floor: if (1-T)*prefix computes a hair under an integer
    # value, flooring could drop a pair sitting exactly AT the
    # threshold; one extra band row is free
    import math as _math

    max_dist = int(_math.ceil((1.0 - threshold) * prefix))
    lev = F.levenshtein("ta", "tb", max_dist)
    scored = (
        pairs.select("id_a", "id_b")
        .join(t.withColumnRenamed("id", "id_a").withColumnRenamed("t", "ta"), "id_a")
        .join(t.withColumnRenamed("id", "id_b").withColumnRenamed("t", "tb"), "id_b")
        .filter(bound >= threshold)
        .select(
            "id_a",
            "id_b",
            F.when(lev < 0, F.lit(-1.0))
            .otherwise(round_half_away_col(1.0 - lev / denom, 6))
            .alias("edit_sim"),
        )
    )
    # LAZY checkpoint between scoring and filtering: pushing the
    # edit_sim filter through the projection would substitute the
    # levenshtein expression into the predicate and re-evaluate the DP
    # up to 4x per row (measured: 224s -> ~50s on 250k pairs at 10x).
    # The checkpointed frame is 2 longs + 1 double per CANDIDATE —
    # negligible next to the DP it prevents re-running; lazy, so no
    # work happens until the caller's first action.
    return scored.localCheckpoint(eager=False).filter(
        F.col("edit_sim") >= threshold
    )


def sql_edit_verify_pairs(
    table: str,
    col: str,
    id_col: str,
    pairs_sql: str,
    threshold: float = EDIT_SIM_T,
    prefix: int = EDIT_PREFIX,
) -> str:
    return f"""
WITH cand AS ({pairs_sql}),
txt AS (
  SELECT {id_col} AS id, substring({col}, 1, {prefix}) AS t FROM {table}
),
pruned AS (
  SELECT c.id_a, c.id_b, a.t AS ta, b.t AS tb,
         greatest(length(a.t), length(b.t), 1) AS denom
  FROM cand c
  JOIN txt a ON a.id = c.id_a
  JOIN txt b ON b.id = c.id_b
  WHERE round(1.0 - abs(length(a.t) - length(b.t))
        / greatest(length(a.t), length(b.t), 1), 6) >= {threshold}
)
SELECT id_a, id_b, edit_sim FROM (
  SELECT id_a, id_b,
         round(1.0 - levenshtein(ta, tb) / denom, 6) AS edit_sim
  FROM pruned
)
WHERE edit_sim >= {threshold}
"""
