"""Deterministic HyperLogLog distinct-count sketch (engine-portable).

The reference engine has no approximate-distinct capability, and Spark's
own ``approx_count_distinct`` uses a JVM-internal hash, so its estimates
cannot be reproduced by any other engine (or even asserted in a fixture).
This module builds HLL from first principles on top of md5 — the same
content-addressed hashing discipline the repo's sampling/bucketing ops use
— so the *identical* estimate is computable in DuckDB SQL and the entry is
hash-comparable like every other registry query.

Why this matters at 100 TB: ``count(DISTINCT key)`` shuffles every distinct
key; the HLL sketch shuffles at most ``m=256`` register rows per group
(after map-side partial max), is mergeable (max is associative), and
supports rollups — per-shard sketches combine into the exact same global
sketch the full data would produce (``hll_merge_rollup`` demonstrates
this). Standard error is 1.04/sqrt(256) ~ 6.5%.

Portability details (both engines produce bit-identical results):
- register = first 2 md5 hex chars (m=256, p=8); the rank input w is the
  next 13 hex chars (52 bits).
- rho (leftmost-1-bit position) is derived with pure string ops — strip
  leading zero hex digits, then a 4-way CASE on the first non-zero digit —
  no float log2, whose last-ulp behavior differs between libm and the JVM.
- the harmonic-mean denominator is accumulated as an exact *integer*
  sum(2^(53-rho)) — float summation of 2^-rho terms is order-dependent at
  the 2^-53 ulp boundary, and Spark/DuckDB reduce in different orders.
- rounding uses floor(x*scale + 0.5) (values are non-negative), the
  portable form from ``functions/rounding.py``.

No counterpart in the reference (free win); the registry entries run on
the ``events`` table (distinct users per event type / global rollup).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
import pyspark.sql.functions as F

M = 256  # registers (p = 8)
TWO53 = 9007199254740992  # 2^53; rank values are 52-bit


def _rho(hx: Column) -> Column:
    """Leftmost-1-bit position (1-based) of the 52-bit word in md5 hex
    chars 3..15; 53 when the word is zero. String-only arithmetic."""
    s = F.regexp_replace(F.substring(hx, 3, 13), "^0+", "")
    d = F.substring(s, 1, 1)
    msb = (
        F.when(d == "1", 0)
        .when(d.isin("2", "3"), 1)
        .when(d.isin("4", "5", "6", "7"), 2)
        .otherwise(3)
    )
    return F.when(s == "", 53).otherwise(
        52 - ((F.length(s) - 1) * 4 + msb)
    )


def register_rows(df: DataFrame, key: str, *group_cols: str) -> DataFrame:
    """(group..., reg, mj): the per-group HLL registers — max rho per
    register. This IS the sketch; it is mergeable by further max."""
    hx = F.md5(F.col(key).cast("string"))
    reg = F.conv(F.substring(hx, 1, 2), 16, 10).cast("int").alias("reg")
    return (
        df.select(*group_cols, reg, _rho(hx).alias("rho"))
        .groupBy(*group_cols, "reg")
        .agg(F.max("rho").alias("mj"))
    )


def estimate(regs: DataFrame, *group_cols: str) -> DataFrame:
    """(group..., approx_distinct): HLL estimate from register rows, with
    the standard small-range (linear counting) correction."""
    agg = regs.groupBy(*group_cols).agg(
        # exact integer accumulation: 2^(53-mj) is a dyadic integer
        F.sum(F.pow(F.lit(2.0), F.lit(53) - F.col("mj")).cast("long")).alias(
            "zi"
        ),
        F.count(F.lit(1)).alias("used"),
    )
    denom = (F.col("zi") + (F.lit(M) - F.col("used")) * F.lit(TWO53)).cast(
        "double"
    )
    alpha_num = (
        (F.lit(0.7213) / (F.lit(1.0) + F.lit(1.079) / F.lit(256.0)))
        * F.lit(65536.0)
        * F.lit(9007199254740992.0)
    )
    e_raw = alpha_num / denom
    v = F.lit(M) - F.col("used")
    e = F.when(
        (e_raw <= F.lit(2.5 * M)) & (v > 0),
        F.lit(float(M)) * F.log(F.lit(float(M)) / v.cast("double")),
    ).otherwise(e_raw)
    rounded = F.floor(e * F.lit(100.0) + F.lit(0.5)) / F.lit(100.0)
    return agg.select(*group_cols, rounded.alias("approx_distinct"))


def hll_distinct(df: DataFrame, key: str, *group_cols: str) -> DataFrame:
    """Per-group approximate distinct count of ``key``."""
    return estimate(register_rows(df, key, *group_cols), *group_cols)


# --------------------------------------------------------------------- SQL


def _sql_rho(hx: str) -> str:
    s = f"regexp_replace(substr({hx}, 3, 13), '^0+', '')"
    return f"""(CASE WHEN {s} = '' THEN 53 ELSE
      52 - ((length({s}) - 1) * 4 +
        (CASE WHEN substr({s}, 1, 1) = '1' THEN 0
              WHEN substr({s}, 1, 1) IN ('2', '3') THEN 1
              WHEN substr({s}, 1, 1) IN ('4', '5', '6', '7') THEN 2
              ELSE 3 END)) END)"""


def sql_register_rows(table: str, key_expr: str, group_cols: str) -> str:
    hx = f"md5(CAST({key_expr} AS VARCHAR))"
    gc = f"{group_cols}, " if group_cols else ""
    return f"""
  SELECT {gc}('0x' || substr({hx}, 1, 2))::BIGINT AS reg,
         max({_sql_rho(hx)}) AS mj
  FROM {table} GROUP BY {gc}reg
"""


# ------------------------------------------------------------ count-min
#
# Same engine-portability discipline as the HLL above: Spark's own
# CountMinSketch aggregate lives behind a JVM-internal hash, so its cells
# can't be reproduced (or asserted) anywhere else. This one is md5-derived
# and bit-identical in DuckDB SQL.
#
# Shape at 100 TB: the sketch is D*W cells (4*512 longs here) regardless
# of key cardinality — a frequency table over billions of keys becomes a
# fixed 16 KB grid after map-side partial sums; shards merge by cell-wise
# addition (sum is associative), so per-partition/per-day sketches roll up
# without touching raw keys again. Estimates only over-count (min over D
# independent rows), never under-count — the right direction for
# heavy-hitter screening (no false negatives above the threshold).

CMS_D = 4  # hash rows
CMS_W = 512  # cells per row


def _cms_coord(i: int, key: Column, w: int) -> Column:
    """Row-i cell coordinate: first 32 md5 bits of 'i:key', mod w."""
    hx = F.md5(F.concat(F.lit(f"{i}:"), key.cast("string")))
    return (F.conv(F.substring(hx, 1, 8), 16, 10).cast("long") % w).alias(
        "col"
    )


def cms_cells(
    df: DataFrame, key: str, *group_cols: str, d: int = CMS_D, w: int = CMS_W
) -> DataFrame:
    """(group..., row, col, c): the count-min grid — one increment per
    input row in one cell per hash row. This IS the sketch; shards merge
    by summing c cell-wise."""
    coords = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(i).alias("row"), _cms_coord(i, F.col(key), w)
                )
                for i in range(d)
            ]
        )
    ).alias("cell")
    return (
        df.select(*group_cols, coords)
        .select(*group_cols, "cell.row", "cell.col")
        .groupBy(*group_cols, "row", "col")
        .agg(F.count(F.lit(1)).alias("c"))
    )


def cms_estimate(
    cells: DataFrame,
    probes: DataFrame,
    key: str,
    d: int = CMS_D,
    w: int = CMS_W,
    pre_merged: bool = False,
) -> DataFrame:
    """(key, est): point-frequency estimate for each probe key = min over
    the D rows of that key's cell. ``probes`` is small by nature (the
    keys you're asking about), so its exploded coordinates broadcast into
    the cell join; the grid itself is tiny after aggregation.

    ``pre_merged``: pass True ONLY when ``cells`` already holds one row
    per (row, col) — the defensive shard-merge below is then skipped
    (Catalyst can't prove an aggregation idempotent, so the redundant
    groupBy otherwise costs a real shuffle: measured +46% on the
    merge-heavy-hitters benchmark entry)."""
    coords = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(i).alias("row"), _cms_coord(i, F.col(key), w)
                )
                for i in range(d)
            ]
        )
    ).alias("cell")
    probe_cells = probes.select(key, coords).select(
        key, "cell.row", "cell.col"
    )
    # Merge shards to one count per (row, col) first: min() over per-shard
    # counts would under-estimate, violating the CMS never-undercount
    # guarantee. Semantically a no-op on already-merged input — callers
    # that just merged assert that with pre_merged=True to skip the
    # shuffle.
    merged = (
        cells
        if pre_merged
        else cells.groupBy("row", "col").agg(F.sum("c").alias("c"))
    )
    return (
        probe_cells.join(merged, ["row", "col"], "left")
        .groupBy(key)
        .agg(F.min(F.coalesce(F.col("c"), F.lit(0))).alias("est"))
    )


def sql_cms_cells(
    table: str, key_expr: str, group_cols: str, d: int = CMS_D, w: int = CMS_W
) -> str:
    gc = f"{group_cols}, " if group_cols else ""
    rows = " UNION ALL ".join(
        f"SELECT {gc}{i} AS row, "
        f"(('0x' || substr(md5('{i}:' || CAST({key_expr} AS VARCHAR)), 1, 8))"
        f"::BIGINT % {w}) AS col FROM {table}"
        for i in range(d)
    )
    return (
        f"SELECT {gc}row, col, count(*) AS c FROM ({rows}) "
        f"GROUP BY {gc}row, col"
    )


def sql_cms_probe_cells(
    probes_sql: str, key_col: str, d: int = CMS_D, w: int = CMS_W
) -> str:
    """Exploded (key, row, col) coordinates for a probe-key relation."""
    return " UNION ALL ".join(
        f"SELECT {key_col}, {i} AS row, "
        f"(('0x' || substr(md5('{i}:' || CAST({key_col} AS VARCHAR)), 1, 8))"
        f"::BIGINT % {w}) AS col FROM ({probes_sql})"
        for i in range(d)
    )


def sql_estimate(group_cols: str) -> str:
    """SELECT body over a CTE named ``regs`` (from sql_register_rows)."""
    gc = f"{group_cols}, " if group_cols else ""
    gb = f"GROUP BY {group_cols}" if group_cols else ""
    sel = f"{group_cols}, " if group_cols else ""
    return f"""
agg AS (
  SELECT {gc}sum(CAST(power(2.0, 53 - mj) AS BIGINT)) AS zi,
         count(*) AS used
  FROM regs {gb}
),
est AS (
  SELECT {sel}
    (0.7213 / (1.0 + 1.079 / 256.0)) * 65536.0 * 9007199254740992.0
      / CAST(zi + (256 - used) * 9007199254740992 AS DOUBLE) AS e_raw,
    256 - used AS v
  FROM agg
)
SELECT {sel}
  floor((CASE WHEN e_raw <= 640.0 AND v > 0
         THEN 256.0 * ln(256.0 / CAST(v AS DOUBLE)) ELSE e_raw END)
        * 100.0 + 0.5) / 100.0 AS approx_distinct
FROM est
"""


# ---------------------------------------------------------------- bloom
#
# Same md5 discipline once more: Spark's own BloomFilter aggregate
# (stat.BloomFilter / bloom_filter_agg) hashes JVM-side and can't be
# reproduced cross-engine. This one is a set of bit positions derived
# from md5, so DuckDB computes the identical filter.
#
# Scale: the filter is AT MOST m distinct bit rows however large the
# member set is — the decontamination screen against a benchmark suite
# broadcasts ~m ints, not the suite; membership never false-negatives,
# so screening is safe (false positives are discarded by the exact
# verify that follows candidates).

BLOOM_K = 3  # hash functions
BLOOM_M = 8192  # bits


def bloom_bits(
    df: DataFrame, key: str, k: int = BLOOM_K, m: int = BLOOM_M
) -> DataFrame:
    """(bit): the distinct set-bit positions of the filter over ``key``
    — this IS the Bloom filter; shards merge by set union (distinct)."""
    coords = F.explode(
        F.array(*[_cms_coord(i, F.col(key), m) for i in range(k)])
    ).alias("bit")
    return df.select(coords).distinct()


def bloom_member_pred(
    bits: DataFrame, key, k: int = BLOOM_K, m: int = BLOOM_M
):
    """MAP-SIDE Bloom membership predicate over column ``key``: the bit
    set collapses to one m-bit mask packed into an m/64-element int64
    array LITERAL, and membership is k O(1) bit_get probes — no
    shuffle, no distinct, no join. This is the runtime-filter shape:
    the fact table is filtered in its scan stage (whole-stage codegen)
    and only the ~joining fraction (+ the bounded false-positive tail)
    reaches the exact join. (First cut used an m-char '0'/'1' string
    literal + substring, which is O(position) per probe on a UTF8
    string — 9x slower on the sf0.1 fact scan.)

    The collect here is the FILTER, not the corpus: at most m (=8192)
    single-int rows regardless of member-set or probe-set size — the
    scale-invariant broadcast the technique exists to enable. Never
    false-negative; callers must still exact-join to drop false
    positives."""
    if isinstance(key, str):
        key = F.col(key)
    words = [0] * ((m + 63) // 64)
    for r in bits.collect():
        b = int(r["bit"])
        words[b >> 6] |= 1 << (b & 63)
    # int64 literals are signed: fold bit 63 into the sign
    arr = F.lit([w - (1 << 64) if w >= (1 << 63) else w for w in words])
    pred = None
    for i in range(k):
        coord = _cms_coord(i, key, m)
        word = F.element_at(
            arr, (F.shiftright(coord, 6) + 1).cast("int")
        )
        hit = F.bit_get(word, coord.bitwiseAND(F.lit(63))) == 1
        pred = hit if pred is None else (pred & hit)
    return pred


def bloom_candidates(
    bits: DataFrame,
    probes: DataFrame,
    key: str,
    k: int = BLOOM_K,
    m: int = BLOOM_M,
) -> DataFrame:
    """Probe keys whose k positions are ALL set (Bloom 'maybe-member').
    Never drops a true member; false-positive rate ~(1-e^(-kn/m))^k."""
    coords = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(i).alias("i"), _cms_coord(i, F.col(key), m)
                )
                for i in range(k)
            ]
        )
    ).alias("c")
    pc = probes.select(key, coords).select(key, "c.i", F.col("c.col").alias("bit"))
    return (
        pc.join(F.broadcast(bits), "bit")
        .groupBy(key)
        .agg(F.countDistinct("i").alias("__k_hit"))
        .filter(F.col("__k_hit") == k)
        .select(key)
    )


def sql_bloom_bits(
    members_sql: str, key_col: str, k: int = BLOOM_K, m: int = BLOOM_M
) -> str:
    rows = " UNION ALL ".join(
        f"SELECT (('0x' || substr(md5('{i}:' || CAST({key_col} AS VARCHAR)),"
        f" 1, 8))::BIGINT % {m}) AS bit FROM ({members_sql})"
        for i in range(k)
    )
    return f"SELECT DISTINCT bit FROM ({rows})"


def sql_bloom_candidates(
    bits_cte: str,
    probes_sql: str,
    key_col: str,
    k: int = BLOOM_K,
    m: int = BLOOM_M,
) -> str:
    """Candidates whose k positions are all present in CTE ``bits_cte``."""
    pc = " UNION ALL ".join(
        f"SELECT {key_col}, {i} AS i, "
        f"(('0x' || substr(md5('{i}:' || CAST({key_col} AS VARCHAR)), 1, 8))"
        f"::BIGINT % {m}) AS bit FROM ({probes_sql})"
        for i in range(k)
    )
    return f"""
SELECT {key_col} FROM ({pc}) pc
JOIN {bits_cte} b ON pc.bit = b.bit
GROUP BY {key_col} HAVING count(DISTINCT i) = {k}
"""


# --- KMV (k-minimum-values / theta-style) distinct sketches ------------------
#
# The set-operation gap in the sketch family: HLL registers union cleanly
# but cannot INTERSECT; a KMV sketch (the k smallest hash values of a
# set — Bar-Yossef et al. "Counting distinct elements in a data stream",
# RANDOM 2002; the DataSketches theta-sketch family) supports
# intersection estimates via the Jaccard share of the combined sketch.
# Deterministic by construction here: the hash is the house md5 idiom,
# so "k smallest hashes" is a pure function of the member set and both
# engines agree exactly.

KMV_K = 64
KMV_M = 1 << 52  # 13 md5 nibbles -> uniform in [0, 2^52)


def kmv_hash(key: Column | str) -> Column:
    c = F.col(key) if isinstance(key, str) else key
    return F.conv(
        F.substring(F.md5(c.cast("string")), 1, 13), 16, 10
    ).cast("long")


def sql_kmv_hash(key_expr: str) -> str:
    return (
        f"(('0x' || substr(md5(CAST({key_expr} AS VARCHAR)), 1, 13))"
        f"::BIGINT)"
    )


def kmv_sketch(
    df: DataFrame, key: str, group_col: str, k: int = KMV_K
) -> DataFrame:
    """(grp, rank, h): each group's k smallest distinct key hashes.
    Scale shape: one distinct shuffle on (grp, h), one per-group window
    (partitions are per-group, parallel across groups); the output is
    k rows per group — the thing you persist and merge, never the
    member set."""
    from pyspark.sql import Window

    hframe = df.select(
        F.col(group_col).alias("grp"), kmv_hash(key).alias("h")
    ).distinct()
    w = Window.partitionBy("grp").orderBy(F.col("h").asc())
    return (
        hframe.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def kmv_estimate(sketch: DataFrame, k: int = KMV_K) -> DataFrame:
    """(grp, est): distinct-count estimate per group — exact when the
    sketch holds the whole set (n < k), else the KMV estimator
    (k-1) * M / h_k."""
    return sketch.groupBy("grp").agg(
        F.round(
            F.when(
                F.count(F.lit(1)) < k,
                F.count(F.lit(1)).cast("double"),
            ).otherwise(
                F.lit(float(k - 1))
                * F.lit(float(KMV_M))
                / F.max("h").cast("double")
            ),
            4,
        ).alias("est")
    )


def kmv_pair_intersections(
    sketch: DataFrame, k: int = KMV_K
) -> DataFrame:
    """(grp_a, grp_b, est_shared): estimated distinct-intersection size
    for every group pair, from sketches alone — the query exact
    count-distinct can't serve at 100 TB without a corpus-sized
    self-join. Combined-sketch protocol: take the k smallest hashes of
    the UNION of both sketches, measure the share present in both, and
    scale the union estimate by that share. All frames here are
    (groups x k)-sized."""
    from pyspark.sql import Window

    a = sketch.select(
        F.col("grp").alias("grp_a"), F.col("h").alias("h")
    )
    b = sketch.select(
        F.col("grp").alias("grp_b"), F.col("h").alias("h")
    )
    pairs = (
        a.select("grp_a")
        .distinct()
        .crossJoin(b.select("grp_b").distinct())
        .filter(F.col("grp_a") < F.col("grp_b"))
    )
    comb = (
        pairs.join(a, "grp_a")
        .select("grp_a", "grp_b", "h")
        .union(pairs.join(b, "grp_b").select("grp_a", "grp_b", "h"))
        .distinct()
    )
    w = Window.partitionBy("grp_a", "grp_b").orderBy(F.col("h").asc())
    topk = comb.withColumn("rn", F.row_number().over(w)).filter(
        F.col("rn") <= k
    )
    flagged = (
        topk.join(
            a.withColumn("in_a", F.lit(1)), ["grp_a", "h"], "left"
        )
        .join(b.withColumn("in_b", F.lit(1)), ["grp_b", "h"], "left")
    )
    return flagged.groupBy("grp_a", "grp_b").agg(
        F.round(
            (
                F.sum(
                    F.when(
                        F.col("in_a").isNotNull()
                        & F.col("in_b").isNotNull(),
                        1,
                    ).otherwise(0)
                ).cast("double")
                / F.count(F.lit(1)).cast("double")
            )
            * F.when(
                F.count(F.lit(1)) < k, F.count(F.lit(1)).cast("double")
            ).otherwise(
                F.lit(float(k - 1))
                * F.lit(float(KMV_M))
                / F.max("h").cast("double")
            ),
            4,
        ).alias("est_shared")
    )


def sql_kmv_pair_intersections(
    table: str, key_expr: str, group_col: str, k: int = KMV_K
) -> str:
    """Oracle: identical hashing, ranks, and estimator arithmetic."""
    h = sql_kmv_hash(key_expr)
    return f"""
WITH hframe AS (
  SELECT DISTINCT {group_col} AS grp, {h} AS h FROM {table}
),
sk AS (
  SELECT grp, h,
         row_number() OVER (PARTITION BY grp ORDER BY h ASC) AS rank
  FROM hframe QUALIFY rank <= {k}
),
pairs AS (
  SELECT a.grp AS grp_a, b.grp AS grp_b
  FROM (SELECT DISTINCT grp FROM sk) a, (SELECT DISTINCT grp FROM sk) b
  WHERE a.grp < b.grp
),
comb AS (
  SELECT DISTINCT p.grp_a, p.grp_b, s.h
  FROM pairs p JOIN sk s ON s.grp = p.grp_a OR s.grp = p.grp_b
),
topk AS (
  SELECT grp_a, grp_b, h,
         row_number() OVER (
           PARTITION BY grp_a, grp_b ORDER BY h ASC
         ) AS rn
  FROM comb QUALIFY rn <= {k}
),
flagged AS (
  SELECT t.grp_a, t.grp_b, t.h,
         (sa.h IS NOT NULL) AS in_a, (sb.h IS NOT NULL) AS in_b
  FROM topk t
  LEFT JOIN sk sa ON sa.grp = t.grp_a AND sa.h = t.h
  LEFT JOIN sk sb ON sb.grp = t.grp_b AND sb.h = t.h
)
SELECT grp_a, grp_b,
       round(
         (CAST(sum(CASE WHEN in_a AND in_b THEN 1 ELSE 0 END) AS DOUBLE)
          / count(*))
         * (CASE WHEN count(*) < {k} THEN CAST(count(*) AS DOUBLE)
                 ELSE CAST({k - 1} AS DOUBLE) * CAST({KMV_M} AS DOUBLE)
                      / CAST(max(h) AS DOUBLE) END),
         4) AS est_shared
FROM flagged GROUP BY grp_a, grp_b
"""


def kmv_merge(
    sketch_a: DataFrame, sketch_b: DataFrame, k: int = KMV_K
) -> DataFrame:
    """Union-merge two KMV sketch frames (grp, rank, h) into one: per
    group, the k smallest distinct hashes across both — EXACTLY the
    sketch of the unioned member sets, which is the property that makes
    sketches shippable: per-partition/per-day sketches merge into
    per-corpus ones without revisiting members. (k smallest of
    (k smallest of A) ∪ (k smallest of B) = k smallest of A ∪ B.)"""
    from pyspark.sql import Window

    both = (
        sketch_a.select("grp", "h")
        .union(sketch_b.select("grp", "h"))
        .distinct()
    )
    w = Window.partitionBy("grp").orderBy(F.col("h").asc())
    return (
        both.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )
