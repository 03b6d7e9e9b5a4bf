"""Deterministic sampling & dataset splitting (training-data pipeline
operators, SURVEY §7 Phase 6 family).

Random sampling (``df.sample``) is not reproducible across engines, scales
or partitionings — a training pipeline needs *content-addressed* sampling:
hash the stable key, bucket the hash. Same row → same bucket, forever, on
any engine (md5-derived buckets, oracle-exact in DuckDB), robust to
repartitioning and incremental appends.

- hash_sample:       keep rows whose key-hash bucket < rate·buckets
- train_val_test:    97/2/1-style split assignment column
- stratified_sample: per-class rate via the same bucketing

At 100 TB these are map-side-only (no shuffle): each row's fate is a pure
function of its key.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
import pyspark.sql.functions as F

BUCKETS = 10_000

# val's bucket range anchors here (test anchors at 0): growing either
# rate can never move a row between val and test — see train_val_test.
VAL_ANCHOR = BUCKETS // 2


def _n_buckets(rate: float) -> int:
    """rate -> kept-bucket count. round(), not int(): 0.29 * 10000 is
    2899.9999999999995 in IEEE doubles — truncation silently keeps one
    bucket too few, a systematic shortfall vs the nominal rate."""
    return int(round(rate * BUCKETS))


def _bucket(key: Column) -> Column:
    """Stable bucket in [0, BUCKETS): md5-derived, engine-portable."""
    return (
        F.conv(F.substring(F.md5(key.cast("string")), 1, 8), 16, 10)
        .cast("long")
        % BUCKETS
    )


def sql_bucket(key_expr: str) -> str:
    return (
        f"(('0x' || substr(md5(CAST({key_expr} AS VARCHAR)), 1, 8))::BIGINT"
        f" % {BUCKETS})"
    )


def hash_sample(df: DataFrame, key: str, rate: float) -> DataFrame:
    """Keep ~rate of rows, deterministically by key hash."""
    return df.filter(_bucket(F.col(key)) < _n_buckets(rate))


def _split_ranges(val: float, test: float) -> tuple[int, int]:
    n_test, n_val = _n_buckets(test), _n_buckets(val)
    if n_test > VAL_ANCHOR or n_val > BUCKETS - VAL_ANCHOR:
        raise ValueError(
            f"split rates too large for anchored ranges: test <= "
            f"{VAL_ANCHOR / BUCKETS}, val <= {(BUCKETS - VAL_ANCHOR) / BUCKETS}"
        )
    return n_test, n_val


def train_val_test(
    df: DataFrame, key: str, val: float = 0.02, test: float = 0.01
) -> DataFrame:
    """Assign a split column with ANCHORED bucket ranges: test grows up
    from bucket 0, val grows up from bucket VAL_ANCHOR — the ranges are
    disjoint by construction, so growing EITHER rate later can never
    move a row between val and test (growing a rate only converts train
    rows). The previous adjacent-range layout ([0,t) test, [t,t+v) val)
    violated exactly this: raising the test rate annexed former VAL
    buckets into test, contaminating the held-out set with examples the
    model was tuned against."""
    b = _bucket(F.col(key))
    n_test, n_val = _split_ranges(val, test)
    return df.withColumn(
        "split",
        F.when(b < n_test, "test")
        .when((b >= VAL_ANCHOR) & (b < VAL_ANCHOR + n_val), "val")
        .otherwise("train"),
    )


def sql_train_val_test(key_expr: str, val: float = 0.02, test: float = 0.01) -> str:
    n_test, n_val = _split_ranges(val, test)
    b = sql_bucket(key_expr)
    return (
        f"(CASE WHEN {b} < {n_test} THEN 'test' "
        f"WHEN {b} >= {VAL_ANCHOR} AND {b} < {VAL_ANCHOR + n_val} "
        f"THEN 'val' ELSE 'train' END)"
    )


def stratified_sample(
    df: DataFrame, key: str, strata: str, rates: dict[str, float]
) -> DataFrame:
    """Per-class sampling rate (e.g. downsample the majority language)."""
    if not rates:
        raise ValueError("stratified_sample needs a non-empty rates dict")
    b = _bucket(F.col(key))
    thresh = None
    for cls, rate in rates.items():
        cond = F.col(strata) == cls
        n = _n_buckets(rate)
        thresh = F.when(cond, n) if thresh is None else thresh.when(cond, n)
    thresh = thresh.otherwise(0)
    return df.filter(b < thresh)


def mix_to_weights(
    df: DataFrame, key: str, strata: str, weights: dict[str, float]
) -> DataFrame:
    """Downsample each stratum so the output matches target mixture
    ``weights`` (training-data mixing: "50% web / 30% books / 20% code").

    The output is the LARGEST dataset achieving the target proportions
    without upsampling: n_out = min over strata of count_s / w_s, and each
    stratum keeps rate_s = w_s * n_out / count_s of its rows (the binding
    stratum keeps everything). Row fate is content-addressed (md5 bucket
    of ``key``), so the sample is stable under repartitioning, appends to
    OTHER strata, and engine choice.

    Scale shape: one tiny per-stratum count aggregate (map-side partial),
    broadcast back; the keep/drop decision is a pure map-side function of
    (key, stratum rate). No corpus-sized shuffle. No counterpart in the
    reference (free win).
    """
    if not weights:
        raise ValueError("mix_to_weights needs a non-empty weights dict")
    w = None
    for cls, wt in weights.items():
        cond = F.col(strata) == cls
        w = F.when(cond, F.lit(wt)) if w is None else w.when(cond, F.lit(wt))
    w = w.otherwise(F.lit(None))
    counts = df.groupBy(strata).agg(F.count(F.lit(1)).alias("__cnt"))
    counts = counts.withColumn("__w", w).filter(F.col("__w").isNotNull())
    n_out = counts.agg(
        F.min(F.col("__cnt") / F.col("__w")).alias("__n_out")
    )
    rates = (
        counts.crossJoin(F.broadcast(n_out))
        .withColumn(
            "__rate", F.col("__w") * F.col("__n_out") / F.col("__cnt")
        )
        .select(strata, "__rate")
    )
    # round(), not floor(): the binding stratum's rate computes as e.g.
    # 0.9999999999999999 in doubles (w * (cnt/w) / cnt), and floor would
    # drop its top hash bucket — violating "the binding stratum keeps
    # everything". Both engines round the identical double identically.
    return (
        df.join(F.broadcast(rates), strata)
        .filter(
            _bucket(F.col(key))
            < F.round(F.col("__rate") * F.lit(float(BUCKETS)), 0)
        )
        .drop("__rate")
    )


def sql_mix_to_weights(
    table: str, key: str, strata: str, weights: dict[str, float], cols: str
) -> str:
    """DuckDB oracle mirroring mix_to_weights' arithmetic exactly."""
    case = "CASE " + " ".join(
        f"WHEN {strata} = '{cls}' THEN {wt!r}" for cls, wt in weights.items()
    ) + " ELSE NULL END"
    return f"""
WITH c AS (
  SELECT {strata}, ({case}) AS w, count(*) AS cnt
  FROM {table} GROUP BY {strata}
),
cw AS (SELECT * FROM c WHERE w IS NOT NULL),
sc AS (SELECT min(cnt / w) AS n_out FROM cw),
r AS (
  SELECT {strata}, w * n_out / cnt AS rate FROM cw CROSS JOIN sc
)
SELECT {cols} FROM {table} t JOIN r USING ({strata})
WHERE {sql_bucket(f"t.{key}")} < round(rate * 10000.0, 0)
"""


def per_group_cap(
    df: DataFrame, key: str, group: str, cap: int
) -> DataFrame:
    """At most ``cap`` rows per group, chosen by md5 order of the key —
    the per-domain/per-source document cap every crawled-corpus recipe
    applies (one domain must not dominate the mixture). Deterministic
    and stable under appends: a kept row is only ever displaced by a new
    row hashing strictly earlier, never by reordering.

    One shuffle on the group; the rank window orders each group by
    (md5(key), key) — the key tiebreak makes the cut exact even on hash
    collisions. At extreme skew (one group >> executor memory) pre-trim
    with a per-partition local top-``cap`` before the global window —
    same result, bounded sort."""
    from pyspark.sql import Window

    h = F.md5(F.col(key).cast("string"))
    w = Window.partitionBy(group).orderBy(h.asc(), F.col(key).asc())
    return (
        df.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= cap)
        .drop("__rk")
    )


def sql_per_group_cap(
    table: str, key_expr: str, group: str, cap: int, select: str = "*"
) -> str:
    h = f"md5(CAST({key_expr} AS VARCHAR))"
    return f"""
SELECT {select} FROM (
  SELECT *, row_number() OVER (
    PARTITION BY {group} ORDER BY {h} ASC, {key_expr} ASC) AS __rk
  FROM {table}
) WHERE __rk <= {cap}
"""


def weighted_sample(df: DataFrame, key: str, weight: Column) -> DataFrame:
    """Keep each row with probability ``weight`` (a [0,1] column),
    deterministically: accept when the key's md5 bucket fraction falls
    below the row's weight. Content-addressed like hash_sample, so the
    kept set is reproducible and append-stable; map-side only."""
    frac = _bucket(F.col(key)) / F.lit(float(BUCKETS))
    return df.filter(frac < weight)


def sql_weighted_sample(table: str, key_expr: str, weight_expr: str) -> str:
    return (
        f"SELECT * FROM {table} "
        f"WHERE CAST({sql_bucket(key_expr)} AS DOUBLE) / {float(BUCKETS)!r}"
        f" < ({weight_expr})"
    )


def training_order(
    df: DataFrame, key: str, seed: str = "epoch0", id_col: str | None = None
) -> DataFrame:
    """Deterministic global shuffle for training-example order: sort by
    md5(seed || key) — reproducible across runs/engines, re-shuffled per
    epoch by changing ``seed``, and free of any RNG state. At cluster
    scale the orderBy is a range-partitioned distributed sort; writing
    the result produces files whose lexical order IS the training order,
    so a downstream loader streams shards sequentially without a global
    materialization. Returns the input columns plus ``ord`` (the sort
    key) so consumers can verify or merge ranges."""
    ord_col = F.md5(F.concat(F.lit(seed), F.lit("#"), F.col(key).cast("string")))
    return df.withColumn("ord", ord_col).orderBy("ord", key)


def sql_training_order(
    table: str, key_expr: str, cols: str, seed: str = "epoch0"
) -> str:
    return (
        f"SELECT {cols}, md5('{seed}' || '#' || CAST({key_expr} AS VARCHAR))"
        f" AS ord FROM {table}"
    )


KFOLD_SEED = "kf1"


def kfold_assign(
    df: DataFrame, key: str, k: int = 5, seed: str = KFOLD_SEED
) -> DataFrame:
    """Add a ``fold`` column in [0, k): content-addressed k-fold CV
    assignment — fold membership is a pure function of (seed, key), so
    folds are reproducible across runs/engines/partitionings and
    append-stable (new rows never move old rows between folds, the
    property rank-based balancing schemes lack). Rotating ``seed``
    draws fresh folds. Map-side, no shuffle.

    Balance is statistical, not exact (hash-uniform ~ multinomial);
    pair with a per-stratum balance report so a pathological key
    distribution is caught, never assumed away."""
    from hash_db_spark.operators.curation import sample_u

    return df.withColumn(
        "fold",
        (
            sample_u(
                F.concat(F.lit(seed), F.lit("#"), F.col(key).cast("string"))
            )
            % k
        ).cast("int"),
    )


def sql_kfold_assign(key: str, k: int = 5, seed: str = KFOLD_SEED) -> str:
    from hash_db_spark.operators.curation import sql_sample_u

    u = sql_sample_u(f"'{seed}#' || CAST({key} AS VARCHAR)")
    return f"CAST({u} % {k} AS INT)"
