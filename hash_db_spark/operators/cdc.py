"""Changelog application: UPDATE/DELETE on immutable storage
(SURVEY §7 "what's hard" — the reference mutates trie entries in place,
/root/reference/client.py:483-546; Parquet is immutable, so mutation
becomes a *changelog* merged at read time and compacted periodically —
exactly the Delta/Iceberg MERGE model, implemented engine-level).

A change row is (key, version, op, <columns>) with op ∈ {upsert, delete}.
``latest_view`` computes current state: union base (version 0) with the
log, keep the highest-version row per key, drop deletes. One shuffle on
the key; at scale the log is tiny next to the base and AQE broadcasts it
into the window stage. ``compact`` materializes the view back to a plain
table (log truncation point).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
import pyspark.sql.functions as F

OP_UPSERT = "upsert"
OP_DELETE = "delete"


def _require_change_cols(changes: DataFrame, key: str, version: str) -> None:
    """The allowMissingColumns union would silently MASK a malformed
    changelog: without ``op`` every changed key's NULL-op winner is
    filtered out (looks like a delete — silent data loss); without
    ``version`` NULLs sort last and every change is silently ignored.
    Fail loudly instead."""
    missing = {key, version, "op"} - set(changes.columns)
    if missing:
        raise ValueError(
            f"changes frame is missing required columns {sorted(missing)}"
        )


def latest_view(
    base: DataFrame, changes: DataFrame, key: str, version: str = "version"
) -> DataFrame:
    """Current state = base ⊎ changes, last version per key wins,
    deletes removed. ``changes`` carries (key, version, op, data cols);
    base rows are implicit (version 0, op upsert)."""
    _require_change_cols(changes, key, version)
    base_tagged = (
        base.withColumn(version, F.lit(0).cast("long"))
        .withColumn("op", F.lit(OP_UPSERT))
        .withColumn("__src", F.lit(0))
    )
    changes_tagged = changes.withColumn("__src", F.lit(1))
    unioned = base_tagged.unionByName(changes_tagged, allowMissingColumns=True)
    # Tie-break on __src so a (nonconforming) version-0 change row still
    # deterministically beats the base row it shadows. Change versions are
    # expected to be >= 1 and distinct per key; the flag makes the base-vs-
    # change case deterministic regardless.
    w = Window.partitionBy(key).orderBy(
        F.col(version).desc(), F.col("__src").desc()
    )
    return (
        unioned.withColumn("__rn", F.row_number().over(w))
        .filter((F.col("__rn") == 1) & (F.col("op") == OP_UPSERT))
        .drop("__rn", "op", version, "__src")
    )


def scd2_history(
    base: DataFrame, changes: DataFrame, key: str, version: str = "version"
) -> DataFrame:
    """Slowly-changing-dimension type-2 view of the changelog: every
    upsert becomes a validity interval (valid_from, valid_to, is_current)
    — valid_to is the next version that touched the key (NULL = still
    open); a delete closes the prior interval without contributing a row.

    Same scale shape as ``latest_view``: one shuffle on the key; the
    window only orders the (tiny) per-key version chain.

    Contract: change versions are >= 1 and distinct per key (base rows
    take version 0). A base-vs-change tie on version is still ordered
    deterministically (base first) via the ``__src`` flag."""
    _require_change_cols(changes, key, version)
    base_tagged = (
        base.withColumn(version, F.lit(0).cast("long"))
        .withColumn("op", F.lit(OP_UPSERT))
        .withColumn("__src", F.lit(0))
    )
    changes_tagged = changes.withColumn("__src", F.lit(1))
    unioned = base_tagged.unionByName(changes_tagged, allowMissingColumns=True)
    w = Window.partitionBy(key).orderBy(
        F.col(version).asc(), F.col("__src").asc()
    )
    hist = unioned.withColumn("valid_to", F.lead(version).over(w))
    return (
        hist.filter(F.col("op") == OP_UPSERT)
        .withColumn("is_current", F.col("valid_to").isNull())
        .withColumnRenamed(version, "valid_from")
        .drop("op", "__src")
    )


def compact(
    base: DataFrame, changes: DataFrame, key: str, version: str = "version"
) -> DataFrame:
    """Materialize the latest view (what a maintenance job writes back,
    truncating the log)."""
    return latest_view(base, changes, key, version)


def snapshot_diff(
    old: DataFrame, new: DataFrame, id_col: str, cmp_cols: list[str]
) -> DataFrame:
    """(id, status ∈ {added, removed, changed}) between two corpus
    snapshots, compared on ``cmp_cols`` (typically a content hash) —
    the dataset-versioning report a training pipeline runs between
    crawls. One full-outer shuffle on the id; unchanged rows drop out
    of the result. Null-safe comparison: a column going NULL <-> value
    counts as changed."""
    if not cmp_cols:
        raise ValueError(
            "cmp_cols must be non-empty (pass the content/hash columns "
            "that define 'changed')"
        )
    o = old.select(
        F.col(id_col).alias("id"),
        *[F.col(c).alias(f"__o_{c}") for c in cmp_cols],
        F.lit(1).alias("__o"),
    )
    n = new.select(
        F.col(id_col).alias("id"),
        *[F.col(c).alias(f"__n_{c}") for c in cmp_cols],
        F.lit(1).alias("__n"),
    )
    j = o.join(n, "id", "full_outer")
    changed = None
    for c in cmp_cols:
        d = ~F.col(f"__o_{c}").eqNullSafe(F.col(f"__n_{c}"))
        changed = d if changed is None else (changed | d)
    status = (
        F.when(F.col("__o").isNull(), F.lit("added"))
        .when(F.col("__n").isNull(), F.lit("removed"))
        .when(changed, F.lit("changed"))
    )
    return (
        j.select("id", status.alias("status"))
        .filter(F.col("status").isNotNull())
    )
