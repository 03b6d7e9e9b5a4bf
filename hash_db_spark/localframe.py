"""Driver-local DataFrames as JVM LocalRelations, not Python RDDs.

``spark.createDataFrame(list_of_rows, schema)`` produces a LogicalRDD
plan: the rows live in a pickled Python RDD, and the FIRST action on
any plan containing it pays a Python-worker scan measured at 1.7-4.2s
on this machine (subsequent actions ~1s) — a pure driver-side tax on
every bounded metadata frame (version pointers, centroid tables,
query-literal frames, iterative-loop results).

Routing the same rows through a pandas DataFrame converts them at
BUILD time via Arrow into a LocalRelation embedded in the JVM plan:
first action 0.3-0.7s, no Python worker involved, identical schema and
values (verified: ints, strings, doubles, arrays, None cells). This is
guide §5 ("the driver should do almost no data work") applied to plan
construction.

Only bounded frames belong here — every caller already holds the rows
in driver memory by construction (collected scalars, literal configs,
loop outputs), so this changes HOW they enter the plan, never how much
data the driver holds.
"""

from __future__ import annotations

from typing import Any, Iterable

from pyspark.sql import DataFrame, SparkSession


def local_frame(
    spark: SparkSession, rows: Iterable[Any], schema
) -> DataFrame:
    """``spark.createDataFrame(rows, schema)`` that yields a JVM
    LocalRelation (pandas/Arrow fast path) instead of a Python-RDD scan.
    ``rows`` must be a list of tuples/lists mapped POSITIONALLY onto
    ``schema`` (the same contract as createDataFrame with a list).
    Falls back to the plain path for inputs pandas can't round-trip."""
    import pandas as pd

    rows = list(rows)
    if not rows:
        # an empty list has no Python rows to scan; the empty LogicalRDD
        # materializes without a Python worker pass
        return spark.createDataFrame([], schema)
    if isinstance(rows[0], dict):
        # dict rows map by KEY in createDataFrame but from_records would
        # order columns by first-seen key — a silent positional mismatch
        # against the schema. Take the plain path (pyspark Row is a tuple
        # subclass, so it stays on the fast path).
        return spark.createDataFrame(rows, schema)
    try:
        pdf = pd.DataFrame.from_records(rows)
        return spark.createDataFrame(pdf, schema)
    except Exception:
        # dtype pandas/Arrow cannot represent (Decimal edge cases, raw
        # Row objects with nested Rows, ...): correctness over speed
        return spark.createDataFrame(rows, schema)
