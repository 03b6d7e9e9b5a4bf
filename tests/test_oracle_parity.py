"""Oracle-parity harness: every registered query with an oracle is checked
against DuckDB on sf0.001, the same way the driver's t2 gate does at sf0.01
(row count + sorted-column value comparison, order-insensitive).

This is the single most important test file: if it's green here, the
driver's CORRECTNESS_r{N}.json should be green too.
"""

from __future__ import annotations

import math

import duckdb
import pytest

from hash_db_spark.catalog import TABLES
from hash_db_spark.queries import all_queries

REGISTRY = all_queries()


def _duck(sf_dir: str):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con


def _canon_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.9g}"
    if hasattr(v, "isoformat"):
        return v.isoformat()
    if isinstance(v, list):
        return tuple(_canon_cell(x) for x in v)
    return v


def _canon(rows, colnames):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    out = [tuple(_canon_cell(r[i]) for i in order) for r in rows]
    return sorted(out, key=repr)


@pytest.mark.parametrize(
    "name", [n for n, q in REGISTRY.items() if q.oracle is not None]
)
def test_query_matches_oracle(spark, sf_dir, name):
    q = REGISTRY[name]
    sdf = q.fn(spark, sf_dir)
    spark_cols = sdf.columns
    spark_rows = [tuple(r) for r in sdf.collect()]

    con = _duck(sf_dir)
    res = con.execute(q.oracle)
    duck_cols = [d[0] for d in res.description]
    duck_rows = res.fetchall()

    assert sorted(spark_cols) == sorted(duck_cols), (
        f"{name}: column mismatch spark={spark_cols} duck={duck_cols}"
    )
    assert len(spark_rows) == len(duck_rows), (
        f"{name}: row count spark={len(spark_rows)} duck={len(duck_rows)}"
    )
    cs, cd = _canon(spark_rows, spark_cols), _canon(duck_rows, duck_cols)
    mismatches = [i for i, (a, b) in enumerate(zip(cs, cd)) if a != b]
    assert not mismatches, (
        f"{name}: {len(mismatches)} mismatched rows; first: "
        f"spark={cs[mismatches[0]]} duck={cd[mismatches[0]]}"
    )


@pytest.mark.parametrize(
    "name", [n for n, q in REGISTRY.items() if q.oracle is None]
)
def test_query_runs_rows_only(spark, sf_dir, name):
    df = REGISTRY[name].fn(spark, sf_dir)
    assert df.count() >= 0
    assert df.schema is not None
