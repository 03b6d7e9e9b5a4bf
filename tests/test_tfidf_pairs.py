"""TF-IDF-weighted shingle cosine near-dup pairs: the idf property
(boilerplate downweighted), totality on short docs, oracle parity, and
plan shape."""

from __future__ import annotations

import duckdb
import pytest

from hash_db_spark.operators import ranking as R


@pytest.fixture(scope="module")
def docs(spark):
    boiler = "all rights reserved contact us terms of service apply here"
    rare = "quantum flux capacitor resonance chamber overload sequence nine"
    rows = [
        # a/b share ONLY boilerplate; c/d share the rare sentence
        (1, f"{boiler} alpha beta gamma delta epsilon zeta eta theta"),
        (2, f"{boiler} iota kappa lambda mu nu xi omicron pi rho"),
        (3, f"{rare} first unique tail one two"),
        (4, f"{rare} second unique tail three four"),
        # filler docs so the boilerplate shingles' df exceeds the cap
        *[
            (10 + i, f"{boiler} filler{i} pad{i} mat{i} row{i} col{i}")
            for i in range(25)
        ],
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"]).cache()


def test_idf_downweights_boilerplate(docs):
    """Docs sharing only >max_df boilerplate never pair; docs sharing
    rare content do — the property raw Jaccard doesn't have."""
    got = {
        (r.id_a, r.id_b)
        for r in R.tfidf_cosine_pairs(
            docs, "text", "doc_id", threshold=0.3
        ).collect()
    }
    assert (3, 4) in got
    assert (1, 2) not in got
    assert not any({a, b} & {1, 2} for a, b in got)


def test_short_docs_are_total(spark):
    """Sub-n-token docs yield no shingles (guarded transform), not a
    negative-length sequence error."""
    df = spark.createDataFrame(
        [(1, "one two"), (2, ""), (3, "a"), (4, "x y z x y z")],
        ["doc_id", "text"],
    )
    got = R.tfidf_cosine_pairs(df, "text", "doc_id", threshold=0.0).collect()
    assert got == []  # no doc pair shares a shingle


def test_self_pairs_excluded_and_ordered(docs):
    got = R.tfidf_cosine_pairs(
        docs, "text", "doc_id", threshold=0.0
    ).collect()
    assert all(r.id_a < r.id_b for r in got)


def test_oracle_parity_fixture(spark, sf_dir):
    from hash_db_spark.catalog import load_table

    got = (
        R.tfidf_cosine_pairs(
            load_table(spark, sf_dir, "documents"), "text", "doc_id"
        )
        .toPandas()
        .sort_values(["id_a", "id_b"])
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS "
        f"SELECT * FROM '{sf_dir}/documents.parquet'"
    )
    want = (
        con.execute(R.sql_tfidf_cosine_pairs("documents", "text", "doc_id"))
        .df()
        .sort_values(["id_a", "id_b"])
        .reset_index(drop=True)
    )
    con.close()
    assert len(got) == len(want) > 0
    assert [int(x) for x in got["id_a"]] == [int(x) for x in want["id_a"]]
    assert [int(x) for x in got["id_b"]] == [int(x) for x in want["id_b"]]
    assert [round(float(x), 6) for x in got["cos"]] == [
        round(float(x), 6) for x in want["cos"]
    ]


def test_plan_no_cartesian_no_corpus_broadcast(spark, sf_dir):
    """The self-join is an equi-join on the df-capped shingle key. The
    ONE BroadcastNestedLoopJoin is the 1-row corpus-count scalar frame
    (the house crossJoin(broadcast(count)) pattern — bounded by
    construction); anything more means a real nested loop crept in."""
    from hash_db_spark.catalog import load_table

    df = R.tfidf_cosine_pairs(
        load_table(spark, sf_dir, "documents"), "text", "doc_id"
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert plan.count("BroadcastNestedLoopJoin") <= 1
