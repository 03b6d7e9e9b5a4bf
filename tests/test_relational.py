"""Unit tests for relational operator semantics (SURVEY §2.2), modeled on
the reference's example.py scenarios (people/items/products inserts, joins,
update-then-reselect — /root/reference/example.py:86-238)."""

from __future__ import annotations

import pytest
import pyspark.sql.functions as F

from hash_db_spark.operators import relational as R


@pytest.fixture(scope="module")
def people(spark):
    return spark.createDataFrame(
        [(1, "Sam", 29), (2, "Dinar", 31), (3, "Lee", 29)],
        ["id", "people_name", "age"],
    )


@pytest.fixture(scope="module")
def items(spark):
    return spark.createDataFrame(
        [(1, "fishing rod", 1), (2, "spanner", 3), (3, "boat", 1)],
        ["id", "search", "people"],
    )


def test_filter_eq_typed(spark, people):
    # Typed equality: age=29 matches 29 only — not the reference's
    # accidental prefix match of 290+ (SURVEY §2.1 caveats).
    got = R.filter_eq(people, "age", 29).select("people_name").collect()
    assert sorted(r.people_name for r in got) == ["Lee", "Sam"]


def test_project_skips_missing(spark):
    # Reference rule: rows lacking a selected field are skipped
    # (/root/reference/client.py:655-661).
    df = spark.createDataFrame(
        [(1, "a", None), (2, "b", "x")], ["id", "f1", "f2"]
    )
    assert R.project(df, ["id", "f2"]).count() == 1
    assert R.project(df, ["id", "f2"], skip_missing=False).count() == 2


def test_hash_join_duplicate_keys_multiply(spark, people, items):
    # Duplicate join keys produce one output row per pair
    # (reference build-dict holds lists, client.py:396-410).
    joined = R.hash_join(items, people, on=items.people == people.id)
    assert joined.count() == 3
    sam_items = joined.filter(F.col("people_name") == "Sam")
    assert sorted(r.search for r in sam_items.collect()) == ["boat", "fishing rod"]


def test_insert_rows_dynamic_schema(spark, people):
    new = spark.createDataFrame(
        [("Noor", 40, "new-field")], ["people_name", "age", "nickname"]
    )
    out = R.insert_rows(people, new)
    assert out.count() == 4
    noor = out.filter(F.col("people_name") == "Noor").collect()[0]
    assert noor.id == 4  # max(id)+1 auto-increment
    assert noor.nickname == "new-field"
    # Old rows read NULL for the novel column (emergent schema).
    assert out.filter(F.col("nickname").isNull()).count() == 3


def test_update_where(spark, people):
    out = R.update_where(
        people, F.col("people_name") == "Sam", {"age": F.lit(30)}
    )
    rows = {r.people_name: r.age for r in out.collect()}
    assert rows == {"Sam": 30, "Dinar": 31, "Lee": 29}


def test_rank_per_group_deterministic(spark, items):
    ranked = R.rank_per_group(
        items, ["people"], [F.col("search").asc(), F.col("id").asc()], 1
    )
    got = {r.people: r.search for r in ranked.collect()}
    assert got == {1: "boat", 3: "spanner"}


def test_update_where_widens_schema_for_new_column(spark):
    """Emergent-schema UPDATE (README.md:175): SET on a column the
    table doesn't have yet creates it — matching rows get the value,
    the rest read NULL — instead of raising UNRESOLVED_COLUMN."""
    df = spark.createDataFrame([(1, "a"), (2, "b")], ["id", "v"])
    out = R.update_where(
        df, F.col("id") == 1, {"nickname": F.lit("one")}
    )
    got = {r.id: r.nickname for r in out.collect()}
    assert got == {1: "one", 2: None}


# --- FK integrity audit ------------------------------------------------------


def test_fk_audit_detects_planted_orphan(spark, sf_dir, tmp_path):
    """Plant one orphan child row in a copied fixture dir and the audit
    must count exactly it."""
    import shutil
    from pathlib import Path

    import pyspark.sql.functions as F

    from hash_db_spark.catalog import load_table
    from hash_db_spark.queries.relational_queries import q_fk_integrity_audit

    broken = tmp_path / "broken_sf"
    broken.mkdir()
    for t in (
        "region nation customer supplier part orders lineitem "
        "events documents embeddings"
    ).split():
        shutil.copy(f"{sf_dir}/{t}.parquet", broken / f"{t}.parquet")
    # one nation row pointing at a nonexistent region
    nat = load_table(spark, str(broken), "nation")
    bad = nat.limit(1).withColumn("n_regionkey", F.lit(999999)).withColumn(
        "n_nationkey", F.lit(999999)
    )
    nat.union(bad).toPandas().to_parquet(broken / "nation.parquet")
    got = {
        r.edge: (r.n_child, r.n_orphans)
        for r in q_fk_integrity_audit(spark, str(broken)).collect()
    }
    assert got["nation.n_regionkey->region.r_regionkey"][1] == 1
    # the planted nation row is a PARENT elsewhere, so customer/supplier
    # edges stay clean
    assert got["customer.c_nationkey->nation.n_nationkey"][1] == 0


def test_fk_integrity_audit_oracle_parity(spark, sf_dir):
    """Driver-style compare for the r10-queued fk_integrity_audit entry;
    the shipped fixtures are referentially sound (all zeros)."""
    import duckdb

    from hash_db_spark.queries.relational_queries import (
        _fk_integrity_oracle,
        q_fk_integrity_audit,
    )

    got = sorted(tuple(r) for r in q_fk_integrity_audit(spark, sf_dir).collect())
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem "
        "events documents embeddings"
    ).split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    want = sorted(
        tuple(r) for r in con.execute(_fk_integrity_oracle()).fetchall()
    )
    con.close()
    assert got == want and len(got) == 7
    assert all(o == 0 for _, _, o in got)


def test_erasure_audit_oracle_parity_and_cascade(spark, sf_dir):
    """Driver-style compare for the r10-queued erasure_audit entry, plus
    the cascade law: lineitem erasure >= orders erasure (every subject
    order has >= 1 line item in TPC-H-shaped data)."""
    import duckdb

    from hash_db_spark.queries.relational_queries import (
        ERASURE_AUDIT_ORACLE,
        q_erasure_audit,
    )

    got = sorted(tuple(r) for r in q_erasure_audit(spark, sf_dir).collect())
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem "
        "events documents embeddings"
    ).split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    want = sorted(
        tuple(r) for r in con.execute(ERASURE_AUDIT_ORACLE).fetchall()
    )
    con.close()
    assert got == want and len(got) == 4
    by = dict(got)
    assert by["customer"] > 0
    assert by["lineitem"] >= by["orders"] > 0


def test_join_size_estimate_unbiased_enough(spark, sf_dir):
    """Oracle parity for the r11-candidate join_size_estimate, plus the
    estimator laws: exact equals the true row-level join count, and
    the 20%-key-sample estimate lands within 10% of it on the
    fixtures."""
    import duckdb

    from hash_db_spark.catalog import load_table
    from hash_db_spark.queries.relational_queries import (
        _join_size_estimate_oracle,
        q_join_size_estimate,
    )

    row = q_join_size_estimate(spark, sf_dir).collect()[0]
    true_join = (
        load_table(spark, sf_dir, "orders")
        .join(
            load_table(spark, sf_dir, "customer"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .count()
    )
    assert row.exact_rows == true_join
    assert row.rel_err < 0.10, row
    con = duckdb.connect()
    for t in ("orders", "customer"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    want = con.execute(_join_size_estimate_oracle()).fetchone()
    con.close()
    assert tuple(row) == want


def test_k_anonymity_audit(spark, sf_dir):
    """Risk classes match DuckDB exactly; every reported class is
    genuinely under k; and the audit's complement (classes >= k) plus
    the risky classes partition the corpus."""
    import duckdb

    import pyspark.sql.functions as F

    from hash_db_spark.queries.relational_queries import (
        K_ANON_K,
        K_ANONYMITY_ORACLE,
        q_k_anonymity_audit,
    )

    got = sorted(tuple(r) for r in q_k_anonymity_audit(spark, sf_dir).collect())
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'"
    )
    want = sorted(tuple(r) for r in con.execute(K_ANONYMITY_ORACLE).fetchall())
    con.close()
    assert got == want and len(got) > 0
    assert all(row[-1] < K_ANON_K for row in got)
    from hash_db_spark.catalog import load_table

    n_docs = load_table(spark, sf_dir, "documents").count()
    risky_members = sum(row[-1] for row in got)
    assert 0 < risky_members < n_docs


def test_l_diversity_audit(spark, sf_dir):
    """Homogeneity risk: every reported class is k-anonymous (size >= k)
    yet carries fewer than l distinct sensitive values; shares are
    consistent; DuckDB agrees exactly. Plus a planted-frame law: a
    class where everyone shares one source is flagged with share 1.0."""
    import duckdb

    from hash_db_spark.queries.relational_queries import (
        K_ANON_K,
        L_DIVERSITY_L,
        L_DIVERSITY_ORACLE,
        q_l_diversity_audit,
    )

    got = sorted(tuple(r) for r in q_l_diversity_audit(spark, sf_dir).collect())
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'"
    )
    want = sorted(tuple(r) for r in con.execute(L_DIVERSITY_ORACLE).fetchall())
    con.close()
    assert got == want and len(got) > 0
    for _lang, _lb, size, n_sens, share, low in got:
        assert size >= K_ANON_K
        assert low == (n_sens < L_DIVERSITY_L)
        assert 1.0 / n_sens - 1e-6 <= share <= 1.0  # share is 6dp-rounded

    # planted homogeneous class: 10 docs, same QI cell, one source
    import pyspark.sql.functions as F

    from hash_db_spark.queries.relational_queries import K_ANON_CHAR_BUCKET

    rows = [(i, "xx", "only-src", 50) for i in range(10)]
    df = spark.createDataFrame(
        rows, "doc_id long, lang string, source string, n_chars long"
    )
    cell = (
        df.select(
            "lang",
            (F.floor(F.col("n_chars") / K_ANON_CHAR_BUCKET)
             * K_ANON_CHAR_BUCKET).cast("long").alias("len_bucket"),
            "source",
        )
        .groupBy("lang", "len_bucket", "source")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    flagged = (
        cell.groupBy("lang", "len_bucket")
        .agg(
            F.sum("c").alias("class_size"),
            F.count(F.lit(1)).alias("n_sensitive"),
            F.round(F.max("c") / F.sum("c"), 6).alias("top_share"),
        )
        .collect()
    )
    assert flagged[0].n_sensitive == 1 and flagged[0].top_share == 1.0
