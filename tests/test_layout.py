"""Z-order layout: Morton interleave correctness + the clustering
property the layout exists for (tight per-file rectangles in BOTH
dimensions)."""

from __future__ import annotations

import pyspark.sql.functions as F

from hash_db_spark.operators import layout


def _py_z(a: int, b: int) -> int:
    z = 0
    for i in range(16):
        z |= ((a >> i) & 1) << (2 * i)
        z |= ((b >> i) & 1) << (2 * i + 1)
    return z


def test_z_value_matches_reference_bits(spark):
    pts = [(a, b) for a in (0, 1, 2, 3, 255, 65535) for b in (0, 1, 7, 1024)]
    df = spark.createDataFrame(pts, ["a", "b"])
    got = {
        (r.a, r.b): r.z
        for r in df.select("a", "b", layout.z_value("a", "b").alias("z")).collect()
    }
    for a, b in pts:
        assert got[(a, b)] == _py_z(a, b), (a, b)


def test_z_locality_beats_single_sort(spark, tmp_path):
    """In a z-sorted layout, split the data into contiguous blocks (what
    files/row-groups become): every block must span a bounded sub-range
    of BOTH dimensions — the two-dimensional locality a single-column
    sort cannot give the second column."""
    n = 32
    grid = spark.createDataFrame(
        [(x, y) for x in range(n) for y in range(n)], ["x", "y"]
    )
    rows = (
        grid.select("x", "y", layout.z_value("x", "y").alias("z"))
        .orderBy("z")
        .collect()
    )
    block = 64  # 1024 points / 64 = 16 blocks == aligned z-squares
    for i in range(0, len(rows), block):
        xs = [r.x for r in rows[i : i + block]]
        ys = [r.y for r in rows[i : i + block]]
        # An aligned 64-point z-block is an 8x8 rectangle exactly.
        assert max(xs) - min(xs) <= 7, (i, min(xs), max(xs))
        assert max(ys) - min(ys) <= 7, (i, min(ys), max(ys))


def test_write_zordered_roundtrip(spark, sf_dir, tmp_path):
    part = spark.read.parquet(f"{sf_dir}/part.parquet")
    path = str(tmp_path / "part_z")
    layout.write_zordered(part, path, "p_size", "p_partkey")
    back = spark.read.parquet(path)
    assert back.count() == part.count()
    assert set(back.columns) == set(part.columns)


def test_sql_spread16_wide_values_match_spark(spark):
    """DuckDB evaluates sql_z_value in 64-bit even on INTEGER inputs —
    the BIGINT cast prevents the <<8 overflow DuckDB raises for
    x >= 32768 (ADVICE r3)."""
    import duckdb

    pts = [(5, 40000), (40000, 5), (65535, 65535), (32768, 32768)]
    df = spark.createDataFrame(pts, ["a", "b"])
    got = {
        (r.a, r.b): r.z
        for r in df.select("a", "b", layout.z_value("a", "b").alias("z")).collect()
    }
    con = duckdb.connect()
    expr = layout.sql_z_value("a", "b")
    for a, b in pts:
        (z,) = con.execute(
            f"SELECT {expr} FROM (SELECT CAST({a} AS INTEGER) a, "
            f"CAST({b} AS INTEGER) b)"
        ).fetchone()
        assert z == got[(a, b)], (a, b)


# --- parquet bloom filters (round-9 session 2) ------------------------------


def test_bloom_write_lands_in_file(spark, sf_dir, tmp_path):
    """The write options must actually produce bloom filters. Neither
    this container's pyarrow (16.1) nor duckdb (1.0) exposes the
    footer's bloom_filter_offset, so verify behaviorally: an identical
    single-partition write WITH a bloom filter must be larger by
    roughly the filter's size (ndv=1000 @ fpp 1% ~ 1.2 KB minimum,
    parquet-mr rounds the bitset up to a power of two)."""
    import glob
    import os

    from hash_db_spark.catalog import load_table
    from hash_db_spark.operators.layout import write_bloom_parquet

    docs = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", "lang")
        .coalesce(1)
    )
    plain_out = str(tmp_path / "plain")
    bloom_out = str(tmp_path / "bloomed")
    docs.write.mode("overwrite").parquet(plain_out)
    write_bloom_parquet(docs, bloom_out, ("doc_id",), expected_ndv=1000)

    plain = sum(
        os.path.getsize(f) for f in glob.glob(f"{plain_out}/*.parquet")
    )
    bloomed = sum(
        os.path.getsize(f) for f in glob.glob(f"{bloom_out}/*.parquet")
    )
    assert bloomed >= plain + 1024, (plain, bloomed)


def test_bloom_point_lookup_correct_and_pushed(spark, sf_dir, tmp_path):
    """Read-back correctness for a needle probe, with the equality
    filter actually pushed to the parquet scan."""
    from hash_db_spark.catalog import load_table
    from hash_db_spark.operators.layout import write_bloom_parquet

    docs = load_table(spark, sf_dir, "documents")
    out = str(tmp_path / "bloomed2")
    write_bloom_parquet(docs, out, ("doc_id",), expected_ndv=1000)

    probe = spark.read.parquet(out).filter("doc_id = 42")
    got = probe.collect()
    want = docs.filter("doc_id = 42").collect()
    assert [r.doc_id for r in got] == [r.doc_id for r in want]
    plan = probe._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "doc_id" in plan


# --- compaction planning -----------------------------------------------------


def test_compaction_plan_bins_fill_to_target(spark):
    """Controlled manifest: equal 10-byte files, target 35 -> exclusive
    prefix DIV binning cuts the prefix axis at 35-byte marks: grp 0 gets
    prefixes 0,10,20,30 (4 files, 40 bytes — overflows past the mark),
    grp 1 gets 40,50,60 (3 files — the previous bin's overflow ate into
    its range), grp 2 gets 70,80,90."""
    from hash_db_spark.operators.layout import compaction_plan

    files = spark.createDataFrame(
        [(f"f{i:03d}", 10) for i in range(10)], ["path", "bytes"]
    )
    got = {
        r.path: (r.grp, r.grp_files, r.grp_bytes)
        for r in compaction_plan(files, 35).collect()
    }
    assert got["f000"] == (0, 4, 40)
    assert got["f003"] == (0, 4, 40)
    assert got["f004"] == (1, 3, 30)  # prefix 40 -> 40 DIV 35 = 1
    assert got["f008"] == (2, 3, 30)  # prefixes 70,80,90
    # oversized file occupies bins alone
    big = spark.createDataFrame(
        [("a", 100), ("b", 10), ("c", 10)], ["path", "bytes"]
    )
    gb = {r.path: r.grp for r in compaction_plan(big, 35).collect()}
    assert gb["a"] == 0 and gb["b"] == 2 and gb["c"] == 3


def test_compaction_plan_oracle_parity(spark, sf_dir):
    """Driver-style compare for the r10-queued compaction_plan entry,
    plus the invariant every non-final group reached the target."""
    import duckdb

    from hash_db_spark.queries.sources_queries import (
        COMPACT_TARGET,
        _compaction_plan_oracle,
        q_compaction_plan,
    )

    got = sorted(tuple(r) for r in q_compaction_plan(spark, sf_dir).collect())
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'"
    )
    want = sorted(
        tuple(r) for r in con.execute(_compaction_plan_oracle()).fetchall()
    )
    con.close()
    assert got == want and len(got) > 0
    groups = sorted({(g, gf, gb) for _, _, g, gf, gb in got})
    assert len(groups) > 1
    # every group except the last covers a full target-width range of
    # the prefix axis, so it undershoots by at most one file's bytes
    max_file = max(b for _, b, *_ in got)
    for _, _, gb in groups[:-1]:
        assert gb > COMPACT_TARGET - max_file


def test_compaction_plan_single_file(spark):
    """A one-file manifest compacts to one group regardless of size."""
    from hash_db_spark.operators.layout import compaction_plan

    for size in (1, 10_000_000):
        df = spark.createDataFrame([("only", size)], ["path", "bytes"])
        got = compaction_plan(df, 1000).collect()
        assert len(got) == 1
        assert got[0].grp == 0 and got[0].grp_bytes == size
