"""Lossless round-trip proofs for the interchange formats, including the
cases the fixture tables don't cover: nulls in every type, negative and
subnormal-ish doubles, and timestamps through the text formats."""

from __future__ import annotations

import datetime

import pytest

from hash_db_spark.sources import formats


@pytest.fixture(scope="module")
def edge_df(spark):
    rows = [
        (1, "plain", 1.5, datetime.datetime(2024, 1, 1, 0, 0, 7, 179575)),
        (2, None, None, None),
        (3, "comma, quote\" and\nnewline", -2.25e-8, datetime.datetime(1999, 12, 31, 23, 59, 59)),
        (4, "", 6.55, datetime.datetime(2024, 6, 1)),
    ]
    return spark.createDataFrame(rows, "id long, s string, d double, ts timestamp")


def _rows(df):
    return sorted(map(tuple, df.collect()))


def test_csv_roundtrip_edge_values(spark, edge_df, tmp_path):
    path = str(tmp_path / "csv")
    formats.write_csv(edge_df, path)
    got = formats.read_csv(spark, path, edge_df.schema)
    want = _rows(edge_df)
    have = _rows(got)
    # CSV cannot distinguish null string from empty string (both write as
    # empty field) — that is a documented text-format limit; normalize.
    fix = [tuple(x if x != "" else None for x in r) for r in want]
    assert have == sorted(fix)


def test_jsonl_roundtrip_edge_values(spark, edge_df, tmp_path):
    path = str(tmp_path / "jsonl")
    formats.write_jsonl(edge_df, path)
    got = formats.read_jsonl(spark, path, edge_df.schema)
    assert _rows(got) == _rows(edge_df)


def test_orc_roundtrip_edge_values(spark, edge_df, tmp_path):
    path = str(tmp_path / "orc")
    formats.write_orc(edge_df, path)
    got = formats.read_orc(spark, path)
    assert _rows(got) == _rows(edge_df)
    assert got.schema == edge_df.schema
