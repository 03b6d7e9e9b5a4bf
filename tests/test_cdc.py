"""Changelog-application semantics: last version wins, deletes remove,
re-insert after delete resurrects, base is implicit version 0."""

from __future__ import annotations

import pytest

from hash_db_spark.operators import cdc


@pytest.fixture(scope="module")
def base(spark):
    return spark.createDataFrame(
        [(1, "alpha"), (2, "beta"), (3, "gamma")], ["id", "name"]
    )


def rows(df):
    return {(r.id, r.name) for r in df.collect()}


def test_update_delete_insert(spark, base):
    changes = spark.createDataFrame(
        [
            (1, 1, "upsert", "alpha-v2"),
            (2, 1, "delete", None),
            (4, 1, "upsert", "delta"),
        ],
        "id long, version long, op string, name string",
    )
    got = rows(cdc.latest_view(base, changes, "id"))
    assert got == {(1, "alpha-v2"), (3, "gamma"), (4, "delta")}


def test_last_version_wins_and_resurrection(spark, base):
    changes = spark.createDataFrame(
        [
            (1, 1, "delete", None),
            (1, 2, "upsert", "alpha-back"),   # resurrect after delete
            (3, 5, "upsert", "gamma-v5"),
            (3, 4, "upsert", "gamma-v4"),     # stale, ignored
        ],
        "id long, version long, op string, name string",
    )
    got = rows(cdc.latest_view(base, changes, "id"))
    assert got == {(1, "alpha-back"), (2, "beta"), (3, "gamma-v5")}


def test_empty_changelog_is_identity(spark, base):
    changes = spark.createDataFrame(
        [], "id long, version long, op string, name string"
    )
    assert rows(cdc.latest_view(base, changes, "id")) == rows(base)


def test_scd2_intervals(spark, base):
    changes = spark.createDataFrame(
        [
            (1, 1, "upsert", "alpha-v2"),
            (1, 3, "upsert", "alpha-v3"),
            (2, 2, "delete", None),
            (4, 1, "upsert", "delta"),
        ],
        "id long, version long, op string, name string",
    )
    hist = {
        (r.id, r.valid_from, r.valid_to, r.is_current, r.name)
        for r in cdc.scd2_history(base, changes, "id").collect()
    }
    assert hist == {
        (1, 0, 1, False, "alpha"),
        (1, 1, 3, False, "alpha-v2"),
        (1, 3, None, True, "alpha-v3"),
        (2, 0, 2, False, "beta"),     # closed by the delete, no successor
        (3, 0, None, True, "gamma"),  # untouched → single open interval
        (4, 1, None, True, "delta"),
    }


def test_scd2_current_rows_equal_latest_view(spark, base):
    changes = spark.createDataFrame(
        [
            (1, 1, "upsert", "alpha-v2"),
            (2, 1, "delete", None),
            (4, 1, "upsert", "delta"),
        ],
        "id long, version long, op string, name string",
    )
    cur = cdc.scd2_history(base, changes, "id").filter("is_current").select(
        "id", "name"
    )
    assert rows(cur) == rows(cdc.latest_view(base, changes, "id"))


def test_version_tie_break_change_beats_base(spark, base):
    """A (nonconforming) version-0 change row still deterministically
    shadows the base row it targets — the __src tie-break, not union
    order, decides."""
    changes = spark.createDataFrame(
        [(1, 0, "upsert", "alpha-shadow")],
        "id long, version long, op string, name string",
    )
    got = rows(cdc.latest_view(base, changes, "id"))
    assert (1, "alpha-shadow") in got
    hist = {
        (r.id, r.valid_from, r.name, r.is_current)
        for r in cdc.scd2_history(base, changes, "id").filter("id = 1").collect()
    }
    # base interval closed by the tying change; change row is current
    assert hist == {(1, 0, "alpha", False), (1, 0, "alpha-shadow", True)}
