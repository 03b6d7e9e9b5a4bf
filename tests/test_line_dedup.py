"""Unit tests for line-level corpus dedup (operators/lines.py):
first-occurrence semantics, boilerplate doc-frequency capping,
reassembly ordering, vanish-on-empty behavior, and the scale-shape
pins (min-struct partial agg, no window; broadcast anti-join for the
strip). Oracle parity for the registry entries is covered by
tests/test_oracle_parity.py."""

from __future__ import annotations

import pytest

from hash_db_spark.operators import lines as L


@pytest.fixture(scope="module")
def line_df(spark):
    # doc 1: [x, y, x]  — internal dup of "x"
    # doc 2: [y, z]     — "y" already seen in doc 1
    # doc 3: [x]        — fully duplicate doc (vanishes after dedup)
    rows = [
        (1, 0, "x"),
        (1, 1, "y"),
        (1, 2, "x"),
        (2, 0, "y"),
        (2, 1, "z"),
        (3, 0, "x"),
    ]
    return spark.createDataFrame(rows, "id long, line_idx int, line string")


def test_dedup_lines_first_occurrence(line_df):
    surv = {(r.id, r.line_idx, r.line) for r in L.dedup_lines(line_df).collect()}
    assert surv == {(1, 0, "x"), (1, 1, "y"), (2, 1, "z")}


def test_line_dedup_docs_reassembles_in_order_and_drops_empty(line_df):
    got = {r.id: (r.clean_text, r.n_kept) for r in L.line_dedup_docs(line_df).collect()}
    assert got == {1: ("x y", 2), 2: ("z", 1)}  # doc 3 vanished


def test_boilerplate_df_counts_distinct_docs_not_instances(spark):
    # "b" appears twice in doc 1 but only in 2 distinct docs -> df=2.
    rows = [
        (1, 0, "b"),
        (1, 1, "b"),
        (2, 0, "b"),
        (2, 1, "u"),
        (3, 0, "c"),
        (4, 0, "c"),
        (5, 0, "c"),
    ]
    df = spark.createDataFrame(rows, "id long, line_idx int, line string")
    assert {r.line for r in L.boilerplate_lines(df, 2).collect()} == {"c"}
    got = {r.id: r.clean_text for r in L.strip_boilerplate_docs(df, 2).collect()}
    # docs 3-5 were pure boilerplate and vanish; "b" (df=2) survives.
    assert got == {1: "b b", 2: "b u"}


def test_strip_keeps_everything_below_cap(line_df):
    out = L.strip_boilerplate_docs(line_df, 99)
    assert out.count() == 3
    assert out.agg({"n_kept": "sum"}).collect()[0][0] == 6


def test_containment_subset_doc(spark):
    # doc 2's distinct lines {p, q} are a subset of doc 1's {p, q, r}:
    # containment = 2 / min(3, 2) = 1.0. doc 3 shares only one line
    # with doc 1: 1 / min(3, 1) = 1.0 as well (single-line doc fully
    # contained); with threshold just above, only exact subsets at
    # size >= 2 remain.
    rows = [
        (1, 0, "p"),
        (1, 1, "q"),
        (1, 2, "r"),
        (2, 0, "p"),
        (2, 1, "q"),
        (3, 0, "z"),
        (4, 0, "q"),
        (4, 1, "w"),
    ]
    df = spark.createDataFrame(rows, "id long, line_idx int, line string")
    got = {
        (r.id_a, r.id_b): r.containment
        for r in L.line_containment_pairs(df, threshold=0.9).collect()
    }
    assert got == {(1, 2): 1.0}


def test_containment_hot_correction_is_exact(spark):
    # "h" is in 3 docs -> hot at max_doc_freq=2 and dropped from
    # candidate generation; pairs sharing a non-hot line must still
    # report the EXACT containment including "h".
    rows = [
        (1, 0, "h"),
        (1, 1, "a"),
        (2, 0, "h"),
        (2, 1, "a"),
        (3, 0, "h"),
        (3, 1, "b"),
    ]
    df = spark.createDataFrame(rows, "id long, line_idx int, line string")
    got = {
        (r.id_a, r.id_b): r.containment
        for r in L.line_containment_pairs(
            df, threshold=0.5, max_doc_freq=2
        ).collect()
    }
    # (1,2) share {h,a}: 2/2 = 1.0 exactly, even though "h" was capped.
    # (1,3)/(2,3) share only the hot "h" -> no non-hot meeting point,
    # documented miss (the exact-dup path catches identical docs).
    assert got == {(1, 2): 1.0}


def test_line_clean_prep_strip_then_dedup_then_gate(spark):
    # "c" is boilerplate at cap=2 (3 docs) and is stripped FIRST, so it
    # never wins a dedup slot; "x"/"y" dedup to doc 1; the min_lines=2
    # gate then drops every doc but doc 1.
    rows = [
        (1, 0, "x"),
        (1, 1, "y"),
        (1, 2, "c"),
        (2, 0, "x"),
        (2, 1, "c"),
        (3, 0, "y"),
        (3, 1, "c"),
        (4, 0, "z"),
    ]
    df = spark.createDataFrame(rows, "id long, line_idx int, line string")
    got = {
        r.id: (r.clean_text, r.n_kept)
        for r in L.line_clean_prep(df, max_doc_freq=2, min_lines=2).collect()
    }
    assert got == {1: ("x y", 2)}


def test_dedup_plan_is_partial_agg_no_window(line_df):
    from hash_db_spark.plans.inspect import formatted_plan

    plan = formatted_plan(L.dedup_lines(line_df))
    # Hot-line skew safety: commutative min must partial-aggregate
    # map-side; a sort-based Window would funnel hot lines into one task.
    assert "partial_min" in plan
    assert "Window" not in plan


def test_strip_plan_broadcasts_hot_set(line_df):
    from hash_db_spark.plans.inspect import formatted_plan

    plan = formatted_plan(L.strip_boilerplate(line_df, 1))
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_stream_line_dedup_wm_matches_unbounded_form(spark, sf_dir):
    """The watermark-evicted production variant (VERDICT r08 #5) must
    emit exactly the unbounded form's line set under availableNow —
    every row is inside the horizon, so the watermark changes the
    STATE bound, not the result — while its plan carries the
    bounded-state dedup operator."""
    from hash_db_spark.queries.pipeline_queries import (
        q_stream_line_dedup,
        q_stream_line_dedup_wm,
    )

    unbounded = {r.line for r in q_stream_line_dedup(spark, sf_dir).collect()}
    wm = {r.line for r in q_stream_line_dedup_wm(spark, sf_dir).collect()}
    assert wm == unbounded
    assert len(wm) > 0
