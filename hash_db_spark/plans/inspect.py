"""Physical-plan inspection helpers — the feedback loop for the scale
rules in README (pushdown reached the scan? did the dimension broadcast?
how wide are the codegen spans?)."""

from __future__ import annotations

import contextlib
import io
import re
from dataclasses import dataclass

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


@dataclass(frozen=True)
class PlanSummary:
    broadcast_joins: int
    sortmerge_joins: int
    shuffle_exchanges: int
    codegen_spans: int
    pushed_filters: list[str]
    partition_filters: list[str]
    has_take_ordered: bool

    def pushed(self, fragment: str) -> bool:
        return any(fragment in f for f in self.pushed_filters)


def summarize(df: DataFrame) -> PlanSummary:
    plan = formatted_plan(df)
    return PlanSummary(
        broadcast_joins=plan.count("BroadcastHashJoin"),
        sortmerge_joins=plan.count("SortMergeJoin"),
        shuffle_exchanges=plan.count("Exchange hashpartitioning"),
        codegen_spans=len(set(re.findall(r"codegen id : (\d+)", plan))),
        pushed_filters=[
            l.strip() for l in plan.splitlines() if "PushedFilters" in l
        ],
        partition_filters=[
            l.strip() for l in plan.splitlines() if "PartitionFilters" in l
        ],
        has_take_ordered="TakeOrderedAndProject" in plan,
    )
