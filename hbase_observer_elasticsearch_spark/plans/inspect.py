"""Physical-plan inspection helpers.

`.explain("formatted")` as data: tests assert that filters actually push
down to the parquet scan, that dim joins actually broadcast, and that
nothing silently degrades to a cartesian product — the properties that
decide whether a plan survives 100 TB.
"""

from __future__ import annotations

import io
import re
from contextlib import redirect_stdout

from pyspark.sql import DataFrame


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain(mode=mode)
    return buf.getvalue()


def pushed_filters(df: DataFrame) -> list[str]:
    """All PushedFilters entries across the plan's file scans."""
    plan = explain_str(df)
    return re.findall(r"PushedFilters: \[([^\]]*)\]", plan)


def scan_read_columns(df: DataFrame) -> list[str]:
    """ReadSchema column lists per scan (column-pruning check)."""
    plan = explain_str(df)
    return re.findall(r"ReadSchema: struct<([^>]*)>", plan)


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in explain_str(df)


def has_cartesian_or_bnl(df: DataFrame) -> bool:
    plan = explain_str(df)
    return "CartesianProduct" in plan or "BroadcastNestedLoopJoin" in plan


def wholestage_codegen_ids(df: DataFrame, execute: bool = False) -> list[str]:
    """Distinct whole-stage-codegen stage ids in the physical plan.

    Under AQE the codegen annotations only appear once the adaptive plan is
    final — pass execute=True to materialize the query first.
    """
    if execute:
        # collect (not count) so THIS plan's AdaptiveSparkPlan finalizes —
        # count() would wrap it in a new aggregate plan instead.
        df.collect()
    plan = explain_str(df)
    ids = re.findall(r"\[codegen id : (\d+)\]", plan)
    ids += re.findall(r"WholeStageCodegen \((\d+)\)", plan)
    return sorted(set(ids))
