"""Physical-plan inspection helpers (SURVEY.md §4): the engine's
"is this the plan I'd want at 100 TB" checks, usable in tests and at
the REPL.

These read `df.explain("formatted")` output — the same surface a human
tunes with — and answer the questions that matter at scale:
  - did my filter reach the parquet scan? (has_pushed_filter)
  - am I reading only the columns I project? (read_schema_columns)
  - did the small side broadcast? (has_broadcast_join)
  - is my top-k a TakeOrdered, not a global sort? (has_take_ordered)
  - how many shuffles does this plan pay? (count_exchanges)
"""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def has_pushed_filter(df: DataFrame, fragment: str) -> bool:
    """True if a parquet scan advertises a pushed filter containing
    `fragment` (e.g. 'l_shipdate' or 'LessThanOrEqual')."""
    plan = formatted_plan(df)
    return any(
        "PushedFilters" in line and fragment in line for line in plan.splitlines()
    )


def read_schema_columns(df: DataFrame) -> list[set]:
    """Column sets each scan actually reads (column-pruning check):
    one set per scan's ReadSchema line."""
    out = []
    for line in formatted_plan(df).splitlines():
        line = line.strip()
        if line.startswith("ReadSchema"):
            inner = line.split("struct<", 1)[-1].rsplit(">", 1)[0]
            cols = {c.split(":")[0].strip() for c in inner.split(",") if ":" in c}
            out.append(cols)
    return out


def has_broadcast_join(df: DataFrame) -> bool:
    plan = formatted_plan(df)
    return "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan


def has_take_ordered(df: DataFrame) -> bool:
    return "TakeOrderedAndProject" in formatted_plan(df)


def count_scans(df: DataFrame) -> int:
    """Number of distinct file-scan nodes. Each formatted-plan node
    appears twice (tree line + numbered detail section); count only the
    detail headers so one scan counts once. A query that should read a
    table once but plans two scans will recompute the whole upstream
    stage per branch — the classic self-join-instead-of-window smell."""
    plan = formatted_plan(df)
    return sum(
        1
        for line in plan.splitlines()
        if line.strip().startswith("(") and line.strip().split(") ", 1)[-1].startswith("Scan ")
    )


def count_exchanges(df: DataFrame) -> int:
    """Shuffle count in the (initial) plan. AQE may coalesce partitions
    at runtime but each Exchange is still a full data movement — the
    number to minimize."""
    plan = formatted_plan(df)
    return sum(
        1
        for line in plan.splitlines()
        if line.strip().startswith("(") and "Exchange" in line and "Reused" not in line
    )


def executed_plan(df: DataFrame) -> str:
    """Run the query, then return the FINAL adaptive plan. AQE rewrites
    (ReusedExchange, skew-join splits, runtime broadcast promotion)
    only appear post-execution — use this for assertions about what
    actually ran, formatted_plan for static shape."""
    df.collect()
    return formatted_plan(df)
