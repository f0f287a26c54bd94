"""Pivot / unpivot (SURVEY.md §2 common OLAP patterns).

Pivot = groupBy + pivot with an EXPLICIT value list (never let the
engine scan for distinct pivot values at 100 TB — that's an extra
pass); unpivot = native DataFrame.unpivot (Expand, no shuffle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..sources.loader import load_table

_TYPES = ["click", "view", "purchase", "signup", "error"]
# CAST to BIGINT: DuckDB count_if returns HUGEINT, which fetchdf()
# materializes as float64 and the value-hash would then mismatch
# Spark's int64 even when every value is identical.
_PIVOT_SQL = ",\n           ".join(
    f"CAST(count_if(event_type = '{t}') AS BIGINT) AS {t}" for t in _TYPES
)


@query(
    "q_pivot",
    oracle=f"""
    SELECT user_id,
           {_PIVOT_SQL}
    FROM events
    GROUP BY user_id
    """,
    tags=("pivot",),
)
def q_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-type counts pivoted to columns, one row per user."""
    e = load_table(spark, sf_dir, "events")
    out = e.groupBy("user_id").pivot("event_type", _TYPES).count()
    # missing combinations pivot to NULL; normalize to 0 like count_if
    return out.na.fill(0, _TYPES)


@query(
    "q_unpivot",
    oracle=f"""
    SELECT user_id, event_type, n_events FROM (
      SELECT user_id, unnest(['{"', '".join(_TYPES)}']) AS event_type,
             unnest([{", ".join(f"CAST(count_if(event_type = '{t}') AS BIGINT)" for t in _TYPES)}])
               AS n_events
      FROM events GROUP BY user_id
    )
    """,
    tags=("unpivot",),
)
def q_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-trip: unpivot(pivot(events)) — wide back to long with
    zero-count combinations preserved (native DataFrame.unpivot)."""
    wide = q_pivot(spark, sf_dir)
    return wide.unpivot("user_id", _TYPES, "event_type", "n_events")