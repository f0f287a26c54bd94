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

# ---------------------------------------------------------------------
# q_median_polish (round 8, session 3)
# ---------------------------------------------------------------------


@query(
    "q_median_polish",
    oracle="""
    WITH cells AS (
      SELECT event_type AS r, CAST(hour(ts) // 6 AS BIGINT) AS c,
             CAST(4 * SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT)
               AS y
      FROM events GROUP BY 1, 2
    ),
    rm1 AS (
      SELECT r, CAST((SELECT (arr[2] + arr[3]) // 2
                      FROM (SELECT list_sort(list(y)) AS arr)) AS BIGINT)
               AS rmed
      FROM cells GROUP BY r
    ),
    s1 AS (
      SELECT cells.r, cells.c, cells.y - rm1.rmed AS y
      FROM cells JOIN rm1 USING (r)
    ),
    cm1 AS (
      SELECT c, CAST((SELECT arr[3]
                      FROM (SELECT list_sort(list(y)) AS arr)) AS BIGINT)
               AS cmed
      FROM s1 GROUP BY c
    ),
    s2 AS (
      SELECT s1.r, s1.c, s1.y - cm1.cmed AS y
      FROM s1 JOIN cm1 USING (c)
    ),
    rm2 AS (
      SELECT r, CAST((SELECT (arr[2] + arr[3]) // 2
                      FROM (SELECT list_sort(list(y)) AS arr)) AS BIGINT)
               AS rmed
      FROM s2 GROUP BY r
    ),
    s3 AS (
      SELECT s2.r, s2.c, s2.y - rm2.rmed AS y
      FROM s2 JOIN rm2 USING (r)
    ),
    cm2 AS (
      SELECT c, CAST((SELECT arr[3]
                      FROM (SELECT list_sort(list(y)) AS arr)) AS BIGINT)
               AS cmed
      FROM s3 GROUP BY c
    )
    SELECT s3.r AS event_type, s3.c AS hour_bin,
           CAST(s3.y - cm2.cmed AS BIGINT) AS resid4
    FROM s3 JOIN cm2 USING (c)
    """,
    tags=("pivots", "median-polish", "robust", "two-way"),
)
def q_median_polish(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tukey's median polish of the event-type x six-hour-bin revenue
    table (two full row/column sweeps): the ROBUST two-way
    decomposition whose residuals flag which (type, time-of-day) cell
    deviates from additive row+column structure — outlier cells that
    a mean-based ANOVA decomposition would smear across the table.
    Values are pre-scaled x4 so the even-count row median (average of
    the 2 middle order stats) and every subsequent residual stay
    exact integers through both sweeps — no floats anywhere.

    Scale: one 20-cell aggregate (|types| x 4 bins, constant at any
    SF); each sweep is a keyed 4-or-5-element sorted-array median —
    the scan is the only data-sized stage."""
    e = load_table(spark, sf_dir, "events")
    cells = (
        e.groupBy(
            F.col("event_type").alias("r"),
            F.floor(F.hour("ts") / 6).cast("long").alias("c"),
        )
        .agg(
            (4 * F.sum(F.round(F.col("value") * 100).cast("long")))
            .cast("long")
            .alias("y")
        )
    )

    def row_med(df):
        return df.groupBy("r").agg(
            F.expr(
                "CAST((sort_array(collect_list(y))[1]"
                " + sort_array(collect_list(y))[2]) div 2 AS BIGINT)"
            ).alias("rmed")
        )

    def col_med(df):
        return df.groupBy("c").agg(
            F.expr(
                "CAST(sort_array(collect_list(y))[2] AS BIGINT)"
            ).alias("cmed")
        )

    s1 = cells.join(row_med(cells), "r").select(
        "r", "c", (F.col("y") - F.col("rmed")).alias("y")
    )
    s2 = s1.join(col_med(s1), "c").select(
        "r", "c", (F.col("y") - F.col("cmed")).alias("y")
    )
    s3 = s2.join(row_med(s2), "r").select(
        "r", "c", (F.col("y") - F.col("rmed")).alias("y")
    )
    return s3.join(col_med(s3), "c").select(
        F.col("r").alias("event_type"),
        F.col("c").alias("hour_bin"),
        (F.col("y") - F.col("cmed")).cast("long").alias("resid4"),
    )
