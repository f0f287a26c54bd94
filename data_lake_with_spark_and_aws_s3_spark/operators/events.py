"""Streaming-shaped operators, batch-first over `events`
(SURVEY.md §2.9). Structured Streaming twins live in streaming/twins.py
— same expressions over readStream, not driver-checked.

Scale posture: tumbling/sliding/session windows are hash aggregates on
derived keys — partial aggregation bounds shuffle volume by
|windows|x|keys|. The sliding window materializes size/slide rows per
event BEFORE partial agg (here 4x) — at 100 TB pick slide ratios
consciously; session windows shuffle once on the session key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.numeric import dec, money_sum
from ..registry import query
from ..sources.loader import load_table

_SLIDE_US = 900_000_000  # 15 min
_GAP = "30 minutes"


@query(
    "q_sliding_window",
    oracle=f"""
    SELECT make_timestamp(((epoch_us(CAST(ts AS TIMESTAMP)) // {_SLIDE_US}) - g.i)
                          * {_SLIDE_US}) AS window_start,
           event_type,
           COUNT(*) AS n_events,
           CAST(ROUND(SUM(CAST(value AS DECIMAL(19,2))), 2) AS DOUBLE) AS sum_value
    FROM events, generate_series(0, 3) AS g(i)
    GROUP BY 1, 2
    """,
    tags=("events", "sliding-window"),
)
def q_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-hour windows sliding every 15 min (each event lands in
    size/slide = 4 windows). Oracle reproduces Spark's epoch-aligned
    window starts arithmetically: start = (floor(us/slide) - i) * slide.
    """
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour", "15 minutes"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            money_sum(dec("value"), "sum_value"),
        )
        .select(
            F.col("window.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


_SESSION_ORACLE = f"""
    WITH o AS (
      SELECT user_id, CAST(ts AS TIMESTAMP) AS ts FROM events
    ), marked AS (
      SELECT user_id, ts,
             CASE WHEN lag(ts) OVER w IS NULL
                    OR ts - lag(ts) OVER w >= INTERVAL {_GAP}
                  THEN 1 ELSE 0 END AS new_session
      FROM o
      WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ), numbered AS (
      SELECT user_id, ts,
             SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                    ROWS UNBOUNDED PRECEDING) AS session_id
      FROM marked
    )
    SELECT user_id,
           MIN(ts) AS session_start,
           MAX(ts) + INTERVAL {_GAP} AS session_end,
           COUNT(*) AS n_events
    FROM numbered
    GROUP BY user_id, session_id
"""


@query("q_session_window", oracle=_SESSION_ORACLE, tags=("events", "session-window"))
def q_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native session_window(ts, 30 min) per user. Session end is
    last-event + gap, window half-open, so a new session starts when
    the gap is >= 30 min — the oracle's gaps-and-islands SQL mirrors
    exactly that boundary."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(F.session_window("ts", _GAP), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_events",
        )
    )


@query(
    "q_sessionize_gaps",
    oracle="""
    SELECT event_id, user_id,
           CAST(SUM(new_session) OVER (PARTITION BY user_id
                                       ORDER BY CAST(ts AS TIMESTAMP), event_id
                                       ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
    FROM (
      SELECT event_id, user_id, ts,
             CASE WHEN lag(ts) OVER w IS NULL
                    OR CAST(ts AS TIMESTAMP) - lag(CAST(ts AS TIMESTAMP)) OVER w
                       >= INTERVAL 30 MINUTE
                  THEN 1 ELSE 0 END AS new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id)
    )
    """,
    tags=("events", "sessionize", "stateful"),
)
def q_sessionize_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event session ids via gaps-and-islands (lag + cumulative
    sum) — the batch expression of custom stateful sessionization
    (streaming twin: transformWithStateInPandas / session_window)."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = 30 * 60 * 1_000_000
    new_s = F.when(
        F.lag("ts").over(w).isNull()
        | (F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts").over(w)) >= gap_us),
        1,
    ).otherwise(0)
    wsum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return e.select(
        "event_id",
        "user_id",
        F.sum(new_s).over(wsum).cast("long").alias("session_id"),
    )


@query(
    "q_late_data_filter",
    oracle="""
    SELECT event_type, COUNT(*) AS n_events
    FROM events
    WHERE CAST(ts AS TIMESTAMP) >=
          (SELECT MAX(CAST(ts AS TIMESTAMP)) FROM events) - INTERVAL 1 DAY
    GROUP BY event_type
    """,
    tags=("events", "watermark"),
)
def q_late_data_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch analog of a watermark: keep only events within 1 day of
    the observed max event time (late rows dropped). In streaming this
    is withWatermark('ts', '1 day') — see streaming.twins."""
    e = load_table(spark, sf_dir, "events")
    mx = e.agg(F.max("ts").alias("_mx"))
    return (
        e.join(F.broadcast(mx))
        .filter(F.col("ts") >= F.col("_mx") - F.expr("INTERVAL 1 DAY"))
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )


@query(
    "q_stream_dedup",
    oracle="""
    SELECT event_type, COUNT(*) AS n_events
    FROM events
    GROUP BY event_type
    """,
    tags=("events", "dedup"),
)
def q_stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """At-least-once delivery dedup: the input doubled (union all with
    itself), then dropDuplicates on the event id — counts must equal
    the original single-delivery counts. Streaming twin:
    dropDuplicatesWithinWatermark."""
    e = load_table(spark, sf_dir, "events")
    doubled = e.unionByName(e)
    return (
        doubled.dropDuplicates(["event_id"])
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
