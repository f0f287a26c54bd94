"""Window-function family (SURVEY.md §2.5): ranking, analytic
(lag/lead/running), row frames, time-range frames.

Reference parity: none in the reference itself; some template
variants use a window for latest-level-per-user dedup (SURVEY.md
§2.4 [K]) — that shape is q_latest_per_user in dedup.py.

Scale posture: a window = one shuffle on partition keys + in-partition
sort. Keys here (user_id, o_custkey) are high-cardinality, so
partitions stay balanced; a low-cardinality or skewed partition key
would need pre-aggregation or two-phase forms. All frames are bounded
(ROWS k / RANGE interval), so state during evaluation is O(frame).
Determinism: every ORDER BY carries a unique tie-break column.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.numeric import dec
from ..registry import query
from ..sources.loader import load_table

_US_PER_HOUR = 3_600_000_000


@query(
    "q_lag_gap",
    oracle="""
    SELECT event_id, user_id,
           epoch_us(CAST(ts AS TIMESTAMP))
             - lag(epoch_us(CAST(ts AS TIMESTAMP))) OVER w AS gap_us,
           lead(epoch_us(CAST(ts AS TIMESTAMP))) OVER w
             - epoch_us(CAST(ts AS TIMESTAMP)) AS next_gap_us
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id)
    """,
    tags=("window", "analytic"),
)
def q_lag_gap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Microseconds since the previous / until the next event of the
    same user (lag + lead, NULL at partition edges). Integer
    arithmetic end-to-end — exact on both engines."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts"))
    return e.select(
        "event_id",
        "user_id",
        (us - F.lag(us).over(w)).alias("gap_us"),
        (F.lead(us).over(w) - us).alias("next_gap_us"),
    )


@query(
    "q_running_total",
    oracle="""
    SELECT event_id, user_id,
           CAST(ROUND(SUM(CAST(value AS DECIMAL(19,2)))
                  OVER (PARTITION BY user_id
                        ORDER BY CAST(ts AS TIMESTAMP), event_id
                        ROWS UNBOUNDED PRECEDING), 2) AS DOUBLE) AS running_value
    FROM events
    """,
    tags=("window", "analytic"),
)
def q_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running per-user value total. Decimal prefix sums over a
    deterministic order — exact at every step."""
    e = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return e.select(
        "event_id",
        "user_id",
        F.sum(dec("value")).over(w).cast("decimal(38,2)").cast("double").alias("running_value"),
    )


@query(
    "q_moving_sum",
    oracle="""
    SELECT o_orderkey, o_custkey,
           CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(19,2)))
                  OVER (PARTITION BY o_custkey
                        ORDER BY CAST(o_orderdate AS TIMESTAMP), o_orderkey
                        ROWS BETWEEN 3 PRECEDING AND CURRENT ROW), 2)
                AS DOUBLE) AS last4_spend
    FROM orders
    """,
    tags=("window", "frame"),
)
def q_moving_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding ROWS frame: each order's spend summed with the
    customer's previous three orders."""
    o = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(-3, Window.currentRow)
    )
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.sum(dec("o_totalprice")).over(w).cast("decimal(38,2)").cast("double").alias("last4_spend"),
    )


@query(
    "q_rank_dense_ntile",
    oracle="""
    SELECT o_custkey, o_orderkey,
           CAST(rank() OVER w AS BIGINT) AS rnk,
           CAST(dense_rank() OVER w AS BIGINT) AS drnk,
           CAST(ntile(4) OVER w AS BIGINT) AS quartile
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey
                 ORDER BY o_totalprice DESC, o_orderkey)
    """,
    tags=("window", "ranking"),
)
def q_rank_dense_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rank / dense_rank / ntile in one window (single shuffle+sort,
    all three evaluated in the same pass)."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), "o_orderkey")
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.rank().over(w).cast("long").alias("rnk"),
        F.dense_rank().over(w).cast("long").alias("drnk"),
        F.ntile(4).over(w).cast("long").alias("quartile"),
    )


@query(
    "q_time_range_frame",
    oracle=f"""
    SELECT event_id, user_id,
           CAST(ROUND(SUM(CAST(value AS DECIMAL(19,2)))
                  OVER (PARTITION BY user_id
                        ORDER BY epoch_us(CAST(ts AS TIMESTAMP))
                        RANGE BETWEEN {_US_PER_HOUR} PRECEDING AND CURRENT ROW), 2)
                AS DOUBLE) AS trailing_1h_value
    FROM events
    """,
    tags=("window", "range-frame"),
)
def q_time_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing one-hour per-user sum via a time-RANGE frame over the
    epoch-microsecond ordering column. RANGE frames include ALL rows
    with equal ordering value, so no tie-break is needed for
    determinism (both engines agree on the frame contents)."""
    e = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros(F.col("ts")))
        .rangeBetween(-_US_PER_HOUR, Window.currentRow)
    )
    return e.select(
        "event_id",
        "user_id",
        F.sum(dec("value")).over(w).cast("decimal(38,2)").cast("double").alias("trailing_1h_value"),
    )


@query(
    "q_window_extras",
    oracle="""
    SELECT o_orderkey, o_orderstatus,
           ROUND(percent_rank() OVER w, 9) AS pct_rank,
           ROUND(cume_dist() OVER w, 9) AS cume,
           nth_value(o_orderkey, 3) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING
                                          AND UNBOUNDED FOLLOWING) AS third_key
    FROM orders
    WHERE o_custkey < 30
    WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_totalprice, o_orderkey)
    """,
    tags=("window", "analytic"),
)
def q_window_extras(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The remaining analytic window trio: percent_rank / cume_dist
    (relative position — both a single division of integer
    rank/count, rounded to absorb nothing: the division is exact-
    input, the round only normalizes 0.1 vs 0.1000...; 9 digits keeps
    full information) and nth_value over the full-partition frame.
    Total order inside each partition (price + unique key) makes all
    three deterministic."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_custkey") < 30)
    w = Window.partitionBy("o_orderstatus").orderBy("o_totalprice", "o_orderkey")
    wf = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return o.select(
        "o_orderkey",
        "o_orderstatus",
        F.round(F.percent_rank().over(w), 9).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 9).alias("cume"),
        F.nth_value("o_orderkey", 3).over(wf).alias("third_key"),
    )


@query(
    "q_window_distinct_count",
    oracle="""
    SELECT e.event_type, CAST(e.ts AS TIMESTAMP) AS ts, e.event_id,
           CAST((
             SELECT COUNT(DISTINCT e2.user_id) FROM events e2
             WHERE e2.event_type = e.event_type
               AND CAST(e2.ts AS TIMESTAMP)
                     BETWEEN CAST(e.ts AS TIMESTAMP) - INTERVAL 1 HOUR
                         AND CAST(e.ts AS TIMESTAMP)
           ) AS BIGINT) AS users_trailing_1h
    FROM events e WHERE e.event_id % 20 = 0
    """,
    tags=("window", "distinct", "range-frame"),
)
def q_window_distinct_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct count over a sliding time frame — the window class
    Spark has NO native aggregate for (COUNT(DISTINCT ...) OVER is
    unsupported): per sampled event, distinct users of the same type
    in the trailing hour. Expressed as size(collect_set(...)) over a
    RANGE frame keyed on epoch MICROseconds — the fixture timestamps
    carry sub-second components, so the frame key must match the
    oracle's microsecond-precision BETWEEN exactly (a seconds-truncated
    key admits different rows). Set semantics inside the frame, one
    shuffle on event_type. The oracle is the correlated subquery
    definition.

    Scale note: collect_set state is bounded by distinct users per
    (type, 1h) — fine when the window's key cardinality is bounded
    (here: dozens); for unbounded cardinality switch to the sketch
    path (approx_count_distinct over a windowed pre-aggregate, or
    q_hll_mergeable's per-bucket sketches)."""
    e = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("event_type")
        .orderBy(F.unix_micros(F.col("ts")))
        .rangeBetween(-3_600_000_000, 0)
    )
    return (
        e.withColumn(
            "users_trailing_1h",
            F.size(F.collect_set("user_id").over(w)).cast("bigint"),
        )
        .filter(F.col("event_id") % 20 == 0)
        .select("event_type", "ts", "event_id", "users_trailing_1h")
    )


@query(
    "q_rolling_slope",
    oracle="""
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             CAST(COUNT(*) AS BIGINT) AS y,
             CAST(ROW_NUMBER() OVER (PARTITION BY event_type
                                     ORDER BY CAST(ts AS DATE))
                  AS BIGINT) AS x
      FROM events GROUP BY event_type, CAST(ts AS DATE)
    ),
    m AS (
      SELECT event_type, day, x, y,
             CAST(COUNT(*) OVER w AS BIGINT) AS n,
             CAST(SUM(x) OVER w AS BIGINT) AS sx,
             CAST(SUM(y) OVER w AS BIGINT) AS sy,
             CAST(SUM(x * x) OVER w AS BIGINT) AS sxx,
             CAST(SUM(x * y) OVER w AS BIGINT) AS sxy
      FROM daily
      WINDOW w AS (PARTITION BY event_type ORDER BY x
                   ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
    )
    SELECT event_type, x, y, n,
           CAST(n * sxy - sx * sy AS BIGINT) AS slope_num,
           CAST(n * sxx - sx * sx AS BIGINT) AS slope_den,
           CAST((1000000 * (n * sxy - sx * sy))
                // NULLIF(n * sxx - sx * sx, 0) AS BIGINT)
             AS slope_micro
    FROM m
    """,
    tags=("window", "rolling-regression", "trend", "timeseries"),
)
def q_rolling_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """7-day rolling OLS slope of the daily event-count series per
    type — the local-trend detector dashboards draw as "momentum":
    regression moments (n, Sx, Sy, Sxx, Sxy) accumulate inside ONE
    rows-frame window, the slope numerator/denominator are exact
    BIGINTs, and slope_micro is a truncating division — a full
    regression per row without any self-join or UDF.

    Scale: the daily aggregate is one hash shuffle; all five moment
    windows share a single (event_type, x) sort — one window pass
    over |types| x |days| rows."""
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy(
        "event_type", F.col("ts").cast("date").alias("day")
    ).agg(F.count(F.lit(1)).alias("y"))
    w_rn = Window.partitionBy("event_type").orderBy("day")
    daily = daily.withColumn("x", F.row_number().over(w_rn).cast("long"))
    w = (
        Window.partitionBy("event_type")
        .orderBy("x")
        .rowsBetween(-6, Window.currentRow)
    )
    m = daily.select(
        "event_type",
        "day",
        "x",
        "y",
        F.count(F.lit(1)).over(w).cast("long").alias("n"),
        F.sum("x").over(w).alias("sx"),
        F.sum("y").over(w).alias("sy"),
        F.sum(F.col("x") * F.col("x")).over(w).alias("sxx"),
        F.sum(F.col("x") * F.col("y")).over(w).alias("sxy"),
    )
    return m.select(
        "event_type",
        "x",
        "y",
        "n",
        F.expr("CAST(n * sxy - sx * sy AS BIGINT)").alias("slope_num"),
        F.expr("CAST(n * sxx - sx * sx AS BIGINT)").alias("slope_den"),
        F.expr(
            "CAST((1000000 * (n * sxy - sx * sy))"
            " div NULLIF(n * sxx - sx * sx, 0) AS BIGINT)"
        ).alias("slope_micro"),
    )


@query(
    "q_lag_features",
    oracle="""
    WITH daily AS (
      SELECT event_type, CAST(COUNT(*) AS BIGINT) AS y,
             CAST(ROW_NUMBER() OVER (PARTITION BY event_type
                                     ORDER BY CAST(ts AS DATE))
                  AS BIGINT) AS x
      FROM events GROUP BY event_type, CAST(ts AS DATE)
    )
    SELECT event_type, x, y,
           LAG(y, 1) OVER w AS lag1,
           LAG(y, 7) OVER w AS lag7,
           CAST(SUM(y) OVER (PARTITION BY event_type ORDER BY x
                 ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS BIGINT)
             AS sum7,
           CAST(COUNT(*) OVER (PARTITION BY event_type ORDER BY x
                 ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS BIGINT)
             AS n7,
           CAST((1000000 * (y - LAG(y, 1) OVER w))
                // NULLIF(LAG(y, 1) OVER w, 0) AS BIGINT)
             AS pct_change_ppm
    FROM daily
    WINDOW w AS (PARTITION BY event_type ORDER BY x)
    """,
    tags=("window", "feature-engineering", "lags", "ml-features"),
)
def q_lag_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forecasting feature matrix per (type, day): lag-1 and lag-7
    values, trailing-7 sum and count (the exact-integer face of a
    moving average), and day-over-day percent change in truncating
    ppm — the standard supervised-learning feature block, generated
    in one window pass with no self-joins. NULLs at series edges are
    the honest contract (a model pipeline drops or imputes them
    downstream).

    Scale: one daily aggregate; all five features share the single
    (event_type, x) window sort."""
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy(
        "event_type", F.col("ts").cast("date").alias("day")
    ).agg(F.count(F.lit(1)).alias("y"))
    daily = daily.select(
        "event_type",
        "y",
        F.row_number()
        .over(Window.partitionBy("event_type").orderBy("day"))
        .cast("long")
        .alias("x"),
    )
    w = Window.partitionBy("event_type").orderBy("x")
    w7 = w.rowsBetween(-6, Window.currentRow)
    return daily.select(
        "event_type",
        "x",
        "y",
        F.lag("y", 1).over(w).alias("lag1"),
        F.lag("y", 7).over(w).alias("lag7"),
        F.sum("y").over(w7).cast("long").alias("sum7"),
        F.count(F.lit(1)).over(w7).cast("long").alias("n7"),
        F.expr(
            "CAST((1000000 * (y - LAG(y, 1) OVER (PARTITION BY event_type"
            " ORDER BY x))) div NULLIF(LAG(y, 1) OVER (PARTITION BY"
            " event_type ORDER BY x), 0) AS BIGINT)"
        ).alias("pct_change_ppm"),
    )
