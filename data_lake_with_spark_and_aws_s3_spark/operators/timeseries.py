"""Time-series operators over `events`: grid resampling with
gap-filling (LOCF) and interval-overlap union — the hypertable-style
rollups a metrics/observability workload runs constantly
(TimescaleDB's `time_bucket_gapfill` + `locf`, SQL:2016 row-pattern
"busy time" unions).

Scale posture (100 TB):
- Gap-fill is agg -> per-key span -> `sequence` explode -> left join
  -> per-key window. Every stage is keyed by user_id, so all shuffles
  hash on the same key and AQE coalesces; the generated grid is
  |keys| x |buckets|, produced executor-side by `sequence` (never a
  driver loop). A pathological key spanning years materializes its
  own grid rows only — no cross-key blowup.
- Interval union is the classic sweep: one hash shuffle on user_id,
  then sort-within-partition windows (running max end, island sum) —
  O(n log n) per key, no self-join. The quadratic interval-overlap
  join this replaces is the plan that dies at 100x.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.numeric import dec, money_sum
from ..registry import query
from ..sources.loader import load_table

_BUCKET_US = 21_600_000_000  # 6 hours


@query(
    "q_gap_fill",
    oracle=f"""
    WITH e AS (
      SELECT user_id, CAST(ts AS TIMESTAMP) AS ts,
             CAST(value AS DECIMAL(19,2)) AS v
      FROM events
    ), actual AS (
      SELECT user_id,
             make_timestamp((epoch_us(ts) // {_BUCKET_US}) * {_BUCKET_US})
               AS bucket_start,
             CAST(COUNT(*) AS BIGINT) AS n_events,
             CAST(CAST(SUM(v) AS DECIMAL(38,2)) AS DOUBLE) AS sum_value
      FROM e GROUP BY 1, 2
    ), span AS (
      SELECT user_id, MIN(bucket_start) AS lo, MAX(bucket_start) AS hi
      FROM actual GROUP BY 1
    ), grid AS (
      SELECT user_id,
             unnest(generate_series(lo, hi, INTERVAL 6 HOUR)) AS bucket_start
      FROM span
    )
    SELECT g.user_id, g.bucket_start,
           CAST(COALESCE(a.n_events, 0) AS BIGINT) AS n_events,
           last_value(a.sum_value IGNORE NULLS)
             OVER (PARTITION BY g.user_id ORDER BY g.bucket_start
                   ROWS UNBOUNDED PRECEDING) AS sum_value_locf,
           a.n_events IS NULL AS is_gap
    FROM grid g LEFT JOIN actual a USING (user_id, bucket_start)
    """,
    tags=("timeseries", "gap-fill", "locf", "resample"),
)
def q_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resample events to a dense 6-hour grid per user (from each
    user's first to last bucket) and forward-fill the value sum into
    empty buckets (LOCF). `sequence()` generates the grid
    executor-side; the first grid bucket is always an actual bucket,
    so the LOCF window never emits NULL. `is_gap` marks filled rows so
    downstream consumers can tell carried values from observed ones."""
    e = load_table(spark, sf_dir, "events")
    actual = (
        e.groupBy("user_id", F.window("ts", "6 hours"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            money_sum(dec("value"), "sum_value"),
        )
        .select(
            "user_id",
            F.col("window.start").alias("bucket_start"),
            "n_events",
            "sum_value",
        )
    )
    grid = (
        actual.groupBy("user_id")
        .agg(F.min("bucket_start").alias("lo"), F.max("bucket_start").alias("hi"))
        .select(
            "user_id",
            F.explode(F.expr("sequence(lo, hi, interval 6 hours)")).alias(
                "bucket_start"
            ),
        )
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("bucket_start")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return grid.join(actual, ["user_id", "bucket_start"], "left").select(
        "user_id",
        "bucket_start",
        F.coalesce("n_events", F.lit(0)).cast("long").alias("n_events"),
        F.last("sum_value", ignorenulls=True).over(w).alias("sum_value_locf"),
        F.col("n_events").isNull().alias("is_gap"),
    )


@query(
    "q_interval_union",
    oracle="""
    WITH iv AS (
      SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS s,
             CAST(ts AS TIMESTAMP)
               + to_minutes(CAST(event_id % 45 + 5 AS BIGINT)) AS en
      FROM events
    ), m AS (
      SELECT *, MAX(en) OVER (PARTITION BY user_id ORDER BY s, event_id
                              ROWS BETWEEN UNBOUNDED PRECEDING
                              AND 1 PRECEDING) AS prev_max_end
      FROM iv
    ), f AS (
      SELECT *, CASE WHEN prev_max_end IS NULL OR s > prev_max_end
                     THEN 1 ELSE 0 END AS new_island
      FROM m
    ), n AS (
      SELECT *, SUM(new_island) OVER (PARTITION BY user_id ORDER BY s, event_id
                                      ROWS UNBOUNDED PRECEDING) AS island
      FROM f
    )
    SELECT user_id, CAST(island AS BIGINT) AS busy_seq,
           MIN(s) AS busy_start, MAX(en) AS busy_end,
           CAST(COUNT(*) AS BIGINT) AS n_merged,
           CAST(epoch_us(MAX(en)) - epoch_us(MIN(s)) AS BIGINT) AS busy_us
    FROM n GROUP BY user_id, island
    """,
    tags=("timeseries", "interval-union", "gaps-and-islands"),
)
def q_interval_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Union of overlapping per-user intervals (sweep-line): each event
    opens an interval [ts, ts + (event_id % 45 + 5) minutes]; touching
    or overlapping intervals merge into one busy period. A row starts a
    new island iff its start exceeds the running max end of all earlier
    intervals — running max + island sum, both single-pass windows on
    one user_id shuffle. Durations are exact integer microseconds."""
    e = load_table(spark, sf_dir, "events").select("user_id", "event_id", "ts")
    iv = e.select(
        "user_id",
        "event_id",
        F.col("ts").alias("s"),
        F.expr(
            "timestampadd(MINUTE, CAST(event_id % 45 + 5 AS INT), ts)"
        ).alias("en"),
    )
    order = [F.col("s"), F.col("event_id")]
    w_prev = (
        Window.partitionBy("user_id")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_run = (
        Window.partitionBy("user_id")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    marked = iv.withColumn("prev_max_end", F.max("en").over(w_prev)).withColumn(
        "new_island",
        F.when(
            F.col("prev_max_end").isNull() | (F.col("s") > F.col("prev_max_end")), 1
        ).otherwise(0),
    )
    islands = marked.withColumn("island", F.sum("new_island").over(w_run))
    return islands.groupBy("user_id", "island").agg(
        F.min("s").alias("busy_start"),
        F.max("en").alias("busy_end"),
        F.count(F.lit(1)).alias("n_merged"),
        (F.unix_micros(F.max("en")) - F.unix_micros(F.min("s"))).alias("busy_us"),
    ).select(
        "user_id",
        F.col("island").alias("busy_seq"),
        "busy_start",
        "busy_end",
        "n_merged",
        "busy_us",
    )


@query(
    "q_reaggregation",
    oracle="""
    WITH minutely AS (
      SELECT event_type, date_trunc('minute', CAST(ts AS TIMESTAMP)) AS m,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS v_cents
      FROM events GROUP BY 1, 2
    ), hourly_rollup AS (
      SELECT event_type, date_trunc('hour', m) AS hour_ts,
             CAST(SUM(n) AS BIGINT) AS n_events,
             CAST(SUM(v_cents) AS BIGINT) AS value_cents
      FROM minutely GROUP BY 1, 2
    ), hourly_direct AS (
      SELECT event_type, date_trunc('hour', CAST(ts AS TIMESTAMP)) AS hour_ts,
             CAST(COUNT(*) AS BIGINT) AS n_direct,
             CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS v_direct
      FROM events GROUP BY 1, 2
    )
    SELECT r.event_type, r.hour_ts, r.n_events, r.value_cents,
           (r.n_events = d.n_direct AND r.value_cents = d.v_direct)
             AS rollup_matches_direct
    FROM hourly_rollup r
    JOIN hourly_direct d
      ON d.event_type = r.event_type AND d.hour_ts = r.hour_ts
    """,
    tags=("timeseries", "reaggregation", "rollup", "mergeable"),
)
def q_reaggregation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-granularity rollup — the materialized-aggregate pattern at
    the heart of every warehouse's cube/rollup tables: aggregate the
    raw stream ONCE at minute grain, then derive hour grain by
    re-aggregating the minutely table, never rescanning raw events.
    Works because count/sum are mergeable (unlike median — use the
    sketch operators for those); the rollup_matches_direct boolean
    proves rollup == direct exactly (cent-scaled integer sums, no
    float drift), in both engines independently.

    Scale: the raw scan happens once for the fine grain; each coarser
    grain aggregates the previous one — at 100 TB that is the
    difference between one scan plus tiny re-aggs and one full scan
    per granularity. Same mergeability story as q_hll_mergeable, with
    exact sums instead of sketches."""
    e = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.date_trunc("minute", "ts").alias("m"),
        F.expr("CAST(ROUND(value * 100) AS BIGINT)").alias("vc"),
    )
    minutely = e.groupBy("event_type", "m").agg(
        F.count(F.lit(1)).alias("n"), F.sum("vc").alias("v_cents")
    )
    rollup = minutely.groupBy(
        "event_type", F.date_trunc("hour", "m").alias("hour_ts")
    ).agg(F.sum("n").alias("n_events"), F.sum("v_cents").alias("value_cents"))
    direct = (
        load_table(spark, sf_dir, "events")
        .groupBy("event_type", F.date_trunc("hour", "ts").alias("hour_ts"))
        .agg(
            F.count(F.lit(1)).alias("n_direct"),
            F.sum(F.expr("CAST(ROUND(value * 100) AS BIGINT)")).alias("v_direct"),
        )
    )
    return rollup.join(direct, ["event_type", "hour_ts"]).select(
        "event_type",
        "hour_ts",
        "n_events",
        "value_cents",
        (
            (F.col("n_events") == F.col("n_direct"))
            & (F.col("value_cents") == F.col("v_direct"))
        ).alias("rollup_matches_direct"),
    )


@query(
    "q_seasonal_decompose",
    oracle="""
    WITH hourly AS (
      SELECT event_type, date_trunc('hour', CAST(ts AS TIMESTAMP)) AS hour_ts,
             CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS BIGINT) AS cents
      FROM events GROUP BY 1, 2
    ),
    trended AS (
      SELECT event_type, hour_ts, cents,
             (1000 * SUM(cents) OVER w) // (COUNT(*) OVER w) AS trend_milli
      FROM hourly
      WINDOW w AS (PARTITION BY event_type ORDER BY hour_ts
                   ROWS BETWEEN 12 PRECEDING AND 11 FOLLOWING)
    ),
    detrended AS (
      SELECT event_type, hour_ts, cents, trend_milli,
             1000 * cents - trend_milli AS det_milli,
             EXTRACT(hour FROM hour_ts) AS hod
      FROM trended
    ),
    seasonal AS (
      SELECT event_type, hod,
             SUM(det_milli) // COUNT(*) AS seasonal_milli
      FROM detrended GROUP BY 1, 2
    )
    SELECT d.event_type, CAST(d.hour_ts AS TIMESTAMP) AS hour_ts,
           d.cents, CAST(d.trend_milli AS BIGINT) AS trend_milli,
           CAST(s.seasonal_milli AS BIGINT) AS seasonal_milli,
           CAST(d.det_milli - s.seasonal_milli AS BIGINT) AS residual_milli
    FROM detrended AS d JOIN seasonal AS s
      ON s.event_type = d.event_type AND s.hod = d.hod
    """,
    tags=("timeseries", "decomposition", "window"),
)
def q_seasonal_decompose(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classical seasonal decomposition (trend + hour-of-day seasonal +
    residual) over the hourly event-value series — entirely in exact
    INTEGER arithmetic so the whole decomposition is hash-stable:
    values quantize to cents, the 24h centered moving-average trend is
    an integer-division of exact sums (Spark `div` and DuckDB `//`
    both truncate toward zero), the seasonal component is the
    integer-mean of detrended milli-cents per hour-of-day, and the
    residual is what's left. No double ever enters an aggregation, so
    no sum-order or libm drift exists to diverge ([[oracle-exactness
    -playbook]] rule: quantize first, divide once).

    Plan: one hourly aggregate (partial map-side), one ROWS-frame
    window (single shuffle on event_type), one |types|x24-row seasonal
    aggregate joined back broadcast. Scale: the series table after the
    first aggregate is |types| x hours — metadata-sized at any corpus
    scale; this is the standard pre-aggregate-then-decompose shape."""
    e = load_table(spark, sf_dir, "events")
    hourly = e.groupBy(
        F.col("event_type"),
        F.date_trunc("hour", F.col("ts")).alias("hour_ts"),
    ).agg(
        F.sum(F.round(F.col("value") * 100, 0).cast("long")).alias("cents")
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("hour_ts")
        .rowsBetween(-12, 11)
    )
    trended = hourly.select(
        "event_type",
        "hour_ts",
        "cents",
        (F.sum("cents").over(w) * 1000).alias("_tsum"),
        F.count(F.lit(1)).over(w).alias("_tn"),
    ).select(
        "event_type",
        "hour_ts",
        "cents",
        F.expr("_tsum div _tn").alias("trend_milli"),
    )
    detrended = trended.select(
        "event_type",
        "hour_ts",
        "cents",
        "trend_milli",
        (F.col("cents") * 1000 - F.col("trend_milli")).alias("det_milli"),
        F.hour("hour_ts").alias("hod"),
    ).localCheckpoint(eager=True)
    # ^ the series is |types| x hours (metadata-sized); checkpointing it
    # keeps the seasonal self-join from recomputing the window chain —
    # and, at scale, from scanning the raw events table TWICE
    seasonal = detrended.groupBy("event_type", "hod").agg(
        F.expr("sum(det_milli) div count(*)").alias("seasonal_milli")
    )
    return detrended.join(F.broadcast(seasonal), ["event_type", "hod"]).select(
        "event_type",
        "hour_ts",
        "cents",
        "trend_milli",
        "seasonal_milli",
        (F.col("det_milli") - F.col("seasonal_milli")).alias("residual_milli"),
    )


@query(
    "q_holt_forecast",
    oracle="""
    WITH RECURSIVE s AS MATERIALIZED (
      SELECT event_type, CAST(ts AS DATE) AS day,
             CAST(COUNT(*) AS BIGINT) AS y,
             CAST(ROW_NUMBER() OVER (PARTITION BY event_type
                                     ORDER BY CAST(ts AS DATE))
                  AS BIGINT) AS rn
      FROM events GROUP BY event_type, CAST(ts AS DATE)
    ), r AS (
      SELECT event_type, rn, y, y AS l, CAST(0 AS BIGINT) AS b
      FROM s WHERE rn = 1
      UNION ALL
      SELECT s.event_type, s.rn, s.y,
             (s.y + r.l + r.b) // 2,
             (((s.y + r.l + r.b) // 2) - r.l + r.b) // 2
      FROM s JOIN r ON s.event_type = r.event_type AND s.rn = r.rn + 1
    )
    SELECT event_type, rn, y,
           CAST(l AS BIGINT) AS level,
           CAST(b AS BIGINT) AS trend,
           CAST(l + 7 * b AS BIGINT) AS fc7
    FROM r
    """,
    tags=("timeseries", "forecast", "recurrence", "stateful", "udf"),
)
def q_holt_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt double-exponential smoothing (level + linear trend,
    alpha = beta = 1/2) over the per-type daily event-count series,
    with a 7-step-ahead linear forecast from every fitted point. Like
    q_ewma_recurrence this is the operator class SQL windows cannot
    express (state depends on previous OUTPUT): the coupled integer
    recurrence l_t = (y_t + l + b) div 2, b_t = (l_t - l + b) div 2
    runs in grouped applyInPandas, and the oracle replays it with a
    DuckDB recursive CTE — truncating integer halving makes every
    step bit-exact across engines (div matches // toward-zero; the
    Python side truncates explicitly since trend can go negative).

    Scale: the daily aggregate is one hash shuffle; the recurrence
    then runs over |types| x |days| rows (tiny), one ordered group
    per pandas batch with O(1) state — chunk by time and carry (l, b)
    if a single series ever outgrows a batch."""
    import pandas as pd

    e = load_table(spark, sf_dir, "events")
    s = e.groupBy(
        "event_type", F.col("ts").cast("date").alias("day")
    ).agg(F.count(F.lit(1)).alias("y"))

    def tdiv2(t: int) -> int:
        return t // 2 if t >= 0 else -((-t) // 2)

    def holt(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("day")
        l = b = None
        levels, trends = [], []
        for y in pdf["y"].to_numpy():
            y = int(y)
            if l is None:
                l, b = y, 0
            else:
                l_new = tdiv2(y + l + b)
                b = tdiv2(l_new - l + b)
                l = l_new
            levels.append(l)
            trends.append(b)
        return pd.DataFrame(
            {
                "event_type": pdf["event_type"].to_numpy(),
                "rn": range(1, len(levels) + 1),
                "y": pdf["y"].to_numpy(),
                "level": levels,
                "trend": trends,
                "fc7": [lv + 7 * tr for lv, tr in zip(levels, trends)],
            }
        )

    return s.groupBy("event_type").applyInPandas(
        holt,
        schema="event_type string, rn long, y long, level long,"
        " trend long, fc7 long",
    )


@query(
    "q_cusum_drift",
    oracle="""
    WITH RECURSIVE s AS MATERIALIZED (
      SELECT event_type, CAST(ts AS DATE) AS day,
             CAST(COUNT(*) AS BIGINT) AS y,
             CAST(ROW_NUMBER() OVER (PARTITION BY event_type
                                     ORDER BY CAST(ts AS DATE))
                  AS BIGINT) AS rn
      FROM events GROUP BY event_type, CAST(ts AS DATE)
    ),
    k AS MATERIALIZED (
      SELECT event_type,
             CAST(SUM(y) // COUNT(*) AS BIGINT) AS target
      FROM s GROUP BY event_type
    ),
    r AS (
      SELECT s.event_type, rn, y,
             GREATEST(CAST(0 AS BIGINT), y - k.target) AS cpos,
             GREATEST(CAST(0 AS BIGINT), k.target - y) AS cneg
      FROM s JOIN k ON k.event_type = s.event_type WHERE rn = 1
      UNION ALL
      SELECT s.event_type, s.rn, s.y,
             GREATEST(CAST(0 AS BIGINT), r.cpos + s.y - k.target),
             GREATEST(CAST(0 AS BIGINT), r.cneg + k.target - s.y)
      FROM s
      JOIN r ON s.event_type = r.event_type AND s.rn = r.rn + 1
      JOIN k ON k.event_type = s.event_type
    )
    SELECT r.event_type, rn, y, cpos, cneg,
           k.target,
           cpos > 3 * k.target OR cneg > 3 * k.target AS alarm
    FROM r JOIN k ON k.event_type = r.event_type
    """,
    tags=("timeseries", "changepoint", "cusum", "recurrence", "stateful"),
)
def q_cusum_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sided CUSUM drift detector over the per-type daily event-
    count series: c+_t = max(0, c+ + y_t - target) accumulates
    upward drift, c-_t the downward mirror, alarm when either exceeds
    3x the per-type mean target — the changepoint primitive behind
    "did this source's volume shift". The target is the truncating
    integer mean, so the whole recurrence is exact BIGINT and the
    oracle replays it with a recursive CTE (max(0, .) carries state
    through GREATEST — still bit-exact).

    Scale: q_holt_forecast economics — one daily hash aggregate, the
    recurrence runs over |types| x |days| rows with O(1) state."""
    import pandas as pd

    e = load_table(spark, sf_dir, "events")
    s = e.groupBy(
        "event_type", F.col("ts").cast("date").alias("day")
    ).agg(F.count(F.lit(1)).alias("y"))

    def cusum(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("day")
        ys = [int(v) for v in pdf["y"].to_numpy()]
        target = sum(ys) // len(ys)
        cp = cn = 0
        cps, cns = [], []
        for y in ys:
            cp = max(0, cp + y - target)
            cn = max(0, cn + target - y)
            cps.append(cp)
            cns.append(cn)
        return pd.DataFrame(
            {
                "event_type": pdf["event_type"].to_numpy(),
                "rn": range(1, len(ys) + 1),
                "y": ys,
                "cpos": cps,
                "cneg": cns,
                "target": target,
                "alarm": [
                    c1 > 3 * target or c2 > 3 * target
                    for c1, c2 in zip(cps, cns)
                ],
            }
        )

    return s.groupBy("event_type").applyInPandas(
        cusum,
        schema="event_type string, rn long, y long, cpos long,"
        " cneg long, target long, alarm boolean",
    )


@query(
    "q_time_weighted_avg",
    oracle="""
    WITH e AS (
      SELECT user_id,
             CAST(ROUND(value * 100) AS BIGINT) AS v_cents,
             epoch_us(ts) AS t_us,
             LEAD(epoch_us(ts)) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id) AS t_next
      FROM events
    ),
    seg AS (
      SELECT user_id, v_cents, t_next - t_us AS dt_us
      FROM e WHERE t_next IS NOT NULL
    )
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_segments,
           CAST(SUM(dt_us) AS BIGINT) AS span_us,
           CAST(SUM(v_cents * dt_us) AS BIGINT) AS weighted_sum,
           CAST(SUM(v_cents * dt_us) // NULLIF(SUM(dt_us), 0) AS BIGINT)
             AS twap_cents
    FROM seg
    GROUP BY user_id
    HAVING SUM(dt_us) > 0
    """,
    tags=("timeseries", "twap", "window", "events"),
)
def q_time_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average (TWAP) of the event value per user — the
    step-function integral divided by the observed span, the metric
    that survives irregular sampling where a plain mean does not.
    Each observation is held until the next one (LOCF segments from a
    lead window); cent-scaled values x microsecond durations keep the
    integral an exact BIGINT, and the final division is truncating.

    Scale: one user_id shuffle feeds BOTH the lead window and the
    aggregate (same-key discipline as the interval-union sweep); no
    self-join, no second exchange."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seg = (
        e.select(
            "user_id",
            F.expr("CAST(ROUND(value * 100) AS BIGINT)").alias("v_cents"),
            F.unix_micros(F.col("ts")).alias("t_us"),
            F.lead(F.unix_micros(F.col("ts"))).over(w).alias("t_next"),
        )
        .filter(F.col("t_next").isNotNull())
        .select(
            "user_id", "v_cents", (F.col("t_next") - F.col("t_us")).alias("dt_us")
        )
    )
    return (
        seg.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_segments"),
            F.sum("dt_us").alias("span_us"),
            F.sum(F.col("v_cents") * F.col("dt_us")).alias("weighted_sum"),
            F.expr(
                "CAST(SUM(v_cents * dt_us) div NULLIF(SUM(dt_us), 0) AS BIGINT)"
            ).alias("twap_cents"),
        )
        .filter(F.col("span_us") > 0)
    )


@query(
    "q_sax_symbols",
    oracle="""
    WITH seq AS (
      SELECT user_id,
             CAST(ROUND(value * 100) AS BIGINT) AS v_cents,
             CAST(ROW_NUMBER() OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id) AS BIGINT)
               AS rn,
             CAST(COUNT(*) OVER (PARTITION BY user_id) AS BIGINT) AS n
      FROM events
    ),
    segs AS MATERIALIZED (
      SELECT user_id, ((rn - 1) * 8) // n AS seg,
             CAST(SUM(v_cents) // COUNT(*) AS BIGINT) AS m_cents,
             MIN(n) AS n_events
      FROM seq GROUP BY user_id, ((rn - 1) * 8) // n
    ),
    hist AS (
      SELECT m_cents, CAST(COUNT(*) AS BIGINT) AS c FROM segs
      GROUP BY m_cents
    ),
    cum AS (
      SELECT m_cents, SUM(c) OVER (ORDER BY m_cents) AS cum_c,
             SUM(c) OVER () AS m_total
      FROM hist
    ),
    bp AS MATERIALIZED (
      SELECT MIN(CASE WHEN 4 * cum_c >= m_total THEN m_cents END) AS b25,
             MIN(CASE WHEN 2 * cum_c >= m_total THEN m_cents END) AS b50,
             MIN(CASE WHEN 4 * cum_c >= 3 * m_total THEN m_cents END)
               AS b75
      FROM cum
    )
    SELECT user_id, MIN(n_events) AS n_events,
           string_agg(CASE WHEN m_cents < bp.b25 THEN 'a'
                           WHEN m_cents < bp.b50 THEN 'b'
                           WHEN m_cents < bp.b75 THEN 'c'
                           ELSE 'd' END, '' ORDER BY seg) AS sax
    FROM segs CROSS JOIN bp
    GROUP BY user_id
    """,
    tags=("timeseries", "sax", "symbolization", "mining"),
)
def q_sax_symbols(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SAX symbolization of each user's event-value series: piecewise
    aggregate approximation into 8 equal-count segments (integer
    position arithmetic), then each segment mean quantized to a 4-
    letter alphabet at the corpus quartiles — the time-series-mining
    transform that turns numeric series into strings so motif/dedup
    machinery (LSH, n-gram joins) can run on behavior. Segment means
    are truncating cent integers, quartile breakpoints are exact
    order statistics from the mean histogram (rank trick, no sort of
    the data), and the symbol string aggregates in explicit seg
    order — deterministic everywhere.

    Scale: one user_id shuffle for the windows + segment aggregate;
    the breakpoint table is a broadcast 1-row stitch; symbols
    re-aggregate on the same user_id key."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    w_n = Window.partitionBy("user_id")
    seq = e.select(
        "user_id",
        F.expr("CAST(ROUND(value * 100) AS BIGINT)").alias("v_cents"),
        F.row_number().over(w).cast("long").alias("rn"),
        F.count(F.lit(1)).over(w_n).cast("long").alias("n"),
    )
    segs = (
        seq.groupBy(
            "user_id",
            F.expr("((rn - 1) * 8) div n").alias("seg"),
        )
        .agg(
            F.expr("CAST(SUM(v_cents) div COUNT(*) AS BIGINT)").alias(
                "m_cents"
            ),
            F.min("n").alias("n_events"),
        )
        .localCheckpoint()  # feeds the histogram AND the symbol pass
    )
    hist = segs.groupBy("m_cents").agg(F.count(F.lit(1)).alias("c"))
    cum = hist.select(
        "m_cents",
        F.expr("SUM(c) OVER (ORDER BY m_cents)").alias("cum_c"),
        F.expr("SUM(c) OVER ()").alias("m_total"),
    )
    bp = cum.agg(
        F.expr(
            "MIN(CASE WHEN 4 * cum_c >= m_total THEN m_cents END)"
        ).alias("b25"),
        F.expr(
            "MIN(CASE WHEN 2 * cum_c >= m_total THEN m_cents END)"
        ).alias("b50"),
        F.expr(
            "MIN(CASE WHEN 4 * cum_c >= 3 * m_total THEN m_cents END)"
        ).alias("b75"),
    )
    sym = F.when(F.col("m_cents") < F.col("b25"), "a").when(
        F.col("m_cents") < F.col("b50"), "b"
    ).when(F.col("m_cents") < F.col("b75"), "c").otherwise("d")
    return (
        segs.crossJoin(F.broadcast(bp))
        .select("user_id", "seg", "n_events", sym.alias("sym"))
        .groupBy("user_id")
        .agg(
            F.min("n_events").alias("n_events"),
            F.array_join(
                F.transform(
                    F.sort_array(
                        F.collect_list(F.struct("seg", "sym"))
                    ),
                    lambda x: x["sym"],
                ),
                "",
            ).alias("sax"),
        )
    )


@query(
    "q_binseg_split",
    oracle="""
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS day, CAST(COUNT(*) AS BIGINT) AS y,
             CAST(ROW_NUMBER() OVER (ORDER BY CAST(ts AS DATE))
                  AS BIGINT) AS x
      FROM events GROUP BY CAST(ts AS DATE)
    ),
    pre AS MATERIALIZED (
      SELECT x, y,
             CAST(SUM(y) OVER (ORDER BY x) AS BIGINT) AS cy,
             CAST(SUM(y) OVER () AS BIGINT) AS ty,
             CAST(COUNT(*) OVER () AS BIGINT) AS n
      FROM daily
    ),
    scored AS (
      SELECT x AS split_x, cy, ty, n,
             CAST((1000000 * (CAST(cy AS HUGEINT) * cy * (n - x)
                              + CAST(ty - cy AS HUGEINT) * (ty - cy) * x))
                  // (CAST(x AS HUGEINT) * (n - x)) AS BIGINT) AS gain_micro
      FROM pre WHERE x < n
    )
    SELECT split_x,
           CAST(cy AS BIGINT) AS sum_left,
           CAST(ty - cy AS BIGINT) AS sum_right,
           CAST(cy // split_x AS BIGINT) AS mean_left,
           CAST((ty - cy) // (n - split_x) AS BIGINT) AS mean_right,
           gain_micro
    FROM scored
    ORDER BY gain_micro DESC, split_x
    LIMIT 1
    """,
    tags=("timeseries", "changepoint", "binary-segmentation"),
)
def q_binseg_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Offline changepoint by binary segmentation (first split): the
    day k that maximizes the between-segment sum-of-squares
    Sy_left^2/n_left + Sy_right^2/n_right of the daily count series —
    the batch complement of the online q_cusum_drift. Prefix sums
    give every candidate's score in one window pass; the objective
    rationalizes to one truncating micro division per candidate
    (common denominator x*(n-x)), so the argmax and both segment
    means are exact integers, tie-broken on the split index.

    Scale: one daily aggregate, one prefix-sum window over |days|
    rows, TakeOrdered(1) for the argmax — recurse on the winning
    halves for the full binseg tree, same cost shape per level."""
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy(F.col("ts").cast("date").alias("day")).agg(
        F.count(F.lit(1)).alias("y")
    )
    daily = daily.withColumn(
        "x", F.row_number().over(Window.orderBy("day")).cast("long")
    )
    pre = daily.select(
        "x",
        "y",
        F.expr("CAST(SUM(y) OVER (ORDER BY x) AS BIGINT)").alias("cy"),
        F.expr("CAST(SUM(y) OVER () AS BIGINT)").alias("ty"),
        F.expr("CAST(COUNT(*) OVER () AS BIGINT)").alias("n"),
    )
    scored = pre.filter(F.col("x") < F.col("n")).select(
        F.col("x").alias("split_x"),
        "cy",
        "ty",
        "n",
        F.expr(
            "CAST((1000000 * (CAST(cy AS DECIMAL(38,0)) * cy * (n - x)"
            " + CAST(ty - cy AS DECIMAL(38,0)) * (ty - cy) * x))"
            " div (CAST(x AS DECIMAL(38,0)) * (n - x)) AS BIGINT)"
        ).alias("gain_micro"),
    )
    return (
        scored.select(
            "split_x",
            F.col("cy").alias("sum_left"),
            (F.col("ty") - F.col("cy")).alias("sum_right"),
            F.expr("CAST(cy div split_x AS BIGINT)").alias("mean_left"),
            F.expr(
                "CAST((ty - cy) div (n - split_x) AS BIGINT)"
            ).alias("mean_right"),
            "gain_micro",
        )
        .orderBy(F.desc("gain_micro"), "split_x")
        .limit(1)
    )


@query(
    "q_autocorrelation",
    oracle="""
    WITH daily AS MATERIALIZED (
      SELECT event_type, CAST(COUNT(*) AS BIGINT) AS y,
             CAST(ROW_NUMBER() OVER (PARTITION BY event_type
                                     ORDER BY CAST(ts AS DATE))
                  AS BIGINT) AS x
      FROM events GROUP BY event_type, CAST(ts AS DATE)
    ),
    lags AS (
      SELECT lag FROM (SELECT CAST(unnest([1, 2, 7]) AS BIGINT) AS lag)
    ),
    paired AS (
      SELECT a.event_type, l.lag, a.y AS y0, b.y AS y1
      FROM daily a
      JOIN lags l ON TRUE
      JOIN daily b ON b.event_type = a.event_type
                  AND b.x = a.x + l.lag
    )
    SELECT event_type, lag,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(y0) AS BIGINT) AS s0,
           CAST(SUM(y1) AS BIGINT) AS s1,
           CAST(SUM(y0 * y0) AS BIGINT) AS s00,
           CAST(SUM(y1 * y1) AS BIGINT) AS s11,
           CAST(SUM(y0 * y1) AS BIGINT) AS s01,
           CAST(COUNT(*) * SUM(y0 * y1) - SUM(y0) * SUM(y1) AS BIGINT)
             AS num
    FROM paired
    GROUP BY event_type, lag
    """,
    tags=("timeseries", "autocorrelation", "seasonality"),
)
def q_autocorrelation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample autocorrelation moments of the daily count series at
    lags 1, 2, and 7 — the periodicity probe that finds weekly
    seasonality before a decomposition is fitted. The hashed surface
    is the exact paired moments (n, sums, cross-products) and the
    correlation numerator per (type, lag); the lagged pairing is an
    EQUI-join on (type, x + lag) — no window spill, no self-range
    scan — and the lag grid is a constant 3-row broadcast.

    Scale: one daily aggregate; the pair join fans each series row
    out 3x (|lags|), then one moment reduction per (type, lag)."""
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
    lags = spark.createDataFrame([(1,), (2,), (7,)], "lag long")
    a = daily.crossJoin(F.broadcast(lags)).select(
        "event_type", F.col("y").alias("y0"), (F.col("x") + F.col("lag")).alias("xt"), "lag"
    )
    b = daily.select(
        F.col("event_type").alias("et_b"),
        F.col("y").alias("y1"),
        F.col("x").alias("xb"),
    )
    paired = a.join(
        b,
        (F.col("et_b") == F.col("event_type")) & (F.col("xb") == F.col("xt")),
    )
    return paired.groupBy("event_type", "lag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("y0").alias("s0"),
        F.sum("y1").alias("s1"),
        F.sum(F.col("y0") * F.col("y0")).alias("s00"),
        F.sum(F.col("y1") * F.col("y1")).alias("s11"),
        F.sum(F.col("y0") * F.col("y1")).alias("s01"),
        F.expr(
            "CAST(COUNT(*) * SUM(y0 * y1) - SUM(y0) * SUM(y1) AS BIGINT)"
        ).alias("num"),
    )


@query(
    "q_peak_concurrency",
    oracle="""
    WITH iv AS (
      SELECT event_type, epoch_us(ts) AS s,
             epoch_us(ts) + 1800000000 AS e
      FROM events
    ),
    pts AS (
      SELECT event_type, s AS t, 1 AS delta FROM iv
      UNION ALL
      SELECT event_type, e AS t, -1 AS delta FROM iv
    ),
    sweep AS (
      SELECT event_type, t,
             CAST(SUM(delta) OVER (PARTITION BY event_type
                   ORDER BY t, delta
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS BIGINT) AS running
      FROM pts
    )
    SELECT event_type,
           CAST(MAX(running) AS BIGINT) AS peak,
           CAST(MIN(CASE WHEN running = mx THEN t END) AS BIGINT)
             AS first_peak_us
    FROM (SELECT *, MAX(running) OVER (PARTITION BY event_type) AS mx
          FROM sweep)
    GROUP BY event_type
    """,
    tags=("timeseries", "sweep-line", "concurrency", "events"),
)
def q_peak_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak concurrency per event type — how many 30-minute activity
    intervals overlap at the busiest instant, and when that first
    happens: the +1/-1 sweep-line (the capacity-planning read of the
    q_interval_union machinery). Ends sort before starts at the same
    microsecond (delta ascending), so touching intervals don't
    double-count; the running sum, its max, and the first argmax
    timestamp are all exact integers.

    Scale: one event_type-partitioned sort window over 2N boundary
    points — the same single-shuffle sweep discipline as interval
    union; no self-join, no O(n^2) overlap test."""
    e = load_table(spark, sf_dir, "events")
    s = F.unix_micros(F.col("ts"))
    iv = e.select("event_type", s.alias("s"), (s + 1_800_000_000).alias("e"))
    pts = iv.select(
        "event_type", F.col("s").alias("t"), F.lit(1).alias("delta")
    ).unionAll(
        iv.select(
            "event_type", F.col("e").alias("t"), F.lit(-1).alias("delta")
        )
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("t", "delta")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    sweep = pts.select(
        "event_type",
        "t",
        F.sum("delta").over(w).cast("long").alias("running"),
    )
    wm = Window.partitionBy("event_type")
    return (
        sweep.withColumn("mx", F.max("running").over(wm))
        .groupBy("event_type")
        .agg(
            F.max("running").alias("peak"),
            F.min(
                F.when(F.col("running") == F.col("mx"), F.col("t"))
            ).alias("first_peak_us"),
        )
    )


@query(
    "q_forecast_backtest",
    oracle="""
    WITH daily AS (
      SELECT event_type,
             CAST(ts AS DATE) AS d,
             CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS cents
      FROM events GROUP BY event_type, CAST(ts AS DATE)
    ),
    lagged AS (
      SELECT event_type, d, cents,
             LAG(cents, 1) OVER (PARTITION BY event_type ORDER BY d) AS p1,
             LAG(cents, 7) OVER (PARTITION BY event_type ORDER BY d) AS p7
      FROM daily
    ),
    scored AS (SELECT * FROM lagged WHERE p7 IS NOT NULL)
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_days,
           CAST(SUM(ABS(cents - p1)) AS BIGINT) AS ae_naive_cents,
           CAST(SUM(ABS(cents - p7)) AS BIGINT) AS ae_snaive_cents,
           CAST((1000000 * SUM(ABS(cents - p7))) // SUM(ABS(cents - p1))
                AS BIGINT) AS mase_ppm
    FROM scored GROUP BY event_type
    """,
    tags=("timeseries", "forecasting", "backtest", "mase", "evaluation"),
)
def q_forecast_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Walk-forward forecast backtest with MASE: per event type, the
    daily value series is scored one-step-ahead by two zero-parameter
    forecasters — naive (yesterday) and seasonal-naive (same weekday
    last week) — over every day where both have history. MASE is the
    standard scale-free comparison (Hyndman & Koehler 2006): seasonal-
    naive absolute error / naive absolute error, here as an exact
    integer ppm ratio of exact cent sums (no per-day division, so no
    rounding accumulates). mase_ppm < 1e6 means weekly seasonality is
    real and a seasonal model earns its keep; this is the gate a
    forecasting pipeline runs before swapping models in production,
    and the denominator convention matches q_holt_forecast's naive
    baseline.

    Scale: one (type, day) hash aggregate with map-side partials, one
    per-type window sort over |days| rows, one final rollup to
    |types| rows. The raw event scan is the only data-sized stage."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.col("ts").cast("date").alias("d")
    ).agg(
        F.sum(F.expr("CAST(ROUND(value * 100) AS BIGINT)")).alias("cents")
    )
    w = Window.partitionBy("event_type").orderBy("d")
    lagged = daily.select(
        "event_type",
        "d",
        "cents",
        F.lag("cents", 1).over(w).alias("p1"),
        F.lag("cents", 7).over(w).alias("p7"),
    ).filter(F.col("p7").isNotNull())
    return lagged.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_days"),
        F.sum(F.abs(F.col("cents") - F.col("p1"))).alias("ae_naive_cents"),
        F.sum(F.abs(F.col("cents") - F.col("p7"))).alias("ae_snaive_cents"),
        F.expr(
            "CAST((1000000 * SUM(ABS(cents - p7))) div SUM(ABS(cents - p1))"
            " AS BIGINT)"
        ).alias("mase_ppm"),
    )


@query(
    "q_holt_winters",
    oracle="""
    WITH RECURSIVE s AS MATERIALIZED (
      SELECT event_type, CAST(ts AS DATE) AS day,
             CAST(COUNT(*) AS BIGINT) AS y,
             CAST(ROW_NUMBER() OVER (PARTITION BY event_type
                                     ORDER BY CAST(ts AS DATE))
                  AS BIGINT) AS rn
      FROM events GROUP BY event_type, CAST(ts AS DATE)
    ), r AS (
      SELECT event_type, rn, y,
             y AS l, CAST(0 AS BIGINT) AS b, CAST(0 AS BIGINT) AS sv,
             CAST([0, 0, 0, 0, 0, 0, 0] AS BIGINT[]) AS season
      FROM s WHERE rn = 1
      UNION ALL
      SELECT s.event_type, s.rn, s.y,
             (s.y - r.season[1] + r.l + r.b) // 2 AS l,
             (((s.y - r.season[1] + r.l + r.b) // 2) - r.l + r.b) // 2 AS b,
             (s.y - ((s.y - r.season[1] + r.l + r.b) // 2) + r.season[1])
               // 2 AS sv,
             list_append(
               r.season[2:],
               (s.y - ((s.y - r.season[1] + r.l + r.b) // 2) + r.season[1])
                 // 2
             ) AS season
      FROM s JOIN r ON s.event_type = r.event_type AND s.rn = r.rn + 1
    )
    SELECT event_type, rn, y,
           CAST(l AS BIGINT) AS level,
           CAST(b AS BIGINT) AS trend,
           CAST(sv AS BIGINT) AS seasonal,
           CAST(l + 7 * b + sv AS BIGINT) AS fc7
    FROM r
    """,
    tags=("timeseries", "forecast", "holt-winters", "recurrence", "udf"),
)
def q_holt_winters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Additive Holt-Winters triple-exponential smoothing (level +
    trend + weekly seasonality, alpha = beta = gamma = 1/2, m = 7)
    over the per-type daily event-count series — q_holt_forecast plus
    the seasonal state, the recurrence class SQL windows cannot
    express. Coupled truncating-integer updates per day t:

        l_t = (y_t - s_{t-7} + l + b) div 2
        b_t = (l_t - l + b) div 2
        s_t = (y_t - l_t + s_{t-7}) div 2

    with deterministic init l_1 = y_1, b_1 = 0, seasonal ring all
    zeros (the first week therefore fits like Holt — stated, not
    hidden). fc7 = l + 7b + s_t is the same-weekday-next-week
    forecast, the number a capacity planner actually wants. The Spark
    side runs grouped applyInPandas with an O(m) ring buffer; the
    oracle replays the identical recurrence in a DuckDB recursive CTE
    whose state row CARRIES the 7-slot seasonal ring as a list column
    (list_append(season[2:], s_t)) — truncating halving (Python
    explicit, DuckDB //, Spark div) keeps every step bit-exact even
    where the trend or seasonal goes negative.

    Scale: one daily hash aggregate; the recurrence runs over
    |types| x |days| rows with O(m) state per group — chunk by time
    and carry (l, b, ring) if a series outgrows a pandas batch."""
    import pandas as pd

    e = load_table(spark, sf_dir, "events")
    s = e.groupBy(
        "event_type", F.col("ts").cast("date").alias("day")
    ).agg(F.count(F.lit(1)).alias("y"))

    def tdiv2(t: int) -> int:
        return t // 2 if t >= 0 else -((-t) // 2)

    def hw(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("day").reset_index(drop=True)
        season = [0] * 7
        out = []
        l = b = None
        for rn, y in enumerate(pdf["y"].astype(int), start=1):
            if l is None:
                l, b, sv = int(y), 0, 0
            else:
                s_old = season[0]
                l_new = tdiv2(y - s_old + l + b)
                b = tdiv2(l_new - l + b)
                sv = tdiv2(y - l_new + s_old)
                l = l_new
                season = season[1:] + [sv]
            out.append(
                (pdf["event_type"].iat[0], rn, int(y), l, b, sv,
                 l + 7 * b + sv)
            )
        return pd.DataFrame(
            out,
            columns=[
                "event_type", "rn", "y", "level", "trend", "seasonal", "fc7"
            ],
        )

    return s.groupBy("event_type").applyInPandas(
        hw,
        schema=(
            "event_type string, rn long, y long, level long, trend long,"
            " seasonal long, fc7 long"
        ),
    )


# ---------------------------------------------------------------------
# q_dtw_distance (round 6)
# ---------------------------------------------------------------------

_DTW_INF = 1_000_000_000_000_000  # boundary big-M, far above any path sum
_DTW_MONTHS = 24  # fixed 1995-01 .. 1996-12 spine
_DTW_A, _DTW_B = "NATION_7", "NATION_8"


@query(
    "q_dtw_distance",
    oracle=f"""
    WITH RECURSIVE monthly AS (
      SELECT n.n_name AS nation,
             (extract(year FROM CAST(o.o_orderdate AS TIMESTAMP)) - 1995) * 12
               + extract(month FROM CAST(o.o_orderdate AS TIMESTAMP)) - 1
               AS mo,
             CAST(SUM(CAST(ROUND(o.o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS cents
      FROM orders o
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n ON n.n_nationkey = c.c_nationkey
      WHERE n.n_name IN ('{_DTW_A}', '{_DTW_B}')
        AND o.o_orderdate >= DATE '1995-01-01'
        AND o.o_orderdate < DATE '1997-01-01'
      GROUP BY 1, 2
    ),
    spine AS (SELECT CAST(g.mo AS BIGINT) AS mo
              FROM range(0, {_DTW_MONTHS}) g(mo)),
    series AS (
      SELECT
        (SELECT list(COALESCE(m.cents, 0) ORDER BY spine.mo)
         FROM spine LEFT JOIN monthly m
           ON m.mo = spine.mo AND m.nation = '{_DTW_A}') AS a,
        (SELECT list(COALESCE(m.cents, 0) ORDER BY spine.mo)
         FROM spine LEFT JOIN monthly m
           ON m.mo = spine.mo AND m.nation = '{_DTW_B}') AS b
    ),
    dp(i, row) AS (
      SELECT 0,
             list_concat([CAST(0 AS BIGINT)],
                         list_transform(range(1, {_DTW_MONTHS} + 1),
                                        j -> CAST({_DTW_INF} AS BIGINT)))
      FROM series
      UNION ALL
      SELECT dp.i + 1,
             list_reduce(
               list_prepend([CAST({_DTW_INF} AS BIGINT)],
                            list_transform(range(1, {_DTW_MONTHS} + 1),
                                           j -> [CAST(j AS BIGINT)])),
               (acc, x) -> list_append(
                 acc,
                 abs(s.a[dp.i + 1] - s.b[x[1]])
                 + least(dp.row[x[1] + 1], dp.row[x[1]], acc[x[1]])))
      FROM dp, series s WHERE dp.i < {_DTW_MONTHS}
    )
    SELECT CAST({_DTW_MONTHS} AS BIGINT) AS n_months,
           CAST(dp.row[{_DTW_MONTHS} + 1] AS BIGINT) AS dtw_cents,
           CAST(dp.row[{_DTW_MONTHS} + 1] AS DOUBLE)
             / CAST(2 * {_DTW_MONTHS} AS DOUBLE) AS dtw_per_step_cents
    FROM dp WHERE dp.i = {_DTW_MONTHS}
    """,
    tags=("timeseries", "dtw", "alignment", "recurrence"),
)
def q_dtw_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dynamic time warping between {a} and {b} monthly revenue curves
    (fixed 24-month spine, zero-filled gaps): the elastic alignment
    distance that matches two series whose shapes agree but whose
    timing drifts — what a naive month-by-month L1 penalizes and a
    curve comparison wants. Full O(n·m) DP, Manhattan cost in exact
    cents, big-M boundary.

    Engineering note — the DP runs as ONE Catalyst expression: an outer
    `aggregate` over rows threads the previous DP row through an inner
    `aggregate` that folds left-to-right within the row (the same
    nested-HOF threading the oracle expresses with a recursive CTE +
    a list_reduce whose accumulator is seeded by list_prepend, since
    DuckDB 1.0's two-arg list_reduce initializes from the first
    element). No Python boundary, no shuffle beyond the two tiny
    series aggregates. HOFs are CodegenFallback (SCALE.md round-4
    lesson) — acceptable here by design because the lambda runs
    n·m = 576 times on ONE row, not per input row; this is the
    documented pattern for small-state recurrences over AGGREGATED
    series, the same class as q_holt_winters.

    Exactness: both series are exact cent sums on a fixed month spine;
    every DP cell is integer min/add — the whole table is exact on
    both engines by construction.

    Scale: the data-sized work is one (nation, month) aggregate; the
    DP state is months², constant. For thousands of series pairs, the
    same expression vectorizes per-row over a pair table (each row
    carries its own a/b arrays — embarrassingly parallel, still no
    shuffle).""".format(a=_DTW_A, b=_DTW_B)
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    monthly = (
        o.join(c, o["o_custkey"] == c["c_custkey"])
        .join(n, c["c_nationkey"] == n["n_nationkey"])
        .filter(
            F.col("n_name").isin(_DTW_A, _DTW_B)
            & (F.col("o_orderdate") >= F.lit("1995-01-01").cast("date"))
            & (F.col("o_orderdate") < F.lit("1997-01-01").cast("date"))
        )
        .groupBy(
            F.col("n_name").alias("nation"),
            (
                (F.year("o_orderdate") - 1995) * 12 + F.month("o_orderdate") - 1
            ).cast("long").alias("mo"),
        )
        .agg(F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("cents"))
    )
    per_nation = monthly.groupBy("nation").agg(
        F.map_from_entries(
            F.sort_array(F.collect_list(F.struct("mo", "cents")))
        ).alias("m")
    )
    fill = lambda m: F.transform(
        F.sequence(F.lit(0), F.lit(_DTW_MONTHS - 1)),
        lambda i: F.coalesce(F.element_at(m, i.cast("long")), F.lit(0).cast("long")),
    )
    # coalesce to the zero series: a nation with no orders in the
    # window must mean "flat zero curve" on BOTH engines (the oracle's
    # left-joined spine zero-fills by construction; without this the
    # Spark side would emit NULL arrays on such an SF)
    zeros = F.transform(
        F.sequence(F.lit(0), F.lit(_DTW_MONTHS - 1)),
        lambda _: F.lit(0).cast("long"),
    )
    series = per_nation.agg(
        F.coalesce(
            F.max(F.when(F.col("nation") == _DTW_A, fill(F.col("m")))), zeros
        ).alias("a"),
        F.coalesce(
            F.max(F.when(F.col("nation") == _DTW_B, fill(F.col("m")))), zeros
        ).alias("b"),
    )
    dtw = F.expr(
        f"""
        aggregate(
          sequence(1, {_DTW_MONTHS}),
          concat(array(0L),
                 transform(sequence(1, {_DTW_MONTHS}), j -> {_DTW_INF}L)),
          (prev, i) -> aggregate(
            sequence(1, {_DTW_MONTHS}),
            array({_DTW_INF}L),
            (acc, j) -> concat(acc, array(
              abs(element_at(a, i) - element_at(b, j))
              + least(element_at(prev, j + 1),
                      element_at(prev, j),
                      element_at(acc, j))))),
          dprow -> element_at(dprow, {_DTW_MONTHS} + 1))
        """
    )
    return series.select(
        F.lit(_DTW_MONTHS).cast("long").alias("n_months"),
        dtw.cast("long").alias("dtw_cents"),
        (dtw.cast("double") / F.lit(float(2 * _DTW_MONTHS))).alias(
            "dtw_per_step_cents"
        ),
    )


# ---------------------------------------------------------------------
# q_page_hinkley (round 7)
# ---------------------------------------------------------------------

_PH_ALARM_PCT = 10  # alarm when deviation mass > 10% of cumulative revenue


@query(
    "q_page_hinkley",
    oracle=f"""
    WITH daily AS (
      SELECT CAST(o_orderdate AS TIMESTAMP) AS day,
             CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS cents
      FROM orders GROUP BY 1
    ),
    runs AS (
      SELECT day, cents,
             CAST(ROW_NUMBER() OVER (ORDER BY day) AS BIGINT) AS i,
             CAST(SUM(cents) OVER (ORDER BY day) AS BIGINT) AS cum
      FROM daily
    ),
    dev AS (
      SELECT day, cents, i, cum,
             CAST(ROUND(1000.0 * (CAST(cents AS DOUBLE) * i - cum)
                        / CAST(i AS DOUBLE)) AS BIGINT) AS dev_milli
      FROM runs
    ),
    m AS (
      SELECT day, cents, i, cum, dev_milli,
             CAST(SUM(dev_milli) OVER (ORDER BY day) AS BIGINT) AS m_milli
      FROM dev
    )
    SELECT day, cents, dev_milli, m_milli,
           CAST(MAX(m_milli) OVER (ORDER BY day) - m_milli AS BIGINT)
             AS ph_milli,
           (MAX(m_milli) OVER (ORDER BY day) - m_milli)
             * {_PH_ALARM_PCT} > CAST(cum AS BIGINT) * 1000 AS alarm
    FROM m
    """,
    tags=("timeseries", "page-hinkley", "drift", "changepoint"),
)
def q_page_hinkley(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Page-Hinkley downward-drift monitor over daily revenue: the
    cumulative deviation from the RUNNING mean, m_t = Σ_i (x_i − x̄_i),
    and the PH statistic max_s m_s − m_t — alarming when the deviation
    mass exceeds {_PH_ALARM_PCT}% of cumulative revenue (a RELATIVE
    bound, so the gate means the same thing at every SF). The
    sequential changepoint detector that complements q_cusum_drift
    (fixed reference mean) by tracking the mean as it drifts — the
    standard data-stream drift test (Page 1954; Gama et al. 2014).

    Exactness: daily cents exact; each deviation (x_i·i − cum_i)/i is
    ONE IEEE division of exact integer operands quantized to
    milli-units (numerator < 2^63 while daily-cents × day-count stays
    under ~9e18 — holds through every shipped tile; the 100 TB form
    re-scales to dollar units first); m and the running max are then
    exact integer window sums; the alarm is an exact integer
    cross-multiplication.

    Scale: one hash aggregate to the calendar-bounded daily frame
    (~2.4k rows at any SF), then keyless windows over that bounded
    frame — the allowlisted class; nothing data-proportional follows
    the scan. In production the same integer update runs as a
    stateful streaming operator."""
    daily = (
        load_table(spark, sf_dir, "orders")
        .groupBy(F.col("o_orderdate").cast("timestamp").alias("day"))
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias(
                "cents"
            )
        )
    )
    w_run = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    runs = daily.select(
        "day",
        "cents",
        F.row_number().over(Window.orderBy("day")).cast("long").alias("i"),
        F.sum("cents").over(w_run).cast("long").alias("cum"),
    )
    dev = runs.select(
        "day",
        "cents",
        "i",
        "cum",
        F.round(
            F.lit(1000.0)
            * (F.col("cents").cast("double") * F.col("i") - F.col("cum"))
            / F.col("i").cast("double")
        )
        .cast("long")
        .alias("dev_milli"),
    )
    m = dev.select(
        "day",
        "cents",
        "dev_milli",
        "cum",
        F.sum("dev_milli").over(w_run).cast("long").alias("m_milli"),
    )
    ph = F.max("m_milli").over(w_run) - F.col("m_milli")
    return m.select(
        "day",
        "cents",
        "dev_milli",
        "m_milli",
        ph.cast("long").alias("ph_milli"),
        (ph * _PH_ALARM_PCT > F.col("cum") * 1000).alias("alarm"),
    )


# ---------------------------------------------------------------------
# q_durbin_watson (round 8)
# ---------------------------------------------------------------------


@query(
    "q_durbin_watson",
    oracle="""
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS y
      FROM events GROUP BY event_type, CAST(ts AS DATE)
    ),
    seq AS (
      SELECT event_type, y,
             CAST(ROW_NUMBER() OVER (PARTITION BY event_type
                                     ORDER BY day) AS BIGINT) AS t
      FROM daily
    ),
    mom AS MATERIALIZED (
      SELECT event_type,
             CAST(COUNT(*) AS HUGEINT) AS n,
             CAST(SUM(t) AS HUGEINT) AS st,
             CAST(SUM(t * t) AS HUGEINT) AS stt,
             CAST(SUM(y) AS HUGEINT) AS sy,
             SUM(CAST(t AS HUGEINT) * y) AS sty
      FROM seq GROUP BY event_type
    ),
    res AS (
      -- residual of the OLS fit y ~ a + b t, scaled by n*D (exact),
      -- then quantized ONCE per row to milli-cents
      SELECT s.event_type, s.t,
             (1000 * (m.n * (m.n * m.stt - m.st * m.st) * s.y
                      - (m.n * m.stt - m.st * m.st) * m.sy
                      + (m.n * m.sty - m.st * m.sy) * m.st
                      - m.n * (m.n * m.sty - m.st * m.sy) * s.t))
               // (m.n * (m.n * m.stt - m.st * m.st)) AS e_milli
      FROM seq s JOIN mom m USING (event_type)
    ),
    lagged AS (
      SELECT event_type, e_milli,
             LAG(e_milli) OVER (PARTITION BY event_type
                                ORDER BY t) AS e_prev
      FROM res
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_days,
           CAST((1000 * SUM(CASE WHEN e_prev IS NULL THEN 0
                                 ELSE (e_milli - e_prev) * (e_milli - e_prev)
                            END))
                // SUM(e_milli * e_milli) AS BIGINT) AS dw_milli,
           (1000 * SUM(CASE WHEN e_prev IS NULL THEN 0
                            ELSE (e_milli - e_prev) * (e_milli - e_prev)
                       END))
             // SUM(e_milli * e_milli) < 1500 AS positive_autocorr
    FROM lagged GROUP BY event_type
    """,
    tags=("timeseries", "durbin-watson", "autocorrelation", "diagnostics"),
)
def q_durbin_watson(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Durbin-Watson serial-correlation diagnostic of the residuals of
    a per-type linear trend fit over the daily revenue series: detrend
    with OLS (y ~ a + b t), then DW = sum (e_t - e_{t-1})^2 / sum e_t^2
    — near 2 means uncorrelated residuals, well below 2 means the
    trend fit leaves positively autocorrelated structure (the classic
    "your regression standard errors are lies" regression diagnostic,
    complementing q_autocorrelation's raw-series ACF).

    Exactness: the OLS residual is computed in closed form scaled by
    the exact integer n*D (D = n*Stt - St^2), so the only rounding is
    ONE truncating division per row quantizing the residual to
    milli-cents; both difference and level sums of squares are then
    exact DECIMAL(38,0)/HUGEINT integer sums, and dw_milli one more
    truncating division. Both engines truncate integer division toward
    zero (verified), so negative residuals quantize identically.

    Scale: one daily hash aggregate; moments are one map-side-
    combinable reduction per type; the residual join broadcasts
    |types| rows; the lag is a TYPE-KEYED window (partition-parallel,
    frame 1 row). Nothing is driver-side or data-proportional in one
    task."""
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy(
        "event_type", F.col("ts").cast("date").alias("day")
    ).agg(
        F.sum(F.expr("CAST(ROUND(value * 100) AS BIGINT)")).alias("y")
    )
    w_t = Window.partitionBy("event_type").orderBy("day")
    seq = daily.select(
        "event_type", "y", F.row_number().over(w_t).cast("long").alias("t")
    )
    mom = seq.groupBy("event_type").agg(
        F.expr("CAST(COUNT(*) AS DECIMAL(38,0))").alias("n"),
        F.expr("CAST(SUM(t) AS DECIMAL(38,0))").alias("st"),
        F.expr("CAST(SUM(t * t) AS DECIMAL(38,0))").alias("stt"),
        F.expr("CAST(SUM(y) AS DECIMAL(38,0))").alias("sy"),
        F.expr("SUM(CAST(t AS DECIMAL(38,0)) * y)").alias("sty"),
    )
    res = seq.join(F.broadcast(mom), "event_type").select(
        "event_type",
        "t",
        F.expr(
            "(1000 * (n * (n * stt - st * st) * y"
            " - (n * stt - st * st) * sy"
            " + (n * sty - st * sy) * st"
            " - n * (n * sty - st * sy) * t))"
            " div (n * (n * stt - st * st))"
        ).alias("e_milli"),
    )
    w_lag = Window.partitionBy("event_type").orderBy("t")
    lagged = res.select(
        "event_type",
        "e_milli",
        F.lag("e_milli").over(w_lag).alias("e_prev"),
    )
    d2 = (
        "SUM(CASE WHEN e_prev IS NULL THEN CAST(0 AS DECIMAL(38,0))"
        " ELSE CAST(e_milli - e_prev AS DECIMAL(38,0))"
        " * (e_milli - e_prev) END)"
    )
    lvl = "SUM(CAST(e_milli AS DECIMAL(38,0)) * e_milli)"
    return lagged.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_days"),
        F.expr(
            f"CAST((1000 * {d2}) div {lvl} AS BIGINT)"
        ).alias("dw_milli"),
        F.expr(
            f"(1000 * {d2}) div {lvl} < 1500"
        ).alias("positive_autocorr"),
    )


# ---------------------------------------------------------------------
# q_theil_u_forecast (round 8)
# ---------------------------------------------------------------------


@query(
    "q_theil_u_forecast",
    oracle="""
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS y
      FROM events GROUP BY event_type, CAST(ts AS DATE)
    ),
    lagged AS (
      SELECT event_type, y,
             LAG(y, 1) OVER (PARTITION BY event_type ORDER BY day) AS y1,
             LAG(y, 2) OVER (PARTITION BY event_type ORDER BY day) AS y2
      FROM daily
    ),
    scored AS (
      -- MA2 forecast error scaled x2: (y1 + y2 - 2y); naive error: (y - y1)
      SELECT event_type,
             CAST(y1 + y2 - 2 * y AS HUGEINT) AS a,
             CAST(y - y1 AS HUGEINT) AS b
      FROM lagged WHERE y2 IS NOT NULL
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_scored,
           CAST((1000 * SUM(a * a)) // (4 * SUM(b * b)) AS BIGINT)
             AS u2_sq_milli,
           (1000 * SUM(a * a)) // (4 * SUM(b * b)) < 1000 AS beats_naive
    FROM scored GROUP BY event_type
    """,
    tags=("timeseries", "forecast-accuracy", "theil-u", "evaluation"),
)
def q_theil_u_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil's U^2 forecast-accuracy ratio of a 2-day moving-average
    forecast against the naive (last-value) forecast on each type's
    daily revenue: U^2 = sum (yhat_t - y_t)^2 / sum (y_t - y_{t-1})^2.
    U^2 < 1 means the model adds information over persistence — the
    standard sanity gate before shipping any forecaster
    (q_forecast_backtest measures a model against actuals; this
    measures it against the do-nothing baseline).

    Exactness: with yhat = (y_{t-1} + y_{t-2}) / 2 both error terms
    clear denominators exactly — numerator (y1 + y2 - 2y)^2 carries the
    x4, so u2_sq_milli = (1000 * sum a^2) div (4 * sum b^2) is pure
    wide-integer arithmetic on exact daily cent sums.

    Scale: one daily hash aggregate; lags are a TYPE-KEYED window
    (2-row frame); the scoring reduction is map-side combinable; output
    is |types| rows."""
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy(
        "event_type", F.col("ts").cast("date").alias("day")
    ).agg(
        F.sum(F.expr("CAST(ROUND(value * 100) AS BIGINT)")).alias("y")
    )
    w = Window.partitionBy("event_type").orderBy("day")
    lagged = daily.select(
        "event_type",
        "y",
        F.lag("y", 1).over(w).alias("y1"),
        F.lag("y", 2).over(w).alias("y2"),
    )
    scored = lagged.filter(F.col("y2").isNotNull()).select(
        "event_type",
        F.expr("CAST(y1 + y2 - 2 * y AS DECIMAL(38,0))").alias("a"),
        F.expr("CAST(y - y1 AS DECIMAL(38,0))").alias("b"),
    )
    return scored.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_scored"),
        F.expr(
            "CAST((1000 * SUM(a * a)) div (4 * SUM(b * b)) AS BIGINT)"
        ).alias("u2_sq_milli"),
        F.expr("(1000 * SUM(a * a)) div (4 * SUM(b * b)) < 1000").alias(
            "beats_naive"
        ),
    )

# ---------------------------------------------------------------------
# q_hurst_exponent (round 8)
# ---------------------------------------------------------------------

_HURST_SIZES = (8, 16, 32)  # R/S block sizes over the hourly series


def _hurst_oracle() -> str:
    from .curation import _isqrt_sql

    sizes = ", ".join(str(n) for n in _HURST_SIZES)
    return f"""
    WITH hourly AS (
      SELECT event_type, date_trunc('hour', ts) AS hr,
             CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS y
      FROM events GROUP BY 1, 2
    ),
    seq AS (
      SELECT event_type, y,
             CAST(ROW_NUMBER() OVER (PARTITION BY event_type
                                     ORDER BY hr) AS BIGINT) - 1 AS t,
             CAST(COUNT(*) OVER (PARTITION BY event_type) AS BIGINT) AS len
      FROM hourly
    ),
    framed AS (
      SELECT s.event_type, n.n, s.y,
             s.t // n.n AS blk, s.t % n.n + 1 AS j
      FROM seq s
      CROSS JOIN (SELECT unnest([{sizes}]) AS n) n
      WHERE s.t // n.n < s.len // n.n
    ),
    parts AS (
      SELECT event_type, n, blk, j, y,
             CAST(SUM(y) OVER (PARTITION BY event_type, n, blk
                               ORDER BY j) AS BIGINT) AS p,
             CAST(SUM(y) OVER (PARTITION BY event_type, n, blk)
               AS BIGINT) AS s_blk
      FROM framed
    ),
    blocks AS (
      SELECT event_type, n, blk,
             CAST(MAX(n * p - j * s_blk) - MIN(n * p - j * s_blk)
               AS BIGINT) AS rng,
             CAST(n * SUM(CAST(y AS HUGEINT) * y)
                  - CAST(MAX(s_blk) AS HUGEINT) * MAX(s_blk)
               AS BIGINT) AS var_sc
      FROM parts GROUP BY event_type, n, blk
    ),
    rs AS (
      SELECT event_type, n,
             CAST(SUM((1000000 * CAST(rng AS HUGEINT))
                      // {_isqrt_sql("var_sc")}) // COUNT(*) AS BIGINT)
               AS rs_micro,
             CAST(COUNT(*) AS BIGINT) AS n_blocks
      FROM blocks WHERE var_sc > 0
      GROUP BY event_type, n
    )
    SELECT event_type,
           MAX(CASE WHEN n = 8 THEN n_blocks END)
             + MAX(CASE WHEN n = 16 THEN n_blocks END)
             + MAX(CASE WHEN n = 32 THEN n_blocks END) AS n_blocks_total,
           MAX(CASE WHEN n = 8 THEN rs_micro END) AS rs8_micro,
           MAX(CASE WHEN n = 16 THEN rs_micro END) AS rs16_micro,
           MAX(CASE WHEN n = 32 THEN rs_micro END) AS rs32_micro,
           CAST(ROUND(1000 * (ln(CAST(MAX(CASE WHEN n = 32 THEN rs_micro
                                       END) AS DOUBLE))
                              - ln(CAST(MAX(CASE WHEN n = 8 THEN rs_micro
                                        END) AS DOUBLE)))
                      / ln(4.0)) AS BIGINT) AS hurst_milli
    FROM rs GROUP BY event_type
    """


@query(
    "q_hurst_exponent",
    oracle=_hurst_oracle(),
    tags=("timeseries", "hurst", "long-range-dependence", "rs-analysis"),
)
def q_hurst_exponent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hurst exponent by rescaled-range (R/S) analysis (Hurst 1951,
    Mandelbrot's long-range-dependence diagnostic) of each type's
    HOURLY revenue series: partition the series into complete blocks
    of {_HURST_SIZES} points, compute each block's range of cumulative
    deviations over its standard deviation, average per block size,
    and fit log(R/S) ~ H log(n). H near 0.5 is a memoryless walk,
    H > 0.5 persistent trends (seasonality/bursts that invalidate iid
    assumptions downstream), H < 0.5 mean reversion — the
    long-memory complement of q_autocorrelation's short-lag ACF and
    q_durbin_watson's lag-1 residual diagnostic.

    Exactness: cumulative deviations clear the block-mean denominator
    exactly (dev_j = n*P_j - j*S, all integers); the block's n*std is
    the EXACT integer square root of n*Syy - S^2 (curation.py's
    corrected floor-sqrt, dialect-shared), so R/S truncates to
    micro once per block and the per-size mean once per size.
    Zero-variance blocks are excluded in both engines. The final
    slope uses ln over exactly-equal integers (the entropy-family
    treatment); with three log-evenly-spaced sizes the OLS slope
    collapses to (y3 - y1)/(x3 - x1) exactly, one rounded milli.

    Scale: one hourly hash aggregate; the t-index and block windows
    are TYPE- and (type, n, blk)-KEYED (partition-parallel, bounded
    frames); block reduction and the 3-point fit run on |types| x
    |sizes| rows."""
    from .curation import _isqrt_sql

    e = load_table(spark, sf_dir, "events")
    hourly = e.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("hr")
    ).agg(F.sum(F.expr("CAST(ROUND(value * 100) AS BIGINT)")).alias("y"))
    w_t = Window.partitionBy("event_type").orderBy("hr")
    w_len = Window.partitionBy("event_type")
    seq = hourly.select(
        "event_type",
        "y",
        (F.row_number().over(w_t).cast("long") - 1).alias("t"),
        F.count(F.lit(1)).over(w_len).cast("long").alias("len"),
    )
    sizes = F.explode(
        F.array(*[F.lit(n).cast("long") for n in _HURST_SIZES])
    ).alias("n")
    framed = (
        seq.select("event_type", "y", "t", "len", sizes)
        .filter(F.expr("t div n < len div n"))
        .select(
            "event_type",
            "n",
            "y",
            F.expr("t div n").alias("blk"),
            F.expr("t % n + 1").alias("j"),
        )
    )
    w_run = (
        Window.partitionBy("event_type", "n", "blk")
        .orderBy("j")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_blk = Window.partitionBy("event_type", "n", "blk")
    parts = framed.select(
        "event_type",
        "n",
        "blk",
        "j",
        "y",
        F.sum("y").over(w_run).alias("p"),
        F.sum("y").over(w_blk).alias("s_blk"),
    )
    blocks = (
        parts.groupBy("event_type", "n", "blk")
        .agg(
            (
                F.max(F.col("n") * F.col("p") - F.col("j") * F.col("s_blk"))
                - F.min(F.col("n") * F.col("p") - F.col("j") * F.col("s_blk"))
            ).alias("rng"),
            F.expr(
                "CAST(FIRST(n) * SUM(CAST(y AS DECIMAL(38,0)) * y)"
                " - CAST(MAX(s_blk) AS DECIMAL(38,0)) * MAX(s_blk)"
                " AS BIGINT)"
            ).alias("var_sc"),
        )
    )
    rs = (
        blocks.filter(F.col("var_sc") > 0)
        .groupBy("event_type", "n")
        .agg(
            F.expr(
                "CAST(SUM((1000000 * CAST(rng AS DECIMAL(38,0)))"
                f" div {_isqrt_sql('var_sc')}) div COUNT(*) AS BIGINT)"
            ).alias("rs_micro"),
            F.count(F.lit(1)).alias("n_blocks"),
        )
    )
    pick = "MAX(CASE WHEN n = {k} THEN {c} END)"
    return rs.groupBy("event_type").agg(
        F.expr(
            " + ".join(pick.format(k=k, c="n_blocks") for k in _HURST_SIZES)
        ).alias("n_blocks_total"),
        F.expr(pick.format(k=8, c="rs_micro")).alias("rs8_micro"),
        F.expr(pick.format(k=16, c="rs_micro")).alias("rs16_micro"),
        F.expr(pick.format(k=32, c="rs_micro")).alias("rs32_micro"),
        F.expr(
            "CAST(ROUND(1000 * (ln(CAST(MAX(CASE WHEN n = 32 THEN rs_micro"
            " END) AS DOUBLE))"
            " - ln(CAST(MAX(CASE WHEN n = 8 THEN rs_micro END) AS DOUBLE)))"
            " / ln(4.0)) AS BIGINT)"
        ).alias("hurst_milli"),
    )


# ---------------------------------------------------------------------
# q_pacf (round 8)
# ---------------------------------------------------------------------


@query(
    "q_pacf",
    oracle="""
    WITH daily AS MATERIALIZED (
      SELECT event_type, CAST(COUNT(*) AS BIGINT) AS y,
             CAST(ROW_NUMBER() OVER (PARTITION BY event_type
                                     ORDER BY CAST(ts AS DATE))
                  AS BIGINT) AS x
      FROM events GROUP BY event_type, CAST(ts AS DATE)
    ),
    mom AS MATERIALIZED (
      SELECT event_type, CAST(COUNT(*) AS HUGEINT) AS n,
             CAST(SUM(y) AS HUGEINT) AS s,
             SUM(CAST(y AS HUGEINT) * y) AS syy
      FROM daily GROUP BY event_type
    ),
    paired AS (
      SELECT a.event_type, l.lag,
             CAST(SUM(CAST(a.y AS HUGEINT) * b.y) AS HUGEINT) AS sxy,
             CAST(SUM(a.y) AS HUGEINT) AS h,
             CAST(SUM(b.y) AS HUGEINT) AS t
      FROM daily a
      JOIN (SELECT CAST(unnest([1, 2]) AS BIGINT) AS lag) l ON TRUE
      JOIN daily b ON b.event_type = a.event_type AND b.x = a.x + l.lag
      GROUP BY a.event_type, l.lag
    ),
    ck AS (
      SELECT p.event_type,
             MAX(m.n) AS n,
             -- scaled autocovariances: CK_k = n^2*Sxy - n*S*(H+T)
             --                                + (n-k)*S^2; CK_0 shares
             -- the scale, so ratios are exact
             MAX(m.n) * MAX(m.n) * MAX(m.syy)
               - MAX(m.n) * MAX(m.s) * MAX(m.s) AS ck0,
             MAX(CASE WHEN p.lag = 1 THEN
                 m.n * m.n * p.sxy - m.n * m.s * (p.h + p.t)
                 + (m.n - 1) * m.s * m.s END) AS ck1,
             MAX(CASE WHEN p.lag = 2 THEN
                 m.n * m.n * p.sxy - m.n * m.s * (p.h + p.t)
                 + (m.n - 2) * m.s * m.s END) AS ck2
      FROM paired p JOIN mom m USING (event_type)
      GROUP BY p.event_type
    ),
    r AS (
      SELECT event_type, CAST(n AS BIGINT) AS n_days,
             (1000000 * ck1) // ck0 AS r1,
             (1000000 * ck2) // ck0 AS r2
      FROM ck
    )
    SELECT event_type, n_days,
           CAST(r1 AS BIGINT) AS r1_micro,
           CAST(r2 AS BIGINT) AS r2_micro,
           CAST(r1 AS BIGINT) AS pacf1_micro,
           CAST((1000000 * (1000000 * r2 - r1 * r1))
                // (1000000000000 - r1 * r1) AS BIGINT) AS pacf2_micro
    FROM r
    """,
    tags=("timeseries", "pacf", "box-jenkins", "autocorrelation"),
)
def q_pacf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partial autocorrelation of the daily count series at lags 1 and
    2 via the closed-form Durbin-Levinson step: pacf(1) = r1,
    pacf(2) = (r2 - r1^2) / (1 - r1^2) — the Box-Jenkins
    order-selection companion to q_autocorrelation (ACF says a lag
    correlates; PACF says whether it correlates DIRECTLY or only
    through shorter lags, which is what picks the AR order).

    Exactness goes one step further than q_autocorrelation (which
    hashes moments only): the autocovariances are scaled to the
    COMMON exact integer CK_k = n^2*Sxy_k - n*S*(H_k + T_k)
    + (n-k)*S^2 (full-series-mean convention, denominators cleared),
    so r_k itself quantizes to micro as one truncating division of
    exact integers, and the lag-2 partial is one more — the hashed
    surface includes the correlations, not just their ingredients.

    Scale: lagged pairing is an EQUI-join on (type, x + lag) with a
    constant 2-row lag grid; type-level moments broadcast; everything
    after runs on |types| rows."""
    e = load_table(spark, sf_dir, "events")
    w_x = Window.partitionBy("event_type").orderBy("day")
    daily = (
        e.groupBy("event_type", F.col("ts").cast("date").alias("day"))
        .agg(F.count(F.lit(1)).alias("y"))
        .select(
            "event_type", "y", F.row_number().over(w_x).cast("long").alias("x")
        )
    )
    mom = daily.groupBy("event_type").agg(
        F.expr("CAST(COUNT(*) AS DECIMAL(38,0))").alias("n"),
        F.expr("CAST(SUM(y) AS DECIMAL(38,0))").alias("s"),
        F.expr("SUM(CAST(y AS DECIMAL(38,0)) * y)").alias("syy"),
    )
    lags = F.explode(F.array(F.lit(1).cast("long"), F.lit(2).cast("long")))
    a = daily.select("event_type", F.col("y").alias("y0"), "x", lags.alias("lag"))
    b = daily.select(
        F.col("event_type").alias("bt"), F.col("y").alias("y1"),
        F.col("x").alias("bx"),
    )
    paired = (
        a.join(
            b,
            (F.col("bt") == F.col("event_type"))
            & (F.col("bx") == F.col("x") + F.col("lag")),
        )
        .groupBy("event_type", "lag")
        .agg(
            F.expr("CAST(SUM(CAST(y0 AS DECIMAL(38,0)) * y1) AS DECIMAL(38,0))").alias("sxy"),
            F.expr("CAST(SUM(y0) AS DECIMAL(38,0))").alias("h"),
            F.expr("CAST(SUM(y1) AS DECIMAL(38,0))").alias("t"),
        )
    )
    ckk = (
        "n * n * sxy - n * s * (h + t) + (n - {k}) * s * s"
    )
    ck = (
        paired.join(F.broadcast(mom), "event_type")
        .groupBy("event_type")
        .agg(
            F.max("n").alias("n"),
            F.expr(
                "MAX(n) * MAX(n) * MAX(syy) - MAX(n) * MAX(s) * MAX(s)"
            ).alias("ck0"),
            F.expr(
                f"MAX(CASE WHEN lag = 1 THEN {ckk.format(k=1)} END)"
            ).alias("ck1"),
            F.expr(
                f"MAX(CASE WHEN lag = 2 THEN {ckk.format(k=2)} END)"
            ).alias("ck2"),
        )
    )
    r = ck.select(
        "event_type",
        F.col("n").cast("long").alias("n_days"),
        F.expr("(1000000 * ck1) div ck0").alias("r1"),
        F.expr("(1000000 * ck2) div ck0").alias("r2"),
    )
    return r.select(
        "event_type",
        "n_days",
        F.col("r1").cast("long").alias("r1_micro"),
        F.col("r2").cast("long").alias("r2_micro"),
        F.col("r1").cast("long").alias("pacf1_micro"),
        F.expr(
            "CAST((1000000 * (1000000 * r2 - r1 * r1))"
            " div (1000000000000 - r1 * r1) AS BIGINT)"
        ).alias("pacf2_micro"),
    )


# ---------------------------------------------------------------------
# q_periodogram (round 8, session 3)
# ---------------------------------------------------------------------

# Milli-scaled cos/sin tables at the candidate periods: literal integer
# constants (no libm at query time — the q_sprt_boundary embedded-
# constant rule), so both engines sum EXACTLY the same integers.
_PGRAM_TRIG = {3: ([1000, -500, -500], [0, 866, -866]), 7: ([1000, 623, -223, -901, -901, -223, 623], [0, 782, 975, 434, -434, -975, -782])}


@query(
    "q_periodogram",
    oracle="""
    SELECT CAST(3 AS BIGINT) AS period, CAST(n AS BIGINT) AS n_days,
           CAST((1000 * ((cxx*czz - cxz*cxz) * cyy
                 - (cyy * (cxx*czz - cxz*cxz)
                    - (cxy*cxy*czz - 2*cxy*czy*cxz + czy*czy*cxx))))
                // ((cxx*czz - cxz*cxz) * cyy) AS BIGINT) AS r2_milli
    FROM (
      SELECT n, n*syy - sy*sy AS cyy, n*sxx - sx*sx AS cxx,
             n*szz - sz*sz AS czz, n*sxy - sx*sy AS cxy,
             n*szy - sz*sy AS czy, n*sxz - sx*sz AS cxz
      FROM (
        SELECT CAST(COUNT(*) AS HUGEINT) AS n, SUM(y) AS sy, SUM(c) AS sx,
               SUM(s) AS sz, SUM(y*y) AS syy, SUM(c*c) AS sxx,
               SUM(s*s) AS szz, SUM(c*y) AS sxy, SUM(s*y) AS szy,
               SUM(c*s) AS sxz
        FROM (
          SELECT CAST(COUNT(*) AS HUGEINT) AS y,
                 CAST(CASE (t % 3) WHEN 0 THEN 1000 WHEN 1 THEN -500 WHEN 2 THEN -500 END AS HUGEINT) AS c,
                 CAST(CASE (t % 3) WHEN 0 THEN 0 WHEN 1 THEN 866 WHEN 2 THEN -866 END AS HUGEINT) AS s
          FROM (SELECT datediff('day', DATE '1970-01-01', CAST(ts AS DATE))
                       AS t FROM events)
          GROUP BY t
        )
      )
    ) UNION ALL 
    SELECT CAST(7 AS BIGINT) AS period, CAST(n AS BIGINT) AS n_days,
           CAST((1000 * ((cxx*czz - cxz*cxz) * cyy
                 - (cyy * (cxx*czz - cxz*cxz)
                    - (cxy*cxy*czz - 2*cxy*czy*cxz + czy*czy*cxx))))
                // ((cxx*czz - cxz*cxz) * cyy) AS BIGINT) AS r2_milli
    FROM (
      SELECT n, n*syy - sy*sy AS cyy, n*sxx - sx*sx AS cxx,
             n*szz - sz*sz AS czz, n*sxy - sx*sy AS cxy,
             n*szy - sz*sy AS czy, n*sxz - sx*sz AS cxz
      FROM (
        SELECT CAST(COUNT(*) AS HUGEINT) AS n, SUM(y) AS sy, SUM(c) AS sx,
               SUM(s) AS sz, SUM(y*y) AS syy, SUM(c*c) AS sxx,
               SUM(s*s) AS szz, SUM(c*y) AS sxy, SUM(s*y) AS szy,
               SUM(c*s) AS sxz
        FROM (
          SELECT CAST(COUNT(*) AS HUGEINT) AS y,
                 CAST(CASE (t % 7) WHEN 0 THEN 1000 WHEN 1 THEN 623 WHEN 2 THEN -223 WHEN 3 THEN -901 WHEN 4 THEN -901 WHEN 5 THEN -223 WHEN 6 THEN 623 END AS HUGEINT) AS c,
                 CAST(CASE (t % 7) WHEN 0 THEN 0 WHEN 1 THEN 782 WHEN 2 THEN 975 WHEN 3 THEN 434 WHEN 4 THEN -434 WHEN 5 THEN -975 WHEN 6 THEN -782 END AS HUGEINT) AS s
          FROM (SELECT datediff('day', DATE '1970-01-01', CAST(ts AS DATE))
                       AS t FROM events)
          GROUP BY t
        )
      )
    )
    """,
    tags=("timeseries", "periodogram", "seasonality", "harmonic"),
)
def q_periodogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Harmonic-regression periodogram of the daily event-count
    series at candidate periods 3 and 7: the fraction of variance a
    single (cos, sin) pair at that frequency explains — R^2 of the
    two-regressor OLS, the Goertzel/single-bin-DFT read that answers
    "is there a weekly cycle" BEFORE q_seasonal_decompose commits to
    one. The trig design columns are milli-scaled INTEGER literals
    keyed by day-ordinal mod p (~0.1% design quantization, identical
    on both engines), and R^2 = (D*Cyy - B)/(D*Cyy) reuses the exact
    two-regressor determinant sweep from q_granger_causality — one
    truncating division per period, no libm, no float accumulation.
    Period 2 is excluded: its sine column is identically zero and the
    design matrix goes singular (use the cosine-only contrast in
    q_autocorrelation's lag-2 moments instead).

    Scale: one calendar-bounded daily aggregate per period (constant
    2-branch union), each followed by a 1-row ten-moment reduction."""
    e = load_table(spark, sf_dir, "events")
    days = e.select(
        F.datediff(F.col("ts").cast("date"), F.lit("1970-01-01").cast("date"))
        .cast("long")
        .alias("t")
    )
    outs = []
    for p, (ctab, stab) in sorted(_PGRAM_TRIG.items()):
        c_case = "CASE (t % {p}) {c} END".format(
            p=p,
            c=" ".join(
                "WHEN {r} THEN {v}".format(r=r, v=v)
                for r, v in enumerate(ctab)
            ),
        )
        s_case = "CASE (t % {p}) {c} END".format(
            p=p,
            c=" ".join(
                "WHEN {r} THEN {v}".format(r=r, v=v)
                for r, v in enumerate(stab)
            ),
        )
        daily = days.groupBy("t").agg(
            F.expr("CAST(COUNT(*) AS DECIMAL(38,0))").alias("y")
        ).select(
            "y",
            F.expr(f"CAST({c_case} AS DECIMAL(38,0))").alias("c"),
            F.expr(f"CAST({s_case} AS DECIMAL(38,0))").alias("s"),
        )
        m = daily.agg(
            F.expr("CAST(COUNT(*) AS DECIMAL(38,0))").alias("n"),
            F.expr("SUM(y)").alias("sy"),
            F.expr("SUM(c)").alias("sx"),
            F.expr("SUM(s)").alias("sz"),
            F.expr("SUM(y*y)").alias("syy"),
            F.expr("SUM(c*c)").alias("sxx"),
            F.expr("SUM(s*s)").alias("szz"),
            F.expr("SUM(c*y)").alias("sxy"),
            F.expr("SUM(s*y)").alias("szy"),
            F.expr("SUM(c*s)").alias("sxz"),
        )
        cc = m.select(
            "n",
            F.expr("n*syy - sy*sy").alias("cyy"),
            F.expr("n*sxx - sx*sx").alias("cxx"),
            F.expr("n*szz - sz*sz").alias("czz"),
            F.expr("n*sxy - sx*sy").alias("cxy"),
            F.expr("n*szy - sz*sy").alias("czy"),
            F.expr("n*sxz - sx*sz").alias("cxz"),
        )
        outs.append(
            cc.select(
                F.lit(p).cast("long").alias("period"),
                F.col("n").cast("long").alias("n_days"),
                F.expr(
                    "CAST((1000 * ((cxx*czz - cxz*cxz) * cyy"
                    " - (cyy * (cxx*czz - cxz*cxz)"
                    " - (cxy*cxy*czz - 2*cxy*czy*cxz + czy*czy*cxx))))"
                    " div ((cxx*czz - cxz*cxz) * cyy) AS BIGINT)"
                ).alias("r2_milli"),
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionAll(o)
    return out
