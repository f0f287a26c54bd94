"""Behavioral-insight operators over `events`: multi-touch
attribution, z-score anomaly flagging from exact integer moments, and
partial-aggregate re-merge (the lambda-architecture rollup).

Scale posture (100 TB):
- Attribution is an equi-join on user_id with a time-range predicate
  — per-user blocks only, never cross-user; credit is emitted at pair
  grain with exact integer numerator/denominator (a SUM of 1/n
  doubles would be order-dependent; downstream can aggregate the
  rationals exactly).
- Anomaly detection computes (n, sum, sum-of-squares) as exact BIGINT
  cents in ONE hash aggregate, then derives mean/std/z with
  deterministic IEEE double steps — no builtin stddev (its merge
  order varies), no second pass over the data for the mean.
- Re-aggregation merges daily partial states (count/sum/min/max) into
  monthly finals — sums of sums, min of mins — demonstrating that
  every aggregate here is decomposable; at 100 TB this is the
  pre-aggregation pipeline pattern (store partials, merge on read).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import query
from ..sources.loader import load_table

_CENTS = "CAST(ROUND(value * 100) AS BIGINT)"


@query(
    "q_attribution_touch",
    oracle="""
    WITH e AS (
      SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts, event_type
      FROM events
    ), conv AS (
      SELECT event_id AS conv_id, user_id, ts AS conv_ts
      FROM e WHERE event_type = 'purchase'
    ), touch AS (
      SELECT event_id AS touch_id, user_id, ts AS touch_ts, event_type
      FROM e WHERE event_type IN ('view', 'click')
    ), pairs AS (
      SELECT c.conv_id, c.user_id, t.touch_id, t.event_type AS channel,
             c.conv_ts, t.touch_ts
      FROM conv c
      JOIN touch t
        ON t.user_id = c.user_id
       AND t.touch_ts < c.conv_ts
       AND t.touch_ts >= c.conv_ts - INTERVAL 7 DAY
    )
    SELECT conv_id, user_id, touch_id, channel,
           CAST(ROW_NUMBER() OVER w AS BIGINT) AS touch_pos,
           CAST(COUNT(*) OVER (PARTITION BY conv_id) AS BIGINT) AS n_touches,
           ROW_NUMBER() OVER w = 1 AS is_first_touch,
           ROW_NUMBER() OVER (PARTITION BY conv_id
                              ORDER BY touch_ts DESC, touch_id DESC) = 1
             AS is_last_touch,
           CAST(1 AS DOUBLE)
             / CAST(COUNT(*) OVER (PARTITION BY conv_id) AS DOUBLE)
             AS linear_credit
    FROM pairs
    WINDOW w AS (PARTITION BY conv_id ORDER BY touch_ts, touch_id)
    """,
    tags=("insights", "attribution", "events"),
)
def q_attribution_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-touch attribution: every view/click in the 7 days before
    a purchase by the same user is a touch; emits first/last-touch
    flags and linear credit 1/n per touch. Credit stays at pair grain
    as one division of exact counts — summing 1/n doubles across
    conversions would be order-dependent, so channel rollups should
    aggregate (1, n_touches) rationals instead. The join is user-keyed
    with a range predicate evaluated inside each user block."""
    e = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "ts", "event_type"
    )
    conv = e.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("conv_id"), "user_id", F.col("ts").alias("conv_ts")
    )
    touch = e.filter(F.col("event_type").isin("view", "click")).select(
        F.col("event_id").alias("touch_id"),
        F.col("user_id").alias("t_user"),
        F.col("ts").alias("touch_ts"),
        F.col("event_type").alias("channel"),
    )
    pairs = conv.join(
        touch,
        (F.col("t_user") == F.col("user_id"))
        & (F.col("touch_ts") < F.col("conv_ts"))
        & (F.col("touch_ts") >= F.col("conv_ts") - F.expr("INTERVAL 7 DAY")),
    )
    w_fwd = Window.partitionBy("conv_id").orderBy("touch_ts", "touch_id")
    w_rev = Window.partitionBy("conv_id").orderBy(
        F.col("touch_ts").desc(), F.col("touch_id").desc()
    )
    w_all = Window.partitionBy("conv_id")
    return pairs.select(
        "conv_id",
        "user_id",
        "touch_id",
        "channel",
        F.row_number().over(w_fwd).cast("long").alias("touch_pos"),
        F.count(F.lit(1)).over(w_all).alias("n_touches"),
        (F.row_number().over(w_fwd) == 1).alias("is_first_touch"),
        (F.row_number().over(w_rev) == 1).alias("is_last_touch"),
        (
            F.lit(1).cast("double")
            / F.count(F.lit(1)).over(w_all).cast("double")
        ).alias("linear_credit"),
    )


@query(
    "q_zscore_anomalies",
    oracle=f"""
    WITH v AS (
      SELECT event_id, user_id, {_CENTS} AS cents FROM events
    ), stats AS (
      SELECT user_id,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(cents) AS BIGINT) AS s1,
             CAST(SUM(cents * cents) AS BIGINT) AS s2
      FROM v GROUP BY 1
    )
    SELECT v.event_id, v.user_id, v.cents,
           CAST(s.s1 AS DOUBLE) / CAST(s.n AS DOUBLE) AS mean_cents,
           sqrt(CAST(s.n * s.s2 - s.s1 * s.s1 AS DOUBLE)
                / CAST(s.n * (s.n - 1) AS DOUBLE)) AS std_cents,
           (CAST(v.cents AS DOUBLE)
              - CAST(s.s1 AS DOUBLE) / CAST(s.n AS DOUBLE))
             / sqrt(CAST(s.n * s.s2 - s.s1 * s.s1 AS DOUBLE)
                    / CAST(s.n * (s.n - 1) AS DOUBLE)) AS z
    FROM v JOIN stats s USING (user_id)
    WHERE abs((CAST(v.cents AS DOUBLE)
               - CAST(s.s1 AS DOUBLE) / CAST(s.n AS DOUBLE))
              / sqrt(CAST(s.n * s.s2 - s.s1 * s.s1 AS DOUBLE)
                     / CAST(s.n * (s.n - 1) AS DOUBLE))) >= 2.5
    """,
    tags=("insights", "anomaly", "zscore"),
)
def q_zscore_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user z-score outliers (|z| >= 2.5) over event values in
    exact integer cents. The sample variance comes from integer
    moments — var = (n*s2 - s1^2) / (n*(n-1)) with BIGINT numerator
    and denominator computed exactly, then ONE double division, one
    sqrt (correctly rounded per IEEE), and deterministic double
    arithmetic for z. Builtin stddev is avoided: its partial-merge
    order varies run to run. One aggregate + one user-keyed join."""
    e = load_table(spark, sf_dir, "events")
    v = e.select("event_id", "user_id", F.expr(_CENTS).alias("cents"))
    stats = v.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("cents").alias("s1"),
        F.sum(F.col("cents") * F.col("cents")).alias("s2"),
    )
    mean = F.col("s1").cast("double") / F.col("n").cast("double")
    var = (F.col("n") * F.col("s2") - F.col("s1") * F.col("s1")).cast("double") / (
        F.col("n") * (F.col("n") - 1)
    ).cast("double")
    std = F.sqrt(var)
    z = (F.col("cents").cast("double") - mean) / std
    return (
        v.join(stats, "user_id")
        .select(
            "event_id",
            "user_id",
            "cents",
            mean.alias("mean_cents"),
            std.alias("std_cents"),
            z.alias("z"),
        )
        .filter(F.abs(F.col("z")) >= 2.5)
    )


@query(
    "q_reaggregate_partials",
    oracle=f"""
    WITH daily AS (
      SELECT CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE) AS day,
             event_type,
             CAST(COUNT(*) AS BIGINT) AS cnt,
             CAST(SUM({_CENTS}) AS BIGINT) AS sum_cents,
             CAST(MIN({_CENTS}) AS BIGINT) AS min_cents,
             CAST(MAX({_CENTS}) AS BIGINT) AS max_cents
      FROM events GROUP BY 1, 2
    )
    SELECT CAST(date_trunc('month', day) AS TIMESTAMP) AS month, event_type,
           CAST(SUM(cnt) AS BIGINT) AS n_events,
           CAST(SUM(sum_cents) AS BIGINT) AS total_cents,
           CAST(MIN(min_cents) AS BIGINT) AS min_cents,
           CAST(MAX(max_cents) AS BIGINT) AS max_cents,
           CAST(SUM(sum_cents) AS DOUBLE) / CAST(SUM(cnt) AS DOUBLE)
             AS avg_cents,
           CAST(COUNT(*) AS BIGINT) AS n_partials_merged
    FROM daily GROUP BY 1, 2
    """,
    tags=("insights", "reaggregation", "partial-state"),
)
def q_reaggregate_partials(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lambda-architecture rollup: daily partial aggregate states
    (count / sum / min / max in exact cents) merged into monthly
    finals — sum of sums, min of mins, max of maxes, and the exact
    average derived from merged sums at the end. Every statistic here
    is decomposable, which is precisely what makes store-the-partials
    pre-aggregation work at 100 TB; the second aggregate's input is
    |days| x |types| rows."""
    e = load_table(spark, sf_dir, "events")
    cents = F.expr(_CENTS)
    daily = e.groupBy(
        F.date_trunc("day", "ts").cast("date").alias("day"), "event_type"
    ).agg(
        F.count(F.lit(1)).alias("cnt"),
        F.sum(cents).alias("sum_cents"),
        F.min(cents).alias("min_cents"),
        F.max(cents).alias("max_cents"),
    )
    return daily.groupBy(
        F.date_trunc("month", "day").alias("month"), "event_type"
    ).agg(
        F.sum("cnt").alias("n_events"),
        F.sum("sum_cents").alias("total_cents"),
        F.min("min_cents").alias("min_cents"),
        F.max("max_cents").alias("max_cents"),
        (F.sum("sum_cents").cast("double") / F.sum("cnt").cast("double")).alias(
            "avg_cents"
        ),
        F.count(F.lit(1)).alias("n_partials_merged"),
    )


@query(
    "q_frequent_trigrams",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type,
             lead(event_type, 1) OVER w AS e2,
             lead(event_type, 2) OVER w AS e3
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id)
    ), tri AS (
      SELECT user_id, event_type AS e1, e2, e3 FROM seq
      WHERE e2 IS NOT NULL AND e3 IS NOT NULL
    )
    SELECT e1, e2, e3,
           CAST(COUNT(*) AS BIGINT) AS support,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
    FROM tri
    GROUP BY e1, e2, e3
    QUALIFY ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, e1, e2, e3) <= 20
    """,
    tags=("insights", "sequence-mining", "events"),
)
def q_frequent_trigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequent behavioral sequences: top-20 event-type trigrams in
    per-user event-time order, with total support and distinct-user
    reach — the sequence-mining primitive behind funnel discovery
    (q_funnel_conversion assumes a funnel; this FINDS candidate
    funnels). Sliding trigrams come from two lead() taps on one
    per-user window — the contiguous-subsequence special case that
    needs no joins (general gapped sequence mining would build on the
    same window + a self-join per extension step).

    Scale: one shuffle for the user window, one hash aggregate whose
    key space is |event_types|^3 (tiny) — the distinct-user count is
    the only expand. Top-20 is TakeOrderedAndProject."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    tri = (
        e.select(
            "user_id",
            F.col("event_type").alias("e1"),
            F.lead("event_type", 1).over(w).alias("e2"),
            F.lead("event_type", 2).over(w).alias("e3"),
        )
        .filter(F.col("e2").isNotNull() & F.col("e3").isNotNull())
    )
    return (
        tri.groupBy("e1", "e2", "e3")
        .agg(
            F.count(F.lit(1)).alias("support"),
            F.countDistinct("user_id").alias("n_users"),
        )
        .orderBy(F.desc("support"), "e1", "e2", "e3")
        .limit(20)
    )


@query(
    "q_position_bias_coec",
    oracle="""
    WITH ranked AS (
      SELECT user_id, event_type,
             CAST(ROW_NUMBER() OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id) AS BIGINT)
               AS pos
      FROM events
    ),
    capped AS MATERIALIZED (
      SELECT user_id, event_type,
             CASE WHEN pos > 10 THEN 10 ELSE pos END AS pos
      FROM ranked
    ),
    prior AS MATERIALIZED (
      SELECT pos, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
                  AS BIGINT) AS clicks,
             CAST((1000000 * SUM(CASE WHEN event_type = 'click'
                                      THEN 1 ELSE 0 END))
                  // COUNT(*) AS BIGINT) AS ctr_ppm
      FROM capped GROUP BY pos
    ),
    per_user AS (
      SELECT c.user_id,
             CAST(SUM(CASE WHEN c.event_type = 'click' THEN 1 ELSE 0 END)
                  AS BIGINT) AS clicks,
             CAST(SUM(p.ctr_ppm) AS BIGINT) AS expected_micro
      FROM capped c JOIN prior p ON p.pos = c.pos
      GROUP BY c.user_id
    )
    SELECT user_id, clicks, expected_micro,
           CAST((1000000 * clicks * 1000000) // NULLIF(expected_micro, 0)
                AS BIGINT) AS coec_ppm
    FROM per_user
    """,
    tags=("insights", "position-bias", "coec", "evaluation"),
)
def q_position_bias_coec(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Clicks-over-expected-clicks (COEC) per user — the position-
    bias-corrected engagement metric: each impression's expected
    clicks is the POSITION prior (global CTR at that within-session
    rank, capped at 10), and a user's COEC is actual clicks over the
    sum of priors, so users who click from deep positions score above
    1. The prior is truncating ppm per position; expectations
    accumulate those exact integers, and COEC is one cross-multiplied
    division — fully hashable, no floats.

    Scale: one user_id window pass ranks impressions; the prior is a
    10-row broadcast; the per-user reduction reuses the same user_id
    key."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    capped = e.select(
        "user_id",
        "event_type",
        F.least(F.row_number().over(w).cast("long"), F.lit(10)).alias(
            "pos"
        ),
    )
    prior = capped.groupBy("pos").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(
            F.when(F.col("event_type") == "click", 1).otherwise(0)
        ).alias("clicks_at"),
        F.expr(
            "CAST((1000000 * SUM(CASE WHEN event_type = 'click'"
            " THEN 1 ELSE 0 END)) div COUNT(*) AS BIGINT)"
        ).alias("ctr_ppm"),
    )
    per_user = (
        capped.join(F.broadcast(prior.select("pos", "ctr_ppm")), "pos")
        .groupBy("user_id")
        .agg(
            F.sum(
                F.when(F.col("event_type") == "click", 1).otherwise(0)
            ).alias("clicks"),
            F.sum("ctr_ppm").alias("expected_micro"),
        )
    )
    return per_user.select(
        "user_id",
        "clicks",
        "expected_micro",
        F.expr(
            "CAST((1000000 * clicks * 1000000)"
            " div NULLIF(expected_micro, 0) AS BIGINT)"
        ).alias("coec_ppm"),
    )


@query(
    "q_heavy_hitter_drift",
    oracle="""
    WITH weekly AS (
      SELECT date_diff('day', DATE '1970-01-05', CAST(ts AS DATE)) // 7
               AS wk,
             user_id, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM events GROUP BY wk, user_id
    ),
    ranked AS (
      SELECT wk, user_id,
             ROW_NUMBER() OVER (PARTITION BY wk
                                ORDER BY cnt DESC, user_id ASC) AS rk
      FROM weekly
    ),
    tops AS (SELECT wk, user_id FROM ranked WHERE rk <= 10),
    sizes AS (
      SELECT wk, CAST(COUNT(*) AS BIGINT) AS k FROM tops GROUP BY wk
    ),
    retained AS (
      SELECT b.wk, CAST(COUNT(*) AS BIGINT) AS r
      FROM tops a JOIN tops b
        ON b.user_id = a.user_id AND b.wk = a.wk + 1
      GROUP BY b.wk
    )
    SELECT c2.wk AS week_key, c2.k AS topk_size,
           CAST(COALESCE(r.r, 0) AS BIGINT) AS retained,
           CAST((1000000 * (c2.k - COALESCE(r.r, 0))) // c2.k AS BIGINT)
             AS drift_ppm
    FROM sizes c2
    JOIN sizes c1 ON c1.wk = c2.wk - 1
    LEFT JOIN retained r ON r.wk = c2.wk
    """,
    tags=("insights", "heavy-hitters", "drift", "monitoring"),
)
def q_heavy_hitter_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Week-over-week churn of the top-10 heaviest event users — the
    drift monitor that tells an abuse/caching/skew-mitigation system
    whether its hot-key set is stable (salt the same keys again) or
    rotating (re-derive the salt list every window). Top sets use
    ROW_NUMBER with a total tie-break (count desc, user asc) so
    membership is exact; drift is the exact ppm of the current top
    set not present in the previous week's.

    Scale: one (week, user) aggregate with map-side partials, a
    per-week top-k window (parallel across weeks), then joins on sets
    of at most 10 rows per week. The expensive thing — scanning
    events — happens once; everything downstream is O(weeks)."""
    e = load_table(spark, sf_dir, "events")
    weekly = (
        e.select(
            F.expr(
                "datediff(CAST(ts AS DATE), DATE '1970-01-05') div 7"
            ).alias("wk"),
            "user_id",
        )
        .groupBy("wk", "user_id")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    ranked = weekly.withColumn(
        "rk",
        F.row_number().over(
            Window.partitionBy("wk").orderBy(
                F.col("cnt").desc(), F.col("user_id").asc()
            )
        ),
    )
    tops = ranked.filter(F.col("rk") <= 10).select("wk", "user_id")
    sizes = tops.groupBy("wk").agg(F.count(F.lit(1)).alias("k"))
    retained = (
        tops.alias("a")
        .join(
            tops.alias("b"),
            (F.col("b.user_id") == F.col("a.user_id"))
            & (F.col("b.wk") == F.col("a.wk") + 1),
        )
        .groupBy(F.col("b.wk").alias("wk"))
        .agg(F.count(F.lit(1)).alias("r"))
    )
    c2 = sizes.alias("c2")
    c1 = sizes.alias("c1").select(F.col("wk").alias("pwk"))
    return (
        c2.join(c1, F.col("pwk") == F.col("wk") - 1)
        .join(retained.alias("r"), "wk", "left")
        .select(
            F.col("wk").alias("week_key"),
            F.col("k").alias("topk_size"),
            F.expr("CAST(COALESCE(r, 0) AS BIGINT)").alias("retained"),
            F.expr(
                "CAST((1000000 * (k - COALESCE(r, 0))) div k AS BIGINT)"
            ).alias("drift_ppm"),
        )
    )


@query(
    "q_bot_score",
    oracle="""
    WITH per_min AS (
      SELECT user_id, date_trunc('minute', ts) AS mn,
             CAST(COUNT(*) AS BIGINT) AS cnt
      FROM events GROUP BY user_id, mn
    ),
    burst AS (
      SELECT user_id, CAST(MAX(cnt) AS BIGINT) AS burst_max
      FROM per_min GROUP BY user_id
    ),
    base AS (
      SELECT user_id,
             CAST(COUNT(*) AS BIGINT) AS n_events,
             CAST((epoch_us(MAX(ts)) - epoch_us(MIN(ts))) // 1000000
                  AS BIGINT) AS span_s,
             CAST(COUNT(*) FILTER (WHERE event_type = 'error') AS BIGINT)
               AS n_errors
      FROM events GROUP BY user_id
    ),
    scored AS (
      SELECT b.user_id, b.n_events, u.burst_max,
             CAST((1000 * b.n_events) // (b.span_s + 1) AS BIGINT)
               AS rate_milli,
             CAST((1000000 * b.n_errors) // b.n_events AS BIGINT)
               AS error_ppm
      FROM base b JOIN burst u ON u.user_id = b.user_id
    )
    SELECT user_id, n_events, burst_max, rate_milli, error_ppm,
           CAST((CASE WHEN burst_max >= 4 THEN 1 ELSE 0 END)
              + (CASE WHEN rate_milli >= 2 THEN 1 ELSE 0 END)
              + (CASE WHEN error_ppm >= 300000 THEN 1 ELSE 0 END)
              AS BIGINT) AS bot_score
    FROM scored
    """,
    tags=("insights", "bot-detection", "abuse", "quality"),
)
def q_bot_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rule-based bot scoring per user — the abuse-filter front door
    of a training-data pipeline (bot traffic poisons engagement
    signals and bot-generated text poisons corpora): burstiness (max
    events in any calendar minute), sustained rate (events per
    second in milli units over the user's active span, +1 guarding
    the single-event span), and error affinity (ppm of events that
    are errors). Three integer rule flags sum to bot_score 0-3;
    every component is an exact integer so the score is
    hash-stable, auditable, and thresholds are visible in the plan.

    Scale: two hash aggregates keyed on user_id (the per-minute
    burst pre-agg collapses map-side) and one user_id equi-join —
    one shuffle key end to end, no windows over raw events."""
    e = load_table(spark, sf_dir, "events")
    per_min = e.groupBy(
        "user_id", F.date_trunc("minute", F.col("ts")).alias("mn")
    ).agg(F.count(F.lit(1)).alias("cnt"))
    burst = per_min.groupBy("user_id").agg(
        F.max("cnt").alias("burst_max")
    )
    base = e.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.expr(
            "CAST((unix_micros(MAX(ts)) - unix_micros(MIN(ts)))"
            " div 1000000 AS BIGINT)"
        ).alias("span_s"),
        F.sum(
            F.expr("CASE WHEN event_type = 'error' THEN 1 ELSE 0 END")
        ).alias("n_errors"),
    )
    scored = base.join(burst, "user_id").select(
        "user_id",
        "n_events",
        "burst_max",
        F.expr(
            "CAST((1000 * n_events) div (span_s + 1) AS BIGINT)"
        ).alias("rate_milli"),
        F.expr(
            "CAST((1000000 * n_errors) div n_events AS BIGINT)"
        ).alias("error_ppm"),
    )
    return scored.select(
        "user_id",
        "n_events",
        "burst_max",
        "rate_milli",
        "error_ppm",
        F.expr(
            "CAST((CASE WHEN burst_max >= 4 THEN 1 ELSE 0 END)"
            " + (CASE WHEN rate_milli >= 2 THEN 1 ELSE 0 END)"
            " + (CASE WHEN error_ppm >= 300000 THEN 1 ELSE 0 END)"
            " AS BIGINT)"
        ).alias("bot_score"),
    )


@query(
    "q_simpson_check",
    oracle="""
    WITH pop AS (
      SELECT c.c_nationkey AS stratum,
             CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                  THEN 1 ELSE 0 END AS t,
             CASE WHEN o.o_totalprice > 150000 THEN 1 ELSE 0 END AS y
      FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
    ),
    per AS (
      SELECT stratum,
             CAST(SUM(t) AS BIGINT) AS n_t,
             CAST(SUM(1 - t) AS BIGINT) AS n_c,
             CAST(SUM(t * y) AS BIGINT) AS y_t,
             CAST(SUM((1 - t) * y) AS BIGINT) AS y_c
      FROM pop GROUP BY stratum
    ),
    diffs AS (
      SELECT stratum,
             CAST((1000000 * y_t) // n_t AS BIGINT)
               - CAST((1000000 * y_c) // n_c AS BIGINT) AS diff_ppm
      FROM per WHERE n_t > 0 AND n_c > 0
    ),
    total AS (
      SELECT CAST((1000000 * SUM(y_t)) // SUM(n_t) AS BIGINT)
             - CAST((1000000 * SUM(y_c)) // SUM(n_c) AS BIGINT)
               AS overall_diff_ppm,
             CAST((SELECT COUNT(*) FROM diffs) AS BIGINT) AS n_strata,
             CAST((SELECT COUNT(*) FROM diffs WHERE diff_ppm > 0)
                  AS BIGINT) AS n_positive,
             CAST((SELECT COUNT(*) FROM diffs WHERE diff_ppm < 0)
                  AS BIGINT) AS n_negative
      FROM per
    )
    SELECT overall_diff_ppm, n_strata, n_positive, n_negative,
           (overall_diff_ppm > 0 AND 2 * n_negative > n_strata)
           OR (overall_diff_ppm < 0 AND 2 * n_positive > n_strata)
             AS simpson_flag
    FROM total
    """,
    tags=("insights", "simpson", "confounding", "analytics-qa"),
)
def q_simpson_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Simpson's-paradox screen: the association between urgent order
    priority and high order value, measured overall AND within every
    nation stratum. Reports the pooled rate difference (exact signed
    ppm — each rate is one floor division of non-negative integers,
    the difference a plain subtraction), the per-stratum sign census,
    and a flag that fires when the pooled sign contradicts the
    majority of strata — the aggregation-reversal that means a
    confounder (here: nation mix) is driving the headline number and
    any dashboard reading the pooled rate is lying. This is the
    automated QA check an analytics layer runs before publishing a
    segment comparison; q_diff_in_diff and q_ipw_ate are the repair
    tools once it fires.

    Scale: one fact-dimension equi-join, one hash aggregate to ~25
    stratum rows, scalar census over those rows."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    pop = o.join(c, o.o_custkey == c.c_custkey).select(
        F.col("c_nationkey").alias("stratum"),
        F.expr(
            "CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')"
            " THEN 1 ELSE 0 END"
        ).alias("t"),
        F.expr("CASE WHEN o_totalprice > 150000 THEN 1 ELSE 0 END").alias(
            "y"
        ),
    )
    per = pop.groupBy("stratum").agg(
        F.sum("t").alias("n_t"),
        F.sum(1 - F.col("t")).alias("n_c"),
        F.sum(F.col("t") * F.col("y")).alias("y_t"),
        F.sum((1 - F.col("t")) * F.col("y")).alias("y_c"),
    ).localCheckpoint(eager=True)  # ~25 rows feed both branches
    diffs = per.filter("n_t > 0 AND n_c > 0").select(
        F.expr(
            "CAST((1000000 * y_t) div n_t AS BIGINT)"
            " - CAST((1000000 * y_c) div n_c AS BIGINT)"
        ).alias("diff_ppm")
    )
    census = diffs.agg(
        F.count(F.lit(1)).alias("n_strata"),
        F.sum(F.expr("CASE WHEN diff_ppm > 0 THEN 1 ELSE 0 END")).alias(
            "n_positive"
        ),
        F.sum(F.expr("CASE WHEN diff_ppm < 0 THEN 1 ELSE 0 END")).alias(
            "n_negative"
        ),
    )
    total = per.agg(
        F.expr(
            "CAST((1000000 * SUM(y_t)) div SUM(n_t) AS BIGINT)"
            " - CAST((1000000 * SUM(y_c)) div SUM(n_c) AS BIGINT)"
        ).alias("overall_diff_ppm")
    )
    return total.crossJoin(F.broadcast(census)).select(
        "overall_diff_ppm",
        "n_strata",
        "n_positive",
        "n_negative",
        F.expr(
            "(overall_diff_ppm > 0 AND 2 * n_negative > n_strata)"
            " OR (overall_diff_ppm < 0 AND 2 * n_positive > n_strata)"
        ).alias("simpson_flag"),
    )
