"""Behavioral analytics over the event stream, plus a privacy audit:
ordered funnel conversion, retention cohorts, and k-anonymity — the
three product-analytics queries every events warehouse serves daily,
expressed with the single-exchange window discipline the rest of the
events family uses (operators/events.py, operators/insights.py).

Scale notes (100 TB of events):
- Funnel: all three step resolutions are windows over the SAME
  partitionBy(user_id) — one exchange total; Spark chains the Window
  operators on one sort. The final step->count rollup is a 3-row
  stack aggregate.
- Cohorts: one user window (first-seen), then a (cohort, offset)
  hash aggregate; shuffle bounded by |users| + |cohort cells| after
  map-side combine.
- k-anonymity: a plain QI-tuple hash aggregate — group sizes ARE the
  audit; no row-level reshuffle.
Conversion ratios are truncating integer-ppm divisions of exact
counts (bit-identical across engines).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import query
from ..sources.loader import load_table

_FUNNEL_STEPS = ("view", "click", "purchase")


@query(
    "q_event_funnel",
    oracle="""
    WITH fv AS (
      SELECT user_id, MIN(CASE WHEN event_type = 'view' THEN ts END) AS fv
      FROM events GROUP BY user_id
    ),
    fc AS (
      SELECT e.user_id, MIN(e.ts) AS fc
      FROM events e JOIN fv ON fv.user_id = e.user_id
      WHERE e.event_type = 'click' AND e.ts > fv.fv
      GROUP BY e.user_id
    ),
    fp AS (
      SELECT e.user_id, MIN(e.ts) AS fp
      FROM events e JOIN fc ON fc.user_id = e.user_id
      WHERE e.event_type = 'purchase' AND e.ts > fc.fc
      GROUP BY e.user_id
    ),
    counts AS (
      SELECT CAST((SELECT COUNT(*) FROM fv WHERE fv IS NOT NULL) AS BIGINT) AS n_view,
             CAST((SELECT COUNT(*) FROM fc) AS BIGINT) AS n_click,
             CAST((SELECT COUNT(*) FROM fp) AS BIGINT) AS n_purchase
    )
    SELECT '1_view' AS step, n_view AS n_users,
           CAST(1000000 AS BIGINT) AS conv_from_prev_ppm FROM counts
    UNION ALL
    SELECT '2_click', n_click,
           CAST(CASE WHEN n_view = 0 THEN 0
                     ELSE 1000000 * n_click // n_view END AS BIGINT) FROM counts
    UNION ALL
    SELECT '3_purchase', n_purchase,
           CAST(CASE WHEN n_click = 0 THEN 0
                     ELSE 1000000 * n_purchase // n_click END AS BIGINT) FROM counts
    """,
    tags=("events", "funnel", "analytics"),
)
def q_event_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel conversion view -> click -> purchase: a user
    reaches a step only with an event of that type STRICTLY AFTER
    their first event of the previous step (the classic "did the
    click follow the view" ordering constraint, not mere presence).

    Single-exchange plan: the three first-reach timestamps are
    windows over one partitionBy(user_id) — the second window's
    predicate consumes the first's output column, so Spark chains all
    three Window operators on a single sort after one exchange. The
    per-user frame then collapses to three (step, n_users,
    conversion-ppm) rows; conversions are truncating integer
    divisions of exact user counts."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id")
    step = F.col("event_type")
    with_fv = e.withColumn(
        "fv", F.min(F.when(step == "view", F.col("ts"))).over(w)
    )
    with_fc = with_fv.withColumn(
        "fc",
        F.min(
            F.when((step == "click") & (F.col("ts") > F.col("fv")), F.col("ts"))
        ).over(w),
    )
    with_fp = with_fc.withColumn(
        "fp",
        F.min(
            F.when(
                (step == "purchase") & (F.col("ts") > F.col("fc")), F.col("ts")
            )
        ).over(w),
    )
    per_user = with_fp.groupBy("user_id").agg(
        F.max("fv").alias("fv"), F.max("fc").alias("fc"), F.max("fp").alias("fp")
    )
    counts = per_user.agg(
        F.count("fv").alias("n_view"),
        F.count("fc").alias("n_click"),
        F.count("fp").alias("n_purchase"),
    )
    return counts.select(
        F.expr(
            """stack(3,
                 '1_view', n_view, CAST(1000000 AS BIGINT),
                 '2_click', n_click,
                 CAST(CASE WHEN n_view = 0 THEN 0
                           ELSE 1000000 * n_click div n_view END AS BIGINT),
                 '3_purchase', n_purchase,
                 CAST(CASE WHEN n_click = 0 THEN 0
                           ELSE 1000000 * n_purchase div n_click END AS BIGINT)
               ) AS (step, n_users, conv_from_prev_ppm)"""
        )
    )


@query(
    "q_retention_cohorts",
    oracle="""
    WITH first_seen AS (
      SELECT user_id, date_trunc('week', MIN(ts)) AS cohort_week
      FROM events GROUP BY user_id
    ),
    activity AS (
      SELECT DISTINCT e.user_id, f.cohort_week,
             date_trunc('week', e.ts) AS act_week
      FROM events e JOIN first_seen f ON f.user_id = e.user_id
    )
    SELECT cohort_week,
           CAST(datediff('day', cohort_week, act_week) // 7 AS BIGINT)
             AS week_offset,
           CAST(COUNT(*) AS BIGINT) AS n_users
    FROM activity
    GROUP BY cohort_week, week_offset
    """,
    tags=("events", "retention", "cohort", "analytics"),
)
def q_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retention cohort matrix: users grouped by first-seen ISO week,
    counted in each subsequent week they were active — the
    triangle-shaped table behind every retention curve.

    week_offset is an exact integer: date_trunc('week') aligns both
    timestamps to Mondays, so the day difference is divisible by 7 in
    both engines. Plan: one user window for the cohort week (single
    exchange), a distinct over (user, cohort, week) — same user_id
    key, AQE-coalesced — then the tiny (cohort x offset) aggregate."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id")
    act = (
        e.withColumn("cohort_week", F.date_trunc("week", F.min("ts").over(w)))
        .select(
            "user_id",
            "cohort_week",
            F.date_trunc("week", F.col("ts")).alias("act_week"),
        )
        .distinct()
    )
    return act.groupBy(
        "cohort_week",
        F.expr("CAST(datediff(act_week, cohort_week) div 7 AS BIGINT)").alias(
            "week_offset"
        ),
    ).agg(F.count(F.lit(1)).alias("n_users"))


_K_ANON = 5
_QI_BUCKET = 100  # n_chars bucket width for the quasi-identifier


@query(
    "q_k_anonymity",
    oracle=f"""
    SELECT lang, source,
           CAST(n_chars // {_QI_BUCKET} AS BIGINT) AS size_bucket,
           CAST(COUNT(*) AS BIGINT) AS group_n,
           (COUNT(*) < {_K_ANON}) AS violates_k
    FROM documents
    GROUP BY lang, source, size_bucket
    """,
    tags=("privacy", "k-anonymity", "quality", "llm-pipeline"),
)
def q_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit over the quasi-identifier tuple (lang,
    source, bucketed length): any combination shared by fewer than
    k=5 documents re-identifies — those groups are the ones a
    release would have to suppress or generalize. Complements the
    row-level PII redaction pass (operators/llm_pipeline.py): that
    removes direct identifiers, this measures the indirect ones.

    Plan: one hash aggregate on the QI tuple (map-side combine);
    group sizes ARE the audit — no row-level data leaves the
    executors."""
    d = load_table(spark, sf_dir, "documents")
    return d.groupBy(
        "lang",
        "source",
        F.expr(f"CAST(n_chars div {_QI_BUCKET} AS BIGINT)").alias("size_bucket"),
    ).agg(
        F.count(F.lit(1)).alias("group_n"),
        (F.count(F.lit(1)) < _K_ANON).alias("violates_k"),
    )


@query(
    "q_l_diversity",
    oracle=f"""
    SELECT lang,
           CAST(n_chars // {_QI_BUCKET} AS BIGINT) AS size_bucket,
           CAST(COUNT(*) AS BIGINT) AS group_n,
           CAST(COUNT(DISTINCT source) AS BIGINT) AS l_distinct,
           (COUNT(DISTINCT source) < 3) AS violates_l3
    FROM documents
    GROUP BY lang, size_bucket
    """,
    tags=("privacy", "l-diversity", "quality", "llm-pipeline"),
)
def q_l_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """l-diversity audit — k-anonymity's necessary complement: a QI
    group can be large (k-safe) yet still leak if everyone in it
    shares the same SENSITIVE value. Here the sensitive attribute is
    `source`; a (lang, size-bucket) group with fewer than l=3
    distinct sources lets an attacker who can place a document in the
    group infer its provenance. One hash aggregate; the distinct
    count is the audit."""
    d = load_table(spark, sf_dir, "documents")
    return d.groupBy(
        "lang",
        F.expr(f"CAST(n_chars div {_QI_BUCKET} AS BIGINT)").alias("size_bucket"),
    ).agg(
        F.count(F.lit(1)).alias("group_n"),
        F.countDistinct("source").alias("l_distinct"),
        (F.countDistinct("source") < 3).alias("violates_l3"),
    )


# Seeded Laplace mechanism: u from a 16-bit md5 window; |u - 0.5|
# maps to an ODD numerator over 2^16, so ln(1 - 2|u-0.5|) =
# ln(odd) - ln(65536) — both logs over exact integers, micro-nat
# quantized (the q_entropy_profile treatment). Scale b = 1/eps.
_DP_EPS_INV = 1  # b = 1/eps = 1 (eps = 1)


@query(
    "q_dp_noisy_counts",
    oracle="""
    WITH counts AS (
      SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_true
      FROM events GROUP BY event_type
    ),
    u AS (
      SELECT event_type, n_true,
             (((CAST(0 AS BIGINT) * 16
                + instr('0123456789abcdef', substr(md5(event_type || '#dp'), 1, 1)) - 1) * 16
                + instr('0123456789abcdef', substr(md5(event_type || '#dp'), 2, 1)) - 1) * 16
                + instr('0123456789abcdef', substr(md5(event_type || '#dp'), 3, 1)) - 1) * 16
                + instr('0123456789abcdef', substr(md5(event_type || '#dp'), 4, 1)) - 1
               AS u16
      FROM counts
    ),
    lap AS (
      SELECT event_type, n_true, u16,
             CASE WHEN u16 >= 32768 THEN 1 ELSE -1 END AS sgn,
             CASE WHEN u16 >= 32768 THEN 2 * u16 - 65535
                  ELSE 65535 - 2 * u16 END AS odd_num
      FROM u
    )
    SELECT event_type, n_true,
           CAST(sgn * (CAST(ROUND(1000000 * LN(65536)) AS BIGINT)
                       - CAST(ROUND(1000000 * LN(odd_num)) AS BIGINT))
                AS BIGINT) AS noise_micro,
           CAST(n_true + sgn * (CAST(ROUND(1000000 * LN(65536)) AS BIGINT)
                       - CAST(ROUND(1000000 * LN(odd_num)) AS BIGINT)) / 1000000
                AS DOUBLE) AS noisy_count
    FROM lap
    """,
    tags=("privacy", "differential-privacy", "laplace"),
)
def q_dp_noisy_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Laplace-mechanism demo (eps = 1): per-event-type counts plus
    inverse-CDF Laplace noise — noise = -b * sign(u - 1/2) *
    ln(1 - 2|u - 1/2|) — with the uniform drawn from an md5 window so
    the whole mechanism is deterministic and engine-portable. The
    |u - 1/2| arm is arranged as an ODD integer over 2^16, so both
    logs take exact-integer arguments and quantize to micro-nats the
    same way in both engines (q_entropy_profile treatment).

    Honesty note: a SEEDED mechanism is a demonstration of the
    arithmetic and the plan shape, not a privacy guarantee — real DP
    needs fresh randomness per release (swap the md5 uniform for an
    RNG and drop n_true from the output). The exercise here is that
    the noise pipeline itself distributes: one tiny aggregate, noise
    applied map-side to the aggregate rows.

    Plan: one hash aggregate to |event_type| rows; the noise math is
    per-row expression work on that tiny table."""
    from .llm_pipeline import _hex_val_sql

    e = load_table(spark, sf_dir, "events")
    counts = e.groupBy("event_type").agg(F.count(F.lit(1)).alias("n_true"))
    u16 = _hex_val_sql("md5(event_type || '#dp')", 4)
    sgn = f"(CASE WHEN ({u16}) >= 32768 THEN 1 ELSE -1 END)"
    odd = (
        f"(CASE WHEN ({u16}) >= 32768 THEN 2 * ({u16}) - 65535 "
        f"ELSE 65535 - 2 * ({u16}) END)"
    )
    noise = (
        f"CAST({sgn} * (CAST(ROUND(1000000 * LN(65536)) AS BIGINT)"
        f" - CAST(ROUND(1000000 * LN({odd})) AS BIGINT)) AS BIGINT)"
    )
    return counts.select(
        "event_type",
        "n_true",
        F.expr(noise).alias("noise_micro"),
        F.expr(
            f"CAST(n_true + ({noise}) / 1000000 AS DOUBLE)"
        ).alias("noisy_count"),
    )


@query(
    "q_window_funnel",
    oracle="""
    WITH fv AS (
      SELECT user_id, MIN(ts) AS t1
      FROM events WHERE event_type = 'view' GROUP BY user_id
    ),
    fc AS (
      SELECT e.user_id, MIN(e.ts) AS t2, MIN(fv.t1) AS t1
      FROM events e JOIN fv ON fv.user_id = e.user_id
      WHERE e.event_type = 'click' AND e.ts > fv.t1
        AND e.ts <= fv.t1 + INTERVAL 7 DAY
      GROUP BY e.user_id
    ),
    fp AS (
      SELECT e.user_id, MIN(e.ts) AS t3
      FROM events e JOIN fc ON fc.user_id = e.user_id
      WHERE e.event_type = 'purchase' AND e.ts > fc.t2
        AND e.ts <= fc.t1 + INTERVAL 7 DAY
      GROUP BY e.user_id
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS step1_users,
           CAST(COUNT(fc.t2) AS BIGINT) AS step2_users,
           CAST(COUNT(fp.t3) AS BIGINT) AS step3_users,
           CAST((1000000 * COUNT(fp.t3)) // COUNT(*) AS BIGINT)
             AS conv_ppm
    FROM fv
    LEFT JOIN fc ON fc.user_id = fv.user_id
    LEFT JOIN fp ON fp.user_id = fv.user_id
    """,
    tags=("funnel", "events", "window-funnel", "conversion"),
)
def q_window_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-CONSTRAINED funnel (ClickHouse windowFunnel semantics):
    view -> click -> purchase must all land within 7 days of the
    user's first view, each step strictly after the previous step's
    first qualifying hit. Complements q_event_funnel (unbounded) —
    the bounded window is what real conversion SLAs measure. Step
    resolution is a chain of per-user MIN aggregates with the window
    predicate folded into each step's filter; the result is one row
    of exact step counts and truncating-ppm conversion.

    Scale: every aggregate and join hashes on user_id — one shuffle
    key end to end, AQE coalesces the chain; no windows over raw
    events, no self-join beyond the keyed step probes."""
    e = load_table(spark, sf_dir, "events")
    fv = (
        e.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    fc = (
        e.filter(F.col("event_type") == "click")
        .join(fv, "user_id")
        .filter(
            (F.col("ts") > F.col("t1"))
            & (F.col("ts") <= F.col("t1") + F.expr("INTERVAL 7 DAY"))
        )
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"), F.min("t1").alias("t1"))
    )
    fp = (
        e.filter(F.col("event_type") == "purchase")
        .join(fc, "user_id")
        .filter(
            (F.col("ts") > F.col("t2"))
            & (F.col("ts") <= F.col("t1") + F.expr("INTERVAL 7 DAY"))
        )
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    return (
        fv.join(fc.select("user_id", "t2"), "user_id", "left")
        .join(fp, "user_id", "left")
        .agg(
            F.count(F.lit(1)).alias("step1_users"),
            F.count("t2").alias("step2_users"),
            F.count("t3").alias("step3_users"),
            F.expr(
                "CAST((1000000 * COUNT(t3)) div COUNT(*) AS BIGINT)"
            ).alias("conv_ppm"),
        )
    )


@query(
    "q_growth_accounting",
    oracle="""
    WITH active AS MATERIALIZED (
      SELECT DISTINCT user_id,
             CAST(epoch_us(ts) // 604800000000 AS BIGINT) AS w
      FROM events
    ),
    bounds AS (
      SELECT CAST(MAX(w) AS BIGINT) AS max_w FROM active
    ),
    seq AS MATERIALIZED (
      SELECT user_id, w,
             MIN(w) OVER (PARTITION BY user_id) AS first_w,
             LAG(w) OVER (PARTITION BY user_id ORDER BY w) AS prev_w,
             LEAD(w) OVER (PARTITION BY user_id ORDER BY w) AS next_w
      FROM active
    ),
    states AS (
      SELECT w,
             CAST(SUM(CASE WHEN w = first_w THEN 1 ELSE 0 END) AS BIGINT)
               AS n_new,
             CAST(SUM(CASE WHEN prev_w = w - 1 THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_retained,
             CAST(SUM(CASE WHEN w > first_w AND
                                (prev_w IS NULL OR prev_w < w - 1)
                           THEN 1 ELSE 0 END) AS BIGINT) AS n_resurrected
      FROM seq GROUP BY w
    ),
    churn AS (
      SELECT seq.w + 1 AS w, CAST(COUNT(*) AS BIGINT) AS n_churned
      FROM seq CROSS JOIN bounds
      WHERE (next_w IS NULL AND seq.w < bounds.max_w)
         OR next_w > seq.w + 1
      GROUP BY seq.w + 1
    )
    SELECT states.w, n_new, n_retained, n_resurrected,
           CAST(COALESCE(churn.n_churned, 0) AS BIGINT) AS n_churned
    FROM states LEFT JOIN churn ON churn.w = states.w
    """,
    tags=("funnel", "growth-accounting", "retention", "events"),
)
def q_growth_accounting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly growth accounting — every product-analytics review's
    first table: per week, how many active users are NEW (first-ever
    week), RETAINED (also active the prior week), RESURRECTED (back
    after a gap), and how many CHURNED into this week (active before,
    not now; both gap churns and final drop-offs before the corpus
    edge count). States come from first/lag/lead windows over the
    distinct (user, week) activity table; identities hold by
    construction (new + retained + resurrected = weekly active).

    Scale: one distinct aggregate keyed on user, one user-partitioned
    window pass, two small weekly aggregates; the corpus-edge week is
    a broadcast 1-row stitch."""
    e = load_table(spark, sf_dir, "events")
    active = (
        e.select(
            "user_id",
            F.expr(
                "CAST(unix_micros(ts) div 604800000000 AS BIGINT)"
            ).alias("w"),
        )
        .distinct()
        .localCheckpoint()  # feeds windows + the corpus-edge scalar
    )
    bounds = active.agg(F.max("w").alias("max_w"))
    uw = Window.partitionBy("user_id")
    uwo = uw.orderBy("w")
    seq = active.select(
        "user_id",
        "w",
        F.min("w").over(uw).alias("first_w"),
        F.lag("w").over(uwo).alias("prev_w"),
        F.lead("w").over(uwo).alias("next_w"),
    )
    states = seq.groupBy("w").agg(
        F.sum(F.when(F.col("w") == F.col("first_w"), 1).otherwise(0)).alias(
            "n_new"
        ),
        F.sum(
            F.when(F.col("prev_w") == F.col("w") - 1, 1).otherwise(0)
        ).alias("n_retained"),
        F.sum(
            F.when(
                (F.col("w") > F.col("first_w"))
                & (
                    F.col("prev_w").isNull()
                    | (F.col("prev_w") < F.col("w") - 1)
                ),
                1,
            ).otherwise(0)
        ).alias("n_resurrected"),
    )
    churn = (
        seq.crossJoin(F.broadcast(bounds))
        .filter(
            (F.col("next_w").isNull() & (F.col("w") < F.col("max_w")))
            | (F.col("next_w") > F.col("w") + 1)
        )
        .groupBy((F.col("w") + 1).alias("w"))
        .agg(F.count(F.lit(1)).alias("n_churned"))
    )
    return states.join(churn, "w", "left").select(
        "w",
        "n_new",
        "n_retained",
        "n_resurrected",
        F.coalesce(F.col("n_churned"), F.lit(0)).cast("long").alias(
            "n_churned"
        ),
    )


@query(
    "q_time_to_convert",
    oracle="""
    WITH fv AS (
      SELECT user_id, MIN(ts) AS t1 FROM events
      WHERE event_type = 'view' GROUP BY user_id
    ),
    fp AS (
      SELECT e.user_id, MIN(e.ts) AS t2
      FROM events e JOIN fv ON fv.user_id = e.user_id
      WHERE e.event_type = 'purchase' AND e.ts > fv.t1
      GROUP BY e.user_id
    ),
    lags AS (
      SELECT (epoch_us(fp.t2) - epoch_us(fv.t1)) // 1000000 AS lag_s
      FROM fp JOIN fv ON fv.user_id = fp.user_id
    ),
    h AS (
      SELECT lag_s, CAST(COUNT(*) AS BIGINT) AS cnt FROM lags GROUP BY lag_s
    ),
    cum AS MATERIALIZED (
      SELECT lag_s,
             CAST(SUM(cnt) OVER (ORDER BY lag_s) AS BIGINT) AS cw,
             CAST(SUM(cnt) OVER () AS BIGINT) AS tw
      FROM h
    )
    SELECT pct AS decile,
           MIN(CASE WHEN 10 * cw >= pct * tw THEN lag_s END)
             AS lag_seconds,
           MAX(tw) AS n_converters
    FROM cum
    CROSS JOIN (SELECT CAST(unnest([1,2,3,4,5,6,7,8,9]) AS BIGINT) AS pct)
    GROUP BY pct
    """,
    tags=("funnel", "time-to-convert", "latency-distribution"),
)
def q_time_to_convert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-to-convert distribution: exact deciles of the
    first-view -> first-subsequent-purchase lag in whole seconds —
    the latency complement to q_window_funnel's SLA counts (a funnel
    can convert 40% yet be broken if the median lag tripled). First
    touches resolve as per-user MIN aggregates keyed on user_id; the
    decile read-out is the cent-histogram rank trick on the
    second-quantized lag histogram, so every reported order statistic
    is exact and hash-stable.

    Scale: two user_id-keyed aggregates and one user_id equi-join
    (single shuffle key end to end), then the rank trick on the
    |distinct lag| histogram with a constant 9-row broadcast grid
    (allowlisted)."""
    e = load_table(spark, sf_dir, "events")
    fv = (
        e.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    fp = (
        e.filter(F.col("event_type") == "purchase")
        .join(fv, "user_id")
        .filter(F.col("ts") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"), F.min("t1").alias("t1"))
    )
    lags = fp.select(
        F.expr("(unix_micros(t2) - unix_micros(t1)) div 1000000").alias(
            "lag_s"
        )
    )
    h = lags.groupBy("lag_s").agg(F.count(F.lit(1)).alias("cnt"))
    cum = h.select(
        "lag_s",
        F.expr("CAST(SUM(cnt) OVER (ORDER BY lag_s) AS BIGINT)").alias(
            "cw"
        ),
        F.expr("CAST(SUM(cnt) OVER () AS BIGINT)").alias("tw"),
    )
    grid = spark.createDataFrame([(i,) for i in range(1, 10)], "decile long")
    return (
        cum.crossJoin(F.broadcast(grid))
        .groupBy("decile")
        .agg(
            F.expr(
                "MIN(CASE WHEN 10 * cw >= decile * tw THEN lag_s END)"
            ).alias("lag_seconds"),
            F.max("tw").alias("n_converters"),
        )
    )


@query(
    "q_ltv_cohort",
    oracle="""
    WITH firsts AS (
      SELECT user_id,
             MIN((CAST(ts AS DATE) - DATE '1970-01-01') // 7) AS cohort_m
      FROM events GROUP BY user_id
    ),
    monthly AS (
      SELECT e.user_id, f.cohort_m,
             (CAST(e.ts AS DATE) - DATE '1970-01-01') // 7 - f.cohort_m
               AS age_m,
             CAST(ROUND(e.value * 100) AS BIGINT) AS cents
      FROM events e JOIN firsts f ON f.user_id = e.user_id
      WHERE e.event_type = 'purchase'
    ),
    cohort_sizes AS (
      SELECT cohort_m, CAST(COUNT(*) AS BIGINT) AS n_users
      FROM firsts GROUP BY cohort_m
    ),
    rev AS (
      SELECT cohort_m, age_m, CAST(SUM(cents) AS BIGINT) AS rev_cents
      FROM monthly GROUP BY cohort_m, age_m
    )
    SELECT r.cohort_m, CAST(r.age_m AS BIGINT) AS age_m, s.n_users,
           r.rev_cents,
           CAST(SUM(r.rev_cents) OVER (PARTITION BY r.cohort_m
                                       ORDER BY r.age_m) AS BIGINT)
             AS cum_rev_cents,
           CAST(SUM(r.rev_cents) OVER (PARTITION BY r.cohort_m
                                       ORDER BY r.age_m)
                // s.n_users AS BIGINT) AS ltv_cents_per_user
    FROM rev r JOIN cohort_sizes s ON s.cohort_m = r.cohort_m
    """,
    tags=("funnels", "cohorts", "ltv", "revenue"),
)
def q_ltv_cohort(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort LTV curves: users are cohorted by first-activity WEEK
    (epoch-day div 7 — engine-portable and grain-appropriate for the
    fixture's one-month span; ANY event type is the signup proxy),
    purchase revenue is bucketed by cohort age in weeks, and the running cumulative revenue per
    cohort divided by cohort size gives the LTV-per-user curve — the
    table under every "payback period" chart, and the growth-model
    input that decides acquisition spend. Cents exact; one floor
    division per output row. Complements q_retention_cohorts (user
    counts) with the revenue dimension.

    Scale: first-activity is one user-keyed aggregate; the cohort tag
    rejoins on the same user key (co-partitioned); revenue rolls up
    to |cohorts| x |ages| rows before the cumulative window runs on
    that metadata-sized grid."""
    ev = load_table(spark, sf_dir, "events")
    mexpr = "(datediff(CAST(ts AS DATE), DATE'1970-01-01') div 7)"
    firsts = ev.groupBy("user_id").agg(
        F.expr(f"MIN({mexpr})").alias("cohort_m")
    )
    monthly = (
        ev.filter(F.col("event_type") == "purchase")
        .join(firsts, "user_id")
        .select(
            "cohort_m",
            F.expr(f"{mexpr} - cohort_m").alias("age_m"),
            F.expr("CAST(ROUND(value * 100) AS BIGINT)").alias("cents"),
        )
    )
    sizes = firsts.groupBy("cohort_m").agg(F.count(F.lit(1)).alias("n_users"))
    rev = monthly.groupBy("cohort_m", "age_m").agg(
        F.sum("cents").alias("rev_cents")
    )
    w = Window.partitionBy("cohort_m").orderBy("age_m")
    return (
        rev.join(F.broadcast(sizes), "cohort_m")
        .select(
            "cohort_m",
            F.col("age_m").cast("long").alias("age_m"),
            "n_users",
            "rev_cents",
            F.sum("rev_cents").over(w).alias("cum_rev_cents"),
        )
        .withColumn(
            "ltv_cents_per_user",
            F.expr("CAST(cum_rev_cents div n_users AS BIGINT)"),
        )
    )


@query(
    "q_stickiness_dau_wau",
    oracle="""
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS d,
             CAST(COUNT(DISTINCT user_id) AS BIGINT) AS dau
      FROM events GROUP BY CAST(ts AS DATE)
    ),
    weekly AS (
      SELECT (CAST(ts AS DATE) - DATE '1970-01-01') // 7 AS wk,
             CAST(COUNT(DISTINCT user_id) AS BIGINT) AS wau
      FROM events GROUP BY 1
    )
    SELECT CAST(d.d AS TIMESTAMP) AS day,
           ((d.d - DATE '1970-01-01') // 7) AS wk,
           d.dau, w.wau,
           CAST((1000000 * d.dau) // w.wau AS BIGINT) AS stickiness_ppm
    FROM daily d
    JOIN weekly w ON w.wk = (d.d - DATE '1970-01-01') // 7
    """,
    tags=("funnels", "engagement", "stickiness", "product-analytics"),
)
def q_stickiness_dau_wau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAU/WAU stickiness: distinct daily actives over distinct
    weekly actives for the containing epoch week, in exact ppm — the
    standard engagement-frequency metric (60%+ means most weekly
    users show up most days). Two distinct-count aggregates on
    different grains of one scan, joined on the week key; the ratio
    is one floor division of exact counts.

    Scale: both aggregates are map-side-combinable distinct counts
    keyed by (day|week); the join is |days| x 1 per week —
    metadata-sized. At 100 TB pre-aggregate (day, user) once and
    derive both grains from it to scan the raw events a single time."""
    ev = load_table(spark, sf_dir, "events")
    wk = "(datediff(CAST(ts AS DATE), DATE'1970-01-01') div 7)"
    daily = ev.groupBy(F.col("ts").cast("date").alias("day")).agg(
        F.countDistinct("user_id").alias("dau")
    )
    weekly = ev.groupBy(F.expr(wk).alias("wk")).agg(
        F.countDistinct("user_id").alias("wau")
    )
    return (
        daily.withColumn(
            "wk", F.expr("datediff(day, DATE'1970-01-01') div 7")
        )
        .join(F.broadcast(weekly), "wk")
        .select(
            F.col("day").cast("timestamp").alias("day"),
            F.col("wk").cast("long").alias("wk"),
            "dau",
            "wau",
            F.expr("CAST((1000000 * dau) div wau AS BIGINT)").alias(
                "stickiness_ppm"
            ),
        )
    )


@query(
    "q_bounce_rate",
    oracle="""
    WITH ordered AS (
      SELECT user_id, ts,
             CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts)
                       > INTERVAL 30 MINUTE
                  OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM events
    ),
    sess AS (
      SELECT user_id,
             SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                    ROWS UNBOUNDED PRECEDING) AS sid
      FROM ordered
    ),
    per_session AS (
      SELECT user_id, sid, CAST(COUNT(*) AS BIGINT) AS n_events
      FROM sess GROUP BY user_id, sid
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_sessions,
           CAST(SUM(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_bounces,
           CAST((1000000 * SUM(CASE WHEN n_events = 1 THEN 1 ELSE 0 END))
                // COUNT(*) AS BIGINT) AS bounce_ppm,
           CAST(SUM(n_events) AS BIGINT) AS n_events_total
    FROM per_session
    """,
    tags=("funnels", "sessions", "bounce-rate", "engagement"),
)
def q_bounce_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session bounce rate with 30-minute inactivity sessionization
    (the q_sessionize_gaps boundary rule): the share of sessions that
    contain exactly ONE event — the metric that distinguishes traffic
    from engagement. One user-keyed window pass derives session ids
    (gaps-and-islands), one aggregate sizes sessions, one reduction
    emits the exact ppm.

    Scale: a single user_id exchange feeds both the lag window and
    the running session-id sum; session sizing is map-side-combinable
    on (user, sid)."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts")
    ordered = ev.select(
        "user_id",
        "ts",
        F.expr(
            "CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts)"
            " > INTERVAL 30 MINUTE"
            " OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL"
            " THEN 1 ELSE 0 END"
        ).alias("new_session"),
    )
    sess = ordered.select(
        "user_id",
        F.sum("new_session")
        .over(w.rowsBetween(Window.unboundedPreceding, 0))
        .alias("sid"),
    )
    per_session = sess.groupBy("user_id", "sid").agg(
        F.count(F.lit(1)).alias("n_events")
    )
    return per_session.agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.sum(F.expr("CASE WHEN n_events = 1 THEN 1 ELSE 0 END")).alias(
            "n_bounces"
        ),
        F.expr(
            "CAST((1000000 * SUM(CASE WHEN n_events = 1 THEN 1 ELSE 0 END))"
            " div COUNT(*) AS BIGINT)"
        ).alias("bounce_ppm"),
        F.sum("n_events").alias("n_events_total"),
    )


@query(
    "q_shapley_attribution",
    oracle="""
    WITH pu AS (
      SELECT user_id,
             MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS pts
      FROM events GROUP BY user_id
    ),
    mk AS (
      SELECT pu.user_id,
             COALESCE(BIT_OR(CASE e.event_type
                             WHEN 'click' THEN 1 WHEN 'error' THEN 2
                             WHEN 'signup' THEN 4 WHEN 'view' THEN 8
                             END), 0) AS mask
      FROM pu LEFT JOIN events e
        ON e.user_id = pu.user_id AND e.ts < pu.pts
           AND e.event_type <> 'purchase'
      WHERE pu.pts IS NOT NULL
      GROUP BY pu.user_id
    ),
    mc AS (
      SELECT mask, CAST(COUNT(*) AS BIGINT) AS c FROM mk GROUP BY mask
    ),
    subsets AS (
      SELECT CAST(range AS INTEGER) AS s,
             CAST((range // 1) % 2 + (range // 2) % 2
                  + (range // 4) % 2 + (range // 8) % 2 AS INTEGER) AS pc
      FROM range(0, 16)
    ),
    v AS (
      SELECT sub.s, sub.pc, COALESCE(SUM(mc.c), 0) AS v
      FROM subsets sub LEFT JOIN mc ON (mc.mask & sub.s) = mc.mask
      GROUP BY sub.s, sub.pc
    ),
    ch AS (
      SELECT * FROM (VALUES ('click', 1), ('error', 2),
                            ('signup', 4), ('view', 8)) t(channel, bit)
    )
    SELECT ch.channel,
           CAST(SUM(CASE vo.pc WHEN 0 THEN 6 WHEN 1 THEN 2
                               WHEN 2 THEN 2 WHEN 3 THEN 6 END
                    * (vw.v - vo.v)) AS BIGINT) AS phi_x24
    FROM ch
    JOIN v vo ON (vo.s & ch.bit) = 0
    JOIN v vw ON vw.s = (vo.s | ch.bit)
    GROUP BY ch.channel
    """,
    tags=("attribution", "shapley", "funnel", "game-theory"),
)
def q_shapley_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact Shapley-value channel attribution over the presence game:
    each converting user contributes their SET of touched channels
    (events strictly before the first purchase); the characteristic
    function v(S) counts conversions whose touch set is contained in
    S, and each channel's Shapley value is the exact permutation
    average phi_i = sum_{S not containing i} |S|!(n-1-|S|)!/n! *
    (v(S+i) - v(S)). With n = 4 channels the 16-subset lattice is
    enumerated exactly — no sampling — and values are emitted as
    phi * 4! = phi_x24, an exact integer (the factorial coefficients
    6/2/2/6 clear every denominator). Efficiency axiom holds by
    construction: sum(phi_x24) = 24 * (v(full) - v(empty)).

    Scale: ONE user_id-keyed pass over events (the min-purchase-ts
    window and the touch-mask bit_or ride the same exchange), then a
    <=16-row mask histogram; the whole subset lattice + both v-joins
    are broadcast-sized constants (16 x 16), independent of event
    volume. The textbook exponential blowup is bounded by CHANNEL
    count, which a product controls, never by data."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id")
    bits = (
        "CASE event_type WHEN 'click' THEN 1 WHEN 'error' THEN 2"
        " WHEN 'signup' THEN 4 WHEN 'view' THEN 8 END"
    )
    marked = e.select(
        "user_id",
        "ts",
        "event_type",
        F.min(
            F.when(F.col("event_type") == "purchase", F.col("ts"))
        ).over(w).alias("pts"),
    )
    mk = (
        marked.filter(F.col("pts").isNotNull())
        .groupBy("user_id")
        .agg(
            F.coalesce(
                F.bit_or(
                    F.when(
                        (F.col("event_type") != "purchase")
                        & (F.col("ts") < F.col("pts")),
                        F.expr(bits),
                    )
                ),
                F.lit(0),
            ).alias("mask")
        )
    )
    mc = mk.groupBy("mask").agg(F.count(F.lit(1)).alias("c"))
    subsets = spark.range(16).select(
        F.col("id").cast("int").alias("s"),
        F.expr(
            "CAST((id div 1) % 2 + (id div 2) % 2 + (id div 4) % 2"
            " + (id div 8) % 2 AS INT)"
        ).alias("pc"),
    )
    v = (
        subsets.join(
            F.broadcast(mc),
            F.expr("(mask & s) = mask"),
            "left",
        )
        .groupBy("s", "pc")
        .agg(F.coalesce(F.sum("c"), F.lit(0)).alias("v"))
    )
    ch = spark.createDataFrame(
        [("click", 1), ("error", 2), ("signup", 4), ("view", 8)],
        "channel string, bit int",
    )
    vo = v.select(
        F.col("s").alias("s0"), F.col("pc").alias("pc0"), F.col("v").alias("v0")
    )
    vw_ = v.select(F.col("s").alias("s1"), F.col("v").alias("v1"))
    return (
        ch.join(F.broadcast(vo), F.expr("(s0 & bit) = 0"))
        .join(F.broadcast(vw_), F.expr("s1 = (s0 | bit)"))
        .groupBy("channel")
        .agg(
            F.sum(
                F.expr(
                    "CASE pc0 WHEN 0 THEN 6 WHEN 1 THEN 2"
                    " WHEN 2 THEN 2 WHEN 3 THEN 6 END"
                )
                * (F.col("v1") - F.col("v0"))
            )
            .cast("bigint")
            .alias("phi_x24")
        )
    )


@query(
    "q_t_closeness",
    oracle=f"""
    WITH cell AS (
      SELECT lang, CAST(n_chars // {_QI_BUCKET} AS BIGINT) AS size_bucket,
             source, CAST(COUNT(*) AS BIGINT) AS c
      FROM documents GROUP BY lang, size_bucket, source
    ),
    grp AS (
      SELECT lang, size_bucket, CAST(SUM(c) AS BIGINT) AS n_g
      FROM cell GROUP BY lang, size_bucket
    ),
    gsrc AS (SELECT source, CAST(SUM(c) AS BIGINT) AS c_s FROM cell GROUP BY source),
    tot AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM cell),
    grid AS (
      SELECT g.lang, g.size_bucket, g.n_g, s.source, s.c_s,
             COALESCE(cl.c, 0) AS c_gs, t.n
      FROM grp g CROSS JOIN gsrc s CROSS JOIN tot t
      LEFT JOIN cell cl ON cl.lang = g.lang
                       AND cl.size_bucket = g.size_bucket
                       AND cl.source = s.source
    )
    SELECT lang, size_bucket, n_g AS group_n,
           CAST((1000000 * SUM(ABS(c_gs * n - c_s * n_g)))
                // (2 * n_g * n) AS BIGINT) AS tv_ppm,
           (1000000 * SUM(ABS(c_gs * n - c_s * n_g)))
                // (2 * n_g * n) > 250000 AS violates_t
    FROM grid GROUP BY lang, size_bucket, n_g, n
    """,
    tags=("privacy", "t-closeness", "quality", "llm-pipeline"),
)
def q_t_closeness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """t-closeness audit — the third rung of the release-privacy
    ladder after q_k_anonymity (group size) and q_l_diversity
    (distinct sensitive values): a QI group can be k-large and
    l-diverse yet still leak if its sensitive-value DISTRIBUTION
    differs sharply from the corpus-wide one. Per (lang, size-bucket)
    group, the total-variation distance between the group's `source`
    distribution and the global distribution, in exact-integer ppm:
    tv = (1e6 * sum_s |c_gs*N - C_s*n_g|) div (2*n_g*N), flagged at
    t > 0.25. The absolute-difference sum runs over the FULL sensitive
    domain (a source absent from the group still contributes C_s*n_g),
    which is why the grid is built from groups x sources, not from
    observed cells alone.

    Scale: one QI+sensitive cell aggregate over documents, then all
    machinery on |groups| x |sources| cells — both bounded by the QI
    generalization and the sensitive domain, independent of corpus
    size. The 1-row corpus total broadcasts."""
    d = load_table(spark, sf_dir, "documents")
    cell = d.groupBy(
        "lang",
        F.expr(f"CAST(n_chars div {_QI_BUCKET} AS BIGINT)").alias("size_bucket"),
        "source",
    ).agg(F.count(F.lit(1)).alias("c"))
    cell = cell.localCheckpoint(eager=False)
    grp = cell.groupBy("lang", "size_bucket").agg(F.sum("c").alias("n_g"))
    glob = cell.groupBy("source").agg(F.sum("c").alias("c_s"))
    tot = cell.agg(F.sum("c").alias("n"))
    grid = (
        grp.join(F.broadcast(glob))
        .join(F.broadcast(tot))
        .join(
            cell.select(
                F.col("lang").alias("cl_lang"),
                F.col("size_bucket").alias("cl_bucket"),
                F.col("source").alias("cl_source"),
                "c",
            ),
            (F.col("lang") == F.col("cl_lang"))
            & (F.col("size_bucket") == F.col("cl_bucket"))
            & (F.col("source") == F.col("cl_source")),
            "left",
        )
        .select(
            "lang",
            "size_bucket",
            "n_g",
            "c_s",
            "n",
            F.coalesce(F.col("c"), F.lit(0)).alias("c_gs"),
        )
    )
    return grid.groupBy("lang", "size_bucket", "n_g", "n").agg(
        F.expr(
            "CAST((1000000 * SUM(ABS(c_gs * n - c_s * n_g)))"
            " div (2 * n_g * n) AS BIGINT)"
        ).alias("tv_ppm"),
        F.expr(
            "(1000000 * SUM(ABS(c_gs * n - c_s * n_g)))"
            " div (2 * n_g * n) > 250000"
        ).alias("violates_t"),
    ).select(
        "lang",
        "size_bucket",
        F.col("n_g").alias("group_n"),
        "tv_ppm",
        "violates_t",
    )


@query(
    "q_touch_roles",
    oracle="""
    WITH pu AS (
      SELECT user_id,
             MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS pts
      FROM events GROUP BY user_id
    ),
    touches AS (
      SELECT e.user_id, e.event_type, e.ts, e.event_id,
             ROW_NUMBER() OVER (PARTITION BY e.user_id
                                ORDER BY e.ts, e.event_id) AS rn_asc,
             ROW_NUMBER() OVER (PARTITION BY e.user_id
                                ORDER BY e.ts DESC, e.event_id DESC) AS rn_desc
      FROM events e JOIN pu ON pu.user_id = e.user_id
      WHERE pu.pts IS NOT NULL AND e.ts < pu.pts
            AND e.event_type <> 'purchase'
    )
    SELECT event_type AS channel,
           CAST(SUM(CASE WHEN rn_asc = 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_opener,
           CAST(SUM(CASE WHEN rn_desc = 1 AND rn_asc <> 1
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_closer,
           CAST(SUM(CASE WHEN rn_asc <> 1 AND rn_desc <> 1
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_assist,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_paths_present
    FROM touches GROUP BY event_type
    """,
    tags=("attribution", "funnel", "touch-roles"),
)
def q_touch_roles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Touch-role census per channel over converting paths — the
    position facts (opener / closer / assist) that first- and
    last-touch attribution models consume, counted exactly: for every
    user who purchases, the touches strictly before the first purchase
    are ranked from both ends; a touch is the opener (first), the
    closer (last, when distinct from the opener — single-touch paths
    count once as opener), or an assist. n_paths_present counts paths
    the channel appears in at all. Pairs with q_shapley_attribution
    (fair-division credit) and q_markov_removal (counterfactual
    credit): together the three standard attribution lenses.

    Scale: the purchase-timestamp aggregate and both rank windows key
    on user_id — Spark chains them on ONE exchange; the role rollup is
    a channel-sized hash aggregate."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id")
    marked = e.select(
        "user_id",
        "ts",
        "event_id",
        "event_type",
        F.min(
            F.when(F.col("event_type") == "purchase", F.col("ts"))
        ).over(w).alias("pts"),
    )
    touches = marked.filter(
        F.col("pts").isNotNull()
        & (F.col("ts") < F.col("pts"))
        & (F.col("event_type") != "purchase")
    ).select(
        "user_id",
        "event_type",
        F.row_number()
        .over(w.orderBy("ts", "event_id"))
        .alias("rn_asc"),
        F.row_number()
        .over(w.orderBy(F.col("ts").desc(), F.col("event_id").desc()))
        .alias("rn_desc"),
    )
    return touches.groupBy(F.col("event_type").alias("channel")).agg(
        F.sum(F.when(F.col("rn_asc") == 1, 1).otherwise(0)).alias("n_opener"),
        F.sum(
            F.when((F.col("rn_desc") == 1) & (F.col("rn_asc") != 1), 1).otherwise(0)
        ).alias("n_closer"),
        F.sum(
            F.when((F.col("rn_asc") != 1) & (F.col("rn_desc") != 1), 1).otherwise(0)
        ).alias("n_assist"),
        F.countDistinct("user_id").alias("n_paths_present"),
    )
