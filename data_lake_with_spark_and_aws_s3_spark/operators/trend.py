"""Trend inference and multiple-testing control over the event stream:
Mann-Kendall trend test, Theil-Sen robust slope, and Benjamini-Hochberg
FDR across a per-segment test family — the monitoring-statistics trio a
metrics warehouse runs after q_overdispersion/q_cusum_drift flag a
series as interesting.

Scale notes (100 TB of events):
- Both trend tests first collapse events to DAILY counts per type —
  one map-side-combinable hash aggregate; everything after runs on a
  (types x days) table bounded by the calendar, not the event volume.
  The pairwise self-join is O(types * days^2) on that tiny table — the
  textbook algorithm is quadratic in DAYS (30 days -> 435 pairs), never
  in events. At 100 TB the daily rollup is the only real shuffle.
- BH-FDR: the test family is one segment aggregate (per-nation urgent
  rate) + window ranking over |segments| rows. The procedure (sort
  p ascending, k = max rank with p_(r) <= alpha*r/m, reject ranks <= k)
  is exact BH; the p-value is a documented monotone rational surrogate
  (see q_bh_fdr) so every comparison stays in exact integers.
All emitted statistics are truncating integer divisions of exact
BIGINT/DECIMAL moments — bit-identical across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import query
from ..sources.loader import load_table

# shared daily rollup (Spark side) -----------------------------------


def _daily_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    return e.groupBy(
        "event_type", F.col("ts").cast("date").alias("day")
    ).agg(F.count(F.lit(1)).alias("y"))


_DAILY_SQL = """
    SELECT event_type, CAST(ts AS DATE) AS day,
           CAST(COUNT(*) AS BIGINT) AS y
    FROM events GROUP BY event_type, CAST(ts AS DATE)
"""


@query(
    "q_mann_kendall",
    oracle=f"""
    WITH daily AS ({_DAILY_SQL}),
    pairs AS (
      SELECT a.event_type,
             CAST(SUM(CASE WHEN b.y > a.y THEN 1
                           WHEN b.y < a.y THEN -1 ELSE 0 END) AS BIGINT)
               AS s_stat
      FROM daily a JOIN daily b
        ON a.event_type = b.event_type AND a.day < b.day
      GROUP BY a.event_type
    ),
    ties AS (
      SELECT event_type,
             CAST(SUM(t * (t - 1) * (2 * t + 5)) AS BIGINT) AS tie_term
      FROM (SELECT event_type, y, CAST(COUNT(*) AS BIGINT) AS t
            FROM daily GROUP BY event_type, y)
      GROUP BY event_type
    ),
    n AS (
      SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_days
      FROM daily GROUP BY event_type
    )
    SELECT n.event_type, n.n_days, p.s_stat,
           CAST(n.n_days * (n.n_days - 1) * (2 * n.n_days + 5)
                - t.tie_term AS BIGINT) AS var_s_x18,
           CAST(CASE WHEN p.s_stat > 0 THEN 1
                     WHEN p.s_stat < 0 THEN -1 ELSE 0 END AS BIGINT)
             AS trend_sign
    FROM n
    JOIN pairs p ON p.event_type = n.event_type
    JOIN ties t ON t.event_type = n.event_type
    """,
    tags=("stats", "trend", "mann-kendall", "timeseries", "monitoring"),
)
def q_mann_kendall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Kendall trend test per event type over daily counts:
    S = sum over day pairs i<j of sign(y_j - y_i), with the exact
    tie-corrected variance emitted as 18*Var(S) =
    n(n-1)(2n+5) - sum_t t(t-1)(2t+5) so no division or sqrt ever
    happens (the caller compares S^2 against z^2 * Var(S) in
    integers). The nonparametric "is this series drifting" test that
    needs no distributional assumption — the follow-up to
    q_cusum_drift's change-point alarm.

    Scale: the day-pair self-join runs on the DAILY rollup (types x
    days rows, calendar-bounded), so it is O(days^2) per type on a
    tiny table; the only event-volume shuffle is the daily hash
    aggregate, which map-side combines."""
    daily = _daily_counts(spark, sf_dir)
    a = daily.select(
        F.col("event_type"), F.col("day").alias("d1"), F.col("y").alias("y1")
    )
    b = daily.select(
        F.col("event_type").alias("et2"),
        F.col("day").alias("d2"),
        F.col("y").alias("y2"),
    )
    pairs = (
        a.join(b, (F.col("event_type") == F.col("et2")) & (F.col("d1") < F.col("d2")))
        .groupBy("event_type")
        .agg(
            F.sum(
                F.when(F.col("y2") > F.col("y1"), 1)
                .when(F.col("y2") < F.col("y1"), -1)
                .otherwise(0)
            ).alias("s_stat")
        )
    )
    ties = (
        daily.groupBy("event_type", "y")
        .agg(F.count(F.lit(1)).alias("t"))
        .groupBy("event_type")
        .agg(
            F.sum(
                F.col("t") * (F.col("t") - 1) * (2 * F.col("t") + 5)
            ).alias("tie_term")
        )
    )
    n = daily.groupBy("event_type").agg(F.count(F.lit(1)).alias("n_days"))
    return (
        n.join(pairs, "event_type")
        .join(ties, "event_type")
        .select(
            "event_type",
            "n_days",
            "s_stat",
            (
                F.col("n_days")
                * (F.col("n_days") - 1)
                * (2 * F.col("n_days") + 5)
                - F.col("tie_term")
            ).alias("var_s_x18"),
            F.when(F.col("s_stat") > 0, 1)
            .when(F.col("s_stat") < 0, -1)
            .otherwise(0)
            .cast("bigint")
            .alias("trend_sign"),
        )
    )


@query(
    "q_theil_sen",
    oracle=f"""
    WITH daily AS ({_DAILY_SQL}),
    slopes AS (
      SELECT a.event_type,
             CASE WHEN b.y >= a.y
                  THEN (1000000 * (b.y - a.y)) // (b.day - a.day)
                  ELSE -((1000000 * (a.y - b.y)) // (b.day - a.day))
             END AS slope_micro
      FROM daily a JOIN daily b
        ON a.event_type = b.event_type AND a.day < b.day
    )
    SELECT event_type,
           CAST(COUNT(*) OVER (PARTITION BY event_type) AS BIGINT)
             AS n_pairs,
           CAST(slope_micro AS BIGINT) AS median_slope_micro
    FROM slopes
    QUALIFY ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY slope_micro)
            = (COUNT(*) OVER (PARTITION BY event_type) + 1) // 2
    """,
    tags=("stats", "trend", "theil-sen", "robust", "timeseries"),
)
def q_theil_sen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil-Sen robust trend slope per event type: the LOWER median of
    all pairwise day-to-day slopes (y_j - y_i)/(d_j - d_i) over the
    daily rollup, in micro-units. Breakdown point ~29% — the slope
    estimate q_rolling_slope's least-squares version cannot give when
    a third of the days are outage artifacts. Slopes quantize
    symmetrically toward zero (the CASE splits the sign before the
    truncating division, because DuckDB // floors while Spark div
    truncates); the lower median (rank (n+1) div 2) avoids averaging
    two middles, so every emitted value is an exact element of the
    slope multiset.

    Scale: same currency as q_mann_kendall — the pair join is
    calendar-bounded (days^2 per type on the daily table); the event
    volume only pays one map-combinable daily aggregate."""
    daily = _daily_counts(spark, sf_dir)
    a = daily.select(
        F.col("event_type"), F.col("day").alias("d1"), F.col("y").alias("y1")
    )
    b = daily.select(
        F.col("event_type").alias("et2"),
        F.col("day").alias("d2"),
        F.col("y").alias("y2"),
    )
    slopes = a.join(
        b, (F.col("event_type") == F.col("et2")) & (F.col("d1") < F.col("d2"))
    ).select(
        "event_type",
        F.expr(
            "CASE WHEN y2 >= y1"
            " THEN (1000000 * (y2 - y1)) div datediff(d2, d1)"
            " ELSE -((1000000 * (y1 - y2)) div datediff(d2, d1)) END"
        ).alias("slope_micro"),
    )
    w = Window.partitionBy("event_type")
    ranked = slopes.select(
        "event_type",
        F.count(F.lit(1)).over(w).alias("n_pairs"),
        "slope_micro",
        F.row_number()
        .over(w.orderBy("slope_micro"))
        .alias("rn"),
    )
    return ranked.filter(
        F.col("rn") == F.expr("(n_pairs + 1) div 2")
    ).select(
        "event_type",
        "n_pairs",
        F.col("slope_micro").alias("median_slope_micro"),
    )


@query(
    "q_bh_fdr",
    oracle="""
    WITH lab AS (
      SELECT n.n_name,
             CAST(COUNT(*) AS BIGINT) AS n_i,
             CAST(SUM(CASE WHEN o.o_orderpriority = '1-URGENT'
                           THEN 1 ELSE 0 END) AS BIGINT) AS x_i
      FROM orders o
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n ON n.n_nationkey = c.c_nationkey
      GROUP BY n.n_name
    ),
    tot AS (
      SELECT CAST(SUM(n_i) AS BIGINT) AS nn, CAST(SUM(x_i) AS BIGINT) AS xx,
             CAST(COUNT(*) AS BIGINT) AS m
      FROM lab
    ),
    z AS (
      SELECT l.n_name, l.n_i, l.x_i, t.m,
             CAST((1000000
                   * (CAST(l.x_i AS HUGEINT) * t.nn - CAST(t.xx AS HUGEINT) * l.n_i)
                   * (CAST(l.x_i AS HUGEINT) * t.nn - CAST(t.xx AS HUGEINT) * l.n_i))
                  // (CAST(l.n_i AS HUGEINT) * t.xx * (t.nn - t.xx))
                  AS BIGINT) AS z2_micro
      FROM lab l CROSS JOIN tot t
    ),
    r AS (
      SELECT *,
             CAST(1000000000000 // (1000000 + z2_micro) AS BIGINT) AS p_ppm,
             ROW_NUMBER() OVER (
               ORDER BY 1000000000000 // (1000000 + z2_micro), n_name
             ) AS rnk
      FROM z
    ),
    k AS (
      SELECT *,
             MAX(CASE WHEN p_ppm * m <= 200000 * rnk THEN rnk ELSE 0 END)
               OVER () AS kmax
      FROM r
    )
    SELECT n_name, n_i, x_i, z2_micro, p_ppm,
           CAST(rnk AS BIGINT) AS rnk, rnk <= kmax AS rejected
    FROM k
    """,
    tags=("stats", "multiple-testing", "bh-fdr", "ab-test", "monitoring"),
)
def q_bh_fdr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benjamini-Hochberg FDR control across a per-segment test family:
    each nation's URGENT-priority order rate is tested against the
    pooled rate (one-sample two-proportion z^2, the exact-integer
    rationalization (x_i*N - X*n_i)^2 / (n_i * X * (N-X)) in micro
    units), then the 25 tests are BH-adjusted at alpha = 0.2: sort
    p ascending, k = max rank r with p_(r) <= alpha*r/m, reject ranks
    <= k — the step-up procedure exactly, all comparisons in integers.
    The p-value is a documented MONOTONE RATIONAL SURROGATE
    p_ppm = 1e12 div (1e6 + z2_micro), not the chi-square tail — BH
    only consumes the ordering and a threshold, so the procedure is
    faithful while staying engine-bit-identical; production swaps in
    the chi2 survival function at the same slot.

    Scale: one broadcast star join + one segment aggregate; the BH
    window machinery runs over |segments| rows (25 here), never over
    orders. The kmax window is a single-partition pass over those 25
    rows only."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    lab = (
        o.join(F.broadcast(c), F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(n), F.col("n_nationkey") == F.col("c_nationkey"))
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("n_i"),
            F.sum(
                F.when(F.col("o_orderpriority") == "1-URGENT", 1).otherwise(0)
            ).alias("x_i"),
        )
    )
    tot = lab.agg(
        F.sum("n_i").alias("nn"),
        F.sum("x_i").alias("xx"),
        F.count(F.lit(1)).alias("m"),
    )
    z = lab.join(F.broadcast(tot)).select(
        "n_name",
        "n_i",
        "x_i",
        "m",
        F.expr(
            "CAST((1000000"
            " * (CAST(x_i AS DECIMAL(38,0)) * nn - CAST(xx AS DECIMAL(38,0)) * n_i)"
            " * (CAST(x_i AS DECIMAL(38,0)) * nn - CAST(xx AS DECIMAL(38,0)) * n_i))"
            " div (CAST(n_i AS DECIMAL(38,0)) * xx * (nn - xx)) AS BIGINT)"
        ).alias("z2_micro"),
    )
    p = z.withColumn(
        "p_ppm",
        F.expr("CAST(1000000000000 div (1000000 + z2_micro) AS BIGINT)"),
    )
    r = p.withColumn(
        "rnk",
        F.row_number().over(Window.orderBy("p_ppm", "n_name")),
    )
    k = r.withColumn(
        "kmax",
        F.max(
            F.when(
                F.col("p_ppm") * F.col("m") <= 200000 * F.col("rnk"),
                F.col("rnk"),
            ).otherwise(0)
        ).over(Window.partitionBy()),
    )
    return k.select(
        "n_name",
        "n_i",
        "x_i",
        "z2_micro",
        "p_ppm",
        F.col("rnk").cast("bigint").alias("rnk"),
        (F.col("rnk") <= F.col("kmax")).alias("rejected"),
    )


# ---------------------------------------------------------------------
# q_seasonal_mann_kendall (round 7)
# ---------------------------------------------------------------------


@query(
    "q_seasonal_mann_kendall",
    oracle=f"""
    WITH daily AS ({_DAILY_SQL}),
    sd AS (
      SELECT event_type, day, y,
             -- dialect offset: DuckDB dayofweek is 0-6 (Sun=0), Spark
             -- is 1-7 (Sun=1) — normalize to Spark's convention
             CAST(dayofweek(day) + 1 AS BIGINT) AS season
      FROM daily
    ),
    pairs AS (
      SELECT a.event_type, a.season,
             CAST(SUM(CASE WHEN b.y > a.y THEN 1
                           WHEN b.y < a.y THEN -1 ELSE 0 END) AS BIGINT)
               AS s_season
      FROM sd a JOIN sd b
        ON a.event_type = b.event_type AND a.season = b.season
           AND a.day < b.day
      GROUP BY 1, 2
    ),
    ties AS (
      SELECT event_type, season,
             CAST(SUM(t * (t - 1) * (2 * t + 5)) AS BIGINT) AS tie_term
      FROM (SELECT event_type, season, y, CAST(COUNT(*) AS BIGINT) AS t
            FROM sd GROUP BY event_type, season, y)
      GROUP BY 1, 2
    ),
    n AS (
      SELECT event_type, season, CAST(COUNT(*) AS BIGINT) AS n_days
      FROM sd GROUP BY 1, 2
    ),
    per AS (
      SELECT n.event_type, n.season, n.n_days, p.s_season,
             CAST(n.n_days * (n.n_days - 1) * (2 * n.n_days + 5)
                  - t.tie_term AS BIGINT) AS var_x18
      FROM n
      JOIN pairs p ON p.event_type = n.event_type AND p.season = n.season
      JOIN ties t ON t.event_type = n.event_type AND t.season = n.season
    )
    SELECT event_type, season, n_days, s_season, var_x18,
           CAST(SUM(s_season) OVER (PARTITION BY event_type) AS BIGINT)
             AS s_total,
           CAST(SUM(var_x18) OVER (PARTITION BY event_type) AS BIGINT)
             AS var_total_x18,
           CAST(CASE WHEN SUM(s_season) OVER (PARTITION BY event_type) > 0
                     THEN 1
                     WHEN SUM(s_season) OVER (PARTITION BY event_type) < 0
                     THEN -1 ELSE 0 END AS BIGINT) AS trend_sign
    FROM per
    """,
    tags=("stats", "trend", "seasonal-mann-kendall", "timeseries"),
)
def q_seasonal_mann_kendall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal Mann-Kendall (Hirsch & Slack 1984) per event type with
    DAY-OF-WEEK seasons: the plain MK statistic computed WITHIN each
    weekday (so Monday only ever compares against other Mondays) and
    summed — the trend test that stays valid when the series has a
    weekly cycle q_mann_kendall's all-pairs form would read as noise
    or false trend. Emits per-season S and variance plus the combined
    S_total / Var_total (18-scaled, the q_mann_kendall convention: no
    division or sqrt anywhere) and the trend sign.

    Exactness: sign sums, tie terms, and the variance identity are all
    exact integer arithmetic — bit-identical across engines.

    Scale: the day-pair self-join runs on the daily rollup SPLIT BY
    season, so it is O(types x Σ_s days_s²) on a calendar-bounded
    table — 7x fewer pairs than unseasoned MK on the same span; the
    only event-volume shuffle is the daily hash aggregate."""
    sd = _daily_counts(spark, sf_dir).withColumn(
        "season", F.dayofweek("day").cast("long")
    )
    a = sd.select(
        "event_type", "season", F.col("day").alias("d1"), F.col("y").alias("y1")
    )
    b = sd.select(
        F.col("event_type").alias("et2"),
        F.col("season").alias("se2"),
        F.col("day").alias("d2"),
        F.col("y").alias("y2"),
    )
    pairs = (
        a.join(
            b,
            (F.col("event_type") == F.col("et2"))
            & (F.col("season") == F.col("se2"))
            & (F.col("d1") < F.col("d2")),
        )
        .groupBy("event_type", "season")
        .agg(
            F.sum(
                F.when(F.col("y2") > F.col("y1"), 1)
                .when(F.col("y2") < F.col("y1"), -1)
                .otherwise(0)
            ).alias("s_season")
        )
    )
    ties = (
        sd.groupBy("event_type", "season", "y")
        .agg(F.count(F.lit(1)).alias("t"))
        .groupBy("event_type", "season")
        .agg(
            F.sum(
                F.col("t") * (F.col("t") - 1) * (2 * F.col("t") + 5)
            ).alias("tie_term")
        )
    )
    n = sd.groupBy("event_type", "season").agg(
        F.count(F.lit(1)).alias("n_days")
    )
    per = (
        n.join(pairs, ["event_type", "season"])
        .join(ties, ["event_type", "season"])
        .select(
            "event_type",
            "season",
            "n_days",
            F.col("s_season").cast("long").alias("s_season"),
            (
                F.col("n_days") * (F.col("n_days") - 1) * (2 * F.col("n_days") + 5)
                - F.col("tie_term")
            )
            .cast("long")
            .alias("var_x18"),
        )
    )
    w_t = Window.partitionBy("event_type")
    s_total = F.sum("s_season").over(w_t)
    return per.select(
        "event_type",
        "season",
        "n_days",
        "s_season",
        "var_x18",
        s_total.cast("long").alias("s_total"),
        F.sum("var_x18").over(w_t).cast("long").alias("var_total_x18"),
        F.when(s_total > 0, 1)
        .when(s_total < 0, -1)
        .otherwise(0)
        .cast("long")
        .alias("trend_sign"),
    )


# ---------------------------------------------------------------------
# q_holm_bonferroni (round 8, session 3)
# ---------------------------------------------------------------------


@query(
    "q_holm_bonferroni",
    oracle="""
    WITH lab AS (
      SELECT n.n_name,
             CAST(COUNT(*) AS BIGINT) AS n_i,
             CAST(SUM(CASE WHEN o.o_orderpriority = '1-URGENT'
                           THEN 1 ELSE 0 END) AS BIGINT) AS x_i
      FROM orders o
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n ON n.n_nationkey = c.c_nationkey
      GROUP BY n.n_name
    ),
    tot AS (
      SELECT CAST(SUM(n_i) AS BIGINT) AS nn,
             CAST(SUM(x_i) AS BIGINT) AS xx,
             CAST(COUNT(*) AS BIGINT) AS m
      FROM lab
    ),
    z AS (
      SELECT l.n_name, l.n_i, t.m,
             CAST((1000000
                   * (CAST(l.x_i AS HUGEINT) * t.nn
                      - CAST(t.xx AS HUGEINT) * l.n_i)
                   * (CAST(l.x_i AS HUGEINT) * t.nn
                      - CAST(t.xx AS HUGEINT) * l.n_i))
                  // (CAST(l.n_i AS HUGEINT) * t.xx * (t.nn - t.xx))
                  AS BIGINT) AS z2_micro
      FROM lab l CROSS JOIN tot t
    ),
    r AS (
      SELECT *,
             CAST(1000000000000 // (1000000 + z2_micro) AS BIGINT)
               AS p_ppm,
             ROW_NUMBER() OVER (
               ORDER BY 1000000000000 // (1000000 + z2_micro), n_name
             ) AS rnk
      FROM z
    ),
    k AS (
      SELECT *,
             MIN(CASE WHEN p_ppm * (m - rnk + 1) > 50000
                      THEN rnk ELSE m + 1 END) OVER () AS kmin
      FROM r
    )
    SELECT n_name, p_ppm, CAST(rnk AS BIGINT) AS rnk,
           rnk < kmin AS rejected_holm
    FROM k
    """,
    tags=("stats", "multiple-testing", "holm", "fwer"),
)
def q_holm_bonferroni(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holm step-down correction over the SAME per-nation urgency
    hypothesis family q_bh_fdr screens — the FWER-controlling
    counterpart (run both: BH bounds the FALSE-DISCOVERY RATE and
    rejects more; Holm bounds ANY false positive and is the one a
    launch-gate decision wants): reject ranks below the first i where
    p_(i) > alpha/(m-i+1). Same surrogate integer p_ppm as BH (one
    truncating division of the exact z^2), so the two reports are
    directly comparable row by row; the step-down cutoff is a single
    MIN window over the m-row family.

    Scale: the family is |nations| rows — every window here is over a
    dimension-bounded frame (allowlisted, the q_bh_fdr entry's
    justification)."""
    from pyspark.sql import Window

    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    lab = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("n_i"),
            F.sum(
                F.when(F.col("o_orderpriority") == "1-URGENT", 1).otherwise(0)
            ).alias("x_i"),
        )
    )
    tot = lab.agg(
        F.sum("n_i").alias("nn"),
        F.sum("x_i").alias("xx"),
        F.count(F.lit(1)).alias("m"),
    )
    z = lab.crossJoin(F.broadcast(tot)).select(
        "n_name",
        "m",
        F.expr(
            "CAST((1000000"
            " * (CAST(x_i AS DECIMAL(38,0)) * nn"
            "    - CAST(xx AS DECIMAL(38,0)) * n_i)"
            " * (CAST(x_i AS DECIMAL(38,0)) * nn"
            "    - CAST(xx AS DECIMAL(38,0)) * n_i))"
            " div (CAST(n_i AS DECIMAL(38,0)) * xx * (nn - xx))"
            " AS BIGINT)"
        ).alias("z2_micro"),
    )
    r = z.select(
        "n_name",
        "m",
        F.expr(
            "CAST(1000000000000 div (1000000 + z2_micro) AS BIGINT)"
        ).alias("p_ppm"),
    ).select(
        "*",
        F.row_number()
        .over(Window.orderBy("p_ppm", "n_name"))
        .cast("long")
        .alias("rnk"),
    )
    k = r.select(
        "*",
        F.min(
            F.when(
                F.col("p_ppm") * (F.col("m") - F.col("rnk") + 1) > 50000,
                F.col("rnk"),
            ).otherwise(F.col("m") + 1)
        )
        .over(Window.partitionBy())
        .alias("kmin"),
    )
    return k.select(
        "n_name",
        "p_ppm",
        "rnk",
        (F.col("rnk") < F.col("kmin")).alias("rejected_holm"),
    )


# ---------------------------------------------------------------------
# q_fisher_method (round 8, session 3)
# ---------------------------------------------------------------------


@query(
    "q_fisher_method",
    oracle="""
    WITH lab AS (
      SELECT n.n_name, CAST(COUNT(*) AS BIGINT) AS n_i,
             CAST(SUM(CASE WHEN o.o_orderpriority = '1-URGENT'
                           THEN 1 ELSE 0 END) AS BIGINT) AS x_i
      FROM orders o
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n ON n.n_nationkey = c.c_nationkey
      GROUP BY n.n_name
    ),
    tot AS (
      SELECT CAST(SUM(n_i) AS BIGINT) AS nn,
             CAST(SUM(x_i) AS BIGINT) AS xx,
             CAST(COUNT(*) AS BIGINT) AS m
      FROM lab
    ),
    z AS (
      SELECT l.n_name, t.m,
             CAST((1000000
                   * (CAST(l.x_i AS HUGEINT) * t.nn
                      - CAST(t.xx AS HUGEINT) * l.n_i)
                   * (CAST(l.x_i AS HUGEINT) * t.nn
                      - CAST(t.xx AS HUGEINT) * l.n_i))
                  // (CAST(l.n_i AS HUGEINT) * t.xx * (t.nn - t.xx))
                  AS BIGINT) AS z2_micro
      FROM lab l CROSS JOIN tot t
    ),
    p AS (
      SELECT n_name, m,
             CAST(1000000000000 // (1000000 + z2_micro) AS BIGINT)
               AS p_ppm
      FROM z
    ),
    f AS (
      SELECT CAST(MAX(m) AS BIGINT) AS m,
             CAST(SUM(CAST(ROUND(-2000000
                  * ln(CAST(p_ppm AS DOUBLE) / 1000000)) AS BIGINT))
                  AS BIGINT) AS chi2_micro
      FROM p
    )
    SELECT m, chi2_micro, CAST(2 * m AS BIGINT) AS df FROM f
    """,
    tags=("stats", "multiple-testing", "fisher-method", "meta-analysis"),
)
def q_fisher_method(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fisher's combined-probability test over the SAME per-nation
    urgency family q_bh_fdr and q_holm_bonferroni screen — the
    meta-analytic third leg of the multiple-testing shelf: BH asks
    WHICH hypotheses to reject at bounded FDR, Holm at bounded FWER,
    Fisher asks whether the family is null OVERALL even when no
    single member crosses a line: chi^2_2m = -2 sum ln p_i. Same
    surrogate integer p_ppm; each ln is one IEEE op over the exact
    integer ratio p_ppm/1e6, ROUNDed once to micro-nats before the
    exact sum (the q_kaplan_meier step treatment).

    Scale: the family is |nations| rows; one broadcast-stitched
    map-side score and a 1-row reduction."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    lab = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("n_i"),
            F.sum(
                F.when(F.col("o_orderpriority") == "1-URGENT", 1).otherwise(0)
            ).alias("x_i"),
        )
    )
    tot = lab.agg(
        F.sum("n_i").alias("nn"),
        F.sum("x_i").alias("xx"),
        F.count(F.lit(1)).alias("m"),
    )
    p = lab.crossJoin(F.broadcast(tot)).select(
        "m",
        F.expr(
            "CAST(1000000000000 div (1000000"
            " + CAST((1000000"
            " * (CAST(x_i AS DECIMAL(38,0)) * nn"
            "    - CAST(xx AS DECIMAL(38,0)) * n_i)"
            " * (CAST(x_i AS DECIMAL(38,0)) * nn"
            "    - CAST(xx AS DECIMAL(38,0)) * n_i))"
            " div (CAST(n_i AS DECIMAL(38,0)) * xx * (nn - xx))"
            " AS BIGINT)) AS BIGINT)"
        ).alias("p_ppm"),
    )
    f = p.agg(
        F.expr("CAST(MAX(m) AS BIGINT)").alias("m"),
        F.expr(
            "CAST(SUM(CAST(ROUND(-2000000"
            " * ln(CAST(p_ppm AS DOUBLE) / 1000000)) AS BIGINT))"
            " AS BIGINT)"
        ).alias("chi2_micro"),
    )
    return f.select(
        "m", "chi2_micro", F.expr("CAST(2 * m AS BIGINT)").alias("df")
    )
