"""BI-analytics shapes beyond the TPC-H set: TPC-DS-style
year-over-year growth, a 2-D skyline (Pareto frontier), and an
equi-width histogram with share-of-total.

Scale posture (100 TB):
- YoY growth is one keyed aggregate plus a tiny per-key lag window —
  the window input is |nations| x |years| rows, already reduced.
- Skyline uses the sort-based O(n log n) formulation (running max over
  the price order) instead of the O(n^2) dominance self-join the
  oracle spells out — and since round 7 the running max is TWO-PHASE
  (range partition + per-partition maxima + broadcast prefix max), so
  no stage holds the pair table in one task at any cardinality.
- Histogram is a single hash aggregate on a computed bucket key; the
  share-of-total window sees |buckets| rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.numeric import dec, money_sum
from ..registry import query
from ..sources.loader import load_table

_W = 25_000.0  # histogram bucket width over o_totalprice


@query(
    "q_yoy_growth",
    oracle="""
    WITH yearly AS (
      SELECT n.n_name, CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
             CAST(CAST(SUM(CAST(o.o_totalprice AS DECIMAL(19,2)))
                  AS DECIMAL(38,2)) AS DOUBLE) AS revenue
      FROM orders o
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation n ON c.c_nationkey = n.n_nationkey
      GROUP BY 1, 2
    )
    SELECT n_name, o_year, revenue,
           lag(revenue) OVER w AS prev_revenue,
           revenue / lag(revenue) OVER w AS yoy_ratio
    FROM yearly
    WINDOW w AS (PARTITION BY n_name ORDER BY o_year)
    """,
    tags=("analytics", "tpcds-style", "yoy", "lag"),
)
def q_yoy_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Year-over-year revenue ratio per customer nation (TPC-DS
    Q74-style shape). Revenue is the exact decimal sum presented as
    double; the ratio is a single double division of those exact
    doubles — deterministic IEEE, no rounding needed. First year per
    nation yields NULL prev/ratio in both engines."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    yearly = (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name", F.year("o_orderdate").cast("long").alias("o_year"))
        .agg(money_sum(dec("o_totalprice"), "revenue"))
    )
    w = Window.partitionBy("n_name").orderBy("o_year")
    return yearly.select(
        "n_name",
        "o_year",
        "revenue",
        F.lag("revenue").over(w).alias("prev_revenue"),
        (F.col("revenue") / F.lag("revenue").over(w)).alias("yoy_ratio"),
    )


@query(
    "q_skyline",
    oracle="""
    WITH pairs AS (
      SELECT p_retailprice, CAST(p_size AS BIGINT) AS p_size,
             CAST(COUNT(*) AS BIGINT) AS n_parts
      FROM part GROUP BY 1, 2
    )
    SELECT a.p_retailprice, a.p_size, a.n_parts
    FROM pairs a
    WHERE NOT EXISTS (
      SELECT 1 FROM pairs b
      WHERE b.p_retailprice <= a.p_retailprice AND b.p_size >= a.p_size
        AND (b.p_retailprice < a.p_retailprice OR b.p_size > a.p_size)
    )
    """,
    tags=("analytics", "skyline", "pareto"),
)
def q_skyline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-D skyline of parts: the Pareto frontier minimizing
    p_retailprice while maximizing p_size. The oracle states the
    dominance definition as a quadratic NOT EXISTS; the Spark plan is
    the O(n log n) sweep — over distinct (price, size) pairs ordered
    by (price ASC, size DESC), a pair is on the skyline iff its size
    strictly exceeds the running max size of all preceding pairs
    (every preceding pair has price <=, so any with size >= dominates;
    equal-price larger-size pairs sort earlier, so ties are handled).
    Identical points are collapsed by the pre-aggregation.

    The sweep's running max is TWO-PHASE (the _twophase.py idiom,
    specialized to max): range-partition on the sweep order,
    per-partition exclusive local running max, per-partition maxima ->
    broadcast exclusive prefix max, global exclusive max =
    greatest(prefix, local). No single-task window anywhere; max is
    associative, and the (price, size) key is unique post-aggregation,
    so the output is boundary-independent."""
    p = load_table(spark, sf_dir, "part")
    pairs = (
        p.groupBy("p_retailprice", F.col("p_size").cast("long").alias("p_size"))
        .agg(F.count(F.lit(1)).alias("n_parts"))
    )
    ranged = pairs.repartitionByRange(16, F.asc("p_retailprice"), F.desc("p_size"))
    # pin ONE pid assignment for both the local-window branch and the
    # broadcast offsets branch (round-7 fix, see _twophase.py: two
    # independent materializations of the range exchange can disagree)
    part = ranged.withColumn("pid", F.spark_partition_id()).localCheckpoint(
        eager=False
    )
    w_local = (
        Window.partitionBy("pid")
        .orderBy(F.asc("p_retailprice"), F.desc("p_size"))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    local = part.withColumn("lmx", F.max("p_size").over(w_local))
    # exclusive prefix max over <= 16 per-partition maxima (bounded
    # keyless window — allowlisted class)
    w_off = Window.orderBy("pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = (
        part.groupBy("pid")
        .agg(F.max("p_size").alias("pmax"))
        .withColumn("off_mx", F.max("pmax").over(w_off))
        .select("pid", "off_mx")
    )
    # greatest() skips NULLs: first partition / first row see only the
    # non-null side, all-null (global first row) stays null
    mx = F.greatest("off_mx", "lmx")
    return (
        local.join(F.broadcast(offsets), "pid")
        .withColumn("mx", mx)
        .filter(F.col("mx").isNull() | (F.col("p_size") > F.col("mx")))
        .select("p_retailprice", "p_size", "n_parts")
    )


@query(
    "q_histogram",
    oracle=f"""
    WITH h AS (
      SELECT CAST(FLOOR(o_totalprice / {_W}) AS BIGINT) AS bucket,
             CAST(COUNT(*) AS BIGINT) AS n_orders,
             MIN(o_totalprice) AS min_price,
             MAX(o_totalprice) AS max_price
      FROM orders GROUP BY 1
    )
    SELECT bucket, bucket * {_W} AS bucket_lo, n_orders, min_price, max_price,
           CAST(n_orders AS DOUBLE)
             / CAST(SUM(n_orders) OVER () AS DOUBLE) AS pct
    FROM h
    """,
    tags=("analytics", "histogram", "share-of-total"),
)
def q_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width histogram of order totals (width 25k) with per-bucket
    min/max and share of total. Bucket assignment is one double
    division + floor (deterministic IEEE, identical both engines);
    min/max are comparisons, exact on raw doubles; the share is a
    single division of exact counts. The share window runs over
    |buckets| rows post-aggregation."""
    o = load_table(spark, sf_dir, "orders")
    h = o.groupBy(
        F.floor(F.col("o_totalprice") / F.lit(_W)).cast("long").alias("bucket")
    ).agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.min("o_totalprice").alias("min_price"),
        F.max("o_totalprice").alias("max_price"),
    )
    total = F.sum("n_orders").over(Window.partitionBy())
    return h.select(
        "bucket",
        (F.col("bucket") * F.lit(_W)).alias("bucket_lo"),
        "n_orders",
        "min_price",
        "max_price",
        (F.col("n_orders").cast("double") / total.cast("double")).alias("pct"),
    )


@query(
    "q_mad_outliers",
    oracle="""
    WITH v AS (
      SELECT event_type, CAST(ROUND(value * 100) AS BIGINT) AS cents
      FROM events
    ),
    r AS (
      SELECT event_type, cents,
             ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY cents) AS rn,
             COUNT(*) OVER (PARTITION BY event_type) AS n
      FROM v
    ),
    med AS (
      SELECT event_type, CAST(MAX(n) AS BIGINT) AS n,
             CAST(MIN(cents) + MAX(cents) AS BIGINT) AS med2
      FROM r
      WHERE rn = (n + 1) // 2 OR rn = n // 2 + 1
      GROUP BY event_type
    ),
    dev AS (
      SELECT v.event_type, ABS(2 * v.cents - med.med2) AS dev2
      FROM v JOIN med ON v.event_type = med.event_type
    ),
    rd AS (
      SELECT event_type, dev2,
             ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY dev2) AS rn,
             COUNT(*) OVER (PARTITION BY event_type) AS n
      FROM dev
    ),
    mad AS (
      SELECT event_type, CAST(MIN(dev2) + MAX(dev2) AS BIGINT) AS mad4
      FROM rd
      WHERE rn = (n + 1) // 2 OR rn = n // 2 + 1
      GROUP BY event_type
    )
    SELECT med.event_type, med.n, med.med2 AS median_2cents, mad.mad4,
           CAST(SUM(CASE WHEN 40000 * dev.dev2 > 44478 * mad.mad4
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
           CAST(MAX(dev.dev2) AS BIGINT) AS max_dev2
    FROM dev
    JOIN med ON dev.event_type = med.event_type
    JOIN mad ON dev.event_type = mad.event_type
    GROUP BY med.event_type, med.n, med.med2, mad.mad4
    """,
    tags=("analytics", "robust-stats", "outliers", "quality"),
)
def q_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier detection via Median Absolute Deviation — the
    robust twin of q_zscore_anomalies (mean/stddev break down when the
    outliers themselves inflate the spread; median/MAD have a 50%
    breakdown point). Flags |x - median| > 3 * 1.4826 * MAD per
    event_type and reports the per-group outlier census.

    Exactness: everything is integer — cents, then the median kept as
    lo+hi (2x median, exact), deviations in 2x-cent units, MAD kept as
    lo+hi again (4x MAD). The Gaussian consistency constant 1.4826
    enters via integer cross-multiplication
    (40000 * dev2 > 44478 * mad4), so no float ever touches the
    hashed surface.

    Scale: two ranking windows partitioned by event_type (per-group
    range sort, no global sort) + hash joins on the tiny per-group
    stats table, which broadcasts. Same shape as q_exact_median_mode —
    the exact-audit path; at 100 TB the screening pass would swap the
    exact medians for approx_percentile and keep the identical
    comparison algebra."""
    e = load_table(spark, sf_dir, "events").select(
        "event_type", F.expr("CAST(ROUND(value * 100) AS BIGINT)").alias("cents")
    )
    wv = Window.partitionBy("event_type").orderBy("cents")
    wn = Window.partitionBy("event_type")
    r = e.select(
        "event_type",
        "cents",
        F.row_number().over(wv).alias("rn"),
        F.count(F.lit(1)).over(wn).alias("n"),
    )
    med = (
        r.filter((F.col("rn") == F.expr("(n + 1) div 2")) | (F.col("rn") == F.expr("n div 2 + 1")))
        .groupBy("event_type")
        .agg(
            F.max("n").alias("n"),
            (F.min("cents") + F.max("cents")).alias("med2"),
        )
    )
    dev = e.join(F.broadcast(med), "event_type").select(
        "event_type", "n", "med2", F.abs(2 * F.col("cents") - F.col("med2")).alias("dev2")
    )
    wd = Window.partitionBy("event_type").orderBy("dev2")
    rd = dev.select(
        "event_type",
        "dev2",
        F.row_number().over(wd).alias("rn"),
        F.count(F.lit(1)).over(wn).alias("nn"),
    )
    mad = (
        rd.filter(
            (F.col("rn") == F.expr("(nn + 1) div 2")) | (F.col("rn") == F.expr("nn div 2 + 1"))
        )
        .groupBy("event_type")
        .agg((F.min("dev2") + F.max("dev2")).alias("mad4"))
    )
    return (
        dev.join(F.broadcast(mad), "event_type")
        .groupBy("event_type", "n", "med2", "mad4")
        .agg(
            F.sum(
                F.when(40000 * F.col("dev2") > 44478 * F.col("mad4"), 1).otherwise(0)
            ).alias("n_outliers"),
            F.max("dev2").alias("max_dev2"),
        )
        .select(
            "event_type",
            "n",
            F.col("med2").alias("median_2cents"),
            "mad4",
            "n_outliers",
            "max_dev2",
        )
    )


@query(
    "q_kaplan_meier",
    oracle="""
    WITH su AS MATERIALIZED (
      SELECT user_id, MIN(ts) AS t0
      FROM events WHERE event_type = 'signup' GROUP BY user_id
    ),
    pu AS (
      SELECT e.user_id, MIN(e.ts) AS t_ev
      FROM events e JOIN su ON su.user_id = e.user_id
      WHERE e.event_type = 'purchase' AND e.ts >= su.t0
      GROUP BY e.user_id
    ),
    last_seen AS (
      SELECT user_id, MAX(ts) AS t_last FROM events GROUP BY user_id
    ),
    dur AS MATERIALIZED (
      SELECT su.user_id,
             CASE WHEN pu.t_ev IS NOT NULL
                  THEN CAST(date_diff('day', su.t0, pu.t_ev) AS BIGINT)
                  ELSE CAST(date_diff('day', su.t0, ls.t_last) AS BIGINT)
             END AS d_days,
             CASE WHEN pu.t_ev IS NOT NULL THEN 1 ELSE 0 END AS ev
      FROM su
      LEFT JOIN pu ON pu.user_id = su.user_id
      JOIN last_seen ls ON ls.user_id = su.user_id
    ),
    h AS MATERIALIZED (
      SELECT d_days, CAST(COUNT(*) AS BIGINT) AS n_all,
             CAST(SUM(ev) AS BIGINT) AS d
      FROM dur GROUP BY d_days
    ),
    risk AS MATERIALIZED (
      SELECT d_days, d,
             CAST(SUM(n_all) OVER (ORDER BY d_days DESC
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS BIGINT) AS n_risk
      FROM h
    ),
    steps AS (
      SELECT d_days, d, n_risk,
             CAST(ROUND(ln(CAST(n_risk - d AS DOUBLE)
                           / CAST(n_risk AS DOUBLE)) * 1000000)
                  AS BIGINT) AS step_mnats
      FROM risk WHERE d > 0 AND n_risk > d
    )
    SELECT d_days, n_risk, d,
           step_mnats,
           CAST(SUM(step_mnats) OVER (ORDER BY d_days
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS BIGINT) AS km_mnats
    FROM steps
    """,
    tags=("analytics", "survival", "kaplan-meier", "events"),
)
def q_kaplan_meier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier time-to-purchase survival curve with right
    censoring: per signup user, days from first signup to first
    subsequent purchase (censored at their last observed event), then
    the KM estimator over the duration HISTOGRAM — n_risk is a suffix
    sum, each death-day contributes ln((n-d)/n) quantized once per
    step to micro-nats, and the curve is the exact cumulative integer
    sum of those steps (log-space survival, order-independent; exp is
    the caller's presentation concern). Steps where everyone at risk
    dies are excluded (S hits exact 0; ln undefined) — identically in
    both engines.

    Scale: three user-keyed aggregates (signup, first purchase, last
    seen — all map-side partial), then every window runs over the
    duration histogram (<= distinct days), not the user table."""
    e = load_table(spark, sf_dir, "events")
    su = (
        e.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t0"))
    )
    pu = (
        e.filter(F.col("event_type") == "purchase")
        .join(su, "user_id")
        .filter(F.col("ts") >= F.col("t0"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_ev"))
    )
    ls = e.groupBy("user_id").agg(F.max("ts").alias("t_last"))
    dur = (
        su.join(pu, "user_id", "left")
        .join(ls, "user_id")
        .select(
            F.when(
                F.col("t_ev").isNotNull(),
                F.datediff(F.col("t_ev"), F.col("t0")),
            )
            .otherwise(F.datediff(F.col("t_last"), F.col("t0")))
            .cast("long")
            .alias("d_days"),
            F.when(F.col("t_ev").isNotNull(), 1)
            .otherwise(0)
            .alias("ev"),
        )
    )
    h = dur.groupBy("d_days").agg(
        F.count(F.lit(1)).alias("n_all"), F.sum("ev").alias("d")
    )
    w_risk = Window.orderBy(F.desc("d_days")).rowsBetween(
        Window.unboundedPreceding, 0
    )
    risk = h.select(
        "d_days",
        "d",
        F.sum("n_all").over(w_risk).alias("n_risk"),
    )
    steps = risk.filter((F.col("d") > 0) & (F.col("n_risk") > F.col("d"))).select(
        "d_days",
        "d",
        "n_risk",
        F.expr(
            "CAST(ROUND(ln(CAST(n_risk - d AS DOUBLE)"
            " / CAST(n_risk AS DOUBLE)) * 1000000) AS BIGINT)"
        ).alias("step_mnats"),
    )
    w_cum = Window.orderBy("d_days").rowsBetween(
        Window.unboundedPreceding, 0
    )
    return steps.select(
        "d_days",
        "n_risk",
        "d",
        "step_mnats",
        F.sum("step_mnats").over(w_cum).cast("long").alias("km_mnats"),
    )


@query(
    "q_hierarchical_share",
    oracle="""
    WITH rev AS (
      SELECT r.r_name AS region, n.n_name AS nation,
             CAST(SUM(CAST(ROUND(o.o_totalprice * 100) AS BIGINT))
                  AS BIGINT) AS rev_cents
      FROM orders o
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n ON n.n_nationkey = c.c_nationkey
      JOIN region r ON r.r_regionkey = n.n_regionkey
      GROUP BY r.r_name, n.n_name
    )
    SELECT region, nation, rev_cents,
           CAST(SUM(rev_cents) OVER (PARTITION BY region) AS BIGINT)
             AS region_cents,
           CAST(SUM(rev_cents) OVER () AS BIGINT) AS total_cents,
           CAST((1000000 * rev_cents)
                // SUM(rev_cents) OVER (PARTITION BY region) AS BIGINT)
             AS share_of_region_ppm,
           CAST((1000000 * SUM(rev_cents) OVER (PARTITION BY region))
                // SUM(rev_cents) OVER () AS BIGINT)
             AS region_share_ppm
    FROM rev
    """,
    tags=("analytics", "hierarchy", "share", "windows"),
)
def q_hierarchical_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-level share-of-parent rollup — nation revenue as a share of
    its region, region as a share of the world — the drill-down ratio
    every BI hierarchy renders. Cent-scaled sums keep revenue exact;
    shares are truncating ppm over window totals at each level.

    Scale: one star join (dimensions broadcast) + one (region, nation)
    aggregate; both share windows run over the ~25-row grouped frame,
    never the fact table."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    rev = (
        o.join(F.broadcast(c), F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(n), F.col("n_nationkey") == F.col("c_nationkey"))
        .join(F.broadcast(r), F.col("r_regionkey") == F.col("n_regionkey"))
        .groupBy(
            F.col("r_name").alias("region"), F.col("n_name").alias("nation")
        )
        .agg(
            F.sum(
                F.expr("CAST(ROUND(o_totalprice * 100) AS BIGINT)")
            ).alias("rev_cents")
        )
    )
    return rev.select(
        "region",
        "nation",
        "rev_cents",
        F.expr(
            "CAST(SUM(rev_cents) OVER (PARTITION BY region) AS BIGINT)"
        ).alias("region_cents"),
        F.expr("CAST(SUM(rev_cents) OVER () AS BIGINT)").alias(
            "total_cents"
        ),
        F.expr(
            "CAST((1000000 * rev_cents)"
            " div SUM(rev_cents) OVER (PARTITION BY region) AS BIGINT)"
        ).alias("share_of_region_ppm"),
        F.expr(
            "CAST((1000000 * SUM(rev_cents) OVER (PARTITION BY region))"
            " div SUM(rev_cents) OVER () AS BIGINT)"
        ).alias("region_share_ppm"),
    )


@query(
    "q_fiscal_calendar",
    oracle="""
    WITH bounds AS (
      SELECT MIN(CAST(o_orderdate AS DATE)) AS d0,
             MAX(CAST(o_orderdate AS DATE)) AS d1
      FROM orders
    ),
    dim AS MATERIALIZED (
      SELECT d,
             CASE WHEN month(d) >= 2 THEN year(d) + 1 ELSE year(d) END
               AS fiscal_year,
             ((month(d) + 10) % 12) // 3 + 1 AS fiscal_quarter
      FROM (SELECT unnest(generate_series(d0, d1, INTERVAL 1 DAY))::DATE
              AS d FROM bounds)
    ),
    days AS (
      SELECT CAST(fiscal_year AS BIGINT) AS fiscal_year,
             CAST(fiscal_quarter AS BIGINT) AS fiscal_quarter,
             CAST(COUNT(*) AS BIGINT) AS n_days
      FROM dim GROUP BY 1, 2
    ),
    rev AS (
      SELECT dim.fiscal_year, dim.fiscal_quarter,
             CAST(COUNT(*) AS BIGINT) AS n_orders,
             CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
                  AS BIGINT) AS rev_cents
      FROM orders o JOIN dim ON dim.d = CAST(o.o_orderdate AS DATE)
      GROUP BY 1, 2
    )
    SELECT days.fiscal_year, days.fiscal_quarter, days.n_days,
           CAST(COALESCE(rev.n_orders, 0) AS BIGINT) AS n_orders,
           CAST(COALESCE(rev.rev_cents, 0) AS BIGINT) AS rev_cents
    FROM days
    LEFT JOIN rev ON rev.fiscal_year = days.fiscal_year
                 AND rev.fiscal_quarter = days.fiscal_quarter
    """,
    tags=("analytics", "calendar", "fiscal", "date-dimension"),
)
def q_fiscal_calendar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Generated fiscal date dimension (FY starts in February) joined
    to order revenue by fiscal quarter — the calendar-conformance
    pattern every finance-facing mart needs: the dimension is
    GENERATED executor-side over the fact date span (sequence
    explode, the q_gap_fill precedent — never a driver loop), fiscal
    attributes are pure month arithmetic, and quarters with zero
    orders still appear with their true day counts.

    Scale: the dimension is |days| rows (tiny, broadcast); facts
    join it on the date key and aggregate once; day counting is an
    aggregate over the dimension alone."""
    o = load_table(spark, sf_dir, "orders")
    bounds = o.agg(
        F.min(F.col("o_orderdate").cast("date")).alias("d0"),
        F.max(F.col("o_orderdate").cast("date")).alias("d1"),
    )
    dim = bounds.select(
        F.explode(
            F.expr("sequence(d0, d1, INTERVAL 1 DAY)")
        ).alias("d")
    ).select(
        "d",
        F.expr(
            "CASE WHEN month(d) >= 2 THEN year(d) + 1 ELSE year(d) END"
        )
        .cast("long")
        .alias("fiscal_year"),
        F.expr("((month(d) + 10) % 12) div 3 + 1")
        .cast("long")
        .alias("fiscal_quarter"),
    )
    days = dim.groupBy("fiscal_year", "fiscal_quarter").agg(
        F.count(F.lit(1)).alias("n_days")
    )
    rev = (
        o.join(
            F.broadcast(dim),
            F.col("d") == F.col("o_orderdate").cast("date"),
        )
        .groupBy("fiscal_year", "fiscal_quarter")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(
                F.expr("CAST(ROUND(o_totalprice * 100) AS BIGINT)")
            ).alias("rev_cents"),
        )
    )
    return days.join(rev, ["fiscal_year", "fiscal_quarter"], "left").select(
        "fiscal_year",
        "fiscal_quarter",
        "n_days",
        F.coalesce(F.col("n_orders"), F.lit(0)).cast("long").alias(
            "n_orders"
        ),
        F.coalesce(F.col("rev_cents"), F.lit(0)).cast("long").alias(
            "rev_cents"
        ),
    )


@query(
    "q_topn_plus_other",
    oracle="""
    WITH agg AS (
      SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(n_chars) AS BIGINT) AS chars
      FROM documents GROUP BY lang, source
    ),
    ranked AS (
      SELECT *,
             CAST(ROW_NUMBER() OVER (PARTITION BY lang
                   ORDER BY n_docs DESC, source) AS BIGINT) AS rnk
      FROM agg
    )
    SELECT lang,
           CASE WHEN rnk <= 3 THEN source ELSE '(other)' END AS source,
           CAST(MIN(CASE WHEN rnk <= 3 THEN rnk ELSE 4 END) AS BIGINT)
             AS display_rank,
           CAST(SUM(n_docs) AS BIGINT) AS n_docs,
           CAST(SUM(chars) AS BIGINT) AS chars,
           CAST(COUNT(*) AS BIGINT) AS n_sources_in_bucket
    FROM ranked
    GROUP BY lang, CASE WHEN rnk <= 3 THEN source ELSE '(other)' END
    """,
    tags=("analytics", "topn-other", "bi", "rollup"),
)
def q_topn_plus_other(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 sources per language with everything else rolled into an
    '(other)' bucket — the BI idiom every pie chart and legend uses:
    the long tail never disappears, it aggregates, so totals still
    reconcile. Ranking ties break on the source name; the bucket
    re-aggregation preserves exact doc and char counts.

    Scale: one (lang, source) hash aggregate (bounded cells), a rank
    window partitioned by lang over those cells, and one re-aggregate
    — nothing touches raw rows twice."""
    d = load_table(spark, sf_dir, "documents")
    agg = d.groupBy("lang", "source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("chars"),
    )
    w = Window.partitionBy("lang").orderBy(F.desc("n_docs"), "source")
    ranked = agg.withColumn(
        "rnk", F.row_number().over(w).cast("long")
    )
    return (
        ranked.groupBy(
            "lang",
            F.when(F.col("rnk") <= 3, F.col("source"))
            .otherwise("(other)")
            .alias("source"),
        )
        .agg(
            F.min(
                F.when(F.col("rnk") <= 3, F.col("rnk")).otherwise(4)
            ).alias("display_rank"),
            F.sum("n_docs").alias("n_docs"),
            F.sum("chars").alias("chars"),
            F.count(F.lit(1)).alias("n_sources_in_bucket"),
        )
    )


@query(
    "q_greedy_allocation",
    oracle="""
    WITH supply AS MATERIALIZED (
      SELECT l_partkey,
             CAST((CAST(SUM(l_quantity) AS BIGINT) * 60) // 100 AS BIGINT) AS cap
      FROM lineitem GROUP BY l_partkey
    ),
    demand AS (
      SELECT l.l_partkey, l.l_orderkey,
             CAST(l.l_quantity AS BIGINT) AS qty,
             CAST(COALESCE(SUM(CAST(l.l_quantity AS BIGINT)) OVER (
                 PARTITION BY l.l_partkey
                 ORDER BY o.o_orderdate, l.l_orderkey, l.l_linenumber
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS BIGINT) AS taken_before
      FROM lineitem l
      JOIN orders o ON o.o_orderkey = l.l_orderkey
    )
    SELECT d.l_partkey, d.l_orderkey, d.qty,
           CAST(LEAST(d.qty,
                      GREATEST(CAST(0 AS BIGINT),
                               s.cap - d.taken_before)) AS BIGINT)
             AS allocated,
           d.qty = LEAST(d.qty,
                         GREATEST(CAST(0 AS BIGINT),
                                  s.cap - d.taken_before)) AS fully_filled
    FROM demand d JOIN supply s ON s.l_partkey = d.l_partkey
    WHERE d.qty > LEAST(d.qty,
                        GREATEST(CAST(0 AS BIGINT),
                                 s.cap - d.taken_before))
    """,
    tags=("analytics", "allocation", "inventory", "windows"),
)
def q_greedy_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy priority-ordered inventory allocation: each part's
    supply cap (60% of historical demand, the shortage scenario) is
    handed out in order-date priority; a line gets
    min(demand, max(0, cap - cumulative_taken_before)) — the
    fill-or-kill waterfall every order-promising system runs. The
    "sequential" handout is ONE prefix-sum window per part (no loop,
    no recursion: allocation depends on the running sum of demand,
    not on previous allocations, because the cap is per-part). Output
    is the shortage report: every short-shipped line, exact.

    Scale: one orders join for priority, one (partkey)-keyed window,
    one broadcast-sized supply join — all on the same part key."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    supply = li.groupBy("l_partkey").agg(
        F.expr(
            "CAST((CAST(SUM(l_quantity) AS BIGINT) * 60) div 100 AS BIGINT)"
        ).alias("cap")
    )
    w = (
        Window.partitionBy("l_partkey")
        .orderBy("o_orderdate", "l_orderkey", "l_linenumber")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    demand = (
        li.join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .select(
            "l_partkey",
            "l_orderkey",
            "l_linenumber",
            "o_orderdate",
            F.col("l_quantity").cast("long").alias("qty"),
        )
        .withColumn(
            "taken_before",
            F.coalesce(F.sum("qty").over(w), F.lit(0)).cast("long"),
        )
    )
    alloc = F.least(
        F.col("qty"),
        F.greatest(F.lit(0).cast("long"), F.col("cap") - F.col("taken_before")),
    )
    return (
        demand.join(supply, "l_partkey")
        .select(
            "l_partkey",
            "l_orderkey",
            "qty",
            alloc.alias("allocated"),
            (F.col("qty") == alloc).alias("fully_filled"),
        )
        .filter(F.col("qty") > F.col("allocated"))
    )


@query(
    "q_mix_shift_decomposition",
    oracle="""
    WITH lines AS (
      SELECT CASE WHEN o.o_orderdate >= TIMESTAMP '1998-07-01'
                  THEN 1 ELSE 0 END AS period,
             l.l_returnflag AS bucket,
             CAST(l.l_quantity AS BIGINT) AS qty,
             CAST(ROUND(l.l_extendedprice * 100) AS BIGINT) AS cents
      FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
    ),
    cells AS MATERIALIZED (
      SELECT bucket,
             CAST(SUM(CASE WHEN period = 0 THEN qty ELSE 0 END)
                  AS BIGINT) AS q0,
             CAST(SUM(CASE WHEN period = 1 THEN qty ELSE 0 END)
                  AS BIGINT) AS q1,
             CAST(SUM(CASE WHEN period = 0 THEN cents ELSE 0 END)
                  AS BIGINT) AS r0,
             CAST(SUM(CASE WHEN period = 1 THEN cents ELSE 0 END)
                  AS BIGINT) AS r1
      FROM lines GROUP BY bucket
    )
    SELECT bucket, q0, q1, r0, r1,
           CAST(r1 - r0 AS BIGINT) AS delta_cents,
           CAST((q1 - q0) * (r0 // NULLIF(q0, 0)) AS BIGINT)
             AS volume_effect_cents,
           CAST(q0 * (r1 // NULLIF(q1, 0) - r0 // NULLIF(q0, 0))
                AS BIGINT) AS price_effect_cents,
           CAST((r1 - r0) - (q1 - q0) * (r0 // NULLIF(q0, 0))
                - q0 * (r1 // NULLIF(q1, 0) - r0 // NULLIF(q0, 0))
                AS BIGINT) AS cross_effect_cents
    FROM cells
    """,
    tags=("analytics", "mix-shift", "price-volume", "finance"),
)
def q_mix_shift_decomposition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Price/volume/mix decomposition of revenue change across the
    1998-07-01 cutover, by return-flag bucket — the finance bridge
    that explains WHY revenue moved: volume effect (quantity change
    at old unit price), price effect (unit-price change on old
    volume), and the interaction remainder, reconciling exactly to
    the total delta by construction. Unit prices are truncating
    cent-per-unit integers, so every effect column is exact and the
    identity delta = volume + price + cross holds bit-for-bit.

    Scale: one orders join for the period flag, one bucket aggregate;
    the decomposition is per-bucket scalar arithmetic."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    lines = li.join(
        o.select("o_orderkey", "o_orderdate"),
        F.col("o_orderkey") == F.col("l_orderkey"),
    ).select(
        F.when(
            F.col("o_orderdate") >= F.lit("1998-07-01").cast("timestamp"), 1
        )
        .otherwise(0)
        .alias("period"),
        F.col("l_returnflag").alias("bucket"),
        F.col("l_quantity").cast("long").alias("qty"),
        F.expr("CAST(ROUND(l_extendedprice * 100) AS BIGINT)").alias(
            "cents"
        ),
    )
    cells = lines.groupBy("bucket").agg(
        F.sum(F.when(F.col("period") == 0, F.col("qty")).otherwise(0)).alias("q0"),
        F.sum(F.when(F.col("period") == 1, F.col("qty")).otherwise(0)).alias("q1"),
        F.sum(F.when(F.col("period") == 0, F.col("cents")).otherwise(0)).alias("r0"),
        F.sum(F.when(F.col("period") == 1, F.col("cents")).otherwise(0)).alias("r1"),
    )
    return cells.select(
        "bucket",
        "q0",
        "q1",
        "r0",
        "r1",
        F.expr("CAST(r1 - r0 AS BIGINT)").alias("delta_cents"),
        F.expr(
            "CAST((q1 - q0) * (r0 div NULLIF(q0, 0)) AS BIGINT)"
        ).alias("volume_effect_cents"),
        F.expr(
            "CAST(q0 * (r1 div NULLIF(q1, 0) - r0 div NULLIF(q0, 0))"
            " AS BIGINT)"
        ).alias("price_effect_cents"),
        F.expr(
            "CAST((r1 - r0) - (q1 - q0) * (r0 div NULLIF(q0, 0))"
            " - q0 * (r1 div NULLIF(q1, 0) - r0 div NULLIF(q0, 0))"
            " AS BIGINT)"
        ).alias("cross_effect_cents"),
    )


@query(
    "q_multi_band_scan",
    oracle="""
    SELECT CAST(SUM(CASE WHEN h BETWEEN 0 AND 2 THEN 1 ELSE 0 END)
                AS BIGINT) AS band_00_03,
           CAST(SUM(CASE WHEN h BETWEEN 3 AND 5 THEN 1 ELSE 0 END)
                AS BIGINT) AS band_03_06,
           CAST(SUM(CASE WHEN h BETWEEN 6 AND 8 THEN 1 ELSE 0 END)
                AS BIGINT) AS band_06_09,
           CAST(SUM(CASE WHEN h BETWEEN 9 AND 11 THEN 1 ELSE 0 END)
                AS BIGINT) AS band_09_12,
           CAST(SUM(CASE WHEN h BETWEEN 12 AND 14 THEN 1 ELSE 0 END)
                AS BIGINT) AS band_12_15,
           CAST(SUM(CASE WHEN h BETWEEN 15 AND 17 THEN 1 ELSE 0 END)
                AS BIGINT) AS band_15_18,
           CAST(SUM(CASE WHEN h BETWEEN 18 AND 20 THEN 1 ELSE 0 END)
                AS BIGINT) AS band_18_21,
           CAST(SUM(CASE WHEN h BETWEEN 21 AND 23 THEN 1 ELSE 0 END)
                AS BIGINT) AS band_21_24
    FROM (
      SELECT EXTRACT(HOUR FROM ts) AS h
      FROM events WHERE event_type = 'click' AND value > 100
    )
    """,
    tags=("analytics", "multi-band", "tpcds-q88", "scan-efficiency"),
)
def q_multi_band_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS Q88-signature multi-band count: eight 3-hour activity
    bands of filtered click events, all answered from ONE scan as
    conditional aggregates in a single reduction row. The naive form
    (and Q88's literal SQL) is eight self-joined scalar subqueries —
    eight scans of the fact table; folding the band predicate into
    CASE inside one aggregate is THE rewrite that matters at 100 TB
    (asserted: 1 scan, 1 exchange, tests/test_plans.py). The shared
    filter still pushes down to the reader.

    Scale: one scan with pushed predicates, map-side partial
    aggregation straight to a single row."""
    ev = load_table(spark, sf_dir, "events")
    h = F.hour("ts")
    bands = [
        (0, 2, "band_00_03"), (3, 5, "band_03_06"), (6, 8, "band_06_09"),
        (9, 11, "band_09_12"), (12, 14, "band_12_15"),
        (15, 17, "band_15_18"), (18, 20, "band_18_21"),
        (21, 23, "band_21_24"),
    ]
    return (
        ev.filter((F.col("event_type") == "click") & (F.col("value") > 100))
        .select(h.alias("h"))
        .agg(
            *[
                F.sum(
                    F.when(F.col("h").between(lo, hi), 1).otherwise(0)
                ).alias(name)
                for lo, hi, name in bands
            ]
        )
    )


@query(
    "q_multi_distinct_expand",
    oracle="""
    SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
           CAST(COUNT(DISTINCT event_type) AS BIGINT) AS n_types,
           CAST(COUNT(DISTINCT user_id || '|' || event_type) AS BIGINT)
             AS n_user_type_pairs,
           CAST(COUNT(*) AS BIGINT) AS n_events
    FROM events
    """,
    tags=("analytics", "multi-distinct", "expand", "engine-surface"),
)
def q_multi_distinct_expand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Several COUNT(DISTINCT ...) at DIFFERENT granularities in one
    statement: Catalyst compiles this into a single scan feeding an
    Expand node (one replicated row per distinct-group) and a two-step
    aggregate — NOT one scan per distinct column (asserted:
    single scan + Expand in the plan). Knowing this shape exists is
    the difference between one pass and N passes when a data-quality
    report wants five cardinalities from a 100 TB table; the pair
    column concatenates with a separator so it is the true composite
    cardinality in both engines.

    Scale: one scan; Expand multiplies rows by the number of distinct
    specs BEFORE partial aggregation, so the shuffle is bounded by
    the distinct key spaces, not by the fan-out."""
    ev = load_table(spark, sf_dir, "events")
    return ev.agg(
        F.countDistinct("user_id").alias("n_users"),
        F.countDistinct("event_type").alias("n_types"),
        F.countDistinct(
            F.expr("user_id || '|' || event_type")
        ).alias("n_user_type_pairs"),
        F.count(F.lit(1)).alias("n_events"),
    )


@query(
    "q_ship_lag_deciles",
    oracle="""
    WITH lags AS (
      SELECT l_returnflag,
             CAST(CAST(l_shipdate AS DATE) - CAST(o_orderdate AS DATE)
                  AS BIGINT) AS lag_days
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    ),
    hist AS (
      SELECT l_returnflag, lag_days, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM lags GROUP BY l_returnflag, lag_days
    ),
    cum AS (
      SELECT l_returnflag, lag_days, cnt,
             SUM(cnt) OVER (PARTITION BY l_returnflag ORDER BY lag_days)
               AS cum_cnt,
             SUM(cnt) OVER (PARTITION BY l_returnflag) AS total
      FROM hist
    ),
    grid AS (SELECT unnest(generate_series(1, 9)) AS dec)
    SELECT c.l_returnflag, CAST(g.dec AS BIGINT) AS decile,
           CAST(MIN(c.lag_days) AS BIGINT) AS lag_days_at_decile
    FROM grid g JOIN cum c ON c.cum_cnt * 10 >= c.total * g.dec
    GROUP BY c.l_returnflag, g.dec
    """,
    tags=("analytics", "fulfillment", "lag-deciles", "sla"),
)
def q_ship_lag_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-to-ship fulfillment-lag deciles per return-flag
    segment (the fixture carries no ship mode) — the SLA table an
    operations team publishes ("90% of segment-R shipments leave
    within N days"). Exact day-lag histogram per segment, cumulative
    counts, and the rank trick: the d-th decile is the smallest lag
    whose cumulative count reaches d/10 of the segment's total (integer
    cross-multiplication, no interpolated percentile anywhere). The
    constant 9-row decile grid joins the bounded histogram — the
    q_time_to_convert pattern applied to the relational fact pair.

    Scale: the orderkey equi-join is co-partitioned fact-to-fact; the
    histogram collapses to |segments| x |lag days| rows before any
    window; the grid join is metadata-sized."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    lags = li.join(o, li.l_orderkey == o.o_orderkey).select(
        "l_returnflag",
        F.expr(
            "CAST(datediff(CAST(l_shipdate AS DATE),"
            " CAST(o_orderdate AS DATE)) AS BIGINT)"
        ).alias("lag_days"),
    )
    hist = lags.groupBy("l_returnflag", "lag_days").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    w = Window.partitionBy("l_returnflag").orderBy("lag_days")
    wt = Window.partitionBy("l_returnflag")
    cum = hist.select(
        "l_returnflag",
        "lag_days",
        F.sum("cnt").over(w).alias("cum_cnt"),
        F.sum("cnt").over(wt).alias("total"),
    )
    grid = spark.range(1, 10).select(F.col("id").alias("dec"))
    return (
        cum.join(
            F.broadcast(grid),
            F.col("cum_cnt") * 10 >= F.col("total") * F.col("dec"),
        )
        .groupBy("l_returnflag", F.col("dec").cast("long").alias("decile"))
        .agg(F.min("lag_days").cast("long").alias("lag_days_at_decile"))
    )


@query(
    "q_nelson_aalen",
    oracle="""
    WITH su AS MATERIALIZED (
      SELECT user_id, MIN(ts) AS t0
      FROM events WHERE event_type = 'signup' GROUP BY user_id
    ),
    pu AS (
      SELECT e.user_id, MIN(e.ts) AS t_ev
      FROM events e JOIN su ON su.user_id = e.user_id
      WHERE e.event_type = 'purchase' AND e.ts >= su.t0
      GROUP BY e.user_id
    ),
    last_seen AS (
      SELECT user_id, MAX(ts) AS t_last FROM events GROUP BY user_id
    ),
    dur AS MATERIALIZED (
      SELECT su.user_id,
             CASE WHEN pu.t_ev IS NOT NULL
                  THEN CAST(date_diff('day', su.t0, pu.t_ev) AS BIGINT)
                  ELSE CAST(date_diff('day', su.t0, ls.t_last) AS BIGINT)
             END AS d_days,
             CASE WHEN pu.t_ev IS NOT NULL THEN 1 ELSE 0 END AS ev
      FROM su
      LEFT JOIN pu ON pu.user_id = su.user_id
      JOIN last_seen ls ON ls.user_id = su.user_id
    ),
    h AS MATERIALIZED (
      SELECT d_days, CAST(COUNT(*) AS BIGINT) AS n_all,
             CAST(SUM(ev) AS BIGINT) AS d
      FROM dur GROUP BY d_days
    ),
    risk AS (
      SELECT d_days, d,
             CAST(SUM(n_all) OVER (ORDER BY d_days DESC
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS BIGINT) AS n_risk
      FROM h
    ),
    steps AS (
      SELECT d_days, d, n_risk,
             CAST((1000000 * d) // n_risk AS BIGINT) AS hazard_step_ppm
      FROM risk WHERE d > 0
    )
    SELECT d_days, n_risk, d, hazard_step_ppm,
           CAST(SUM(hazard_step_ppm) OVER (ORDER BY d_days
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS BIGINT) AS cumhaz_ppm
    FROM steps
    """,
    tags=("stats", "survival", "nelson-aalen", "hazard"),
)
def q_nelson_aalen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nelson-Aalen cumulative hazard for time-to-purchase — the
    estimator survival analysts pair with q_kaplan_meier: instead of
    multiplying survival factors it SUMS the per-day hazard d/n, so
    it stays defined even on days where every at-risk user converts
    (the step KM must exclude), and its increments are plain rational
    numbers — quantized here to one truncating ppm division per
    death day, then an exact cumulative integer sum. Same cohort
    construction as KM (signup -> first purchase, censored at last
    observed event), so the two curves are directly comparable.

    Scale: identical to q_kaplan_meier — three user-keyed map-side
    aggregates, then all windows run over the duration histogram
    (<= distinct days), never the user table."""
    e = load_table(spark, sf_dir, "events")
    su = (
        e.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t0"))
    )
    pu = (
        e.filter(F.col("event_type") == "purchase")
        .join(su, "user_id")
        .filter(F.col("ts") >= F.col("t0"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_ev"))
    )
    ls = e.groupBy("user_id").agg(F.max("ts").alias("t_last"))
    dur = (
        su.join(pu, "user_id", "left")
        .join(ls, "user_id")
        .select(
            F.when(
                F.col("t_ev").isNotNull(),
                F.datediff(F.col("t_ev"), F.col("t0")),
            )
            .otherwise(F.datediff(F.col("t_last"), F.col("t0")))
            .cast("long")
            .alias("d_days"),
            F.when(F.col("t_ev").isNotNull(), 1).otherwise(0).alias("ev"),
        )
    )
    h = dur.groupBy("d_days").agg(
        F.count(F.lit(1)).alias("n_all"), F.sum("ev").alias("d")
    )
    w_risk = Window.orderBy(F.desc("d_days")).rowsBetween(
        Window.unboundedPreceding, 0
    )
    steps = (
        h.select("d_days", "d", F.sum("n_all").over(w_risk).alias("n_risk"))
        .filter(F.col("d") > 0)
        .select(
            "d_days",
            "d",
            "n_risk",
            F.expr("CAST((1000000 * d) div n_risk AS BIGINT)").alias(
                "hazard_step_ppm"
            ),
        )
    )
    w_cum = Window.orderBy("d_days").rowsBetween(Window.unboundedPreceding, 0)
    return steps.select(
        "d_days",
        "n_risk",
        "d",
        "hazard_step_ppm",
        F.sum("hazard_step_ppm").over(w_cum).cast("long").alias("cumhaz_ppm"),
    )


# ---------------------------------------------------------------------
# q_daily_streaks (round 7)
# ---------------------------------------------------------------------

_STREAK_MIN = 2  # report streaks of at least 2 consecutive active days


@query(
    "q_daily_streaks",
    oracle=f"""
    WITH days AS (
      SELECT DISTINCT user_id,
             CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE) AS day
      FROM events WHERE event_type = 'purchase'
    ),
    numbered AS (
      SELECT user_id, day,
             CAST(date_diff('day', DATE '1970-01-01', day) AS BIGINT)
               AS day_num,
             ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY day) AS rn
      FROM days
    ),
    islands AS (
      SELECT user_id,
             CAST(MIN(day) AS TIMESTAMP) AS streak_start,
             CAST(MAX(day) AS TIMESTAMP) AS streak_end,
             CAST(COUNT(*) AS BIGINT) AS streak_len
      FROM numbered
      GROUP BY user_id, day_num - rn
    )
    SELECT user_id, streak_start, streak_end, streak_len,
           CAST(ROW_NUMBER() OVER (PARTITION BY user_id
                                   ORDER BY streak_len DESC, streak_start)
                AS BIGINT) AS streak_rank
    FROM islands
    QUALIFY streak_len >= {_STREAK_MIN}
    """,
    tags=("analytics", "gaps-islands", "streaks", "retention"),
)
def q_daily_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Consecutive-day purchase streaks per user via the classic
    gaps-and-islands idiom: distinct active days, per-user row numbers,
    and the invariant that day_number − row_number is CONSTANT within a
    run of consecutive days — each distinct value is one island. Emits
    every streak of ≥{_STREAK_MIN} days with its per-user rank — the
    engagement-streak primitive behind "7-day streak" retention
    features. Complements q_sessionize_gaps (time-GAP islands on raw
    event timestamps) with the integer-difference form on the calendar
    grain.

    Exactness: day arithmetic and counts are exact integers; ranks are
    fully tie-broken (len desc, start).

    Scale: one distinct aggregate to (user, day) grain — map-side
    partials absorb the raw event volume — then windows and the island
    aggregate all PARTITIONED by user (parallel, no global ordering
    anywhere)."""
    days = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase")
        .select(
            "user_id",
            F.date_trunc("day", F.col("ts")).cast("date").alias("day"),
        )
        .distinct()
    )
    w_rn = Window.partitionBy("user_id").orderBy("day")
    numbered = days.select(
        "user_id",
        "day",
        F.datediff("day", F.lit("1970-01-01")).cast("long").alias("day_num"),
        F.row_number().over(w_rn).alias("rn"),
    )
    islands = numbered.groupBy(
        "user_id", (F.col("day_num") - F.col("rn")).alias("grp")
    ).agg(
        F.min("day").cast("timestamp").alias("streak_start"),
        F.max("day").cast("timestamp").alias("streak_end"),
        F.count(F.lit(1)).alias("streak_len"),
    )
    w_rank = Window.partitionBy("user_id").orderBy(
        F.desc("streak_len"), F.asc("streak_start")
    )
    return (
        islands.filter(F.col("streak_len") >= _STREAK_MIN)
        .select(
            "user_id",
            "streak_start",
            "streak_end",
            "streak_len",
            F.row_number().over(w_rank).cast("long").alias("streak_rank"),
        )
    )


# ---------------------------------------------------------------------
# q_hhi_concentration (round 8, session 3)
# ---------------------------------------------------------------------


@query(
    "q_hhi_concentration",
    oracle="""
    WITH sup AS (
      SELECT l.l_suppkey AS sk,
             CAST(SUM(CAST(ROUND(l.l_extendedprice * (1 - l.l_discount)
                                 * 100) AS BIGINT)) AS HUGEINT) AS cents
      FROM lineitem l GROUP BY 1
    ),
    reg AS (
      SELECT r.r_name AS region, sup.cents
      FROM sup
      JOIN supplier s ON s.s_suppkey = sup.sk
      JOIN nation n ON n.n_nationkey = s.s_nationkey
      JOIN region r ON r.r_regionkey = n.n_regionkey
    ),
    t AS (
      SELECT region, CAST(COUNT(*) AS BIGINT) AS n_suppliers,
             SUM(cents) AS tot, SUM(cents * cents) AS ss
      FROM reg GROUP BY region
    )
    SELECT region, n_suppliers, CAST(tot AS BIGINT) AS total_cents,
           CAST((1000000 * ss) // (tot * tot) AS BIGINT) AS hhi_ppm
    FROM t
    """,
    tags=("analytics", "hhi", "concentration", "market-share"),
)
def q_hhi_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Herfindahl-Hirschman supplier-concentration index per region —
    how concentrated is each region's supply revenue? HHI =
    sum_i (s_i/S)^2 = sum s_i^2 / S^2, emitted in ppm with ONE
    truncating division of exact cent integers (the inequality-
    measure companion to q_gini_revenue's two-phase Lorenz sum —
    HHI needs no ranking at all, just two moments). 10000/n_suppliers
    ppm is the perfectly-even floor; antitrust reads >2500 ppm-of-
    10000 scale as concentrated (here ~400-770 on that scale: diffuse).

    Scale: the lineitem collapse pre-aggregates per SUPPLIER before
    any join (the fact table never carries dim columns through a
    shuffle); supplier->nation->region dims broadcast; the final
    frame is |regions| rows."""
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    sup = li.groupBy(F.col("l_suppkey").alias("sk")).agg(
        F.expr(
            "CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 100)"
            " AS BIGINT)) AS DECIMAL(38,0))"
        ).alias("cents")
    )
    reg = (
        sup.join(F.broadcast(s), sup.sk == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select(F.col("r_name").alias("region"), "cents")
    )
    t = reg.groupBy("region").agg(
        F.count(F.lit(1)).alias("n_suppliers"),
        F.expr("SUM(cents)").alias("tot"),
        F.expr("SUM(cents * cents)").alias("ss"),
    )
    return t.select(
        "region",
        "n_suppliers",
        F.col("tot").cast("long").alias("total_cents"),
        F.expr(
            "CAST((1000000 * ss) div (tot * tot) AS BIGINT)"
        ).alias("hhi_ppm"),
    )
