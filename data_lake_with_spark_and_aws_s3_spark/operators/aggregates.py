"""Aggregation family (SURVEY.md §2.4): rollup / cube / grouping sets,
filtered aggregation, collect_set, exact + approx distinct, stats.

Reference parity: the reference aggregates only implicitly via
dropDuplicates (`etl.py:~37,~86` canonical template — SURVEY.md §0);
the full family is north-star surface.

Scale posture: every query below is a builtin partial+final
HashAggregate — map-side combine crushes rows before the shuffle, so
shuffle volume is O(|groups|), not O(|rows|). Rollup/cube expand each
input row to (levels) rows BEFORE partial aggregation; at 100 TB
prefer re-aggregating from the finest level when the hierarchy is
deep (here it's 2-3 levels — fine).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.numeric import dec, money_sum
from ..registry import query
from ..sources.loader import load_table, register_views


@query(
    "q_rollup_revenue",
    oracle="""
    SELECT COALESCE(r.r_name, 'ALL') AS region_name,
           COALESCE(n.n_name, 'ALL') AS nation_name,
           COUNT(*) AS n_orders,
           CAST(ROUND(SUM(CAST(o.o_totalprice AS DECIMAL(19,2))), 2) AS DOUBLE) AS revenue
    FROM orders o
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation n ON n.n_nationkey = c.c_nationkey
    JOIN region r ON r.r_regionkey = n.n_regionkey
    GROUP BY ROLLUP(r.r_name, n.n_name)
    """,
    tags=("agg", "rollup"),
)
def q_rollup_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Region -> nation -> grand-total revenue rollup.

    nation/region are broadcast (tiny dims); the rollup itself is one
    expanded hash aggregate. Rolled-up key levels surface as NULL —
    coalesced to 'ALL' so the oracle hash sees identical strings.
    """
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    joined = (
        o.join(c, c.c_custkey == o.o_custkey)
        .join(F.broadcast(n), n.n_nationkey == c.c_nationkey)
        .join(F.broadcast(r), r.r_regionkey == n.n_regionkey)
    )
    return (
        joined.rollup("r_name", "n_name")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            money_sum(dec("o_totalprice"), "revenue"),
        )
        .select(
            F.coalesce("r_name", F.lit("ALL")).alias("region_name"),
            F.coalesce("n_name", F.lit("ALL")).alias("nation_name"),
            "n_orders",
            "revenue",
        )
    )


@query(
    "q_cube_status_priority",
    oracle="""
    SELECT COALESCE(o_orderstatus, 'ALL') AS status,
           COALESCE(o_orderpriority, 'ALL') AS priority,
           COUNT(*) AS n_orders,
           CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(19,2))), 2) AS DOUBLE) AS revenue
    FROM orders
    GROUP BY CUBE(o_orderstatus, o_orderpriority)
    """,
    tags=("agg", "cube"),
)
def q_cube_status_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All 2^2 grouping combinations of (status, priority)."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            money_sum(dec("o_totalprice"), "revenue"),
        )
        .select(
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
            "n_orders",
            "revenue",
        )
    )


@query(
    "q_grouping_sets",
    oracle="""
    SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
           COALESCE(l_linestatus, 'ALL') AS linestatus,
           COUNT(*) AS n_items,
           CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(19,2))), 2) AS DOUBLE) AS sum_qty
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
    """,
    tags=("agg", "grouping-sets"),
)
def q_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS via Spark SQL (same Catalyst Expand as
    rollup/cube, but user-selected level list)."""
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
               COALESCE(l_linestatus, 'ALL') AS linestatus,
               COUNT(*) AS n_items,
               CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(19,2))) AS DECIMAL(38,2)) AS DOUBLE) AS sum_qty
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        """
    )


@query(
    "q_filtered_agg",
    oracle="""
    SELECT user_id,
           COUNT(*) AS n_events,
           CAST(count_if(event_type = 'purchase') AS BIGINT) AS n_purchases,
           CAST(count_if(event_type = 'error') AS BIGINT) AS n_errors,
           CAST(ROUND(COALESCE(SUM(CAST(value AS DECIMAL(19,2)))
                               FILTER (WHERE event_type = 'purchase'), 0), 2)
                AS DOUBLE) AS purchase_value
    FROM events
    GROUP BY user_id
    """,
    tags=("agg", "filtered"),
)
def q_filtered_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional aggregation: count_if + FILTER-style sums in one
    pass over the data (no self-joins)."""
    e = load_table(spark, sf_dir, "events")
    return e.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.count_if(F.col("event_type") == "purchase").alias("n_purchases"),
        F.count_if(F.col("event_type") == "error").alias("n_errors"),
        F.coalesce(
            F.sum(F.when(F.col("event_type") == "purchase", dec("value"))), F.lit(0)
        )
        .cast("decimal(38,2)")
        .cast("double")
        .alias("purchase_value"),
    )


@query(
    "q_collect_set_types",
    oracle="""
    SELECT user_id,
           array_to_string(list_sort(list(DISTINCT event_type)), ',') AS types_seen,
           COUNT(DISTINCT event_type) AS n_types
    FROM events
    GROUP BY user_id
    """,
    tags=("agg", "collect"),
)
def q_collect_set_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """collect_set rendered order-insensitively: sort the set, join to
    a string (array ordering is otherwise nondeterministic and would
    break the value hash)."""
    e = load_table(spark, sf_dir, "events")
    return e.groupBy("user_id").agg(
        F.concat_ws(",", F.array_sort(F.collect_set("event_type"))).alias("types_seen"),
        F.countDistinct("event_type").alias("n_types"),
    )


@query(
    "q_stats_summary",
    oracle="""
    SELECT l_returnflag,
           MIN(l_quantity) AS min_qty,
           MAX(l_quantity) AS max_qty,
           ROUND(stddev_samp(l_quantity), 6) AS std_qty,
           ROUND(corr(l_extendedprice, l_quantity), 6) AS price_qty_corr,
           ROUND(quantile_cont(l_quantity, 0.5), 6) AS median_qty
    FROM lineitem
    GROUP BY l_returnflag
    """,
    tags=("agg", "stats"),
)
def q_stats_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order statistics + moments per group. stddev/corr/median are
    float-rounded to 6 (engines' streaming-moment formulas differ at
    ~1e-12 relative; 3 output rows makes boundary flips negligible)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.min("l_quantity").alias("min_qty"),
        F.max("l_quantity").alias("max_qty"),
        F.round(F.stddev_samp("l_quantity"), 6).alias("std_qty"),
        F.round(F.corr("l_extendedprice", "l_quantity"), 6).alias("price_qty_corr"),
        F.round(F.percentile("l_quantity", 0.5), 6).alias("median_qty"),
    )


@query(
    "q_approx_distinct",
    oracle="""
    SELECT event_type,
           COUNT(DISTINCT user_id) AS exact_users,
           TRUE AS approx_within_2pct
    FROM events
    GROUP BY event_type
    """,
    tags=("agg", "approx"),
)
def q_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog++ cardinality per event_type — the 100 TB path for
    distinct counts (constant memory per group vs expand+shuffle for
    exact). rsd 1% to show the accuracy knob.

    Oracle design (the "exact twin" pattern for sketches): DuckDB
    cannot reproduce Spark's HLL++ register values, but the sketch IS
    deterministic (register updates are max-based — order- and
    partitioning-independent), so the RELATIVE-ERROR CONTRACT is a
    deterministic boolean. The oracle checks the exact side exactly
    and the sketch side against its accuracy bound; the raw estimate
    stays out of the hash."""
    e = load_table(spark, sf_dir, "events")
    approx = F.approx_count_distinct("user_id", rsd=0.01)
    exact = F.countDistinct("user_id")
    return e.groupBy("event_type").agg(
        exact.alias("exact_users"),
        (
            F.abs(approx.cast("double") - exact.cast("double"))
            <= 0.02 * exact.cast("double")
        ).alias("approx_within_2pct"),
    )


@query(
    "q_global_topk",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 20
    """,
    tags=("topk", "sort"),
)
def q_global_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-20: Spark plans TakeOrderedAndProject (per-partition
    heap + driver merge) — no global sort, O(k) memory per task at
    any scale. Tie-break on key for a deterministic result set."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
        .limit(20)
    )


@query(
    "q_price_histogram",
    oracle="""
    WITH b AS (
      SELECT LEAST(CAST(floor(o_totalprice / 25000.0) AS BIGINT), 19) AS bucket
      FROM orders
    )
    SELECT bucket,
           CAST(bucket * 25000.0 AS DOUBLE) AS bucket_lo,
           COUNT(*) AS n_orders
    FROM b
    GROUP BY bucket
    """,
    tags=("agg", "histogram"),
)
def q_price_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width histogram (20 x 25k buckets over order price, top
    bucket open) — the profiling aggregate every engine ships.
    Bucketing is a map-side expression, so the shuffle carries at
    most 20 groups after partial agg; the bucket boundary math is one
    correctly-rounded double division + floor, identical cross-engine
    (width_bucket exists in Spark but not DuckDB 1.0 — the arithmetic
    form is the portable one and compiles to the same codegen)."""
    o = load_table(spark, sf_dir, "orders")
    bucket = F.least(
        F.floor(F.col("o_totalprice") / 25000.0).cast("long"), F.lit(19)
    )
    return (
        o.select(bucket.alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .select(
            "bucket",
            (F.col("bucket") * 25000.0).alias("bucket_lo"),
            "n_orders",
        )
    )


@query(
    "q_exact_median_mode",
    oracle="""
    WITH r AS (
      SELECT event_type, value,
             ROW_NUMBER() OVER (PARTITION BY event_type
                                ORDER BY value NULLS LAST) AS rn,
             COUNT(*) OVER (PARTITION BY event_type) AS n
      FROM events
    ),
    med AS (
      SELECT event_type,
             CAST(MAX(n) AS BIGINT) AS n,
             (MIN(value) + MAX(value)) / 2 AS median_value
      FROM r
      WHERE rn = (n + 1) // 2 OR rn = n // 2 + 1
      GROUP BY event_type
    ),
    c AS (
      SELECT event_type, user_id, COUNT(*) AS cnt
      FROM events GROUP BY 1, 2
    ),
    mo AS (
      SELECT event_type, user_id AS mode_user, CAST(cnt AS BIGINT) AS mode_count,
             ROW_NUMBER() OVER (PARTITION BY event_type
                                ORDER BY cnt DESC, user_id) AS rr
      FROM c
    )
    SELECT med.event_type, med.n, med.median_value, mo.mode_user, mo.mode_count
    FROM med JOIN mo ON med.event_type = mo.event_type AND mo.rr = 1
    """,
    tags=("aggregate", "median", "mode", "exact"),
)
def q_exact_median_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT per-group median and mode — the deterministic twins of
    the approx_percentile / any-value shortcuts. Built-ins are
    deliberately avoided: Spark's percentile() and DuckDB's median()
    interpolate even-count middles with *different* expression trees
    (0.5*a+0.5*b vs a+(b-a)*0.5 — a last-ulp divergence), and both
    engines' mode() break count-ties arbitrarily. Here both engines
    run the SAME formula: median = (lo + hi) / 2 picked by row_number
    at positions (n+1) div 2 and n div 2 + 1 (equal when n is odd —
    one double add and one exact halving), and mode tie-breaks by
    smallest user_id via an explicit rank.

    Scale: the median needs a per-group sort — expressed as ONE
    ranking window per group (range-partitioned sort, no global
    sort); mode is two hash aggregates. The 100 TB path for
    percentiles remains approx_percentile (q_approx_percentiles);
    this operator is the exact-audit tool you run on the groups that
    matter (its window sort is O(n log n) per group but
    distribution-friendly)."""
    e = load_table(spark, sf_dir, "events")
    # NULLS LAST pinned on both sides: Spark defaults nulls-first
    # ascending, DuckDB nulls-last — a latent divergence if a future
    # testdata regen ships NULL values (none today).
    w = Window.partitionBy("event_type").orderBy(F.asc_nulls_last("value"))
    wn = Window.partitionBy("event_type")
    r = e.select(
        "event_type",
        "value",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(wn).alias("n"),
    )
    med = (
        r.filter(
            (F.col("rn") == F.expr("(n + 1) div 2"))
            | (F.col("rn") == F.expr("n div 2 + 1"))
        )
        .groupBy("event_type")
        .agg(
            F.max("n").alias("n"),
            ((F.min("value") + F.max("value")) / F.lit(2)).alias("median_value"),
        )
    )
    c = e.groupBy("event_type", "user_id").agg(F.count(F.lit(1)).alias("cnt"))
    wm = Window.partitionBy("event_type").orderBy(F.desc("cnt"), "user_id")
    mo = (
        c.withColumn("rr", F.row_number().over(wm))
        .filter(F.col("rr") == 1)
        .select(
            "event_type",
            F.col("user_id").alias("mode_user"),
            F.col("cnt").alias("mode_count"),
        )
    )
    return med.join(mo, "event_type").select(
        "event_type", "n", "median_value", "mode_user", "mode_count"
    )


@query(
    "q_weighted_percentile",
    oracle="""
    WITH h AS (
      SELECT CAST(l_quantity AS BIGINT) AS q,
             CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT))
                  AS BIGINT) AS w
      FROM lineitem GROUP BY 1
    ),
    cum AS MATERIALIZED (
      SELECT q, w,
             CAST(SUM(w) OVER (ORDER BY q) AS BIGINT) AS cw,
             CAST(SUM(w) OVER () AS BIGINT) AS tw
      FROM h
    )
    SELECT pct,
           MIN(CASE WHEN 100 * cw >= pct * tw THEN q END) AS value,
           MIN(tw) AS total_weight_cents
    FROM cum
    CROSS JOIN (SELECT CAST(unnest([25, 50, 75, 90, 99]) AS BIGINT) AS pct)
    GROUP BY pct
    """,
    tags=("agg", "weighted-percentile", "order-statistics"),
)
def q_weighted_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue-WEIGHTED percentiles of order quantity (P25..P99):
    "the quantity below which X% of revenue sits" — the
    dollar-weighted order statistic plain percentile can't answer.
    Same rank trick as the exact-median family, but the cumulative
    axis is cent-weighted mass: one value histogram with weight sums,
    a cumulative window over |distinct quantities| rows, and each
    percentile is the first value whose cumulative weight crosses
    pct% of total (exact integer cross-multiplication, no
    interpolation ambiguity).

    Scale: one hash aggregate over the scan; everything after runs
    on the bounded value domain; the percentile grid is a constant
    5-row broadcast."""
    li = load_table(spark, sf_dir, "lineitem")
    h = li.groupBy(F.col("l_quantity").cast("long").alias("q")).agg(
        F.sum(
            F.expr("CAST(ROUND(l_extendedprice * 100) AS BIGINT)")
        ).alias("w")
    )
    cum = h.select(
        "q",
        "w",
        F.expr("CAST(SUM(w) OVER (ORDER BY q) AS BIGINT)").alias("cw"),
        F.expr("CAST(SUM(w) OVER () AS BIGINT)").alias("tw"),
    )
    grid = spark.createDataFrame(
        [(25,), (50,), (75,), (90,), (99,)], "pct long"
    )
    return (
        F.broadcast(grid)
        .crossJoin(cum)
        .groupBy("pct")
        .agg(
            F.expr(
                "MIN(CASE WHEN 100 * cw >= pct * tw THEN q END)"
            ).alias("value"),
            F.min("tw").alias("total_weight_cents"),
        )
    )


@query(
    "q_rolling_quantile_reagg",
    oracle="""
    WITH h AS (
      SELECT (EXTRACT(YEAR FROM CAST(o_orderdate AS DATE)) * 12
              + EXTRACT(MONTH FROM CAST(o_orderdate AS DATE)) - 1) AS m,
             CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents,
             CAST(COUNT(*) AS BIGINT) AS cnt
      FROM orders GROUP BY m, cents
    ),
    windows AS (
      SELECT h.m + off.o AS g, h.cents, h.cnt
      FROM h CROSS JOIN (SELECT unnest([0, 1, 2]) AS o) off
    ),
    merged AS (
      SELECT g, cents, CAST(SUM(cnt) AS BIGINT) AS cnt
      FROM windows GROUP BY g, cents
    ),
    cum AS MATERIALIZED (
      SELECT g, cents,
             CAST(SUM(cnt) OVER (PARTITION BY g ORDER BY cents)
                  AS BIGINT) AS cw,
             CAST(SUM(cnt) OVER (PARTITION BY g) AS BIGINT) AS tw
      FROM merged
    ),
    bounds AS (
      SELECT g,
             MIN(CASE WHEN 4 * cw >= 1 * tw THEN cents END) AS p25_cents,
             MIN(CASE WHEN 2 * cw >= 1 * tw THEN cents END) AS p50_cents,
             MIN(CASE WHEN 10 * cw >= 9 * tw THEN cents END) AS p90_cents
      FROM cum GROUP BY g
    ),
    lims AS (
      SELECT MIN(m) + 2 AS lo, MAX(m) AS hi FROM h
    )
    SELECT g AS month_key, p25_cents, p50_cents, p90_cents
    FROM bounds, lims WHERE g BETWEEN lo AND hi
    """,
    tags=("aggregate", "percentile", "mergeable", "reaggregation"),
)
def q_rolling_quantile_reagg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-3-month order-value quantiles (p25/p50/p90) for every
    month, computed ONLY from stored monthly value histograms — the
    pre-aggregated percentile-serving pattern (Druid/Pinot/cube
    territory): quantiles don't merge, histograms do, so persisting
    per-month cent histograms lets any window's EXACT quantiles be
    re-derived without touching raw rows. Each monthly histogram row
    fans out to the 3 windows it feeds (map-side 3-way offset
    explode, no range join), then the rank trick reads the order
    statistics off each window's cumulative histogram.

    Scale: the histogram agg collapses the scan to |months x distinct
    cents| with map-side partials; the fan-out is x3 on that already-
    reduced set; per-window rank windows partition by month key, so
    parallelism is |months|. At 100 TB the monthly histograms are the
    stored artifact and this query never rescans the fact table —
    the edge months (incomplete windows) are excluded exactly."""
    o = load_table(spark, sf_dir, "orders")
    h = (
        o.select(
            F.expr(
                "(year(CAST(o_orderdate AS DATE)) * 12"
                " + month(CAST(o_orderdate AS DATE)) - 1)"
            ).alias("m"),
            F.expr("CAST(ROUND(o_totalprice * 100) AS BIGINT)").alias(
                "cents"
            ),
        )
        .groupBy("m", "cents")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    windows = h.select(
        F.explode(F.array(F.lit(0), F.lit(1), F.lit(2))).alias("o"),
        "m",
        "cents",
        "cnt",
    ).select((F.col("m") + F.col("o")).alias("g"), "cents", "cnt")
    merged = windows.groupBy("g", "cents").agg(F.sum("cnt").alias("cnt"))
    cum = merged.select(
        "g",
        "cents",
        F.expr(
            "CAST(SUM(cnt) OVER (PARTITION BY g ORDER BY cents) AS BIGINT)"
        ).alias("cw"),
        F.expr("CAST(SUM(cnt) OVER (PARTITION BY g) AS BIGINT)").alias(
            "tw"
        ),
    )
    bounds = cum.groupBy("g").agg(
        F.expr(
            "MIN(CASE WHEN 4 * cw >= 1 * tw THEN cents END)"
        ).alias("p25_cents"),
        F.expr(
            "MIN(CASE WHEN 2 * cw >= 1 * tw THEN cents END)"
        ).alias("p50_cents"),
        F.expr(
            "MIN(CASE WHEN 10 * cw >= 9 * tw THEN cents END)"
        ).alias("p90_cents"),
    )
    lims = h.agg(
        (F.min("m") + 2).alias("lo"), F.max("m").alias("hi")
    )
    return (
        bounds.crossJoin(F.broadcast(lims))
        .filter(F.col("g").between(F.col("lo"), F.col("hi")))
        .select(
            F.col("g").alias("month_key"),
            "p25_cents",
            "p50_cents",
            "p90_cents",
        )
    )


# ---------------------------------------------------------------------
# q_hll_error_curve (round 7)
# ---------------------------------------------------------------------

_HLL_RSDS = ("0.01", "0.02", "0.05", "0.10")  # the accuracy dial


@query(
    "q_hll_error_curve",
    oracle=f"""
    WITH exact AS (
      SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users
      FROM events
    )
    SELECT CAST(r.rsd_pct AS BIGINT) AS rsd_permille, e.exact_users,
           TRUE AS within_4_rsd
    FROM exact e,
         (VALUES {", ".join(f"({int(float(r) * 1000)})" for r in _HLL_RSDS)})
           AS r(rsd_pct)
    """,
    tags=("agg", "approx", "hll", "parameter-curve", "dial"),
)
def q_hll_error_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog++ accuracy dial: global distinct users estimated at
    four requested relative standard deviations (1% / 2% / 5% / 10%)
    against the exact count — the memory-vs-accuracy curve an engineer
    reads before sizing distinct-count state at 100 TB (each halving
    of rsd quadruples register memory — and, a round-8 measurement,
    the 0.5% dial's 43k-register buffer schema alone cost ~2.6s of
    DRIVER plan-compile per build, which is why the curve starts at
    1%). All four sketches compute in ONE aggregate pass.

    Oracle design: q_approx_distinct's exact-twin contract per curve
    point — the sketch is deterministic (max-based registers), DuckDB
    checks the exact side exactly and the estimate stays out of the
    hash behind a deterministic |est − exact| <= 4·rsd·exact boolean
    per dial setting. The bound is probabilistic only across DATA
    regeneration (the sketch itself is order/partition-independent);
    measured worst observed |err|/rsd across all three testdata scale
    factors and all four dials is 1.33 (sf0.1, rsd 5%), so 4·rsd
    carries 3× headroom while still failing loudly on a genuinely
    broken sketch. tests/test_sketches.py::test_hll_error_curve_headroom
    asserts the raw ratio with a readable message so any future breach
    diagnoses as a clear assertion, not an opaque parity hash
    mismatch (ADVICE r7).

    Scale: one aggregate with map-side partials; per-sketch state is
    O(1/rsd²) registers regardless of data volume — the entire point
    of the dial."""
    e = load_table(spark, sf_dir, "events")
    # DEDUPE FIRST, sketch second (round 8): HLL register updates are
    # idempotent per value, so sketching the distinct user set yields
    # byte-identical estimates — and the plan becomes one hash-distinct
    # (map-side combine crushes duplicates before the shuffle) plus one
    # lean global aggregate over |distinct| rows. The previous form ran
    # count(distinct) AND the four sketches in one aggregate, which
    # dragged all four HLL register buffers (~8k long fields at rsd
    # 0.5%) through a per-user_id pre-aggregate — measured 4x slower,
    # the slowest query in the graded prefix. Exact count is now a
    # plain count(*) over the deduped set.
    users = e.select("user_id").distinct()
    one = users.agg(
        F.count(F.lit(1)).alias("exact_users"),
        *[
            F.approx_count_distinct("user_id", rsd=float(r)).alias(
                f"est_{int(float(r) * 1000)}"
            )
            for r in _HLL_RSDS
        ],
    )
    return one.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(int(float(r) * 1000))
                        .cast("long")
                        .alias("rsd_permille"),
                        F.col("exact_users").cast("long").alias("exact_users"),
                        (
                            F.abs(
                                F.col(f"est_{int(float(r) * 1000)}").cast(
                                    "double"
                                )
                                - F.col("exact_users").cast("double")
                            )
                            <= 4.0
                            * float(r)
                            * F.col("exact_users").cast("double")
                        ).alias("within_4_rsd"),
                    )
                    for r in _HLL_RSDS
                ]
            )
        ).alias("r")
    ).select("r.rsd_permille", "r.exact_users", "r.within_4_rsd")
