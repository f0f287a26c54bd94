"""BI-analytics shapes beyond the TPC-H set: TPC-DS-style
year-over-year growth, a 2-D skyline (Pareto frontier), and an
equi-width histogram with share-of-total.

Scale posture (100 TB):
- YoY growth is one keyed aggregate plus a tiny per-key lag window —
  the window input is |nations| x |years| rows, already reduced.
- Skyline uses the sort-based O(n log n) formulation (running max over
  a price-ordered window) instead of the O(n^2) dominance self-join
  the oracle spells out. The global window runs AFTER pre-aggregation
  to distinct (price, size) pairs, so its single-task input is the
  pair count, not the row count; at extreme pair cardinality the
  textbook refinement is range-partition by price, per-partition
  skyline, then re-run on the union of survivors (noted, not needed
  here).
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
    Identical points are collapsed by the pre-aggregation, which also
    caps the global window's input at the pair cardinality."""
    p = load_table(spark, sf_dir, "part")
    pairs = (
        p.groupBy("p_retailprice", F.col("p_size").cast("long").alias("p_size"))
        .agg(F.count(F.lit(1)).alias("n_parts"))
    )
    w = (
        Window.orderBy(F.asc("p_retailprice"), F.desc("p_size"))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    mx = F.max("p_size").over(w)
    return (
        pairs.withColumn("mx", mx)
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
