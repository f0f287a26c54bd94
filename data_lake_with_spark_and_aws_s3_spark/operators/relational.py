"""Headline relational queries (SURVEY.md §2.2–§2.6, BASELINE.md set).

Reference parity: the reference's relational surface is select/filter/
withColumn/dropDuplicates/join/write (`etl.py:~36,~81,~135` — canonical
template line numbers; checkout empty per SURVEY.md §0). These queries
exercise the same operators over the driver testdata, shaped like the
TPC-H queries the baseline measures.

Scale notes per query are inline. General posture: filters are plain
Column predicates (push into the parquet scan), aggregations are
builtin (partial+final HashAggregate with map-side combine), joins let
Catalyst/AQE pick broadcast vs sort-merge — at sf0.1 the dims broadcast
under the 64 MB threshold; at 100 TB AQE converts or keeps SMJ as
stats dictate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.numeric import avg_exact, dec, money_sum
from ..registry import query
from ..sources.loader import load_table

RATE = "decimal(8,6)"  # discounts/taxes: < 100, 6-decimal precision


def _one_minus(rate_col):
    # Re-cast (1 - rate) to DECIMAL(8,6): keeps the later triple product
    # within Spark's precision 38 (no scale truncation -> bit-exact vs
    # DuckDB, whose oracle SQL mirrors the same cast).
    return (F.lit(1) - rate_col).cast(RATE)


def _one_plus(rate_col):
    return (F.lit(1) + rate_col).cast(RATE)


@query(
    "q1_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
      CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(19,2))), 2) AS DOUBLE) AS sum_qty,
      CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(19,2))), 2) AS DOUBLE) AS sum_base_price,
      CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(19,2))
               * CAST(1 - CAST(l_discount AS DECIMAL(8,6)) AS DECIMAL(8,6))), 2) AS DOUBLE) AS sum_disc_price,
      CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(19,2))
               * CAST(1 - CAST(l_discount AS DECIMAL(8,6)) AS DECIMAL(8,6))
               * CAST(1 + CAST(l_tax AS DECIMAL(8,6)) AS DECIMAL(8,6))), 2) AS DOUBLE) AS sum_charge,
      CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(19,2))), 6) AS DOUBLE) / COUNT(*) AS avg_qty,
      CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(19,2))), 6) AS DOUBLE) / COUNT(*) AS avg_price,
      CAST(ROUND(SUM(CAST(l_discount AS DECIMAL(8,6))), 6) AS DOUBLE) / COUNT(*) AS avg_disc,
      COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
    tags=("agg", "filter", "headline"),
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-like pricing summary: pushed-down date filter ->
    two-key hash aggregate with 8 aggregates.

    Plan: ParquetScan(PushedFilters: l_shipdate <= ...) -> partial
    HashAggregate -> shuffle(2-key) -> final HashAggregate. Whole-stage
    codegen end to end; decimal sums stay in Tungsten. At 100 TB the
    only shuffle moves ~|groups| * cores rows — negligible.
    """
    li = load_table(spark, sf_dir, "lineitem")
    price, qty = dec("l_extendedprice"), dec("l_quantity")
    disc, tax = dec("l_discount", RATE), dec("l_tax", RATE)
    disc_price = price * _one_minus(disc)
    charge = price * _one_minus(disc) * _one_plus(tax)
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            money_sum(qty, "sum_qty"),
            money_sum(price, "sum_base_price"),
            money_sum(disc_price, "sum_disc_price"),
            money_sum(charge, "sum_charge"),
            avg_exact(qty, "avg_qty"),
            avg_exact(price, "avg_price"),
            avg_exact(disc, "avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@query(
    "q3_join_topk",
    oracle="""
    SELECT o.o_orderkey, CAST(o.o_orderdate AS TIMESTAMP) AS o_orderdate,
           o.o_orderpriority,
           CAST(ROUND(SUM(CAST(l.l_extendedprice AS DECIMAL(19,2))
                    * CAST(1 - CAST(l.l_discount AS DECIMAL(8,6)) AS DECIMAL(8,6))), 2) AS DOUBLE) AS revenue
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1995-03-15'
      AND l.l_shipdate > TIMESTAMP '1995-03-15'
    GROUP BY o.o_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY revenue DESC, o_orderkey
    LIMIT 10
    """,
    tags=("join", "agg", "topk", "headline"),
)
def q3_join_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3-like: 3-way join + aggregate + top-10.

    Shape: lineitem (fact) joins orders, orders joins customer; all
    filters applied pre-join so they push into the scans. Catalyst/AQE
    broadcasts customer/orders sides when small; at 100 TB lineitem ⋈
    orders shuffles on orderkey (both huge) — co-partitioning on
    orderkey (bucketing) removes that shuffle in a warehouse layout.
    Top-k compiles to TakeOrderedAndProject (per-partition heap, no
    global sort). Tie-break on o_orderkey keeps the top-10 set
    deterministic for the oracle hash.
    """
    cutoff = F.lit("1995-03-15").cast("timestamp")
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderdate") < cutoff)
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > cutoff)
    revenue = dec("l_extendedprice") * _one_minus(dec("l_discount", RATE))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
        .agg(money_sum(revenue, "revenue"))
        .orderBy(F.desc("revenue"), "o_orderkey")
        .limit(10)
    )


@query(
    "q_window_rank",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             CAST(ROW_NUMBER() OVER (
               PARTITION BY o_custkey
               ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT) AS rn
      FROM orders)
    WHERE rn <= 3
    """,
    tags=("window", "headline"),
)
def q_window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per customer via row_number window.

    One shuffle on o_custkey, then in-partition sort — the canonical
    per-group top-k. At 100 TB a skewed customer would dominate a
    partition; mitigation is pre-aggregation or AQE skew handling
    (window partitioning is by-key, so extreme skew would call for a
    two-phase top-k: per-partition heap then merge).
    Tie-break on o_orderkey makes rank assignment deterministic.
    """
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), "o_orderkey")
    return (
        o.select(
            "o_custkey",
            "o_orderkey",
            "o_totalprice",
            F.row_number().over(w).cast("long").alias("rn"),
        )
        .filter(F.col("rn") <= 3)
    )


@query(
    "q_events_tumbling",
    oracle="""
    SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hour_ts, event_type,
           COUNT(*) AS n_events,
           CAST(ROUND(SUM(CAST(value AS DECIMAL(19,2))), 2) AS DOUBLE) AS sum_value
    FROM events
    GROUP BY 1, 2
    """,
    tags=("events", "window-agg", "headline"),
)
def q_events_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly tumbling-window aggregate over the event stream (batch
    form; streaming twin in streaming/).

    date_trunc keeps the group key scalar (vs window() struct) so the
    oracle matches column-for-column. Single shuffle on (hour, type);
    partial aggregation bounds it by |hours|*|types| per task.
    """
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(
            F.date_trunc("hour", F.col("ts")).alias("hour_ts"),
            "event_type",
        ).agg(
            F.count(F.lit(1)).alias("n_events"),
            money_sum(dec("value"), "sum_value"),
        )
    )


@query(
    "q_distinct_users",
    oracle="""
    SELECT event_type,
           COUNT(DISTINCT user_id) AS n_users,
           COUNT(*) AS n_events
    FROM events
    GROUP BY event_type
    """,
    tags=("agg", "distinct", "headline"),
)
def q_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct-count per event type.

    Spark plans count(distinct) as a two-phase expand+aggregate —
    exact and scalable (the expand doubles rows but partial aggs crush
    them before the shuffle). The approximate variant for 100 TB
    dashboards is q_approx_distinct (HyperLogLog++, rows-only check).
    """
    e = load_table(spark, sf_dir, "events")
    return e.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_users"),
        F.count(F.lit(1)).alias("n_events"),
    )
