"""Scalar function coverage (SURVEY.md §2.8): string, date/time, JSON,
conditional, math families — each exercised end-to-end against the
oracle dialect with its conventions normalized.

Reference parity: the reference's scalar usage is the time-dimension
derivation (`etl.py:~90-103` canonical template: hour/day/weekofyear/
month/year/weekday from epoch-ms, via a Python UDF) and string equality
on natural keys. Per the 100 TB mandate every function here is a
JVM-side builtin — the reference's UDF is replaced by
`timestamp_millis` + builtin date parts (see etl.py module).

Dialect gotchas handled (SURVEY.md §2.8):
- dayofweek: Spark Sun=1 .. Sat=7; DuckDB Sun=0 .. Sat=6 → oracle
  adds +1.
- weekofyear: ISO week in both — no fix needed.
- round/exp/log on doubles only applied to per-group aggregates
  (few rows) to keep 1-ulp libm drift out of hash-relevant columns.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.numeric import dec, money_sum
from ..registry import query
from ..sources.loader import load_table


@query(
    "q_string_funcs",
    oracle="""
    SELECT c_custkey,
           upper(c_name) AS name_upper,
           CAST(length(c_name) AS BIGINT) AS name_len,
           lpad(CAST(c_custkey AS VARCHAR), 12, '0') AS key_padded,
           regexp_extract(c_name, '[0-9]+$') AS key_digits,
           substring(c_mktsegment, 1, 4) AS seg4,
           concat_ws('-', c_mktsegment, trim(c_name)) AS seg_name,
           replace(c_name, 'Customer', 'C') AS short_name,
           CAST(strpos(c_name, '#') AS BIGINT) AS hash_pos,
           CAST(levenshtein(c_mktsegment, 'MACHINERY') AS BIGINT) AS seg_dist
    FROM customer
    """,
    tags=("scalar", "string"),
)
def q_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String family: case, length, pad, regex extract, substring,
    concat, replace, find, edit distance — all codegen'd builtins."""
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.upper("c_name").alias("name_upper"),
        F.length("c_name").cast("long").alias("name_len"),
        F.lpad(F.col("c_custkey").cast("string"), 12, "0").alias("key_padded"),
        F.regexp_extract("c_name", "[0-9]+$", 0).alias("key_digits"),
        F.substring("c_mktsegment", 1, 4).alias("seg4"),
        F.concat_ws("-", "c_mktsegment", F.trim(F.col("c_name"))).alias("seg_name"),
        F.replace(F.col("c_name"), F.lit("Customer"), F.lit("C")).alias("short_name"),
        F.instr("c_name", "#").cast("long").alias("hash_pos"),
        F.levenshtein(F.col("c_mktsegment"), F.lit("MACHINERY")).cast("long").alias("seg_dist"),
    )


@query(
    "q_date_parts",
    oracle="""
    SELECT o_orderkey,
           CAST(year(o_orderdate) AS BIGINT) AS yr,
           CAST(quarter(o_orderdate) AS BIGINT) AS qtr,
           CAST(month(o_orderdate) AS BIGINT) AS mo,
           CAST(dayofmonth(o_orderdate) AS BIGINT) AS dom,
           CAST(weekofyear(o_orderdate) AS BIGINT) AS iso_week,
           CAST(dayofweek(o_orderdate) + 1 AS BIGINT) AS dow,
           CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
           CAST(o_orderdate AS TIMESTAMP) + INTERVAL 90 DAY AS due_date,
           datediff('day', TIMESTAMP '1995-01-01', CAST(o_orderdate AS TIMESTAMP)) AS days_since_1995,
           (year(o_orderdate) * 12 + month(o_orderdate)) - (1995 * 12 + 1) AS months_since_1995
    FROM orders
    """,
    tags=("scalar", "datetime"),
)
def q_date_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time family with cross-dialect conventions normalized
    (dayofweek offset; month arithmetic expressed identically)."""
    o = load_table(spark, sf_dir, "orders")
    d = F.col("o_orderdate")
    return o.select(
        "o_orderkey",
        F.year(d).cast("long").alias("yr"),
        F.quarter(d).cast("long").alias("qtr"),
        F.month(d).cast("long").alias("mo"),
        F.dayofmonth(d).cast("long").alias("dom"),
        F.weekofyear(d).cast("long").alias("iso_week"),
        F.dayofweek(d).cast("long").alias("dow"),
        F.date_trunc("month", d).alias("month_start"),
        (d + F.expr("INTERVAL 90 DAYS")).alias("due_date"),
        F.datediff(d, F.lit("1995-01-01").cast("date")).cast("long").alias("days_since_1995"),
        ((F.year(d) * 12 + F.month(d)) - F.lit(1995 * 12 + 1))
        .cast("long")
        .alias("months_since_1995"),
    )


@query(
    "q_json_extract",
    oracle="""
    SELECT event_type,
           CAST(SUM(CAST(props->>'k' AS BIGINT)) AS BIGINT) AS sum_k,
           MAX(CAST(props->>'k' AS BIGINT)) AS max_k,
           CAST(count_if(CAST(props->>'k' AS BIGINT) > 50) AS BIGINT) AS n_high
    FROM events
    GROUP BY event_type
    """,
    tags=("scalar", "json"),
)
def q_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON props access (events.props is a JSON string '{"k": n}') —
    get_json_object stays JVM-side; integer aggregation is exact."""
    e = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return e.groupBy("event_type").agg(
        F.sum(k).alias("sum_k"),
        F.max(k).alias("max_k"),
        F.count_if(k > 50).alias("n_high"),
    )


@query(
    "q_conditional",
    oracle="""
    SELECT CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 'high'
                WHEN o_orderpriority = '3-MEDIUM' THEN 'medium'
                ELSE 'low' END AS priority_class,
           CASE WHEN o_orderstatus = 'F' THEN 'done' ELSE 'open' END AS status_class,
           COUNT(*) AS n_orders,
           CAST(ROUND(SUM(least(CAST(o_totalprice AS DECIMAL(19,2)),
                                CAST(50000 AS DECIMAL(19,2)))), 2) AS DOUBLE) AS capped_spend,
           CAST(ROUND(SUM(greatest(CAST(o_totalprice AS DECIMAL(19,2)),
                                   CAST(100000 AS DECIMAL(19,2)))), 2) AS DOUBLE) AS floored_spend
    FROM orders
    GROUP BY 1, 2
    """,
    tags=("scalar", "conditional"),
)
def q_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CASE WHEN / when-otherwise, least/greatest — conditional logic
    folded into one aggregation pass."""
    o = load_table(spark, sf_dir, "orders")
    tp = dec("o_totalprice")
    return (
        o.groupBy(
            F.when(F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), "high")
            .when(F.col("o_orderpriority") == "3-MEDIUM", "medium")
            .otherwise("low")
            .alias("priority_class"),
            F.when(F.col("o_orderstatus") == "F", "done").otherwise("open").alias("status_class"),
        ).agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.least(tp, F.lit(50000).cast("decimal(19,2)")))
            .cast("decimal(38,2)")
            .cast("double")
            .alias("capped_spend"),
            F.sum(F.greatest(tp, F.lit(100000).cast("decimal(19,2)")))
            .cast("decimal(38,2)")
            .cast("double")
            .alias("floored_spend"),
        )
    )


@query(
    "q_math_funcs",
    oracle="""
    SELECT l_returnflag,
           CAST(SUM(CAST(ceil(l_extendedprice) AS BIGINT)) AS BIGINT) AS sum_ceil,
           CAST(SUM(CAST(floor(l_extendedprice) AS BIGINT)) AS BIGINT) AS sum_floor,
           CAST(SUM(CAST(abs(round(l_discount * 100, 0)) AS BIGINT)) AS BIGINT) AS sum_disc_pct,
           ROUND(sqrt(CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(19,2))), 2) AS DOUBLE)), 6) AS sqrt_revenue,
           ROUND(ln(CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(19,2))), 2) AS DOUBLE)), 6) AS ln_revenue
    FROM lineitem
    GROUP BY l_returnflag
    """,
    tags=("scalar", "math"),
)
def q_math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math family. ceil/floor/abs/round produce exact integers per
    row (summed as longs); sqrt/ln run once per GROUP on an identical
    double input — libm 1-ulp drift suppressed by round(6) over only
    3 rows."""
    li = load_table(spark, sf_dir, "lineitem")
    revenue = F.sum(dec("l_extendedprice")).cast("decimal(38,2)").cast("double")
    return li.groupBy("l_returnflag").agg(
        F.sum(F.ceil("l_extendedprice").cast("long")).alias("sum_ceil"),
        F.sum(F.floor("l_extendedprice").cast("long")).alias("sum_floor"),
        F.sum(F.abs(F.round(F.col("l_discount") * 100, 0)).cast("long")).alias("sum_disc_pct"),
        F.round(F.sqrt(revenue), 6).alias("sqrt_revenue"),
        F.round(F.log(revenue), 6).alias("ln_revenue"),
    )
