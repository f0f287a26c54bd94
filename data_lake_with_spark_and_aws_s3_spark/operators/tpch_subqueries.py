"""TPC-H subquery-decorrelation shapes: Q2 (correlated scalar MIN over
a join), Q20 (nested IN + HAVING), Q21 (EXISTS + NOT EXISTS self-join),
Q22 (scalar AVG subquery + NOT EXISTS).

These exercise the decorrelation patterns a SQL frontend needs —
re-expressed the way Catalyst wants them rather than as literal
correlated loops (no partsupp table in the corpus, so Q2/Q20 bind the
same shapes to lineitem-as-supply; spec shapes are public TPC-H):

    correlated MIN  -> window min over the correlation key (ONE scan,
                       no groupBy-plus-join-back double read)
    nested IN       -> broadcast semi-joins on the aggregated inner
    EXISTS/NOT EXISTS pair over the same table -> ONE per-key aggregate
                       (count distinct / conditional count) + join,
                       instead of two extra shuffled self-joins
    scalar subquery -> 1-row aggregate broadcast cross join

Exactness notes (driver hash): doubles read from parquet are bitwise
identical in both engines, so passthrough columns, double division,
MIN, and equality on those values are exact. Averages are compared in
scaled-int form (cents * n > total) — no division at all. Money sums
go through functions.numeric (exact decimal accumulation).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.numeric import dec, money_sum
from ..registry import query
from ..sources.loader import load_table


@query(
    "q2_min_cost_supplier",
    oracle="""
    WITH elig AS (
      SELECT p.p_partkey, p.p_type, s.s_name, s.s_acctbal, n.n_name,
             l.l_extendedprice / l.l_quantity AS unit_cost
      FROM lineitem l
      JOIN part p ON p.p_partkey = l.l_partkey AND p.p_size BETWEEN 1 AND 15
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN nation n ON n.n_nationkey = s.s_nationkey
      JOIN region r ON r.r_regionkey = n.n_regionkey AND r.r_name = 'EUROPE'
    )
    SELECT DISTINCT e.p_partkey, e.p_type, e.s_name, e.s_acctbal, e.n_name,
           e.unit_cost
    FROM elig e
    WHERE e.unit_cost = (SELECT MIN(e2.unit_cost) FROM elig e2
                         WHERE e2.p_partkey = e.p_partkey)
    """,
    tags=("join", "subquery", "correlated", "window"),
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: for each small part, the EUROPE supplier(s)
    offering it at the minimum unit cost. The correlated scalar MIN
    subquery decorrelates to a window min over the correlation key —
    one scan of the eligible lines, one fingerprint-keyed shuffle,
    instead of recomputing the 5-way join for the inner query.

    unit_cost = extendedprice/quantity: double division of
    parquet-identical inputs, so the min and the equality filter are
    bit-exact cross-engine."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_size").between(1, 15))
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    elig = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select(
            "p_partkey", "p_type", "s_name", "s_acctbal", "n_name",
            (F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_cost"),
        )
    )
    min_cost = F.min("unit_cost").over(Window.partitionBy("p_partkey"))
    return (
        elig.withColumn("min_cost", min_cost)
        .filter(F.col("unit_cost") == F.col("min_cost"))
        .drop("min_cost")
        .distinct()
    )


@query(
    "q20_supplier_threshold",
    oracle="""
    SELECT s.s_name, s.s_acctbal, n.n_name
    FROM supplier s
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    WHERE s.s_suppkey IN (
      SELECT l_suppkey FROM lineitem
      WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'small%')
      GROUP BY l_suppkey, l_partkey
      HAVING SUM(l_quantity) > 60.0
    )
    """,
    tags=("join", "subquery", "semi", "having"),
)
def q20_supplier_threshold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: suppliers who moved > 60 units of any 'small%'
    part (threshold sits at the ~p95 of per-(supplier, part) volume in
    this corpus, so the HAVING actually selects). Nested IN subqueries decorrelate to broadcast semi-joins:
    part filter -> broadcast semi into lineitem, per-(supplier, part)
    sum + HAVING, then semi into supplier. Every join's small side is
    broadcast; the only shuffle is the (suppkey, partkey) aggregate.

    SUM(l_quantity) is a sum of integral doubles (TPC-H quantities) —
    order-independent below 2^53, so the HAVING threshold is exact."""
    parts = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("small%"))
    li = load_table(spark, sf_dir, "lineitem")
    qualifying = (
        li.join(F.broadcast(parts), li.l_partkey == parts.p_partkey, "left_semi")
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum("l_quantity").alias("qty"))
        .filter(F.col("qty") > 60.0)
        .select("l_suppkey")
        .distinct()
    )
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    return (
        s.join(qualifying, s.s_suppkey == qualifying.l_suppkey, "left_semi")
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .select("s_name", "s_acctbal", "n_name")
    )


@query(
    "q21_waiting_supplier",
    oracle="""
    WITH fl AS (
      SELECT l.l_orderkey, l.l_suppkey,
             (l.l_shipdate > o.o_orderdate + INTERVAL 45 DAY) AS late
      FROM lineitem l
      JOIN orders o ON o.o_orderkey = l.l_orderkey AND o.o_orderstatus = 'F'
    )
    SELECT s.s_name, n.n_name, COUNT(*) AS numwait
    FROM fl l1
    JOIN supplier s ON s.s_suppkey = l1.l_suppkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    WHERE l1.late
      AND EXISTS (SELECT 1 FROM fl l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM fl l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.late)
    GROUP BY s.s_name, n.n_name
    """,
    tags=("join", "subquery", "exists", "anti"),
)
def q21_waiting_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: suppliers who were the SOLE late shipper on
    finished multi-supplier orders (late = shipped > 45 days after the
    order date), counted per supplier.

    The EXISTS / NOT EXISTS pair both correlate on l_orderkey over the
    same derived table, so instead of two extra shuffled self-joins
    this computes ONE per-order aggregate — distinct suppliers and
    distinct LATE suppliers — and joins it back: EXISTS(other supplier)
    = n_supp > 1, NOT EXISTS(other late supplier) = n_late_supp == 1
    (the probe line itself is late). One scan of the join feeds both
    the aggregate and the probe side; at 100 TB that halves the
    dominant shuffle versus the literal semi+anti plan."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    li = load_table(spark, sf_dir, "lineitem")
    late = F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 45 DAYS")
    fl = li.join(o, o.o_orderkey == li.l_orderkey).select(
        "l_orderkey", "l_suppkey", late.alias("late")
    )
    stats = fl.groupBy("l_orderkey").agg(
        F.countDistinct("l_suppkey").alias("n_supp"),
        F.countDistinct(F.when(F.col("late"), F.col("l_suppkey"))).alias("n_late_supp"),
    )
    probes = (
        fl.filter("late")
        .join(stats, "l_orderkey")
        .filter((F.col("n_supp") > 1) & (F.col("n_late_supp") == 1))
    )
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    return (
        probes.join(F.broadcast(s), probes.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy("s_name", "n_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )


@query(
    "q22_idle_customers",
    oracle="""
    WITH pos AS (
      SELECT COUNT(*) AS n_pos,
             CAST(SUM(CAST(ROUND(c_acctbal * 100, 0) AS BIGINT)) AS BIGINT)
               AS total_cents
      FROM customer WHERE c_acctbal > 0.0
    )
    SELECT n.n_name, COUNT(*) AS numcust,
           CAST(CAST(SUM(CAST(c.c_acctbal AS DECIMAL(19,2))) AS DECIMAL(38,2))
                AS DOUBLE) AS totacctbal
    FROM customer c
    JOIN nation n ON n.n_nationkey = c.c_nationkey
    CROSS JOIN pos
    WHERE CAST(ROUND(c.c_acctbal * 100, 0) AS BIGINT) * pos.n_pos > pos.total_cents
      AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
                      AND o.o_orderdate >= TIMESTAMP '2000-01-01')
    GROUP BY n.n_name
    """,
    tags=("join", "subquery", "scalar", "anti"),
)
def q22_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: customers with above-average positive balance
    and no RECENT order (none since 2000-01-01 — every customer in
    this corpus has some historical order, so "never ordered" would be
    vacuous), counted + totaled per nation. The
    scalar AVG subquery becomes a 1-row aggregate broadcast-crossed
    into the scan; NOT EXISTS(orders) is a left-anti join.

    The average comparison never divides: acctbal is scaled to integer
    cents and compared as cents * n_pos > total_cents — exact int64
    arithmetic in both engines (a 1-ulp drift in an avg double would
    flip boundary customers). The per-nation total uses the exact
    decimal-sum path (functions/numeric.py)."""
    c = load_table(spark, sf_dir, "customer")
    cents = F.round(F.col("c_acctbal") * 100, 0).cast("long")
    pos = (
        c.filter(F.col("c_acctbal") > 0.0)
        .agg(
            F.count(F.lit(1)).alias("n_pos"),
            F.sum(cents).alias("total_cents"),
        )
    )
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp")
    )
    n = load_table(spark, sf_dir, "nation")
    return (
        c.crossJoin(F.broadcast(pos))
        .filter(cents * F.col("n_pos") > F.col("total_cents"))
        .join(o, c.c_custkey == o.o_custkey, "left_anti")
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            money_sum(dec("c_acctbal"), "totacctbal"),
        )
    )
