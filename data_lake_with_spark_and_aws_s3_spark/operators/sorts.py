"""Global sort via range partitioning (SURVEY.md §2.6).

A global ORDER BY range-partitions on the sort key (sampled
boundaries) then sorts within partitions — the only scalable total
order. The driver's value-hash is order-insensitive, so the oracle
checks CONTENT while the plan test (tests/test_plans.py) checks the
physical shape: RangePartitioning exchange + in-partition Sort, no
single-task collapse.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..sources.loader import load_table


@query(
    "q_global_sort",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice,
           CAST(o_orderdate AS TIMESTAMP) AS o_orderdate
    FROM orders
    WHERE o_orderstatus = 'O'
    """,
    tags=("sort", "range-partition"),
)
def q_global_sort(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Totally-ordered open orders by (orderdate, orderkey). The sort
    is real work in the plan (range exchange + sort) even though the
    oracle hash can't observe row order — plan-shape asserted
    separately."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "O")
    return (
        o.select("o_orderkey", "o_custkey", "o_totalprice", "o_orderdate")
        .orderBy("o_orderdate", "o_orderkey")
    )


@query(
    "q_global_row_number",
    oracle="""
    SELECT o_orderkey, o_totalprice,
           CAST(ROW_NUMBER() OVER (ORDER BY o_totalprice DESC, o_orderkey)
                AS BIGINT) AS rn
    FROM orders
    """,
    tags=("sort", "row-number", "range-partition"),
)
def q_global_row_number(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contiguous global row numbers 1..N in a total order WITHOUT the
    single-task collapse of `row_number() OVER (ORDER BY ...)` with no
    partition key (Spark plans that as one task holding the whole
    table — the classic scale trap this operator replaces).

    The distributed form: (1) repartitionByRange on the sort key —
    partition i's keys all precede partition i+1's; (2) per-partition
    local row_number (window partitioned by spark_partition_id, so
    parallel); (3) per-partition counts -> running-sum offsets, a
    window over ≤ num_partitions rows, broadcast back; (4) global rn =
    offset + local rn. Sampled range boundaries are run-dependent, but
    the OUTPUT is deterministic: the sort key (totalprice DESC,
    orderkey) is unique, so whatever the boundary placement, offsets +
    local ranks reproduce exactly ROW_NUMBER() — which the oracle
    checks value-for-value. Cost: one range exchange + one tiny
    offset exchange; every stage is partition-parallel."""
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    ranged = o.repartitionByRange(16, F.desc("o_totalprice"), F.asc("o_orderkey"))
    # pin ONE pid assignment for both the local-window branch and the
    # broadcast offsets branch (round-7 fix, see _twophase.py: two
    # independent materializations of the range exchange can disagree)
    part = ranged.withColumn("pid", F.spark_partition_id()).localCheckpoint(
        eager=False
    )

    from pyspark.sql import Window

    w_local = Window.partitionBy("pid").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    local = part.withColumn("local_rn", F.row_number().over(w_local))

    w_off = (
        Window.orderBy("pid").rowsBetween(Window.unboundedPreceding, -1)
    )  # <= 16 rows: the one place a keyless window is fine
    offsets = (
        part.groupBy("pid")
        .agg(F.count(F.lit(1)).alias("n"))
        .withColumn("offset", F.coalesce(F.sum("n").over(w_off), F.lit(0)))
        .select("pid", "offset")
    )
    return (
        local.join(F.broadcast(offsets), "pid")
        .select(
            "o_orderkey",
            "o_totalprice",
            (F.col("offset") + F.col("local_rn")).cast("bigint").alias("rn"),
        )
    )
